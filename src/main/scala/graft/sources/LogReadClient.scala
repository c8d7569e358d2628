package graft.sources

import graft.sources.bus.BusRecord

/** The read surface the GraftBus streaming connector needs from a log
  * client — implemented by the native-protocol [[bus.BusClient]] and the
  * Kafka-protocol [[kafkawire.KafkaWireClient]], so the SAME DSv2
  * micro-batch source (offsets, admission control, AvailableNow
  * snapshots, exactly-once restart) runs over either wire protocol with
  * a one-option switch.
  */
trait LogReadClient extends AutoCloseable {
  def endOffsets(): Array[Long]
  def fetch(partition: Int, from: Long, until: Long,
            max: Int): Array[BusRecord]
}
