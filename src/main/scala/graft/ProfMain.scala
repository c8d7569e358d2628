package graft
// Scratch profiling main (not part of the driver contract).
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("prof", "8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("dedup_ngram_jaccard")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
