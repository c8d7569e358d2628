package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LogRegSpec extends SparkTestBase {

  test("train recovers a planted linear boundary: accuracy well above " +
      "the base rate, both classes predicted, weight signs match") {
    import spark.implicits._
    // planted: y = 1 iff 2*x1 - x2 + noise > 0, noise in [-0.3, 0.3)
    val rows = (1 to 600).map { i =>
      val x1 = (i % 23) / 23.0 - 0.5
      val x2 = (i % 17) / 17.0 - 0.5
      val noise = ((i * 7919) % 600) / 1000.0 - 0.3
      (i.toLong, if (2 * x1 - x2 + noise > 0) 1L else 0L, x1, x2)
    }
    val df = rows.toDF("id", "y", "x1", "x2")
    val got = LogReg.train(df, "id", "y", "x1", "x2",
      iters = 15, lr = 10.0).collect()
    val acc = got.count(r => r.getLong(2) == r.getLong(3)).toDouble / got.length
    val base = math.max(rows.count(_._2 == 1L), rows.count(_._2 == 0L))
      .toDouble / rows.length
    assert(acc > base + 0.1, s"acc $acc must beat base $base clearly")
    val pos = got.count(_.getLong(2) == 1L)
    assert(pos > got.length / 10 && pos < got.length * 9 / 10,
      s"both classes must be predicted (pos=$pos)")
    val (w1, w2) = (got.head.getDouble(5), got.head.getDouble(6))
    assert(w1 > 0 && w2 < 0,
      s"weight signs must match the planted boundary ($w1, $w2)")
  }

  test("training is invariant to row order and partitioning " +
      "(integer gradient sums), and refuses an empty input") {
    import spark.implicits._
    val rows = (1 to 100).map { i =>
      (i.toLong, (i % 3 == 0).compareTo(false).toLong,
        i / 100.0 - 0.5, (i % 7) / 7.0)
    }
    val a = LogReg.train(rows.toDF("id", "y", "x1", "x2"),
      "id", "y", "x1", "x2").collect().map(_.toSeq).sortBy(_.head.toString)
    val b = LogReg.train(rows.reverse.toDF("id", "y", "x1", "x2")
        .repartition(13),
      "id", "y", "x1", "x2").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq,
      "weights and scores must not depend on row order/partitioning")
    val empty = Seq.empty[(Long, Long, Double, Double)]
      .toDF("id", "y", "x1", "x2")
    intercept[IllegalArgumentException] {
      LogReg.train(empty, "id", "y", "x1", "x2")
    }
  }
}
