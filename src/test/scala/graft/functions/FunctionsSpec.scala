package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.operators.VectorOps

class FunctionsSpec extends SparkTestBase {

  test("ngrams generator equals the HOF transform+explode spelling, " +
      "handles short/null inputs, and runs as a real Generate node") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val viaGen = docs.select(col("doc_id"), expr("ngrams(tk, 3)"))
      .select("doc_id", "pos", "gram")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaHof = docs
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(1, size(tk) - 2),
          |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
          |                 element_at(tk, i + 2)))""".stripMargin)))
      .select(col("doc_id"), col("pos"), col("col"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaGen == viaHof, "generator must equal the HOF spelling")
    // short / null / null-element inputs emit nothing (refusal contract)
    val edge = Seq(
      (1L, Seq("a", "b")),            // shorter than n
      (2L, Seq("a", "b", "c", "d")),  // 2 grams
      (3L, null.asInstanceOf[Seq[String]]),
      (4L, Seq("a", null, "c", "d"))  // windows containing null skipped
    ).toDF("id", "tk")
    val got = edge.select(col("id"), expr("ngrams(tk, 3)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSet == Set((2L, 0, "a b c"), (2L, 1, "b c d"),
      (4L, 1, "null?" match { case _ => "" })).filter(_._1 == 2L) ++
      Set((4L, 1, "c d" match { case _ => "" })).filter(_ => false) ||
      got.toSet == Set((2L, 0, "a b c"), (2L, 1, "b c d")),
      s"edge cases wrong: ${got.toSeq}")
    // the plan must carry a Generate over the custom generator
    val plan = docs.select(expr("ngrams(tk, 3)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate") && plan.toLowerCase.contains("ngrams"),
      s"expected a Generate(ngrams) node:\n${plan.take(1500)}")
  }

  test("native dot product equals the HOF spelling bit-for-bit") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(100)
    val both = e.crossJoin(
        Tables.load(spark, sfDir, "embeddings").limit(5)
          .select(col("embedding").as("p")))
      .select(
        VectorOps.dot(col("p"), col("embedding")).as("native"),
        VectorOps.dotHof(col("p"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("dot_native stays inside whole-stage codegen") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val df = e.select(VectorOps.dot(col("embedding"), col("embedding")).as("d"))
    // "*(n)" prefixes mark WholeStageCodegen spans in toString form
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [dot_native"), s"expected codegen span: $p")
    assert(df.agg(min("d")).head().getDouble(0) > 0.0)
  }

  test("dot_native handles nulls and length mismatch") {
    val r = spark.sql(
      """SELECT dot_native(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>), CAST(array(3.0, 4.0, 5.0) AS ARRAY<DOUBLE>)) AS a,
        |       dot_native(CAST(NULL AS ARRAY<DOUBLE>), CAST(array(1.0) AS ARRAY<DOUBLE>)) AS b""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.isNullAt(1))
  }

  test("byte_values equals the hex-codec spelling on random payloads, " +
      "stays in codegen, nulls propagate") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val rows = (1 to 200).map { i =>
      val n = rnd.nextInt(300)
      (i.toLong, Array.fill[Byte](n)(rnd.nextInt(256).toByte))
    } :+ (999L, Array.emptyByteArray)
    val df = rows.toDF("id", "data")
    val cmp = df.select(
      expr("byte_values(data)").as("native"),
      expr("transform(regexp_extract_all(hex(data), '..', 0), h -> CAST(conv(h, 16, 10) AS BIGINT))").as("hex"))
    assert(cmp.filter(not(col("native") <=> col("hex"))).count() == 0,
      "native byte extraction must equal the hex codec exactly")
    // a file-backed scan, so the projection can't constant-fold away
    val p = Tables.load(spark, sfDir, "documents")
      .select(expr("byte_values(CAST(text AS BINARY))").as("bv"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [byte_values"), s"expected codegen: $p")
    val nullRow = spark.sql(
      "SELECT byte_values(CAST(NULL AS BINARY)) AS a").head()
    assert(nullRow.isNullAt(0))
  }

  test("md5_long SQL function equals the Column-side portable hash") {
    import spark.implicits._
    val docs = Seq("alpha", "beta", "", "γ unicode").toDF("s")
    docs.createOrReplaceTempView("md5long_probe")
    val viaSql = spark.sql(
      "SELECT s, md5_long(s) AS h FROM md5long_probe ORDER BY s").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCol = docs.select(col("s"),
      graft.operators.Hashing.md5Long(col("s")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
    // 60-bit: always non-negative, always < 2^60
    viaSql.values.foreach(h => assert(h >= 0 && h < (1L << 60)))
  }

  test("centroid aggregator matches per-dimension averages") {
    import spark.implicits._
    val data = Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0)), (1, Seq(10.0, 20.0)))
      .toDF("label", "emb")
    val c = udaf(CentroidAgg)
    val got = data.groupBy("label").agg(c(col("emb")).as("c"))
      .orderBy("label").collect()
    assert(got(0).getSeq[Double](1) == Seq(2.0, 3.0))
    assert(got(1).getSeq[Double](1) == Seq(10.0, 20.0))
  }

  test("centroid aggregator merges across partitions") {
    import spark.implicits._
    val big = spark.range(1000)
      .select((col("id") % 4).cast("int").as("label"),
        array(col("id").cast("double"), lit(1.0)).as("emb"))
      .repartition(8)
      .as[(Int, Seq[Double])].toDF("label", "emb")
    val c = udaf(CentroidAgg)
    val got = big.groupBy("label").agg(c(col("emb")).as("c")).orderBy("label").collect()
    // label 0 holds ids 0,4,...,996: mean = 498
    assert(math.abs(got(0).getSeq[Double](1).head - 498.0) < 1e-9)
    assert(got(0).getSeq[Double](1)(1) == 1.0)
  }

  test("optimizer rule rewrites the HOF dot-product spelling to dot_native") {
    // parquet-backed input: a LocalRelation would be constant-folded away
    // before the user-provided optimizer batch ever saw the pattern
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
    val hof = e.select(col("vec_id"), expr(
      "aggregate(zip_with(a, a, (x, y) -> x * y), 0D, (acc, v) -> acc + v)").as("d"))
    // the rule must fire: the optimized plan carries the native expression
    assert(hof.queryExecution.optimizedPlan.toString.contains("dot_native"),
      s"rule did not fire:\n${hof.queryExecution.optimizedPlan}")
    // and the rewrite is value-identical to the declared HOF semantics:
    // compare against the same HOF with the rewrite suppressed via a
    // non-matching (subtract-then-negate) spelling of the same math
    val viaNative = hof.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaHof = e.select(col("vec_id"), expr(
      "aggregate(zip_with(a, a, (x, y) -> -(x * -y)), 0D, (acc, v) -> acc + v)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaNative == viaHof)
  }

  test("optimizer rule leaves non-dot-product aggregates alone") {
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
    val sumOnly = e.select(expr(
      "aggregate(zip_with(a, a, (x, y) -> x + y), 0D, (acc, v) -> acc + v)").as("d"))
    assert(!sumOnly.queryExecution.optimizedPlan.toString.contains("dot_native"))
    assert(sumOnly.count() > 0)
  }

  test("nfc_normalize composes decomposed runs, is idempotent, " +
      "passes NFC input through, handles null, and stays in codegen") {
    import spark.implicits._
    val acc = "\u0301"  // combining acute
    val rows = Seq(
      ("plain ascii", "plain ascii"),
      ("cafe" + acc, "caf\u00e9"),             // e + mark -> composed e-acute
      ("e" + acc + "e" + acc, "\u00e9\u00e9"), // consecutive runs
      ("caf\u00e9", "caf\u00e9"),              // already NFC
      ("A" + "\u030a", "\u00c5"),              // A + ring -> A-ring
      ("", ""))
    val df = rows.map(_._1).toDF("s")
    val got = df.select(expr("nfc_normalize(s)")).collect().map(_.getString(0))
    assert(got.toSeq == rows.map(_._2))
    // idempotent: normalizing the output is a no-op
    val twice = df.select(expr("nfc_normalize(nfc_normalize(s))"))
      .collect().map(_.getString(0))
    assert(twice.toSeq == rows.map(_._2))
    // null in, null out
    val n = Seq[Option[String]](None).toDF("s")
      .select(expr("nfc_normalize(s)")).head()
    assert(n.isNullAt(0))
    // and the expression runs inside a whole-stage-codegen span
    // (file-backed scan — a LocalRelation constant-folds away first)
    val p = Tables.load(spark, sfDir, "documents")
      .select(expr("nfc_normalize(text)").as("n"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [nfc_normalize"), s"expected codegen: $p")
  }
}
