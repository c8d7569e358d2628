package graft

/** Scratch helper (not part of the driver contract): write
  * `.explain("formatted")` output for named registry queries to files —
  * the per-query before/after plan evidence the optimization rounds
  * commit under `plans/rNN/`.
  *
  * Usage: PlanDumpMain <sfDir> <outDir> <suffix> <query>[,<query>...]
  * → <outDir>/<query>_<suffix>.txt
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, names) = args.take(4)
    val spark = Engine.session("plandump",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      val txt =
        try SparkEntry.queries(n)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable =>
          s"PLAN-DUMP-ERROR: ${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
        }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      System.err.println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
