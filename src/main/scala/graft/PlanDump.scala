package graft

import java.nio.file.{Files, Paths}

/** Round-17 measurement tool (guide §1.1/§7.2): write each named
  * query's `.explain("formatted")` output to `<outDir>/<query>_<tag>.txt`
  * so plan claims in OPTIMIZATION_r17.md are checkable against committed
  * files. Diagnostic only — not part of the driver contract.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> [q1,q2,…]
  * (no query list = the Bench headline set).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <tag> [q1,…]")
    val Array(sfDir, outDir, tag) = args.take(3)
    val names =
      if (args.length > 3) args(3).split(',').toSeq else Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // Same reason Bench warms up: first calls of the stored-index /
    // trained-artifact queries run the offline build; the plan of
    // record is the online (post-build) one.
    Bench.warmUp(spark, sfDir, "plandump")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      val txt =
        try fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
    }
    spark.stop()
  }
}
