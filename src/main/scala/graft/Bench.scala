package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus.toInt)
      .master(s"local[$cpus]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen/parquet-footer costs land here, not on
    // whichever query happens to run first.
    SparkEntry.queries.get("task_stats").foreach(fn => fn(spark, sfDir).count())
    SparkEntry.queries.get("events_tumbling").foreach(fn => fn(spark, sfDir).count())
    // 3 runs per query: "queries" reports the min (the host shows bursty
    // external CPU contention — identical queries vary 0.1s..30s; the min
    // is the steady-state capability), "p50" the median, so a regression
    // is attributable (plan change moves both; contention moves only p50).
    // A query that throws is recorded as -1 (sentinel) and listed in
    // "failed" — a crash must never masquerade as a fast run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      val runs = Seq(once(), once(), once())
      if (runs.exists(_ < 0)) (name, -1.0, -1.0)
      else (name, runs.min, runs.sorted.apply(1))
    }
    def jmap(sel: ((String, Double, Double)) => Double): String =
      results.map { case r @ (k, _, _) => s"\"" + k + "\":" + sel(r) }
        .mkString("{", ",", "}")
    val failed = results.collect { case (k, v, _) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_._2)},"p50":${jmap(_._3)},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
