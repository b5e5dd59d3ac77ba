package graft

/** Ad-hoc single-query timing probe — `runMain graft.QueryProbe
  * <sfDir> <query>[,query…]` times min-of-3 (after one untimed warm
  * pass) for just the named [[SparkEntry.queries]] entries, so a
  * round's targeted optimization (e.g. the round-16 native BPE encode
  * against BENCH_realcorpus10x's doc_pack_bpe line) can be measured
  * in seconds instead of re-running a whole 72-query headline.
  * Prints one JSON line per query; NOT a driver artifact — the
  * committed trend stays with [[Bench]] and its fixture mains. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe <sfDir> <q1>[,q2…]")
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explainOnly = sys.env.get("GRAFT_PROBE_EXPLAIN").contains("1")
    for (n <- names) {
      val q = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      if (explainOnly) {
        println(s"=== $n ===")
        println(q(spark, sfDir).queryExecution.executedPlan.toString)
      } else {
      q(spark, sfDir).queryExecution.executedPlan // analyze w/o run
      var best = Double.MaxValue
      var rows = -1L
      for (pass <- 0 until 4) {
        val t0 = System.nanoTime()
        rows = q(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (pass > 0 && dt < best) best = dt // pass 0 = warm-up
      }
      println(f"""{"query":"$n","min_sec":$best%.3f,"rows":$rows}""")
      }
    }
    spark.stop()
  }
}
