package graft
import org.apache.spark.sql.SparkSession
object BenchHot {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(32)
      .master("local[32]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("task_stats")(spark, sfDir).count()
    val hot =
      if (args.nonEmpty) args.toSeq
      else Seq("simhash_dedup", "minhash_dedup", "ngram_jaccard",
        "round_robin_assign", "embedding_dedup", "hash_assign",
        "pipeline_curate", "curation_funnel", "ann_ivf_topk",
        "dedup_clusters")
    val unknown = hot.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    // interleaved passes (same contention-proofing as Bench): a burst
    // inflates one pass, not one query's whole window; a throwing query
    // records -1 instead of killing the other timings
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(q)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[hot] $q failed: ${e.getMessage}"); -1.0
      }
    }
    val passes = (1 to 3).map(_ => hot.map(once))
    hot.zipWithIndex.foreach { case (q, i) =>
      val runs = passes.map(_(i))
      val v = if (runs.exists(_ < 0)) -1.0 else runs.min
      println(f"HOT $q%-22s $v%.2f s")
    }
    spark.stop()
  }
}
