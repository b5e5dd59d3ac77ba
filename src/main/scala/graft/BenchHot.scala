package graft
import org.apache.spark.sql.SparkSession
object BenchHot {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
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
    // interleaved passes (same contention-proofing as Bench): a burst
    // inflates one pass, not one query's whole window
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val passes = (1 to 3).map(_ => hot.map(once))
    hot.zipWithIndex.foreach { case (q, i) =>
      println(f"HOT $q%-22s ${passes.map(_(i)).min}%.2f s")
    }
    spark.stop()
  }
}
