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
    for (q <- Seq("simhash_dedup", "minhash_dedup", "ngram_jaccard", "round_robin_assign", "embedding_dedup", "hash_assign", "pipeline_curate", "curation_funnel", "ann_ivf_topk")) {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"HOT $q%-22s ${math.min(once(), once())}%.2f s")
    }
    spark.stop()
  }
}
