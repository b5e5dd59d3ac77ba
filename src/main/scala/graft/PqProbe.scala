package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic (like CcProbe/BucketProbe): decompose IVF-PQ recall loss
  * into its two stages — band PRUNING loss (lattice candidates, exact
  * re-rank = ann_q8_lsh_topk) vs ADC QUANTIZATION loss (PQ scoring).
  * recall@10 measured against the exact q8 top-k.
  *
  * Usage: runMain graft.PqProbe [sfDir]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder(8).master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(operators.SimilarityOps.annQ8Topk(spark, sfDir))
    val lsh = topSet(operators.SimilarityOps.annQ8LshTopk(spark, sfDir))
    val pq = topSet(operators.SimilarityOps.annIvfPqTopk(spark, sfDir))
    def r(s: Set[(Long, Long)]): Double =
      (exact intersect s).size.toDouble / exact.size
    println(f"PQPROBE exact=${exact.size} lshRecall=${r(lsh)}%.3f pqRecall=${r(pq)}%.3f pqVsLsh=${(lsh intersect pq).size.toDouble / lsh.size}%.3f")
    // History (sf0.001, recorded): seed-only codebook + raw ADC top-10
    // gave pqRecall 0.28 with ~18% mean ADC relative error on this
    // synthetic (high-entropy — PQ's worst case) store; one unrolled
    // Lloyd round + exact refine of the ADC top-64 reached 0.68
    // against the 0.74 pruning ceiling (pqVsLsh 0.92).
    // stage timing: fused (store-side band+encode in-plan) vs stored-
    // index probe (bands+codes read from parquet)
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PQPROBE $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    val idxDir = java.nio.file.Files.createTempDirectory("graft-pqp").toString
    t("indexBuild") { operators.SimilarityOps.buildIvfPqIndex(spark, sfDir, idxDir); 0L }
    t("fused") { operators.SimilarityOps.annIvfPqTopk(spark, sfDir).count() }
    t("fused2") { operators.SimilarityOps.annIvfPqTopk(spark, sfDir).count() }
    t("probe") { operators.SimilarityOps.annIvfPqProbe(spark, sfDir, idxDir).count() }
    t("probe2") { operators.SimilarityOps.annIvfPqProbe(spark, sfDir, idxDir).count() }
    spark.stop()
  }
}
