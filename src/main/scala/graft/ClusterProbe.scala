package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, SimilarityOps}
import graft.sources.Tables

/** Stage-timing probe for the incremental cluster-maintenance path
  * (the `fuzzy_clusters_incremental` headline) — the CcProbe/PqProbe
  * convention: measure, don't guess, before optimizing. Times each
  * stage of the probe plan in isolation (forced with a count) so the
  * dominant cost is attributable: batch signing, index probe join,
  * batch self-join, the label-contraction fixpoint, and the final
  * relabel + verdict.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ClusterProbe
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val idx = java.nio.file.Files.createTempDirectory("graft-clusterprobe").toString
    GraphOps.buildClusterIndex(spark, sfDir, idx)

    def time[T](tag: String)(f: => T): T = {
      // min of 2 — first run may include scan warm-up
      val t1 = System.nanoTime(); f; val a = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime(); val r = f; val b = (System.nanoTime() - t2) / 1e9
      println(f"[clusterprobe] $tag%-28s ${math.min(a, b)}%6.2f s")
      r
    }

    val stored = spark.read.parquet(s"$idx/fuzzy_clusters")
      .select(col("doc"), col("comp"))
    val existB = spark.read.parquet(s"$idx/fuzzy_bands")
      .select(col("doc_id"), col("sig"), col("band"), col("bucket"))

    time("batch signing+banding")(
      SimilarityOps.batchBanded(spark, sfDir).count())
    val newB = SimilarityOps.batchBanded(spark, sfDir)
    // the production chain's stages (round-15: raw sharded edges, no
    // pair distinct — the merge's spanning-forest sparsifier owns
    // dedup), plus the pre-round-15 forms side by side so both the
    // sharding's and the sparsifier's effects stay measured
    time("cross probe join (raw)")(
      SimilarityOps.minhashPolyPairsRoleEdges(newB, existB,
        within = false).count())
    time("inner batch join (raw)")(
      SimilarityOps.minhashPolyPairsRoleEdges(newB, newB,
        within = true).count())
    time("cross probe +distinct")(
      SimilarityOps.minhashPolyPairsRole(newB, existB, within = false).count())
    time("cross probe UNSHARDED")(
      SimilarityOps.minhashPolyPairsRoleUnsharded(newB, existB,
        within = false).count())
    val cross = SimilarityOps.minhashPolyPairsRoleEdges(newB, existB,
      within = false)
    val inner = SimilarityOps.minhashPolyPairsRoleEdges(newB, newB,
      within = true)
    val edges = cross.union(inner)
    val nEdges = time("edges (raw union)")(edges.count())
    val nForest = time("sparsifyForest")(
      GraphOps.sparsifyForest(edges).count())
    println(s"[clusterprobe] |raw edges| = $nEdges, |forest| = $nForest, " +
      s"|stored| = ${stored.count()}")
    time("componentsIncremental")(
      GraphOps.componentsIncremental(stored, edges).count())
    time("full query")(
      GraphOps.fuzzyClustersIncrementalProbe(spark, sfDir, idx).count())
    spark.stop()
  }
}
