package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph-shaped resolution ops: turning the dedup family's PAIR output
  * into canonical clusters. Near-dup detectors (chunk/minhash/simhash)
  * emit edges; choosing one canonical doc per group needs connected
  * components — the step every production dedup pipeline runs after
  * candidate verification.
  */
object GraphOps {

  /** Connected components over the chunk-share graph via min-label
    * propagation, the distributed union-find analog.
    *
    * Scale design:
    *  - STAR edges, not cliques: every member of a duplicated-chunk
    *    group links to the group's min doc, so a chunk shared by k
    *    docs contributes k−1 edges (a clique would be k²/2 — the same
    *    quadratic blowup the dedup rewires eliminated).
    *  - Min-label propagation: comp ← min(comp, min over neighbors)
    *    each round; converges in O(graph diameter) rounds — star
    *    topology keeps the diameter small (hub hops). Each round is
    *    one shuffle join + one aggregation; intermediate labels are
    *    persisted and the convergence certificate (#changed labels)
    *    is the only driver-side scalar — the same loop shape as
    *    GraphX/Pregel, declared in DataFrames so AQE plans each round.
    *  - Rows-only correctness (an iterative fixpoint is not a single
    *    SQL statement); GraphOpsSpec proves equality with union-find.
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = chunkStarEdges(spark, sfDir).persist()
    val und = edges.union(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    var comp = edges.select(col("src").as("doc"))
      .union(edges.select(col("dst").as("doc")))
      .distinct()
      .withColumn("comp", col("doc"))
      .persist()
    var converged = false
    var iters = 0
    while (!converged && iters < 20) {
      val msgs = und.join(comp, und("src") === comp("doc"))
        .select(col("dst").as("doc"), col("comp"))
      val next = comp.union(msgs).groupBy("doc")
        .agg(min("comp").as("comp")).persist()
      val changed = next.join(comp.withColumnRenamed("comp", "prev"), Seq("doc"))
        .filter(col("comp") =!= col("prev")).count()
      comp.unpersist()
      comp = next
      converged = changed == 0
      iters += 1
    }
    val sizes = comp.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, Seq("comp"))
      .select(col("doc").as("doc_id"), col("comp").as("component"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Edge list: doc → min-doc-of-group for every chunk duplicated
    * across docs. Distinct per (doc, chunk) so within-doc repetition
    * adds no edges; group roots come from the same md5-keyed
    * aggregation as TextOps.chunkDedup. */
  private[graft] def chunkStarEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val ch = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.chunks10(col("text"))).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("fp"))
      .distinct()
    val roots = ch.groupBy("fp")
      .agg(min("doc_id").as("root"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
    ch.join(roots, Seq("fp"))
      .filter(col("doc_id") =!= col("root"))
      .select(col("root").as("src"), col("doc_id").as("dst"))
      .distinct()
  }
}
