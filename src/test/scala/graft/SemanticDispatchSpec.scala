package graft

import java.nio.file.{Files, Paths}

import graft.operators.SimilarityOps

/** The narrow/wide SEMANTIC dispatcher (round-14, completing the
  * simhash-family symmetry): one operator that picks the cell space
  * from the measured 256-cell population profile — narrow while
  * per-cell candidate blocks stay small, the wide 4×16-bit lattice
  * once Σc²/vec says within-cell enumeration has gone quadratic.
  * Dispatch is pinned by CANONICAL-PLAN EQUALITY (the
  * SimhashDispatchSpec convention). Measured profiles: sf0.01 46/vec,
  * sf0.1 142/vec, hard-10× 1,494/vec — all under the 5,000 cut (the
  * hard-10× wall measurement has the narrow incremental verdict still
  * BEATING the wide twin there, 2.09 s vs 2.62 s) — and hard-100×
  * 15,312/vec, far above it (narrow 19.0 s vs wide 7.74 s); the
  * scale-fixture tests cancel when the built ScaleProbe dirs are
  * absent (the ScaleAuditSpec policy). */
class SemanticDispatchSpec extends SparkSuite {

  // canonicalized STRING: the round-17 self-join optimization
  // materializes the signature pass with localCheckpoint, so two
  // invocations carry distinct (but structurally identical) LogicalRDD
  // leaves — object equality would report a false dispatch mismatch;
  // the tree string prints LogicalRDD without its rdd identity while
  // still pinning every operator, join condition and projection.
  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.canonicalized.toString

  test("healthy profile routes the narrow cell form (sf fixture)") {
    val stats = SimilarityOps.q8CellStats(spark, sf).head()
    val perVec = stats.getLong(stats.fieldIndex("work_per_vec"))
    assert(perVec < SimilarityOps.SemanticSaturationCutPerVec,
      s"spec premise broken: sf fixture measured $perVec/vec")
    assert(canon(SimilarityOps.semanticDedupAuto(spark, sf)) ==
      canon(SimilarityOps.semanticDedupNarrowCommon(spark, sf)),
      "expected the narrow cell form on the healthy sf fixture")
    // the dispatch decision may change the plan, never the schema:
    // both branches project the common (a_id, b_id, dot, cos2_e6)
    assert(SimilarityOps.semanticDedupAuto(spark, sf).columns.toSeq ==
      SimilarityOps.semanticDedupWide(spark, sf).columns.toSeq,
      "auto's narrow branch schema differs from the wide branch")
  }

  test("hard 10x still routes narrow (measured: narrow wins wall there)") {
    val dir = "/tmp/sfx10h"
    assume(Files.exists(Paths.get(s"$dir/embeddings.parquet")),
      s"$dir absent — run graft.BenchHard first")
    val stats = SimilarityOps.q8CellStats(spark, dir).head()
    val perVec = stats.getLong(stats.fieldIndex("work_per_vec"))
    assert(perVec < SimilarityOps.SemanticSaturationCutPerVec,
      s"spec premise broken: hard 10x measured $perVec/vec")
    assert(canon(SimilarityOps.semanticDedupAuto(spark, dir)) ==
      canon(SimilarityOps.semanticDedupNarrowCommon(spark, dir)),
      "expected the narrow cell form at hard 10x")
  }

  test("saturated profile routes the wide lattice (hard 100x fixture)") {
    val dir = "/tmp/sfx100h"
    assume(Files.exists(Paths.get(s"$dir/embeddings.parquet")),
      s"$dir absent — run graft.BenchHard first")
    val stats = SimilarityOps.q8CellStats(spark, dir).head()
    val perVec = stats.getLong(stats.fieldIndex("work_per_vec"))
    assert(perVec >= SimilarityOps.SemanticSaturationCutPerVec,
      s"spec premise broken: hard 100x measured $perVec/vec")
    assert(canon(SimilarityOps.semanticDedupAuto(spark, dir)) ==
      canon(SimilarityOps.semanticDedupWide(spark, dir)),
      "expected the wide lattice at hard 100x")
  }

  test("incremental dispatch follows the same verdict (sf narrow, 100x wide)") {
    // One detector, both surfaces: the nightly merge must sign with
    // the same cell space as the pair reporting (a store that probes a
    // narrow index while reporting wide pairs would miss merges).
    // Canonical-plan equality cannot pin THIS pair — the incremental
    // chain's fixpoint localCheckpoints intermediates, so every
    // constructed plan embeds fresh RDD-backed relations. Pin the
    // shared saturation VERDICT at both ends instead, plus row-for-row
    // parity of the dispatched vs narrow result at the sf fixture
    // (the branch the verdict selects there).
    assert(!SimilarityOps.semanticSaturated(spark, sf),
      "spec premise broken: sf fixture measured saturated")
    val auto = graft.operators.GraphOps
      .semanticClustersIncrementalAuto(spark, sf).collect().toSeq
    val narrow = graft.operators.GraphOps
      .semanticClustersIncremental(spark, sf).collect().toSeq
    assert(auto == narrow, "dispatched result differs from the narrow chain")
    val dir = "/tmp/sfx100h"
    if (Files.exists(Paths.get(s"$dir/embeddings.parquet")))
      assert(SimilarityOps.semanticSaturated(spark, dir),
        "spec premise broken: hard 100x measured unsaturated")
  }

  test("engineered saturated store routes WIDE on the sf fixture (oracle-fired branch)") {
    // round-15 verdict item 1: the semantic dispatcher's wide branch
    // had never fired where a DuckDB oracle runs — every
    // driver-verified store measures narrow. satSemanticDir grows the
    // hottest narrow cell to semSatTarget(N) occupants (round-17:
    // store-derived, so the engineered saturation clears the cut at
    // ANY base size, not just small fixtures), so
    // semantic_dedup_auto_sat's CORRECTNESS row exercises the wide
    // branch hash-for-hash; this pins that the dispatch there IS the
    // wide plan and that the replication measured what it was
    // engineered to (the simhashDedupAutoSat premise convention).
    val satDir = SimilarityOps.satSemanticDir(spark, sf)
    val stats = SimilarityOps.q8CellStats(spark, satDir).head()
    val perVec = stats.getLong(stats.fieldIndex("work_per_vec"))
    assert(perVec >= SimilarityOps.SemanticSaturationCutPerVec,
      s"engineered store measured only $perVec/vec — below the cut")
    assert(SimilarityOps.semanticSaturated(spark, satDir))
    assert(canon(SimilarityOps.semanticDedupAuto(spark, satDir)) ==
      canon(SimilarityOps.semanticDedupWide(spark, satDir)),
      "saturated store must dispatch the wide lattice")
    // and the public rollup carries the engineered mass: the
    // replicated member groups land identical pairs at cos2 = 10^6
    // (bucket 10), at least Σ_members C(reps, 2) of them
    val rows = SimilarityOps.semanticDedupAutoSat(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nBase = graft.sources.Tables.cachedCount(spark, sf, "embeddings")
    assert(rows.getOrElse(10L, 0L) >=
      SimilarityOps.semSatTarget(nBase) / 2,
      s"cos2-bucket-10 within-group mass too small: $rows")
  }

  test("cell stats row is internally consistent") {
    val r = SimilarityOps.q8CellStats(spark, sf).head()
    val (vecs, cells, maxC, sumSq, perVec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(vecs > 0 && cells > 0 && cells <= 256,
      s"narrow cell universe is 8-bit: got $cells cells")
    assert(maxC <= vecs)
    // Σc² bounds: ≥ rows (all singletons) and ≤ rows·max
    assert(sumSq >= vecs && sumSq <= vecs * maxC)
    assert(perVec == sumSq / vecs)
  }
}
