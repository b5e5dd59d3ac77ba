package graft

import java.nio.file.{Files, Paths}

import graft.operators.SimilarityOps

/** The narrow/wide simhash dispatcher (round-13 verdict item 5): one
  * operator that picks the signature width from the measured
  * (source, band, chunk) bucket profile — narrow 30-bit/radius-2 while
  * the fixed key space still spreads candidates, wide
  * 126-bit/radius-8 once Σc²/doc says it has saturated. Dispatch is
  * pinned by CANONICAL-PLAN EQUALITY (the ngram regime-dispatcher
  * convention, ScaleAuditSpec): measured profiles are sf0.001/sf0.01/
  * sf0.1 well under the 200 cut, both 10× scale fixtures above it
  * (plain 1,174/doc — occupied buckets frozen at 2,827 while docs ×10;
  * hard 282/doc), so the sf fixtures must route narrow and the scale
  * fixtures wide. The scale-fixture tests cancel when the built
  * ScaleProbe dirs are absent (the ScaleAuditSpec fixture policy).
  */
class SimhashDispatchSpec extends SparkSuite {

  // canonicalized STRING — tolerates the round-17 localCheckpoint's
  // per-invocation LogicalRDD leaves while pinning the full tree
  // (see SemanticDispatchSpec.canon).
  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.canonicalized.toString

  test("healthy profile routes the narrow poly form (sf fixture)") {
    val stats = SimilarityOps.simhashBucketStats(spark, sf).head()
    val perDoc = stats.getLong(stats.fieldIndex("work_per_doc"))
    assert(perDoc < SimilarityOps.SimhashSaturationCutPerDoc,
      s"spec premise broken: sf fixture measured $perDoc/doc")
    assert(canon(SimilarityOps.simhashDedupAuto(spark, sf)) ==
      canon(SimilarityOps.simhashDedupPoly(spark, sf)),
      "expected the narrow poly form on the healthy sf fixture")
  }

  for ((dir, label) <- Seq("/tmp/sfx10" -> "plain", "/tmp/sfx10h" -> "hard"))
    test(s"saturated profile routes the wide form ($label 10x fixture)") {
      assume(Files.exists(Paths.get(s"$dir/documents.parquet")),
        s"$dir absent — run graft.Bench10x/BenchHard first")
      val stats = SimilarityOps.simhashBucketStats(spark, dir).head()
      val perDoc = stats.getLong(stats.fieldIndex("work_per_doc"))
      assert(perDoc >= SimilarityOps.SimhashSaturationCutPerDoc,
        s"spec premise broken: $label 10x measured $perDoc/doc")
      assert(canon(SimilarityOps.simhashDedupAuto(spark, dir)) ==
        canon(SimilarityOps.simhashDedupWide(spark, dir)),
        s"expected the wide form on the saturated $label fixture")
    }

  test("bucket stats row is internally consistent") {
    val r = SimilarityOps.simhashBucketStats(spark, sf).head()
    val (docs, buckets, maxB, sumSq, perDoc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(docs > 0 && buckets > 0)
    assert(maxB <= docs)
    // Σc² bounds: ≥ rows (all singletons) and ≤ rows·max
    assert(sumSq >= 3 * docs && sumSq <= 3 * docs * maxB)
    assert(perDoc == sumSq / docs)
  }

  test("engineered saturated store routes WIDE on the sf fixture (oracle-fired branch)") {
    // round-15 verdict item 4: the dispatchers' wide branch had never
    // fired where a DuckDB oracle runs — every driver-verified store
    // measures narrow. The satSimhashDir store (one source ×128)
    // crosses the cut at sf sizes, so simhash_dedup_auto_sat's
    // CORRECTNESS row exercises the wide branch hash-for-hash; this
    // pins that the dispatch there IS the wide plan, and that the
    // replication arithmetic measured what it was engineered to.
    val satDir = graft.operators.SimilarityOps.satSimhashDir(spark, sf)
    val stats = graft.operators.SimilarityOps
      .simhashBucketStats(spark, satDir).head()
    val perDoc = stats.getLong(stats.fieldIndex("work_per_doc"))
    assert(perDoc >= graft.operators.SimilarityOps.SimhashSaturationCutPerDoc,
      s"engineered store measured only $perDoc/doc — below the cut")
    assert(graft.operators.SimilarityOps.simhashSaturated(spark, satDir))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.canonicalized.toString
    assert(canon(SimilarityOps.simhashDedupAuto(spark, satDir)) ==
      canon(SimilarityOps.simhashDedupWide(spark, satDir)),
      "saturated store must dispatch the wide lattice")
    // and the public rollup is non-trivial: replica pairs land at
    // hamming 0, so the mass there is at least 25·C(128,2)
    val rows = SimilarityOps.simhashDedupAutoSat(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.getOrElse(0, 0L) >= 25L * 128 * 127 / 2,
      s"hamming-0 mass too small: $rows")
  }
}
