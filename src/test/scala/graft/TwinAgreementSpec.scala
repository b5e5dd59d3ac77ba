package graft

import org.apache.spark.sql.functions._

import graft.operators.{SimilarityOps, TextOps}

/** Rows-only queries (no DuckDB oracle by design — xxhash64 /
  * float-plane / deflate primitives the oracle engine lacks) must AGREE
  * with their hash-checked twins on overlap metrics, so "rows-only"
  * can never drift silently (VERDICT r5 #6). Covered here: the dedup
  * and compression rows plus ann_lsh_topk's explicit twin contract
  * against ann_q8_lsh_topk (VERDICT r7 #5); ann_ivf_topk additionally
  * carries ExprsSpec's recall pin against the hash-checked
  * cosine_topk. All inputs are deterministic (no RNG), so the measured
  * agreement is a constant of the fixture — bounds are pinned
  * comfortably below the measured values (recorded inline).
  */
class TwinAgreementSpec extends SparkSuite {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ann_lsh_topk (float planes) agrees with hash-checked ann_q8_lsh_topk") {
    // both are banded sign-projection LSH over the SAME store answering
    // the SAME cosine top-10 — the float-plane form is rows-only (a
    // seeded Gaussian plane has no DuckDB replay), the integer-lattice
    // q8 form is its hash-checked twin. Two contracts: (a) top-10 SETS
    // substantially agree (measured 0.49 pair-set Jaccard on the
    // fixture — different plane families admit different candidate
    // sets, agreement is on the shared survivors), and (b) BOTH track
    // the true cosine top-10 (recall ≥ 0.5 each, the ExprsSpec bound) —
    // together these pin the rows-only query to a hash-checked anchor
    // from two independent directions.
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val float = topSet(SimilarityOps.annLshTopk(spark, sf))
    val q8 = topSet(SimilarityOps.annQ8LshTopk(spark, sf))
    val exact = topSet(SimilarityOps.cosineTopk(spark, sf))
    assert(float.nonEmpty && q8.nonEmpty)
    val jacc = (float & q8).size.toDouble / (float | q8).size
    assert(jacc >= 0.4, s"ann_lsh_topk vs ann_q8_lsh_topk Jaccard = $jacc")
    assert((exact & float).size.toDouble / exact.size >= 0.5)
    assert((exact & q8).size.toDouble / exact.size >= 0.5)
  }

  test("minhash_dedup (xxhash) agrees with hash-checked minhash_dedup_poly") {
    // both estimate the SAME 3-shingle Jaccard with 16/32 permutations;
    // at the ≥0.5 estimate threshold the surviving pair sets must
    // substantially coincide (same underlying near-dup structure).
    val xx = pairSet(SimilarityOps.minhashDedup(spark, sf)
      .filter(col("est_jaccard_milli") >= 500))
    val poly = pairSet(SimilarityOps.minhashDedupPoly(spark, sf)
      .filter(col("est_jaccard_milli") >= 500))
    assert(xx.nonEmpty && poly.nonEmpty)
    val jacc = (xx & poly).size.toDouble / (xx | poly).size
    assert(jacc >= 0.6, s"pair-set Jaccard xx vs poly = $jacc")
  }

  test("events_value_pct_approx honors the sketch's RANK-error contract") {
    // the sketch's contract is rank error (≤ n/accuracy), not value
    // error — in a sparse value tail adjacent order statistics are far
    // apart, so a value-distance bound would be meaningless. Assert:
    // the approx value's empirical rank window covers the requested
    // percentile within ε (sketch ε = 10⁻⁴ + one-element discreteness).
    val exactRows = operators.EventOps.eventsValuePct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perGroup = sources.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = operators.EventOps.eventsValuePctApprox(spark, sf).collect()
    assert(approx.nonEmpty && approx.length == exactRows.size)
    approx.foreach { r =>
      val g = r.getString(0)
      assert(r.getLong(1) == exactRows(g), "group counts must be exact")
      val vs = perGroup(g)
      val n = vs.length.toDouble
      for ((p, i) <- Seq(0.5 -> 2, 0.95 -> 3, 0.99 -> 4)) {
        val a = r.getLong(i)
        val below = vs.count(_ < a) / n
        val atOrBelow = vs.count(_ <= a) / n
        val eps = 1e-4 + 1.0 / n + 1e-9
        assert(below <= p + eps && atOrBelow >= p - eps,
          s"$g p$p: approx $a has rank window [$below, $atOrBelow]")
      }
    }
  }

  test("simhash_dedup (xxhash64) agrees with hash-checked simhash_dedup_poly") {
    // the two variants hash differently (64-bit xxhash / Hamming ≤ 8 vs
    // 30-bit poly / Hamming ≤ 2) so their full pair sets are not
    // comparable; what they must AGREE on is the near-identical core.
    // Ground truth: same-source pairs the hash-checked poly-MinHash
    // twin estimates at Jaccard ≥ 0.9 — both simhash variants must
    // re-find most of them.
    val src = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = pairSet(SimilarityOps.minhashDedupPoly(spark, sf)
      .filter(col("est_jaccard_milli") >= 900))
      .filter { case (a, b) => src(a) == src(b) }
    assert(truth.nonEmpty, "fixture has no same-source est-J≥0.9 pairs")
    val xx = pairSet(SimilarityOps.simhashDedup(spark, sf))
    val poly = pairSet(SimilarityOps.simhashDedupPoly(spark, sf))
    val xxRecall = (xx & truth).size.toDouble / truth.size
    val polyRecall = (poly & truth).size.toDouble / truth.size
    info(s"n_truth=${truth.size} xxRecall=$xxRecall polyRecall=$polyRecall")
    assert(xxRecall >= 0.7, s"xxhash simhash recall of J≥0.9 pairs = $xxRecall")
    assert(polyRecall >= 0.7, s"poly simhash recall of J≥0.9 pairs = $polyRecall")
  }

  test("profile_orders_approx tracks the hash-checked exact profile within HLL++ rsd") {
    // identical single-scan shape, count_distinct swapped for
    // approx_count_distinct: everything EXCEPT the distinct estimate
    // must be bit-identical to the exact twin, and each per-column
    // estimate must land within HyperLogLog++'s published error
    // envelope (default rsd 0.05; 3σ = 15% relative error bound).
    val exact = operators.AggOps.profileOrders(spark, sf).collect()
      .map(r => r.getString(1) -> r).toMap
    val approx = operators.AggOps.profileOrdersApprox(spark, sf).collect()
    assert(approx.length == exact.size && approx.nonEmpty)
    approx.foreach { r =>
      val e = exact(r.getString(1))
      // exact columns: ord, n_rows, n_nulls, min_v, max_v
      for (i <- Seq(0, 2, 3, 5, 6))
        assert(r.get(i) == e.get(i),
          s"${r.getString(1)} col $i: approx ${r.get(i)} != exact ${e.get(i)}")
      val (est, act) = (r.getLong(4).toDouble, e.getLong(4).toDouble)
      val relErr = math.abs(est - act) / act
      assert(relErr <= 0.15,
        s"${r.getString(1)} n_distinct: approx $est vs exact $act " +
          f"(relative error $relErr%.4f > 0.15)")
    }
  }

  test("compression_ratio orders with the hash-checked repetition_ratio") {
    // deflate must see the redundancy the exact 3-token repeat counter
    // sees: the most-repetitive quartile's mean zratio is materially
    // below the least-repetitive quartile's.
    // most fixture docs have ZERO exact 3-token repeats (93%+), so
    // quartiles degenerate; the stable contrast is rep>0 vs rep==0
    // (measured: mean zratio ≈ 453 vs 562 at sf0.001 — ratio 0.81).
    val joined = TextOps.compressionRatio(spark, sf)
      .join(TextOps.repetitionRatio(spark, sf), "doc_id")
      .select(col("zratio_milli").cast("double").as("z"),
        col("repetition_milli").as("r"))
    val means = joined.agg(
      avg(when(col("r") === 0L, col("z"))).as("z_norep"),
      avg(when(col("r") > 0L, col("z"))).as("z_rep"),
      sum(when(col("r") > 0L, 1L).otherwise(0L)).as("n_rep")).head()
    val (zNoRep, zRep, nRep) =
      (means.getDouble(0), means.getDouble(1), means.getLong(2))
    assert(nRep > 0, "fixture has no repetitive docs")
    assert(zRep < zNoRep * 0.9,
      s"repetitive docs compress no better: rep=$zRep norep=$zNoRep")
  }
}
