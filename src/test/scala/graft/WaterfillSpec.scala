package graft

/** The closed-form water-filling allocation must equal the DEFINING
  * iterative procedure — raise a common integer cap θ while the total
  * min(n_s, θ) stays within budget — on the fixture and on engineered
  * distributions (uniform, one giant, all-equal, single source).
  */
class WaterfillSpec extends SparkSuite {

  /** Defining reference: largest integer θ with Σ min(n_s, θ) ≤ B
    * (binary search — the semantics, independent of the closed form). */
  private def referenceAlloc(ns: Seq[Long], budget: Long): Seq[Long] = {
    def spent(theta: Long): Long = ns.map(math.min(_, theta)).sum
    if (spent(ns.max) <= budget) ns // nothing caps
    else {
      var (lo, hi) = (0L, ns.max)
      while (lo < hi) { // invariant: spent(lo) ≤ B < spent(hi+1)
        val mid = (lo + hi + 1) / 2
        if (spent(mid) <= budget) lo = mid else hi = mid - 1
      }
      ns.map(math.min(_, lo))
    }
  }

  test("fixture allocation equals the iterative definition") {
    val rows = operators.RetrievalOps.tokenBudgetWaterfill(spark, sf)
      .collect()
    val ns = rows.map(_.getLong(1)).toSeq
    val budget = ns.sum / 2
    val expect = referenceAlloc(ns, budget)
    // rows are source-ordered; reference preserves input order
    rows.map(_.getLong(2)).toSeq.zip(expect).zipWithIndex.foreach {
      case ((got, ref), i) =>
        assert(got == ref, s"row $i: alloc $got vs reference $ref")
    }
    val allocSum = rows.map(_.getLong(2)).sum
    assert(allocSum <= budget &&
      budget - allocSum < rows.count(_.getBoolean(3)).max(1),
      "unspent remainder must be smaller than the capped-source count")
  }

  test("closed form matches the definition on engineered distributions") {
    for ((ns, b) <- Seq(
      (Seq(5L, 6L), 8L),
      (Seq(2L, 10L), 8L),
      (Seq(3L, 4L, 10L), 9L),
      (Seq(7L, 7L, 7L), 10L),
      (Seq(100L), 30L),
      (Seq(1L, 1L, 1L, 97L), 50L))) {
      // closed form replayed driver-side (sorted prefix, first undercut)
      val sorted = ns.sorted
      val s = sorted.length
      val undercut = sorted.zipWithIndex.flatMap { case (n, i) =>
        val below = sorted.take(i).sum
        val fair = (b - below) / (s - i)
        if (fair < n) Some(fair) else None
      }
      val theta = undercut.headOption
      val closed = ns.map(n => theta.fold(n)(t => math.min(n, t)))
      assert(closed == referenceAlloc(ns, b), s"ns=$ns b=$b")
    }
  }

  test("mix_sample realizes the waterfill plan") {
    import org.apache.spark.sql.functions._
    val plan = operators.RetrievalOps.tokenBudgetWaterfill(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val kept = operators.RetrievalOps.mixSample(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("realized"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val perSourceDocs = graft.sources.Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plan.nonEmpty && kept.nonEmpty)
    plan.foreach { case (src, (nTokens, alloc, capped)) =>
      if (!capped) {
        // rate 1 ⟹ EXACT: u·n < n·2¹⁶ always — every doc survives
        assert(kept.get(src).map(_._1).contains(perSourceDocs(src)),
          s"uncapped $src must keep all docs")
        assert(kept(src)._2 == nTokens)
      }
    }
    // per-source realized values at fixture scale (2-3 docs/source)
    // carry huge sampling variance; the LAW-OF-LARGE-NUMBERS contracts
    // are aggregate: capped sources collectively track their allocs,
    // and somewhere at least one doc was actually dropped
    val capped = plan.filter(_._2._3)
    assert(capped.nonEmpty, "fixture plan caps no source — budget too big")
    val cappedAlloc = capped.values.map(_._2).sum
    val cappedRealized = capped.keys
      .map(s => kept.get(s).map(_._2).getOrElse(0L)).sum
    assert(math.abs(cappedRealized - cappedAlloc).toDouble / cappedAlloc <= 0.25,
      s"capped realized $cappedRealized vs alloc $cappedAlloc")
    val totalDocs = perSourceDocs.values.sum
    val keptDocs = kept.values.map(_._1).sum
    assert(keptDocs < totalDocs, "sampling dropped nothing")
    val budget = plan.values.map(_._2).sum // Σ alloc ≤ B by construction
    val totalRealized = kept.values.map(_._2).sum
    assert(math.abs(totalRealized - budget).toDouble / budget <= 0.2,
      s"total realized $totalRealized vs planned $budget")
  }
}
