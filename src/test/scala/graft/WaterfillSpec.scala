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
}
