package graft

import java.nio.file.{Files, Paths}

/** The 100×-probe plan audit as a REGRESSION GATE (round-12 judge item
  * 4): round 12 ran PlanAudit over the heavy lines AT the scale
  * fixtures once and recorded the result as BASELINE.md prose — this
  * suite re-asserts it on every green run, so a plan that flips shape
  * with scale (a broadcast that silently becomes a shuffle join, a new
  * corpus window, a scan budget blown by a rewrite) fails tests
  * instead of waiting for the next manual probe.
  *
  * Fixture policy: the replica corpora are BUILT artifacts
  * (ScaleProbe), not repo fixtures — when /tmp/sfx10 (or the hard-mode
  * /tmp/sfx10h) is absent the corresponding test CANCELS (assume)
  * rather than building multi-GB data inside the unit-test JVM. The
  * 100× dirs are audited only when GRAFT_SCALE_AUDIT_FULL=1 is also
  * set: executing the heavy lines at 50M docs on the 4-core test JVM
  * costs tens of minutes, which does not belong in the default suite;
  * the flag is for the pre-round probe pass (BenchHard/Bench100x
  * leave the fixtures in place, so `GRAFT_SCALE_AUDIT_FULL=1 sbt
  * "testOnly graft.ScaleAuditSpec"` right after is the intended use).
  */
class ScaleAuditSpec extends SparkSuite {

  /** The verdict's heavy lines: every query the 100× adjudications
    * name, i.e. where scale risk lives. */
  private val heavy = Seq(
    "ngram_jaccard", "minhash_dedup", "simhash_dedup", "simhash_dedup_wide",
    "embedding_dedup", "semantic_dedup_t95", "dedup_clusters_incremental",
    "fuzzy_clusters_incremental", "semantic_clusters_incremental",
    "semantic_clusters_incremental_wide", "semantic_dedup_wide")

  private def auditAll(dir: String): Unit =
    heavy.foreach { name =>
      val a = PlanAudit.auditQuery(spark, dir, name, SparkEntry.queries(name))
      assert(a.cartesian == 0, s"$name at $dir: ${a.cartesian} cartesians")
      assert(a.unpartWindows == 0,
        s"$name at $dir: ${a.unpartWindows} risky unpartitioned windows")
      assert(a.unadj == 0,
        s"$name at $dir: scan budget violated — ${a.flags.mkString(" ")}")
    }

  private def present(dir: String): Boolean =
    Files.exists(Paths.get(s"$dir/documents.parquet"))

  test("heavy-line plans hold their budgets at the 10x plain fixture") {
    assume(present("/tmp/sfx10"), "/tmp/sfx10 absent — run graft.Bench10x first")
    auditAll("/tmp/sfx10")
  }

  test("heavy-line plans hold their budgets at the 10x hard fixture") {
    assume(present("/tmp/sfx10h"), "/tmp/sfx10h absent — run graft.BenchHard first")
    auditAll("/tmp/sfx10h")
  }

  test("regime dispatcher picks prefix-df on the open-vocabulary hard fixture") {
    assume(present("/tmp/sfx10h"), "/tmp/sfx10h absent — run graft.BenchHard first")
    // The hard fixture is the open-vocabulary corpus shape the
    // dispatcher docs reference (vocabulary grows with the corpus:
    // CellProbe universe 272k → 2.72M at 10×h → 100×h, Σdf²/doc
    // scale-invariant at ~558, far under the 500k saturation cut) —
    // the dispatcher must route the HEALTHY prefix-df regime, not the
    // banded saturation path the closed-vocabulary plain fixture
    // needs at 100× (round-12 item 8's second-corpus check).
    // canonicalized STRING, not plan-object equality (the
    // SimhashDispatchSpec.canon idiom): the round-17 localCheckpoints
    // give each invocation fresh LogicalRDD leaves that differ by RDD
    // identity, not structure — object equality both fails spuriously
    // AND makes ScalaTest render two full plan trees into the failure
    // message (measured: OOM'd the 8g test JVM when this fixture-gated
    // leg first ran after the change).
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.canonicalized.toString
    val dispatched = canon(
      graft.operators.TextOps.ngramJaccard(spark, "/tmp/sfx10h"))
    val prefixDf = canon(
      graft.operators.TextOps.ngramJaccardPrefixDf(spark, "/tmp/sfx10h"))
    assert(dispatched == prefixDf,
      "expected the prefix-df regime on the open-vocab hard fixture")
  }

  test("heavy-line plans hold their budgets at the 100x fixtures (opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_AUDIT_FULL").contains("1"),
      "set GRAFT_SCALE_AUDIT_FULL=1 to audit the 100x fixtures")
    val dirs = Seq("/tmp/sfx100", "/tmp/sfx100h").filter(present)
    assume(dirs.nonEmpty, "no 100x fixture present — run Bench100x/BenchHard")
    dirs.foreach(auditAll)
  }
}
