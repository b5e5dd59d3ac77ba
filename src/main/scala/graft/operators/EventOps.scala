package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.Exprs

/** Event-time analytics over the `events` fixture (SURVEY.md §2.9 —
  * watermark/window semantics the reference lacks; these are the batch
  * forms, the streaming forms run in graft.streaming with the same
  * expressions).
  *
  * Cross-engine rule: events.ts is nanosecond parquet; all emitted
  * timestamps are floor-epoch-second BIGINTs (see Oracles scaladoc).
  *
  * Scale: one shuffle per aggregation on (window, event_type) /
  * (user_id) — both high-cardinality, no hot keys; value sums are exact
  * integer cents.
  */
object EventOps {

  private def valueCents = round(col("value") * 100).cast("long")

  /** Tumbling 1-hour windows: count + exact value cents per
    * (window, event_type). */
  def eventsTumbling(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("sum_cents"))
      .select(Exprs.epochSec(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_cents"))
      .orderBy("window_start", "event_type")

  /** Sliding windows: 1 hour wide, 30-minute slide (each event lands in
    * exactly two windows). */
  def eventsSliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(Exprs.epochSec(col("w.start")).as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type")

  /** Session windows with a 30-minute inactivity gap per user.
    * session_end = last event + gap (Spark session semantics; the
    * oracle's gaps-and-islands reproduces it exactly, including the
    * split-at-exactly-gap boundary). */
  def eventsSession(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        Exprs.epochSec(col("w.start")).as("session_start"),
        Exprs.epochSec(col("w.end")).as("session_end"),
        col("n"))
      .orderBy("user_id", "session_start")

  /** Exact distinct users per event type (shuffled distinct-agg). */
  def eventUserStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** HLL approximate distinct users (rows-only: sketch results are
    * engine-specific; EventOpsSpec bounds the error vs the exact
    * count). The 100 TB form: one pass, no distinct shuffle. */
  def eventUserStatsApprox(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("n_users_approx"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Exact value percentiles (p50/p95/p99 of integer cents) per event
    * type. Exact `percentile` sorts each group — fine for a bounded
    * group count; the 100 TB unbounded-cardinality form swaps in
    * `approx_percentile` (t-digest sketch, one pass, mergeable — same
    * shape as eventUserStatsApprox). Both engines interpolate
    * lower+(upper−lower)·frac over identical integer inputs and round
    * half-away-from-zero, so the oracle compare is exact. */
  def eventsValuePct(spark: SparkSession, sfDir: String): DataFrame = {
    def pct(p: Double, name: String) =
      round(percentile(col("cents"), lit(p))).cast("long").as(name)
    Tables.events(spark, sfDir)
      .select(col("event_type"), valueCents.as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), pct(0.5, "p50_cents"),
        pct(0.95, "p95_cents"), pct(0.99, "p99_cents"))
      .orderBy("event_type")
  }

  /** The 100 TB form of [[eventsValuePct]] made first-class: per-type
    * p50/p95/p99 via `percentile_approx` (a one-pass mergeable
    * KLL-style sketch — no per-group sort, map-side partial merge)
    * instead of exact `percentile`'s group sort. Rows-only by design
    * (DuckDB's approx sketch is a different algorithm); pinned against
    * the hash-checked exact twin by TwinAgreementSpec's per-row error
    * bound. Accuracy 10⁴ ⇒ rank error ≤ n/10⁴ — at fixture scale the
    * sketch is exact or one neighbor off; at corpus scale it is the
    * only shape that doesn't sort every group. */
  def eventsValuePctApprox(spark: SparkSession, sfDir: String): DataFrame = {
    def apct(p: Double, name: String) =
      percentile_approx(col("cents"), lit(p), lit(10000))
        .cast("long").as(name)
    Tables.events(spark, sfDir)
      .select(col("event_type"), valueCents.as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), apct(0.5, "p50_cents"),
        apct(0.95, "p95_cents"), apct(0.99, "p99_cents"))
      .orderBy("event_type")
  }

  /** CDC last-writer-wins compaction: collapse each (user_id,
    * event_type) key to its latest version by sequence number
    * (event_id — monotonic arrival order; ns timestamps are not a
    * cross-engine sort key, see Oracles scaladoc). `max_by` compiles
    * to a single hash aggregation with map-side partial argmax — the
    * scalable upsert-compaction shape; a row_number window would sort
    * every group instead. */
  /** Calendar gap-fill — the time-series densification every monitoring
    * /feature pipeline needs: per-minute purchase counts with explicit
    * zero rows for silent minutes. The calendar spine is generated from
    * the aggregated bounds (sequence + explode), so its size is the
    * TIME RANGE, not the event volume — a dim at any corpus scale; the
    * events aggregate to per-minute counts BEFORE the join, so the
    * spine⋈counts join is dim-sized on both sides no matter how many
    * raw events exist. Minute = floor-epoch-seconds (ns-parquet-safe
    * cross-engine projection). */
  def eventsGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val minute = (floor(Exprs.epochSec(col("ts")) / 60) * 60).cast("long")
    val perMin = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(minute.as("minute"))
      .agg(count(lit(1)).as("n"))
    val cal = perMin.agg(min("minute").as("lo"), max("minute").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(60L))).as("minute"))
    cal.join(perMin, Seq("minute"), "left")
      .select(col("minute"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("minute")
  }

  def cdcLatest(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        valueCents.as("cents"), Exprs.epochSec(col("ts")).as("es"))
      .groupBy("user_id", "event_type")
      .agg(max("event_id").as("last_event_id"),
        max_by(col("cents"), col("event_id")).as("last_cents"),
        max_by(col("es"), col("event_id")).as("last_ts_sec"),
        count(lit(1)).as("n_versions"))
      .orderBy("user_id", "event_type")

  /** Tail-outlier detection: events whose value exceeds their type's
    * exact p99. The per-type threshold dim (bounded: one row per
    * event_type) is BROADCAST back against the fact scan — the
    * aggregate-then-broadcast-join shape that avoids a second wide
    * shuffle at 100 TB. Integer-cents compares are exact in both
    * engines (interpolated percentile parity per eventsValuePct). */
  def valueOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), valueCents.as("cents"))
    val thresholds = ev.groupBy("event_type")
      .agg(round(percentile(col("cents"), lit(0.99))).cast("long").as("p99_cents"))
    ev.join(broadcast(thresholds), Seq("event_type"))
      .filter(col("cents") > col("p99_cents"))
      .select("event_id", "event_type", "cents", "p99_cents")
      .orderBy("event_id")
  }

  /** AS-OF join: each purchase matched to the user's most recent PRIOR
    * click (strictly earlier by sequence number; ns timestamps are not
    * a cross-engine sort key). Implemented as the merge-scan form —
    * union both event roles, one user-partitioned window, last-non-null
    * carry-forward — which is THE scalable as-of shape: zero joins,
    * one shuffle on user_id, no per-row probe. (DuckDB's ASOF JOIN is
    * the same semantics; the oracle mirrors the window form so the
    * strict-inequality boundary is identical.) Missing matches emit
    * -1 (deterministic, null-free compare). */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        valueCents.as("cents"))
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
      .withColumn("click_cents",
        when(col("event_type") === "click", col("cents")))
      .withColumn("prev_click_id", last("click_id", ignoreNulls = true).over(w))
      .withColumn("prev_click_cents", last("click_cents", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        coalesce(col("prev_click_id"), lit(-1L)).as("prev_click_id"),
        coalesce(col("prev_click_cents"), lit(-1L)).as("prev_click_cents"))
      .orderBy("event_id")
  }

  /** Range (window) join, binned: for each purchase, how many OTHER
    * events of the same user fall within ±120 s. A naive inequality
    * join is a per-user cartesian (BroadcastNestedLoop at best); the
    * scalable form BINS time into width-120 buckets, explodes the
    * probe side into its 3 adjacent buckets, equi-joins on
    * (user_id, bin) — a plain shuffle join — and refines with the
    * exact |Δ| ≤ 120 predicate. Every qualifying pair shares exactly
    * one bin with the probe row, so no dedup is needed; candidate
    * blowup is bounded by bin width, independent of corpus size.
    * Left join keeps zero-neighbor purchases (count ignores nulls). */
  def rangeJoinBinned(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Exprs.epochSec(col("ts")).as("es"))
    val probe = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("p_id"),
        col("es").as("p_es"))
      .withColumn("bin", explode(array(
        floor(col("p_es") / 120) - 1, floor(col("p_es") / 120),
        floor(col("p_es") / 120) + 1)))
    val build = ev.select(col("user_id").as("b_uid"),
        col("event_id").as("b_id"), col("es").as("b_es"))
      .withColumn("bin", floor(col("b_es") / 120))
    probe.join(build,
        probe("p_uid") === build("b_uid") && probe("bin") === build("bin") &&
          abs(col("b_es") - col("p_es")) <= 120 && col("b_id") =!= col("p_id"),
        "left")
      .groupBy(col("p_id").as("event_id"))
      .agg(count(col("b_id")).as("n_nearby"))
      .orderBy("event_id")
  }

  /** JSON prop extraction (events.props is a JSON string): per-type
    * stats over get_json_object-extracted values. */
  def eventsPropsJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("k").as("min_k"),
        max("k").as("max_k"), sum("k").as("sum_k"))
      .orderBy("event_type")
}
