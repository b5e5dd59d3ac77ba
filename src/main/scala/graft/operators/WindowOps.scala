package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.Exprs

/** Window-function operators (SURVEY.md §2.7). The reference's
  * argmin/top-k dispatch patterns (/root/reference/tasks/dispatcher.go:612-633,
  * 401-408) carried into ranking, analytic and frame-spec windows.
  *
  * Scale: each window shuffles once on its partition key (worker_id /
  * user_id). Keys are bounded (workers) or high-cardinality (users) —
  * no single-partition global windows anywhere.
  */
object WindowOps {

  /** O4: per-worker top-k pending work — row_number over (worker,
    * priority desc) (dispatcher grabs ≤10 per freed worker). */
  def topkPerWorker(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("worker_id").orderBy(desc("priority"), asc("id"))
    Tables.assignedTasks(spark, sfDir)
      .filter(col("worker_id").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("worker_id", "id", "priority", "rn")
      .orderBy("worker_id", "rn")
  }

  /** Frame-spec aggregation: running in-flight count per worker in
    * create_time order (the batch view of the A2 running counter). */
  def runningLoad(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("worker_id")
      .orderBy(asc("create_time"), asc("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.assignedTasks(spark, sfDir)
      .filter(col("status") === Tables.Processing)
      .withColumn("running_cnt", count(lit(1)).over(w))
      .select("worker_id", "id", "create_time", "running_cnt")
      .orderBy("worker_id", "create_time", "id")
  }

  /** Analytic lag over the task-event history (events fixture): previous
    * event type + gap seconds per user. Event timestamps exit only as
    * floor-epoch-seconds (ns-parquet cross-engine rule, Exprs.epochSec). */
  def taskEventLag(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_sec",
        Exprs.epochSec(col("ts")) - Exprs.epochSec(lag(col("ts"), 1).over(w)))
      .select("user_id", "event_id", "event_type", "prev_type", "gap_sec")
      .orderBy("user_id", "event_id")
  }

  /** Analytic lead + frame-spec first/last: next event type and the
    * session's first/last event per user (rounds out the window-function
    * family with lead/first_value/last_value). */
  def taskEventLead(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, sfDir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("first_type", first(col("event_type")).over(frame))
      .withColumn("last_type", last(col("event_type")).over(frame))
      .select("user_id", "event_id", "event_type", "next_type",
        "first_type", "last_type")
      .orderBy("user_id", "event_id")
  }

  /** Ranking family: rank + dense_rank of workers by load (the
    * least-loaded strategy generalized to a full ranking).
    *
    * Computed WITHOUT a global window: rank = 1 + |workers with lower
    * load| and dense_rank = 1 + |distinct lower loads| via a dim
    * self-join aggregation — |workers|² pairs is trivial for a dim
    * table at any SF, and the plan has no single-reducer WindowExec
    * (the same pattern as AggOps.workerIndex). */
  def workerRank(spark: SparkSession, sfDir: String): DataFrame = {
    val wk = Tables.workers(spark, sfDir).select("worker_id", "task_count")
    wk.alias("x")
      .join(wk.alias("y"), col("y.task_count") < col("x.task_count"), "left")
      .groupBy(col("x.worker_id").as("worker_id"),
        col("x.task_count").as("task_count"))
      .agg((count(col("y.worker_id")) + 1).cast("int").as("load_rank"),
        (count_distinct(col("y.task_count")) + 1).cast("int").as("load_dense_rank"))
      .orderBy("worker_id")
  }

  /** Distribution windows — ntile(4), percent_rank, cume_dist over the
    * worker-load order — WITHOUT a global window (PlanAudit: zero
    * unpartitioned WindowExec). Position rn comes from the same
    * bounded dim self-join as [[workerRank]] (the order
    * (task_count, worker_id) is total, so row_number = rank); n from a
    * broadcast 1-row count; ntile/percent_rank/cume_dist are then pure
    * integer arithmetic replays of the SQL definitions, which the
    * oracle cross-checks against DuckDB's real window functions.
    * Outputs scaled to exact integer millis. */
  def workerPctile(spark: SparkSession, sfDir: String): DataFrame = {
    val wk = Tables.workers(spark, sfDir).select("worker_id", "task_count")
    val total = wk.agg(count(lit(1)).as("n"))
    val before = col("y.task_count") < col("x.task_count") ||
      (col("y.task_count") === col("x.task_count") &&
        col("y.worker_id") < col("x.worker_id"))
    val q = (col("n") / lit(4)).cast("long") // ntile base bucket size
    val r = col("n") % 4 // first r buckets get one extra row
    val rn = col("rn")
    val quartile = when(rn <= r * (q + 1),
      floor((rn - 1) / (q + 1)) + 1)
      .otherwise(r + floor((rn - 1 - r * (q + 1)) / q) + 1)
    wk.alias("x")
      .join(wk.alias("y"), before, "left")
      .groupBy(col("x.worker_id").as("worker_id"),
        col("x.task_count").as("task_count"))
      .agg((count(col("y.worker_id")) + 1).as("rn"))
      .crossJoin(broadcast(total))
      .select(col("worker_id"), col("task_count"),
        quartile.cast("int").as("quartile"),
        // percent_rank of a single-row partition is DEFINED as 0; the
        // (rn−1)/(n−1) formula alone would give 0/0 → NaN → null there
        when(col("n") === 1, lit(0L))
          .otherwise(round(lit(1000.0) * (rn - 1) / (col("n") - 1)).cast("long"))
          .as("pct_rank_milli"),
        round(lit(1000.0) * rn / col("n")).cast("long").as("cume_milli"))
      .orderBy("worker_id")
  }
}
