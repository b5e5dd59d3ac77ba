package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental upsert WITHOUT a transactional table format:
  * the append-log + compaction-on-read pattern (what CDC ingestion
  * looks like on plain parquet before Delta/Iceberg enter the stack;
  * their MERGE is the same logical shape with a transaction log).
  *
  *  - Each micro-batch lands in its own `batch=<id>` partition dir with
  *    per-batch OVERWRITE — so a retried batch REPLACES its own
  *    previous attempt (idempotent), which together with the
  *    checkpoint's exactly-once batch ids gives exactly-once appends.
  *  - Readers compact last-writer-wins with one max_by aggregation
  *    ([[compactedRead]] — the streaming analog of EventOps.cdcLatest;
  *    same plan shape, no window sort).
  *  - A periodic rewrite of old partitions (LayoutOps.compactionPlan
  *    picks the victims) bounds read amplification; not run inline
  *    here — at 100 TB compaction is its own maintenance job.
  */
object MergeSink {

  /** Idempotent per-batch landing: retry of batch N overwrites ONLY
    * `batch=N`. Append-mode writes would duplicate on retry; full
    * overwrite would drop history — per-partition overwrite is the
    * exactly-once middle ground. */
  def mergeBatch(batch: DataFrame, logDir: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$logDir/batch=$batchId")

  /** Start the CDC ingestion stream: every micro-batch appends its own
    * partition under `logDir`; `checkpointDir` carries the batch-id
    * ledger that makes retries idempotent. */
  def start(keyed: DataFrame, logDir: String, checkpointDir: String): StreamingQuery =
    keyed.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => mergeBatch(b, logDir, id))
      .start()

  /** Last-writer-wins view over the log: one hash aggregation keyed by
    * (user_id, event_type), latest row selected by event_id via max_by
    * — identical to the batch cdc_latest compaction (spec-asserted). */
  def compactedRead(spark: SparkSession, logDir: String): DataFrame =
    spark.read.parquet(logDir)
      .groupBy("user_id", "event_type")
      .agg(max("event_id").as("last_event_id"),
        max_by(col("cents"), col("event_id")).as("last_cents"),
        count(lit(1)).as("n_versions"))
}
