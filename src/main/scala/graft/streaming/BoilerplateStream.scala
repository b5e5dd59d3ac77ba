package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextOps

/** Boilerplate stripping as an INGESTION job — the streaming member of
  * the span-removal family (batch accounting `boilerplate_strip`,
  * executed `boilerplate_strip_text`, nightly `boilerplate_incremental`):
  * documents are stripped against the PERSISTED chunk dictionary the
  * moment they arrive, the same deployment shape as
  * [[NearDupStream]]'s `nearDupAgainstIndex` and
  * [[SemanticStream]]'s `semanticAgainstIndex` — a stream-static
  * probe of a stored index, STATELESS by construction.
  *
  * Why `foreachBatch`, not a streaming aggregation: the per-doc
  * re-assembly (group surviving chunks by doc, order by pos) looks
  * like an aggregation, but every chunk of a document derives from
  * ONE arriving row, so the group is always complete within its
  * micro-batch — there is no cross-batch state to keep, and watermark
  * machinery would model a dependency that does not exist.
  * `foreachBatch` runs the SAME shared strip pipeline
  * ([[TextOps.stripAgainstDict]] — one Column chain, batch and stream
  * can't fork) per micro-batch with full batch semantics, and lands
  * results via [[MergeSink.mergeBatch]]'s idempotent per-batch
  * overwrite, so a retried batch replaces itself (exactly-once
  * output under the checkpoint's batch-id ledger).
  *
  * Scale: the dictionary side is ~16 B/chunk and loaded once per
  * micro-batch plan; the probe join is batch-sized. The dictionary
  * REFRESH (new boilerplate emerging across days) is the nightly
  * dictionary job's concern — exactly the split `dedup_incremental`
  * documents for signatures. */
object BoilerplateStream {

  /** Build + persist the chunk dictionary once at ingestion setup
    * (pass 1 of the batch strip, stored — the analog of
    * `buildSigIndex`). */
  def buildChunkDictionary(spark: SparkSession, docs: DataFrame,
      dictDir: String): Unit =
    TextOps.chunkDictionary(spark, docs)
      .write.mode("overwrite").parquet(dictDir)

  /** One micro-batch: shared strip pipeline against the stored
    * dictionary, idempotent per-batch landing. */
  private[streaming] def stripBatch(spark: SparkSession, batch: DataFrame,
      dictDir: String, outDir: String, batchId: Long): Unit = {
    val dict = spark.read.parquet(dictDir)
    MergeSink.mergeBatch(
      TextOps.stripAgainstDict(spark, batch, dict), outDir, batchId)
  }

  /** Start the ingestion-time strip: `docs` is a STREAMING frame with
    * (doc_id, text); survivors land under `outDir/batch=<id>` with
    * clean_text + n_kept, all-boilerplate docs dropped — identical
    * verdicts to running the batch strip over the same arrivals
    * (BoilerplateStreamSpec pins it). */
  def start(spark: SparkSession, docs: DataFrame, dictDir: String,
      outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        stripBatch(spark, b, dictDir, outDir, id))
      .start()
}
