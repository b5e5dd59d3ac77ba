package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.CurationStream

/** Streaming-ingestion curation ≡ the batch pipeline on the same data:
  * the engine's promise that curating while documents ARRIVE produces
  * the corpus the nightly batch job would have produced. */
class CurationStreamSpec extends SparkSuite {

  test("streamed curation ≡ batch pipeline_curate on the fixture corpus") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val bench = CurationStream.benchShingleHashes(spark, sf)
    assert(bench.nonEmpty, "fixture benchmark subset produced no shingles")

    // id-ordered arrival in three micro-batches: first-arrival dedup
    // then equals the batch min-doc_id canonical pick
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id")
      .as[(Long, String)].collect()
    val chunks = docs.grouped((docs.length / 3).max(1)).toSeq

    val input = MemoryStream[(Long, String)]
    val q = CurationStream.curate(spark, input.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("curated").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val batch = operators.TextOps.pipelineCurate(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(streamed == batch,
        s"stream-only: ${(streamed -- batch).take(5)}; " +
          s"batch-only: ${(batch -- streamed).take(5)}")
    } finally q.stop()
  }

  test("watermarked variant: in-horizon dup dropped, past-horizon state evicted") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val text = ("tok " * 30).trim
    val other = ("alt " * 30).trim
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = streaming.CurationStream.curateWithinWatermark(spark,
        input.toDF().toDF("doc_id", "ingest_ts", "text"),
        Array(0L), horizon = "10 minutes")
      .writeStream.format("memory").queryName("curated_wm")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(t: String) = java.sql.Timestamp.valueOf(t)
      input.addData((1L, ts("2024-01-01 10:00:00"), text))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 10:05:00"), text)) // dup in horizon
      q.processAllAvailable()
      // advance the watermark to 10:50 — past first-seen + horizon
      // (10:10), so text's fingerprint state is EVICTED...
      input.addData((3L, ts("2024-01-01 11:00:00"), other))
      q.processAllAvailable()
      // ...and the same content re-sent after the horizon is
      // RE-ADMITTED: the documented accuracy/state trade, and the
      // observable difference from the unbounded curate() — if the
      // operator silently reverted to dropDuplicates, this row would
      // be dropped and the assert below would fail
      input.addData((4L, ts("2024-01-01 11:01:00"), text))
      q.processAllAvailable()
      val out = spark.table("curated_wm").as[(Long, Int)].collect().sortBy(_._1)
      assert(out.toSeq == Seq((1L, 30), (3L, 30), (4L, 30)), s"got ${out.toSeq}")
    } finally q.stop()
  }

  test("re-sent duplicate content in a later micro-batch is dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val text = ("tok " * 30).trim // passes the quality gate, no bench overlap
    val input = MemoryStream[(Long, String)]
    val q = CurationStream.curate(spark,
        input.toDF().toDF("doc_id", "text"), Array(0L))
      .writeStream.format("memory").queryName("curated_dups")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, text))
      q.processAllAvailable()
      input.addData((2L, text)) // same content, new id, later batch
      q.processAllAvailable()
      val out = spark.table("curated_dups").as[(Long, Int)].collect()
      assert(out.toSeq == Seq((1L, 30)), s"got ${out.toSeq}")
    } finally q.stop()
  }
}
