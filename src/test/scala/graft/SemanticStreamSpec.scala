package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.SemanticStream

/** Ingestion-time semantic near-dup detection ≡ the batch
  * semantic_dedup pair stage on the same store: streaming the vectors
  * across several micro-batches (so cross-batch pairs exercise the
  * per-cell keyed state) must surface exactly the pairs the batch
  * within-cell join finds, with identical integer evidence. */
class SemanticStreamSpec extends SparkSuite {

  test("streamed semantic pairs ≡ batch semantic_dedup on the fixture store") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val vecs = sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").orderBy("vec_id")
      .as[(Long, Seq[Float])].collect()
    val chunks = vecs.grouped((vecs.length / 3).max(1)).toSeq

    val input = MemoryStream[(Long, Seq[Float])]
    val q = SemanticStream.semanticPairsStream(spark,
        input.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("semstream")
      .outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("semstream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = operators.SimilarityOps.semanticDedup(spark, sf)
        .select("a_id", "b_id", "dot", "cos2_e6").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(batch.nonEmpty, "fixture produced no semantic pairs")
      assert(streamed == batch,
        s"stream-only: ${(streamed -- batch).take(5)}; " +
          s"batch-only: ${(batch -- streamed).take(5)}")
    } finally q.stop()
  }
}
