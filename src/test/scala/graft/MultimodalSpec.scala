package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Multimodal plumbing: the Spark-side batch shapes are real even
  * though the codec bodies are deterministic stubs. */
class MultimodalSpec extends SparkSuite {

  test("resize emits bounded thumbnails, deterministically") {
    val a = MultimodalOps.multimodalResize(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getInt(1) <= 64)) // thumb_w = byte length ≤ ThumbBytes
    val b = MultimodalOps.multimodalResize(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("frame sampling yields every 4th 256-byte frame per document") {
    val s = spark
    import s.implicits._
    val counts = MultimodalOps.multimodalFrameSample(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val expected = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len"))
      .as[(Long, Int)].collect().toMap.map { case (id, len) =>
        val nFrames = (len + 255) / 256
        id -> ((nFrames - 1) / 4 + 1).toLong
      }
    assert(counts == expected)
  }
}
