package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode

import graft.sources.JsonlCorpus
import graft.streaming.CurationStream

/** JSONL ingestion: clean docs parsed, junk quarantined (never dropped,
  * never fatal), and the streaming form feeds the curation pipeline. */
class JsonlCorpusSpec extends SparkSuite {

  private val goodText = ("tok " * 30).trim

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val lines = Seq(
      s"""{"doc_id": 1, "source": "web", "text": "$goodText"}""",
      s"""{"doc_id": 2, "source": "web", "text": "$goodText extra"}""",
      s"""{"doc_id": 3, "source": "code", "text": "$goodText more"}""",
      """{"doc_id": 4, "source": "web"}""", // structurally valid, no text
      """{"doc_id": oops not json at all""", // malformed
      """just some stray plain text""") // not even an object
    Files.write(java.nio.file.Paths.get(dir, "part-000.jsonl"),
      String.join("\n", lines: _*).getBytes)
    dir
  }

  test("docs parse declared schema; junk lines quarantine with raw text") {
    val s = spark
    import s.implicits._
    val dir = writeFixture()
    val docs = JsonlCorpus.docs(spark, dir)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(docs.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(docs.forall(_._3.startsWith("tok")))
    val quarantined = JsonlCorpus.quarantine(spark, dir)
      .as[String].collect().toSet
    assert(quarantined.size == 3)
    assert(quarantined.exists(_.contains("oops")))
    assert(quarantined.exists(_.contains("stray")))
    assert(quarantined.exists(_.contains("\"doc_id\": 4")),
      "payload-less object must quarantine, not become a null-text doc")
  }

  test("streaming JSONL feed flows through the curation gates") {
    val dir = writeFixture()
    val q = CurationStream.curate(spark,
        JsonlCorpus.stream(spark, dir).select("doc_id", "text"),
        Array(0L))
      .writeStream.format("memory").queryName("jsonl_curated")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val out = spark.table("jsonl_curated").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      // all three clean docs pass quality (30+ tokens), none collide
      assert(out.toSeq == Seq((1L, 30), (2L, 31), (3L, 31)), s"got ${out.toSeq}")
    } finally q.stop()
  }
}
