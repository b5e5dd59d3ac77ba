package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL document ingestion — the de-facto corpus interchange format
  * (one JSON object per line: `{"doc_id":…,"source":…,"text":…}`).
  *
  * Design for a 100 TB drop zone:
  *  - schema is DECLARED, never inferred — `inferSchema` is a full
  *    extra pass over the data before the real one;
  *  - malformed lines are a certainty at corpus scale and must
  *    QUARANTINE, never kill the read or silently vanish. The parse is
  *    `text` + `from_json` (null struct = corrupt) rather than the
  *    json reader's PERMISSIVE `_corrupt_record`, because Spark
  *    disallows filtering on the internal corrupt column without
  *    caching — and this formulation works identically under
  *    `readStream` ([[stream]]), which the json-reader trick does not;
  *  - line splitting is Spark's text source: splittable, parallel,
  *    pushdown-friendly, no custom InputFormat needed.
  */
object JsonlCorpus {

  /** The corpus line schema (doc_id, source, text). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  private def parsed(lines: DataFrame): DataFrame =
    lines.select(col("value"),
      from_json(col("value"), docSchema).as("doc"))

  /** A line is a document iff it parses AND carries non-null doc_id +
    * text (a structurally-valid object missing the payload is still
    * junk for every downstream op). */
  private val isDoc =
    col("doc").isNotNull && col("doc.doc_id").isNotNull &&
      col("doc.text").isNotNull

  /** Clean documents from a JSONL path, in the documents-table shape. */
  def docs(spark: SparkSession, path: String): DataFrame =
    parsed(spark.read.text(path)).filter(isDoc).select(col("doc.*"))

  /** The raw text of every rejected line — route to a quarantine sink
    * and alert on its volume; silently dropping it hides upstream
    * producer bugs. */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    parsed(spark.read.text(path)).filter(!isDoc)
      .select(col("value").as("raw_line"))

  /** Streaming form of [[docs]] — the ingestion feed for
    * [[graft.streaming.CurationStream]]: new JSONL files landing in
    * `path` flow straight into the curation gates. */
  def stream(spark: SparkSession, path: String): DataFrame =
    parsed(spark.readStream.text(path)).filter(isDoc).select(col("doc.*"))
}
