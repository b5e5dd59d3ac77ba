package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` columns
  * with typed metadata, and run decode / feature-extraction as
  * distributed per-partition batch transforms.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB (`fakeDecode`); everything Spark-
  * side — the binary column, the metadata schema, the typed Dataset
  * mapPartitions batch shape, partitioning — is real and spec-tested.
  * In production the stub body is replaced by the codec call with the
  * same signature (bytes → features).
  *
  * Scale: decode runs mapPartitions (one codec init per partition, not
  * per row); binary payloads never shuffle — metadata is extracted
  * first and the pipeline carries (id, features), not bytes.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
      mime: String, n_bytes: Long)

  /** Decoded features (what a real image decode would yield). */
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      n_channels: Int, mean_luma: Double)

  /** Fixture → media table: text bytes as the opaque payload. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Oracle-checkable metadata projection: byte length + hex header
    * (first 8 bytes) — the "inspect without decoding" path. */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("int").as("n_bytes"),
        hex(substring(col("text"), 1, 8).cast("binary")).as("header_hex"),
        lit("text/plain").as("mime"))
      .orderBy("doc_id")

  /** STUB: deterministic fake decode standing in for an image codec.
    * Derives pseudo-features from the bytes so tests are stable. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int, Double) = {
    // ??? <- real codec goes here (e.g. javax.imageio / ffmpeg bindings)
    val n = payload.length
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    val width = 16 + (n % 64)
    val height = 16 + (sum % 64).toInt
    (width, height, 3, (sum % 256).toDouble / 255.0)
  }

  /** Distributed decode: typed mapPartitions over the media table —
    * batch-shaped (iterator in/out, one decoder init per partition). */
  def decodeFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir).mapPartitions { rows =>
      // per-partition init of the (stub) codec happens here, once
      rows.map { r =>
        val (w, h, c, luma) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, w, h, c, luma)
      }
    }
  }

  /** DataFrame view of decodeFeatures for the harness (rows-only check:
    * the stub decode is not SQL-expressible). */
  def multimodalDecode(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(spark, sfDir).toDF().orderBy("doc_id")
}
