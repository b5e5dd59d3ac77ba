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

  /** A resized thumbnail: payload downsampled to ≤ ThumbBytes. */
  final case class MediaThumb(doc_id: Long, thumb_w: Int, thumb_h: Int,
      thumb: Array[Byte])

  private val ThumbBytes = 64

  /** STUB resize: deterministic stride subsampling of the payload —
    * the byte-level shape of a nearest-neighbor downscale. */
  private def fakeResize(payload: Array[Byte]): Array[Byte] = {
    // ??? <- real resize goes here (decode → scale → re-encode)
    val stride = math.max(1, payload.length / ThumbBytes)
    payload.indices.by(stride).take(ThumbBytes).map(payload).toArray
  }

  /** Distributed resize: typed mapPartitions, one (stub) codec init per
    * partition; emits small thumbnails — the only binary that flows
    * downstream (the full payload dies with the partition, so nothing
    * heavy ever shuffles). */
  def resizeThumbs(spark: SparkSession, sfDir: String): Dataset[MediaThumb] = {
    import spark.implicits._
    mediaTable(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val t = fakeResize(r.payload)
        MediaThumb(r.doc_id, t.length, 1, t)
      }
    }
  }

  /** Harness view: thumbnail sizes + content hash (rows-only). */
  def multimodalResize(spark: SparkSession, sfDir: String): DataFrame =
    resizeThumbs(spark, sfDir).toDF()
      .select(col("doc_id"), col("thumb_w"), col("thumb_h"),
        hex(md5(col("thumb"))).as("thumb_md5"))
      .orderBy("doc_id")

  /** One sampled frame of a "video" payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame_md5: String)

  private val FrameBytes = 256
  private val FrameStride = 4

  /** STUB frame extraction: the payload viewed as FrameBytes-sized
    * frames, sampling every FrameStride-th (a keyframe-ish cadence). */
  private def fakeFrames(payload: Array[Byte]): Iterator[(Int, Array[Byte])] = {
    // ??? <- real demux/decode goes here (container parse → frame grab)
    payload.grouped(FrameBytes).zipWithIndex.collect {
      case (frame, i) if i % FrameStride == 0 => (i, frame)
    }
  }

  /** Distributed frame sampling: mapPartitions flatMap — one input row
    * fans out to its sampled frames (iterator-in/iterator-out, so a
    * long video never materializes all frames at once). */
  def frameSample(spark: SparkSession, sfDir: String): Dataset[MediaFrame] = {
    import spark.implicits._
    mediaTable(spark, sfDir).mapPartitions { rows =>
      // per-partition digest instance (MessageDigest is not thread-safe
      // to share, cheap to clone per partition)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        fakeFrames(r.payload).map { case (i, frame) =>
          val h = digest.digest(frame).map("%02X".format(_)).mkString
          MediaFrame(r.doc_id, i, h)
        }
      }
    }
  }

  /** Harness view (rows-only). */
  def multimodalFrameSample(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(spark, sfDir).toDF().orderBy("doc_id", "frame_idx")
}
