package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north star): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, plus a decode →
  * feature-extract → downsample pipeline.
  *
  * The container has no codec libraries, so the *decode step* is a
  * clearly-marked deterministic STUB (bytes → fake grayscale frames);
  * everything around it — binary column construction, metadata
  * schema, per-partition batched processing (`mapPartitions` over an
  * iterator of fixed-size batches, the JVM analog of Arrow-batch
  * UDFs), partition-count preservation, and the feature schema — is
  * real Spark plumbing and is what the tests pin down.
  *
  * Scale shape: payloads never pass through a shuffle here — decode
  * and featurize are narrow per-partition maps; only the small
  * feature vectors (not the blobs) flow into downstream joins/aggs.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. In the harness the
    * payload is synthesized from `documents.text` (UTF-8 bytes) with
    * deterministic fake dimensions derived from n_chars. */
  case class Media(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  /** Decoded features per media item (one row per sampled frame). */
  case class FrameFeatures(media_id: Long, frame_idx: Int,
      mean_intensity: Double, n_pixels: Int)

  /** Binary-column metadata extraction — fully relational, no stub:
    * byte length, content hash, synthesized decode parameters. */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("n_chars"))
      .select(
        col("media_id"),
        length(col("payload")).as("n_bytes"), // length(binary) = byte count
        sha2(col("payload"), 256).as("content_hash"),
        (lit(64) + pmod(col("n_chars"), lit(640))).cast("int").as("width"),
        (lit(64) + pmod(col("n_chars") * 7, lit(480))).cast("int").as("height"),
        (lit(1) + pmod(col("n_chars"), lit(8))).cast("int").as("n_frames"),
        when(pmod(col("n_chars"), lit(3)) === 0, "video")
          .when(pmod(col("n_chars"), lit(3)) === 1, "image")
          .otherwise("audio").as("kind"))
      .orderBy(col("media_id"))

  /** Harness media table for the typed pipeline — one documents scan,
    * deriving payload and metadata together (joining back through
    * multimodalMeta would scan and encode twice and pay its sort). */
  def mediaTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        when(pmod(col("n_chars"), lit(3)) === 0, "video")
          .when(pmod(col("n_chars"), lit(3)) === 1, "image")
          .otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (lit(64) + pmod(col("n_chars"), lit(640))).cast("int").as("width"),
        (lit(64) + pmod(col("n_chars") * 7, lit(480))).cast("int").as("height"),
        (lit(1) + pmod(col("n_chars"), lit(8))).cast("int").as("n_frames"))
      .as[Media]
  }

  /** STUB decode: a real implementation would hand each batch of
    * payloads to a codec (JNI/FFI); the container has none, so frames
    * are synthesized deterministically from payload bytes —
    * `pixel(f, i) = payload[(f + i) mod len] / 255`. The batching,
    * schema, and partition behavior are exactly what a real decoder
    * would use. */
  private[graft] def stubDecodeFrame(payload: Array[Byte], frameIdx: Int,
      nPixels: Int): Array[Float] = {
    val out = new Array[Float](nPixels)
    if (payload.isEmpty) return out // empty media → black frame, not % 0
    var i = 0
    while (i < nPixels) {
      out(i) = (payload((frameIdx + i) % payload.length) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Decode + featurize, batched per partition: sample every
    * `frameStride`-th frame, decode (stub), emit per-frame features.
    * `batchSize` controls how many media rows are materialized at
    * once per partition — the Arrow-batch-shape knob. */
  def frameFeatures(media: Dataset[Media], frameStride: Int = 2,
      batchSize: Int = 64): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          val nPixels = math.min(m.width * m.height, 4096)
          (0 until m.n_frames by frameStride).iterator.map { f =>
            val px = stubDecodeFrame(m.payload, f, nPixels)
            var sum = 0.0
            var i = 0
            while (i < px.length) { sum += px(i); i += 1 }
            FrameFeatures(m.media_id, f, sum / nPixels, nPixels)
          }
        }
      }
    }
  }

  /** 2×2 average-pool "resize" over a decoded frame — pure kernel,
    * used inside the batched map (no per-pixel rows ever hit the
    * engine). */
  private[graft] def poolHalf(px: Array[Float], w: Int, h: Int): Array[Float] = {
    val ow = w / 2
    val oh = h / 2
    val out = new Array[Float](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val i0 = (2 * y) * w + 2 * x
        val i1 = i0 + 1
        val i2 = i0 + w
        val i3 = i2 + 1
        out(y * ow + x) = (px(i0) + px(i1) + px(i2) + px(i3)) / 4.0f
        x += 1
      }
      y += 1
    }
    out
  }

  /** Aggregated features per media item — the relational face of the
    * typed pipeline, used as the declared query. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    frameFeatures(mediaTable(s, d)).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled_frames"),
        round(avg(col("mean_intensity")), 6).as("avg_intensity"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta"     -> multimodalMeta,
    "q_multimodal_features" -> multimodalFeatures,
  )

  val oracles: Map[String, String] = Map(
    // Metadata extraction is pure SQL; the typed decode pipeline
    // (q_multimodal_features) is stub-backed and golden-tested instead.
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         sha256(text) AS content_hash,
         CAST(64 + n_chars % 640 AS INT) AS width,
         CAST(64 + (n_chars * 7) % 480 AS INT) AS height,
         CAST(1 + n_chars % 8 AS INT) AS n_frames,
         CASE WHEN n_chars % 3 = 0 THEN 'video'
              WHEN n_chars % 3 = 1 THEN 'image' ELSE 'audio' END AS kind
         FROM documents ORDER BY media_id""",
  )
}
