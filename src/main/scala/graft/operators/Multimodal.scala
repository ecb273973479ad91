package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side contract (schema, partitioning, batch
  * shape, null handling) is real and tested; the actual codec calls are
  * STUBBED with a deterministic fake (this container has no image/audio
  * libraries) — swap `FakeCodec` for a real decoder (javacv / a JNI codec)
  * without touching the pipeline shape.
  *
  * Design notes for 100 TB of media:
  *   - media bytes live in their own column; metadata-only queries never
  *     touch them (parquet column pruning — verified in tests via ReadSchema);
  *   - decode runs per-partition (`mapPartitions`), so codec init happens
  *     once per task, not per row — the Scala analogue of a Pandas UDF's
  *     batch amortization;
  *   - output is (id, meta, features), never the raw bytes again, so the
  *     decode stage is the last stage that carries them.
  */
object Multimodal {

  final case class MediaRow(media_ref: String, mime: String, content: Array[Byte])
  final case class MediaMeta(media_ref: String, mime: String, bytes: Long,
      width: Int, height: Int, nframes: Int)
  final case class MediaFeature(media_ref: String, dim: Int, feature: Array[Float])

  /** STUB codec: deterministic pseudo-decode derived from content bytes.
    * ??? in spirit — replace with a real decoder; everything downstream
    * only sees the typed result.
    */
  object FakeCodec {
    def probe(mime: String, content: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(content)
      val w = 16 + math.abs(h % 1920)
      val ht = 16 + math.abs((h / 7) % 1080)
      val frames = if (mime.startsWith("video")) 1 + math.abs((h / 13) % 300) else 1
      (w, ht, frames)
    }
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var acc = 1125899906842597L
      var i = 0
      while (i < content.length) { acc = acc * 31 + content(i); i += 1 }
      var j = 0
      while (j < dim) {
        acc = acc * 6364136223846793005L + 1442695040888963407L
        out(j) = ((acc >>> 33).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table (content derived from the ref). */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      concat(lit("m-"), lpad(lower(hex(col("id"))), 8, "0")).as("media_ref"),
      when(pmod(col("id"), lit(3)) === 0, "image/png")
        .when(pmod(col("id"), lit(3)) === 1, "audio/ogg")
        .otherwise("video/mp4").as("mime"),
      // opaque payload: sha-derived bytes, size varies deterministically
      repeat(sha2(col("id").cast("string"), 256), (pmod(col("id"), lit(8)) + 1).cast("int"))
        .cast("binary").as("content"))

  /** Decode/probe stage: binary → typed metadata, one codec init per
    * partition. The batch shape (Iterator-in/Iterator-out) is the real
    * contract; only FakeCodec is a stand-in.
    */
  def probeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_ref"), col("mime"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        // real impl: initialize the codec once here
        rows.map { r =>
          val (w, h, f) = FakeCodec.probe(r.mime, r.content)
          MediaMeta(r.media_ref, r.mime,
            if (r.content == null) 0L else r.content.length.toLong, w, h, f)
        }
      }
  }

  /** Feature-extraction stage: binary → fixed-dim float vector. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_ref"), col("mime"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map(r => MediaFeature(r.media_ref, dim, FakeCodec.features(r.content, dim)))
      }
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index up to
    * the probed frame count — pure Column math over the probed metadata (the
    * actual frame decode would join back to bytes by media_ref).
    */
  def sampleFrames(meta: DataFrame, stride: Int = 10): DataFrame =
    meta.filter(col("mime").startsWith("video"))
      .select(col("media_ref"),
        sequence(lit(0), greatest(col("nframes") - 1, lit(0)), lit(stride))
          .as("frame_indices"))
}
