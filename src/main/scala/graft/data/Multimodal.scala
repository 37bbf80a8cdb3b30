package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed in batch-shaped
  * per-partition transforms.
  *
  * The Spark-side contract (schema, partitioning, batch shape, typed output)
  * is real and tested; the codec step is STUBBED behind `DecoderStub`
  * because no image/audio libraries exist in this container — a real decoder
  * (e.g. javacv / TwelveMonkeys ImageIO) drops into `decode` without
  * touching any of the plumbing. At scale the frames/features output is
  * partitioned by `pmod(hash(media_id), B)` like every other table.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,           // image | audio | video
      payload: Array[Byte],   // opaque encoded bytes
      source: String,
      n_bytes: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,             // image/video
      height: Int,
      n_frames: Int,          // video: sampled frames; audio: windows
      duration_ms: Long,
      feature: Array[Float])  // pooled feature vector (dim 16 in the stub)

  /** ??? seam — deterministic fake decode so the pipeline is testable
    * end-to-end without codecs. Real implementation: decode `payload` with a
    * codec library, resize / frame-sample, pool features. The fake derives
    * every output value from a hash of the payload, so it is stable across
    * runs and partitionings (what the tests assert). */
  object DecoderStub {
    def decode(row: MediaRow): MediaFeatures = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < row.payload.length) { h ^= row.payload(i); h *= 0x100000001b3L; i += 1 }
      def field(salt: Int, mod: Int, off: Int): Int = {
        var x = h ^ (salt * 0x9E3779B97F4A7C15L)
        x *= 0x100000001b3L; x ^= (x >>> 31)
        (Math.floorMod(x, mod.toLong) + off).toInt
      }
      val dim = 16
      val feat = new Array[Float](dim)
      var d = 0
      while (d < dim) { feat(d) = field(100 + d, 2000, -1000) / 1000.0f; d += 1 }
      MediaFeatures(
        media_id = row.media_id,
        kind = row.kind,
        width = if (row.kind == "audio") 0 else field(1, 1920, 64),
        height = if (row.kind == "audio") 0 else field(2, 1080, 64),
        n_frames = row.kind match {
          case "image" => 1
          case _       => field(3, 300, 1)
        },
        duration_ms = if (row.kind == "image") 0L else field(4, 600000, 40).toLong,
        feature = feat)
    }
  }

  /** Deterministic synthetic media table (payload bytes hash-derived). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val len = 64 + (i * 2654435761L % 192).toInt
      val payload = new Array[Byte](len)
      var h = i * 0x9E3779B97F4A7C15L
      var j = 0
      while (j < len) { h ^= (h << 13); h ^= (h >>> 7); h ^= (h << 17); payload(j) = h.toByte; j += 1 }
      MediaRow(i, kind, payload, s"synthetic/${kind}s", len)
    }
  }

  /** Batch decode: one pass per partition, codec initialized once per task
    * (the expensive part for a real decoder), rows streamed through. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // real impl: val codec = Codec.acquire() here, once per batch/partition
      it.map(DecoderStub.decode)
    }
  }

  /** Feature-space stats per kind (drives e.g. resize-policy decisions). */
  def kindStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      round(avg(col("width")), 4).as("avg_width"),
      round(avg(col("n_frames")), 4).as("avg_frames"),
      round(avg(element_at(col("feature"), 1)), 6).as("avg_feat0"))
}
