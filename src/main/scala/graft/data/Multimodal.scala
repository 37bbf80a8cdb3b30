package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed in batch-shaped
  * per-partition transforms.
  *
  * IMAGES decode for REAL via `javax.imageio.ImageIO` (ships in the base
  * JDK: PNG/JPEG/BMP/GIF) — exact dimensions plus a 4×4 pooled mean-luma
  * feature grid. Audio and video stay STUBBED behind `DecoderStub` (those
  * codecs genuinely do not exist in this container; a real decoder, e.g.
  * javacv, drops into the same seam without touching the plumbing), and an
  * image payload ImageIO cannot decode falls back to the stub's
  * deterministic content-hash features rather than dying mid-pipeline — at
  * 100 TB corrupt payloads are routine; a production variant would also
  * route them to a quarantine sink. The frames/features output is
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

  /** Real JDK image decode: payload → exact (width, height) plus a 4×4
    * mean-luma grid as doubles (block d = (y*4/h)*4 + x*4/w, luma =
    * (r+g+b)/3; the grid value is sum(r+g+b) / (pixels*765), kept as a
    * single integer-sum + one division so it is bit-reproducible in any
    * engine — integer sums are exact in doubles regardless of order).
    * Returns None when ImageIO cannot decode the payload. */
  def imageGrid(payload: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    try {
      // ImageIO's default stream wrapper spills to temp FILES even for
      // in-memory byte arrays — at executor fan-out that is disk churn for
      // nothing. A MemoryCacheImageInputStream keeps the decode fully in
      // memory WITHOUT flipping the JVM-global ImageIO.setUseCache flag
      // (which would silently change unrelated ImageIO users in the JVM).
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // ImageIO.read(ImageInputStream) closes the stream itself on the
      // reader path (JDK source: finally { reader.dispose(); stream.close() })
      // — a second close after a successful read would throw and masquerade
      // as an undecodable payload. But the NO-REGISTERED-READER path returns
      // null BEFORE that try/finally, leaving the stream open: close it here
      // or a partition of corrupt/unknown-format payloads leaks one
      // in-memory cache stream per row until GC.
      val img = javax.imageio.ImageIO.read(iis)
      if (img == null) { iis.close(); None }
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](16)
        val counts = new Array[Long](16)
        var y = 0
        while (y < h) {
          val by4 = (y * 4 / h) * 4
          var x = 0
          while (x < w) {
            val d = by4 + x * 4 / w
            val rgb = img.getRGB(x, y)
            sums(d) += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            counts(d) += 1
            x += 1
          }
          y += 1
        }
        val grid = new Array[Double](16)
        var d = 0
        while (d < 16) {
          grid(d) = if (counts(d) > 0) sums(d) / (counts(d) * 765.0) else 0.0
          d += 1
        }
        Some((w, h, grid))
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic planted image for tests/oracles: gray(x, y) =
    * (id*31 + x*7 + y*13) % 256 over id-derived dims, encoded with the
    * given lossless ImageIO format (png/bmp/gif — gray has ≤256 shades, so
    * even GIF's palette is exact). Because encode→decode is lossless, the
    * decoded `imageGrid` equals pure arithmetic over the formula — which a
    * SQL oracle can mirror without touching image bytes. */
  def plantedImage(id: Long, format: String = "png"): Array[Byte] = {
    // floorMod keeps dims >= 8 and gray in [0, 255] for negative ids too
    // (plain % would yield non-positive dims and BufferedImage throws)
    val w = (8 + Math.floorMod(id * 3, 17)).toInt
    val h = (8 + Math.floorMod(id * 5, 13)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = Math.floorMod(id * 31 + x * 7 + y * 13, 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // explicit in-memory output stream (see imageGrid: no global useCache flip)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { javax.imageio.ImageIO.write(img, format, ios); ios.flush() }
    finally ios.close()
    bos.toByteArray
  }

  /** Codec seam for the formats WITHOUT an in-container codec (audio,
    * video) and the fallback for undecodable image payloads — deterministic
    * fake decode so those rows stay testable end-to-end. A real decoder
    * library drops into `decodeFeatures`' routing without touching the
    * plumbing. The fake derives every output value from a hash of the
    * payload, so it is stable across runs and partitionings (what the tests
    * assert). */
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

  /** Batch decode: one pass per partition, codec state initialized once per
    * task, rows streamed through. Images go through the REAL ImageIO path
    * (width/height + pooled 4×4 luma grid, n_frames = 1); audio/video and
    * undecodable image payloads take the stub seam. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // real audio/video impl: val codec = Codec.acquire() here, once per task
      it.map { row =>
        if (row.kind == "image") {
          imageGrid(row.payload) match {
            case Some((w, h, grid)) =>
              MediaFeatures(row.media_id, row.kind, w, h, n_frames = 1,
                duration_ms = 0L, feature = grid.map(_.toFloat))
            case None => DecoderStub.decode(row)
          }
        } else DecoderStub.decode(row)
      }
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
