package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The DECODE step is behind [[MediaDecoder]] with a clearly-marked stub
  * (no codec libraries ship in this container — same policy as
  * [[FrameDecoder]]): [[SyntheticMediaDecoder]] derives deterministic pixels
  * PCM-style samples from the bytes themselves, so the Spark-side plumbing —
  * schema, typed Dataset stages, per-partition batching, column pruning
  * (binary payloads die at decode, before any shuffle) — is real and tested
  * even though the codec is fake. Swapping in a real JavaCV/FFmpeg decoder
  * changes no plan.
  */

/** One media asset: opaque bytes + typed metadata (the 100 TB layout: bytes
  * in parquet binary columns, metadata queryable without touching payloads).
  */
final case class MediaAsset(
    asset_id: Long,
    kind: String, // image | audio | video
    content: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int)

/** Decoded image: row-major RGB float pixels in [0,1]. */
final case class DecodedImage(
    asset_id: Long,
    height: Int,
    width: Int,
    pixels: Array[Float])

/** Extracted per-asset features (image stats or audio energy windows). */
final case class MediaFeatures(
    asset_id: Long,
    kind: String,
    features: Array[Float])

trait MediaDecoder extends Serializable {
  def decodeImage(a: MediaAsset): DecodedImage
  def decodeAudio(a: MediaAsset): Array[Float]
}

/** STUB decoder: real image/audio decoding needs codec libraries that are
  * unavailable offline; this derives deterministic content from the bytes
  * (xorshift over a byte-hash seed) with the declared metadata shape, so
  * every downstream stage processes realistically-shaped data.
  */
final class SyntheticMediaDecoder extends MediaDecoder {
  private def mix(bytes: Array[Byte], n: Int): Array[Float] = {
    var seed = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) {
      seed = (seed ^ bytes(i)) * 0x100000001b3L; i += 1
    }
    val out = new Array[Float](n)
    var x = if (seed == 0) 1L else seed
    var j = 0
    while (j < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      out(j) = ((x >>> 16) & 0xffff) / 65536.0f
      j += 1
    }
    out
  }

  override def decodeImage(a: MediaAsset): DecodedImage =
    DecodedImage(a.asset_id, a.height, a.width,
      mix(a.content, a.height * a.width * 3))

  override def decodeAudio(a: MediaAsset): Array[Float] =
    mix(a.content, math.max(1, a.sample_rate)) // 1 second of samples
}

object Multimodal {

  /** Decode image assets. Narrow map; the binary payload is consumed here
    * and never reaches a shuffle.
    */
  def decodeImages(assets: Dataset[MediaAsset],
      decoder: MediaDecoder): Dataset[DecodedImage] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "image").map(decoder.decodeImage)
  }

  /** Nearest-neighbor resize — real resampling arithmetic (not a stub):
    * output pixel (y,x) samples input (floor(y*h/oh), floor(x*w/ow)).
    */
  def resize(images: Dataset[DecodedImage], outH: Int,
      outW: Int): Dataset[DecodedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.map { im =>
      val out = new Array[Float](outH * outW * 3)
      var y = 0
      while (y < outH) {
        val sy = y * im.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * im.width / outW
          var c = 0
          while (c < 3) {
            out((y * outW + x) * 3 + c) =
              im.pixels((sy * im.width + sx) * 3 + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedImage(im.asset_id, outH, outW, out)
    }
  }

  /** Per-image channel-mean/variance features (the classic pre-model
    * normalization stats), computed in one pass per row.
    */
  def imageStats(images: Dataset[DecodedImage]): Dataset[MediaFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.map { im =>
      val sums = new Array[Double](3)
      val sqs = new Array[Double](3)
      val n = im.height * im.width
      var i = 0
      while (i < n * 3) {
        val v = im.pixels(i).toDouble
        sums(i % 3) += v; sqs(i % 3) += v * v
        i += 1
      }
      val f = new Array[Float](6)
      var c = 0
      while (c < 3) {
        val mean = sums(c) / n
        f(c) = mean.toFloat
        f(c + 3) = (sqs(c) / n - mean * mean).toFloat
        c += 1
      }
      MediaFeatures(im.asset_id, "image", f)
    }
  }

  /** Audio feature extraction: RMS energy per fixed window over the decoded
    * samples (frame-sampling for audio).
    */
  def audioEnergy(assets: Dataset[MediaAsset], decoder: MediaDecoder,
      windowSize: Int): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "audio").map { a =>
      val samples = decoder.decodeAudio(a)
      val nWin = math.max(1, samples.length / windowSize)
      val f = new Array[Float](nWin)
      var w = 0
      while (w < nWin) {
        var acc = 0.0
        var i = w * windowSize
        val end = math.min(samples.length, i + windowSize)
        while (i < end) { acc += samples(i) * samples(i); i += 1 }
        f(w) = math.sqrt(acc / (end - w * windowSize)).toFloat
        w += 1
      }
      MediaFeatures(a.asset_id, "audio", f)
    }
  }

  /** Frame-sampling over binary VIDEO assets: one decoded frame row per
    * `sampleRateMs` of (synthetic) video time, 1→N per asset via the same
    * [[FrameDecoder]] contract the file pipeline uses — binary payloads
    * die inside the flatMap, before any shuffle. The decode is keyed on a
    * CRYPTOGRAPHIC digest of the asset BYTES (not the asset id, not a
    * 32-bit hash), so identical content ⇒ identical frames AND distinct
    * content ⇒ distinct frames even under the synthetic decoder — both
    * halves of the contract a real codec gives for free (a 32-bit key
    * would manufacture false duplicates on hash collision).
    */
  def sampleVideoFrames(assets: Dataset[MediaAsset], decoder: FrameDecoder,
      sampleRateMs: Long): Dataset[DecodedImage] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val key = "asset_" + md.digest(a.content)
        .map(b => f"$b%02x").mkString
      decoder.decode(key, a.content, sampleRateMs)
        .zipWithIndex.map { case (f, i) =>
          DecodedImage(a.asset_id * 1000 + i, f.height, f.width, f.image)
        }
    }
  }

  /** Metadata-only relational surface: per-kind accounting computed WITHOUT
    * decoding — the property that makes 100 TB of media queryable (payload
    * columns are pruned; only lengths/hashes are read).
    *
    * The content fingerprint is the NUMERIC 60-bit md5 prefix, not the hex
    * string: a long min aggregates via HashAggregate, where a string min
    * falls back to SortAggregate (sorts every partition — the same
    * trade documented at TextOps.minhash).
    */
  def assetStats(assets: DataFrame): DataFrame =
    assets
      .select(col("asset_id"), col("kind"), col("content"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("content"))).as("total_bytes"),
        min(conv(substring(md5(col("content")), 1, 15), 16, 10)
          .cast("long")).as("min_content_hash"))

  /** Exact dedup of binary assets by payload hash: duplicate groups
    * (≥2 members) with their canonical (smallest) asset id. The payload
    * is hashed in the scan projection and pruned before the exchange —
    * content bytes never shuffle.
    */
  def dedupByContent(assets: DataFrame): DataFrame =
    assets
      .select(col("asset_id"), col("kind"),
        md5(col("content")).as("content_hash"))
      .groupBy(col("kind"), col("content_hash"))
      .agg(count(lit(1)).as("n_assets"), min(col("asset_id")).as("canonical_id"))
      .filter(col("n_assets") >= 2)
}
