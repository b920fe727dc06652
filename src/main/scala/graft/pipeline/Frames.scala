package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

/** O7 — the frame-extraction UDTF (reference: preprocess.py:156-189).
  *
  * The decode itself sits behind [[FrameDecoder]]: the container has no
  * codec libraries, so the production decoder is a clearly-marked stub and
  * [[SyntheticFrameDecoder]] provides a deterministic implementation that
  * exercises every downstream stage (batching, grouping, pivot, sink) with
  * real Spark plumbing. The flatMap is the Spark-native shape of a 1→N
  * generator: no shuffle, decode parallelism = input file partitioning.
  */
trait FrameDecoder extends Serializable {

  /** Decode one file's bytes, emitting a frame every `sampleRateMs`
    * milliseconds of video time (reference default 500 ms,
    * run_preprocess.py:88-91). `content` may be null for metadata-only
    * decoders (synthetic).
    */
  def decode(filename: String, content: Array[Byte],
      sampleRateMs: Long): Iterator[DecodedFrame]

  /** Metadata-only decode: same frames, `image` empty, pixel work
    * skipped. The hook the column-pruning DataSource V2 path
    * (sources.VideoFrameSource) pushes into — a real decoder reads
    * container headers only. Default falls back to the full decode.
    */
  def decodeMeta(filename: String, content: Array[Byte],
      sampleRateMs: Long): Iterator[DecodedFrame] =
    decode(filename, content, sampleRateMs)
}

/** Deterministic fake decoder: frame count, fps, and pixels derive from a
  * hash of the filename, so every run (and every engine re-running a lost
  * partition) produces identical frames. Pixels are normalized [0,1] floats
  * like the reference's (preprocess.py:178-180).
  */
final class SyntheticFrameDecoder(height: Int = 8, width: Int = 8,
    maxFrames: Int = 7) extends FrameDecoder {

  override def decode(filename: String, content: Array[Byte],
      sampleRateMs: Long): Iterator[DecodedFrame] = {
    val h0 = filename.hashCode
    val nFrames = 1 + java.lang.Math.floorMod(h0, maxFrames)
    val fps = math.round(1000.0 / sampleRateMs).toDouble
    Iterator.tabulate(nFrames) { i =>
      val image = new Array[Float](height * width * 3)
      var x = h0 * 31 + i
      var p = 0
      while (p < image.length) {
        // xorshift — cheap deterministic pseudo-pixels in [0,1)
        x ^= x << 13; x ^= x >>> 17; x ^= x << 5
        image(p) = ((x >>> 8) & 0xffff) / 65536.0f
        p += 1
      }
      DecodedFrame(i * sampleRateMs, fps, nFrames.toDouble, height, width,
        image)
    }
  }

  override def decodeMeta(filename: String, content: Array[Byte],
      sampleRateMs: Long): Iterator[DecodedFrame] = {
    val h0 = filename.hashCode
    val nFrames = 1 + java.lang.Math.floorMod(h0, maxFrames)
    val fps = math.round(1000.0 / sampleRateMs).toDouble
    Iterator.tabulate(nFrames)(i => DecodedFrame(i * sampleRateMs, fps,
      nFrames.toDouble, height, width, Array.emptyFloatArray))
  }
}

/** Production video decoder — requires an FFmpeg/JavaCV binding that is not
  * present in this environment. The Spark-side contract (schema, flatMap
  * shape, partitioning) is identical to the synthetic decoder, so swapping
  * this in changes no plan.
  */
final class FfmpegFrameDecoder extends FrameDecoder {
  override def decode(filename: String, content: Array[Byte],
      sampleRateMs: Long): Iterator[DecodedFrame] =
    throw new UnsupportedOperationException(
      "STUB: real video decode needs FFmpeg/JavaCV, unavailable offline; " +
        "use SyntheticFrameDecoder")
}

object Frames {

  /** Expand each file row into frame rows. Input needs columns
    * (filename, label, dataset[, content]); output is the fixed
    * [[FrameRow]] schema. Decode state is per-task; no shuffle introduced.
    */
  def extract(files: DataFrame, decoder: FrameDecoder,
      sampleRateMs: Long): Dataset[FrameRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    val hasContent = files.columns.contains("content")
    val cols = Seq("filename", "label", "dataset") ++
      (if (hasContent) Seq("content") else Nil)
    files.selectExpr(cols: _*).flatMap { row =>
      val content =
        if (hasContent) row.getAs[Array[Byte]]("content") else null
      decoder.decode(row.getString(0), content, sampleRateMs).map { f =>
        FrameRow(row.getString(0), row.getString(1), row.getString(2),
          f.timestampMs, f.framePerSec, f.frameTotal, f.height, f.width,
          f.image)
      }
    }
  }
}
