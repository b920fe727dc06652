package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import graft.pipeline.FrameDecoder
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** O7 as a DataSource V2 table (SURVEY.md §2 O7: "a `Generator` (UDTF) or
  * DataSource V2 'video' table") — `spark.read.format("videoframes")
  * .load(dir)` yields one row per sampled frame of every video file under
  * `dir`.
  *
  * The V2 shape buys what the flatMap form (pipeline.Frames) cannot:
  * **column-pruning pushdown INTO the decoder**. A query that never
  * touches `image` (counting frames, auditing fps, joining metadata)
  * reports a pruned `ReadSchema` and the reader SKIPS pixel decode
  * entirely — at 100 TB that is the difference between a metadata query
  * and decoding the corpus. Decode stays behind [[FrameDecoder]] via
  * [[graft.pipeline.AutoFrameDecoder]]: the reader sniffs each file's
  * head, so y4m and MJPEG-AVI corpora REAL-decode through this source
  * with zero native deps, and anything else takes the best decoder
  * this JVM offers (JavaCV when present, deterministic synthetic in
  * this offline container).
  *
  * Partition planning: files are listed driver-side (cheap metadata) and
  * round-robined into `spark.default.parallelism` input partitions, so
  * decode parallelism never degrades to files-per-dir < cores the way a
  * single-file binary scan does.
  */
final class VideoFrameSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "videoframes"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VideoFrameSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new VideoFrameTable(properties.asScala.toMap)
}

object VideoFrameSource {
  val Schema: StructType = StructType(Seq(
    StructField("filename", StringType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("frame_per_sec", DoubleType, nullable = false),
    StructField("frame_total", DoubleType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("image", ArrayType(FloatType, containsNull = false))))

  private[sources] val VideoExts = Set("mkv", "avi", "mp4")

  /** Test observability: pixel decodes performed in this JVM. */
  val pixelDecodes = new java.util.concurrent.atomic.AtomicLong(0)

  /** Test observability: files whose frames were decoded (meta or pixel)
    * in this JVM — the counter that proves filename-filter pushdown
    * keeps filtered-out files from ever reaching a decoder.
    */
  val filesDecoded = new java.util.concurrent.atomic.AtomicLong(0)

  /** Filename-predicate compiler for pushed source filters: Some(pred)
    * only when `f` evaluates EXACTLY on the filename string. Exactness
    * is the safety requirement, not a nicety — a wrongly excluded file
    * can never be repaired by the residual Filter Spark re-applies, and
    * under `Not` an over-inclusive approximation would flip into a
    * wrong exclusion. Unknown shapes return None and simply don't
    * prune; the TOP-LEVEL filter array is a conjunction, so the caller
    * may prune with any exact subset of it.
    */
  private[sources] def filenamePredicate(
      f: org.apache.spark.sql.sources.Filter): Option[String => Boolean] = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo("filename", v: String) => Some(_ == v)
      case In("filename", vs) =>
        val set = vs.collect { case s: String => s }.toSet
        if (set.size == vs.length) Some(set) else None
      case StringStartsWith("filename", p) => Some(_.startsWith(p))
      case StringEndsWith("filename", s) => Some(_.endsWith(s))
      case StringContains("filename", s) => Some(_.contains(s))
      case IsNotNull("filename") => Some(_ => true) // listings never null
      case And(l, r) =>
        for (a <- filenamePredicate(l); b <- filenamePredicate(r))
          yield (n: String) => a(n) && b(n)
      case Or(l, r) =>
        for (a <- filenamePredicate(l); b <- filenamePredicate(r))
          yield (n: String) => a(n) || b(n)
      case Not(inner) => filenamePredicate(inner).map(p => (n: String) => !p(n))
      case _ => None
    }
  }
}

final class VideoFrameTable(properties: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String =
    s"videoframes(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = VideoFrameSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path"))
      .orElse(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException(
        "videoframes: .load(<dir>) path is required"))
    val sampleRateMs = Option(options.get("sampleRateMs"))
      .map(_.toLong).getOrElse(500L)
    // Driver-side metadata listing (filenames only, never bytes) through
    // the Hadoop FileSystem API, so any supported scheme works — local,
    // hdfs://, s3a://, gs:// — not just java.io.File. An unreadable or
    // missing directory is an error, not an empty scan: zero partitions
    // from a typo'd path is the silent failure mode at scale.
    // the session that is planning this scan — NOT SparkContext
    // .getOrCreate(), which would silently manufacture a fresh bare
    // context (wrong Hadoop conf) if somehow called with none active
    val hadoopConf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(hadoopConf)
    if (!fs.exists(fsPath)) throw new IllegalArgumentException(
      s"videoframes: path does not exist: $path")
    // listing is DEFERRED to build(), after filter pushdown, so a
    // filename-filtered read (a split- or file-scoped query) keeps only
    // matching files — filtered-out files never reach partition
    // planning, let alone a decoder
    val listFiles = (keep: String => Boolean) => fs.listStatus(fsPath)
      .filter(s => s.isFile &&
        VideoFrameSource.VideoExts(
          s.getPath.getName.split('.').last.toLowerCase))
      .map { s => // local paths stay plain; remote keep their scheme
        val uri = s.getPath.toUri
        if (uri.getScheme == null || uri.getScheme == "file") uri.getPath
        else s.getPath.toString
      }
      .filter(keep).sorted
    new VideoFrameScanBuilder(listFiles, sampleRateMs)
  }
}

final class VideoFrameScanBuilder(
    listFiles: (String => Boolean) => Array[String], sampleRateMs: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = VideoFrameSource.Schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var keep: String => Boolean = _ => true

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve our canonical field order; keep only requested fields
    required = StructType(
      VideoFrameSource.Schema.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  /** Filename filters prune the LISTING; everything (including what we
    * prune by) is returned as residual — Spark re-applies it post-scan,
    * so an exact prune costs one redundant row-level check while any
    * future predicate-shape surprise stays correct instead of silently
    * dropping rows.
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val compiled = filters.flatMap(f =>
      VideoFrameSource.filenamePredicate(f).map(f -> _))
    pushed = compiled.map(_._1)
    val preds = compiled.map(_._2)
    keep = n => preds.forall(_(n))
    filters // all residual; see scaladoc
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  override def build(): Scan = new VideoFrameScan(
    listFiles(keep), sampleRateMs, required, pushed)
}

final class VideoFrameScan(files: Array[String], sampleRateMs: Long,
    required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // BatchScanExec prints pushed filters only for built-in FileScans; a
  // custom scan surfaces them through its description, so .explain
  // evidence of listing-level pruning exists here too
  override def description(): String =
    s"videoframes PushedFilters: [${pushed.mkString(", ")}], " +
      s"files: ${files.length}"

  override def planInputPartitions(): Array[InputPartition] = {
    // same rule as getTable's listing: the ACTIVE session plans this
    // scan — SparkContext.getOrCreate() could manufacture a bare context
    val slices = math.max(1, math.min(files.length,
      org.apache.spark.sql.SparkSession.active
        .sparkContext.defaultParallelism))
    (0 until slices).map(i =>
      VideoFilesPartition(files.zipWithIndex.collect {
        case (f, j) if j % slices == i => f
      }): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VideoFrameReaderFactory(sampleRateMs, required.fieldNames)
}

final case class VideoFilesPartition(files: Array[String])
    extends InputPartition

final class VideoFrameReaderFactory(sampleRateMs: Long,
    fieldNames: Array[String]) extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[VideoFilesPartition].files
    new VideoFrameReader(files, sampleRateMs, fieldNames)
  }
}

/** Emits one InternalRow per sampled frame; pixel decode runs ONLY when
  * the pruned schema still contains `image`.
  */
final class VideoFrameReader(files: Array[String], sampleRateMs: Long,
    fieldNames: Array[String]) extends PartitionReader[InternalRow] {

  private val needImage = fieldNames.contains("image")
  // content-magic routing over the FILE head: real y4m / MJPEG-AVI
  // corpora decode for real through this source (pure JVM); everything
  // else takes the best decoder this JVM offers (JavaCV when present,
  // deterministic synthetic otherwise — the offline default)
  private val decoder: FrameDecoder = new graft.pipeline.AutoFrameDecoder()
  private val frames = files.iterator.flatMap { f =>
    VideoFrameSource.filesDecoded.incrementAndGet()
    val it =
      if (needImage) decoder.decode(f, null, sampleRateMs)
      else decoder.decodeMeta(f, null, sampleRateMs) // pruned: no pixels
    it.map(d => (f, d))
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!frames.hasNext) false
    else {
      val (f, d) = frames.next()
      val values = fieldNames.map {
        case "filename" => UTF8String.fromString(f)
        case "timestamp_ms" => d.timestampMs
        case "frame_per_sec" => d.framePerSec
        case "frame_total" => d.frameTotal
        case "height" => d.height
        case "width" => d.width
        case "image" =>
          VideoFrameSource.pixelDecodes.incrementAndGet()
          ArrayData.toArrayData(d.image)
      }
      current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
