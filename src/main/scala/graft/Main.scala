package graft

import graft.pipeline._
import graft.tfrecord.TFRecords
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end pipeline composition — the Spark-native `build_pipeline`
  * (reference: preprocess.py:371-416): listing → extension filter → label →
  * split → frame decode → batched embedding → sample assembly → shuffled
  * sharded TFRecord sink with per-split directories.
  *
  * The stages are the library pieces (Ingest/Frames/Embed/Samples/
  * TFRecords) glued in one lineage; Catalyst sees a single plan, so column
  * pruning reaches the decode (the wide `image` column dies inside
  * Embed.run, before the sample-assembly shuffle).
  */
object Main {

  sealed trait Mode
  case object SingleFrame extends Mode
  case object FullVideo extends Mode
  case object CropVideo extends Mode

  final case class Config(
      mode: Mode = FullVideo,
      sampleRateMs: Long = 500,
      batchSize: Int = 16,
      embeddingDim: Int = 64,
      sequenceLengthMs: Long = 2000,
      periodMs: Long = 500,
      numShards: Int = 4,
      seed: Long = 42L)

  /** files(filename) → TFRecords under `{outputDir}/data/{dataset=…}`. */
  def run(files: DataFrame, outputDir: String,
      cfg: Config = Config()): Unit = {
    val prepared = Ingest.splitByHash(
      Ingest.withLabel(Ingest.filterVideos(files)), 0.70, 0.15, 0.15)
    val frames = Frames.extract(prepared,
      new SyntheticFrameDecoder(), cfg.sampleRateMs)
    val embedded = Embed.run(frames,
      new HashEmbedder(cfg.embeddingDim), cfg.batchSize).toDF()
    val listCols = Seq("timestamp_ms", "logits")
    val samples = cfg.mode match {
      case SingleFrame => Samples.singleFrame(embedded, listCols)
      case FullVideo => Samples.fullVideo(embedded, listCols)
      case CropVideo => Samples.cropVideo(embedded, listCols,
        cfg.sequenceLengthMs, cfg.periodMs)
    }
    TFRecords.write(samples, outputDir, cfg.numShards, cfg.seed)
  }

  /** Data schema of the written samples (without the partition column). */
  def sampleSchema(mode: Mode): StructType = {
    val ctx = Seq(
      StructField("filename", StringType),
      StructField("label", StringType),
      StructField("frame_per_sec", DoubleType),
      StructField("frame_total", DoubleType),
      StructField("timestamp_ms", ArrayType(LongType)),
      StructField("logits", ArrayType(ArrayType(FloatType))))
    mode match {
      case CropVideo => StructType(
        StructField("window_start", LongType) +:
          StructField("window_end", LongType) +: ctx)
      case _ => StructType(ctx)
    }
  }

  /** Fixture-derived file listing (same synthesis as queries.Reference:
    * each document becomes `videos/<lang>/<source>/doc_<id>.<ext>`).
    */
  def fixtureListing(spark: SparkSession, sfDir: String): DataFrame = {
    val exts = Seq("mp4", "mkv", "avi", "webm", "txt")
    Tables(spark, sfDir, "documents").select(
      concat(lit("videos/"), col("lang"), lit("/"), col("source"),
        lit("/doc_"), col("doc_id"), lit("."),
        element_at(array(exts.map(lit): _*),
          (col("doc_id") % 5 + 1).cast("int"))).as("filename"))
  }

  /** Flagship smoke: full pipeline over the sf listing into a temp dir,
    * returning the decoded samples (driver checks rows > 0).
    */
  def smoke(spark: SparkSession, sfDir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_main").toString
    run(fixtureListing(spark, sfDir), out)
    TFRecords.read(spark, out, sampleSchema(FullVideo))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_out").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(fixtureListing(spark, sfDir), outDir)
    val n = TFRecords.read(spark, outDir, sampleSchema(FullVideo)).count()
    println(s"[main] wrote $n samples to $outDir/data")
    spark.stop()
  }
}
