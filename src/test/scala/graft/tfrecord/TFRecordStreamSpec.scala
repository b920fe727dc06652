package graft.tfrecord

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.types._

/** Streaming TFRecord sink: a file stream of sample rows lands in the same
  * sharded {out}/data/dataset=… layout and reads back exactly.
  */
class TFRecordStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed micro-batches append TFRecord shards that read back exactly") {
    val inDir = Files.createTempDirectory("tfs_in").toString
    val outDir = Files.createTempDirectory("tfs_out").toString
    val ckpt = Files.createTempDirectory("tfs_ckpt").toString

    val rows = (0 until 30).map(i =>
      (s"v$i.mp4", s"l${i % 3}", if (i % 2 == 0) "train" else "val",
        Seq(0L, 500L), Seq(Seq(i.toFloat), Seq(i + 0.5f))))
    // two chunks → two micro-batches
    rows.take(15).toDF("filename", "label", "dataset", "timestamp_ms", "logits")
      .coalesce(1).write.parquet(s"$inDir/b0")
    rows.drop(15).toDF("filename", "label", "dataset", "timestamp_ms", "logits")
      .coalesce(1).write.parquet(s"$inDir/b1")

    val schema = StructType(Seq(
      StructField("filename", StringType),
      StructField("label", StringType),
      StructField("dataset", StringType),
      StructField("timestamp_ms", ArrayType(LongType)),
      StructField("logits", ArrayType(ArrayType(FloatType)))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")

    val q = TFRecords.writeStream(stream, outDir, numShards = 2, ckpt).start()
    try q.processAllAvailable() finally q.stop()

    val readSchema = StructType(schema.filterNot(_.name == "dataset"))
    val back = TFRecords.read(spark, outDir, readSchema)
      .select("filename", "label", "dataset", "timestamp_ms", "logits")
      .as[(String, String, String, Seq[Long], Seq[Seq[Float]])]
      .collect().toSet
    assert(back === rows.toSet)
    // per-split directories, multiple shard files per split
    val splits = new java.io.File(s"$outDir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(splits.toSeq === Seq("dataset=train", "dataset=val"))
  }
}
