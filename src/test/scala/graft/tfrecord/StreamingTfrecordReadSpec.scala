package graft.tfrecord

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The tfrecord FileFormat as a STREAMING source — the read-side
  * completion of the O20 surface: because the sink is a real
  * `FileFormat`, Structured Streaming's file source drives it with no
  * extra code, so a directory of TFRecord shards written by one
  * pipeline incarnation can be tailed as a stream by the next (the
  * retrain-on-new-shards loop). Proves micro-batched stream reads ≡
  * the batch read row-for-row, including shards that arrive after the
  * stream starts.
  */
class StreamingTfrecordReadSpec extends SparkSpec {
  import spark.implicits._

  test("readStream over a growing tfrecord dir equals the batch read") {
    val dir = Files.createTempDirectory("tfrec_stream").toString
    val ckpt = Files.createTempDirectory("tfrec_stream_ckpt").toString
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("n", LongType),
      StructField("score", FloatType)))

    def writeShard(rows: Seq[(String, Long, Float)], sub: String): Unit =
      rows.toDF("name", "n", "score").coalesce(1)
        .write.format("tfrecord").option("recordType", "Example")
        .save(s"$dir/$sub")

    writeShard(Seq(("a.mp4", 1L, 0.5f), ("b.mp4", 2L, 1.5f)), "s0")

    val stream = spark.readStream.schema(schema).format("tfrecord")
      .option("recordType", "Example")
      .option("maxFilesPerTrigger", "1")
      .load(s"$dir/*")
      .withColumn("n2", col("n") * 2) // a transform rides the stream
    val q = stream.writeStream.format("memory").queryName("tfrec_stream")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // a shard arriving AFTER the stream started is picked up too
      writeShard(Seq(("c.mp4", 3L, 2.5f)), "s1")
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("tfrec_stream")
      .select(col("name"), col("n"), col("score"), col("n2"))
      .as[(String, Long, Float, Long)].collect().toSet
    val want = spark.read.schema(schema).format("tfrecord")
      .option("recordType", "Example").load(s"$dir/*")
      .withColumn("n2", col("n") * 2)
      .select(col("name"), col("n"), col("score"), col("n2"))
      .as[(String, Long, Float, Long)].collect().toSet
    assert(want.size === 3)
    assert(got === want)
  }
}
