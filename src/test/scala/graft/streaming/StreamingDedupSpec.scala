package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup keeps one row per normalized text") {
    val inDir = Files.createTempDirectory("dedup_in").toString
    val ckpt = Files.createTempDirectory("dedup_ckpt").toString
    val docs = Seq(
      (1L, "The quick Brown fox", 1000L),
      (2L, "the quick brown fox", 2000L), // dup of 1 after normalization
      (3L, "a different document", 3000L),
      (4L, "THE QUICK BROWN FOX!", 4000L) // dup again
    ).toDF("doc_id", "text", "ems")
      .withColumn("event_time", timestamp_millis(col("ems")))
    docs.coalesce(1).write.parquet(s"$inDir/b0")

    val stream = spark.readStream.schema(docs.schema).parquet(s"$inDir/*")
    val q = StreamingDedup(stream, "1 second").writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val kept = spark.table("dedup_stream")
        .select("doc_id").as[Long].collect().toSet
      assert(kept === Set(1L, 3L)) // first-seen survives per hash
    } finally q.stop()
  }
}
