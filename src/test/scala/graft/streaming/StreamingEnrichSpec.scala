package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: purchases enriched with each click in the
  * preceding hour, asserted EXACTLY equal to the batch inequality join.
  * Time-ordered chunks + the min-watermark policy guarantee no match is
  * evicted before its partner arrives, so inner-join results are complete.
  */
class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("stream-stream interval join ≡ batch inequality join") {
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts", "ems").cache()
    val hourMs = 3600000L

    def sides(df: DataFrame): (DataFrame, DataFrame) = (
      df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          col("ts").as("p_ts")),
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts")))

    // three time-ordered chunks per side
    val dirs = Seq("p", "c").map(s =>
      s -> Files.createTempDirectory(s"enrich_$s").toString).toMap
    val ckpt = Files.createTempDirectory("enrich_ckpt").toString
    val Array(q1, q2) = events.stat
      .approxQuantile("ems", Array(0.33, 0.66), 0.001)
    val (bp, bc) = sides(events)
    Seq((bp, "p"), (bc, "c")).foreach { case (df, tag) =>
      val t = if (tag == "p") "p_ts" else "c_ts"
      df.filter(unix_millis(col(t)) <= q1.toLong)
        .coalesce(1).write.parquet(s"${dirs(tag)}/b0")
      df.filter(unix_millis(col(t)) > q1.toLong &&
          unix_millis(col(t)) <= q2.toLong)
        .coalesce(1).write.parquet(s"${dirs(tag)}/b1")
      df.filter(unix_millis(col(t)) > q2.toLong)
        .coalesce(1).write.parquet(s"${dirs(tag)}/b2")
    }

    def stream(tag: String, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"${dirs(tag)}/*")

    val joined = StreamingEnrich.intervalJoin(
      stream("p", bp.schema), stream("c", bc.schema),
      "p_user", "c_user", "p_ts", "c_ts",
      lowerMs = hourMs, upperMs = 0L, delay = "0 seconds")
    val q = joined.select("p_id", "c_id")
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_stream")
        .as[(Long, Long)].collect().toSet
      val batch = bp.join(bc,
          col("p_user") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"))
        .select("p_id", "c_id").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally {
      q.stop()
      events.unpersist()
    }
  }
}
