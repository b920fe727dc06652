package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** flatMapGroupsWithState sessionization: batch ≡ streaming on the events
  * fixture, plus unit coverage of the merge fold.
  */
class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSession.Sess

  test("merge folds time-sorted runs with the batch gap rule (> splits)") {
    val g = 10L
    // == gap merges, > gap splits; aggregates add up
    val got = StreamingSession.merge(Seq(
      Sess(0, 0, 1, 100), Sess(10, 10, 1, 50), // 10-0 == gap → merge
      Sess(21, 21, 1, 25), // 21-10 > gap → new
      Sess(25, 25, 1, 5)), g)
    assert(got === List(Sess(0, 10, 2, 150), Sess(21, 25, 2, 30)))
    // chain of bridging events merges two previously-open sessions
    val bridged = StreamingSession.merge(
      Seq(Sess(0, 5, 2, 10), Sess(30, 35, 2, 20),
        Sess(15, 15, 1, 1), Sess(25, 25, 1, 2)), g)
    assert(bridged === List(Sess(0, 35, 6, 33)))
  }

  test("a quiet user's session closes via event-time TIMEOUT alone") {
    // user 1 appears only in chunk 0; only other users' later events
    // advance the watermark, so user 1's session can emit solely through
    // the group timeout — the path a per-batch fold never reaches.
    // (Times sit well above epoch 0: Spark's stateful late-row filter
    // drops an event AT the initial watermark value, so an ems=0 event
    // vanishes — an epoch-boundary artifact, not a session-logic one.)
    val inDir = Files.createTempDirectory("sess_to").toString
    val ckpt = Files.createTempDirectory("sess_to_ckpt").toString
    val gap = 1000L
    def chunk(rows: Seq[(Long, Long, Double)], name: String): Unit =
      rows.toDF("user_id", "ems", "value")
        .withColumn("ts", timestamp_millis(col("ems")))
        .select("user_id", "ts", "ems", "value")
        .coalesce(1).write.parquet(s"$inDir/$name")
    chunk(Seq((1L, 10000L, 1.0), (1L, 10500L, 2.0), (2L, 10100L, 9.0)), "b0")
    chunk(Seq((2L, 15000L, 9.0)), "b1") // watermark → 15000 > 10500+gap
    chunk(Seq((2L, 19000L, 9.0)), "b2") // extra batch to fire the timer

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("ems",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
    val q = StreamingSession(stream, gap)
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess_timeout")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      // user 1's merged session emitted despite user 1 never reappearing
      assert(got.contains((1L, 10000L, 10500L, 2L, 3.0)), got.toString)
    } finally q.stop()
  }

  test("sessionization: batch ≡ streaming on the events fixture") {
    val sfDir = "/root/testdata/sf0.001"
    val gap = 1800000L
    val events = Tables.events(spark, sfDir)
      .select("user_id", "ts", "ems", "value").cache()

    val inDir = Files.createTempDirectory("sess_stream").toString
    val ckpt = Files.createTempDirectory("sess_ckpt").toString
    val Array(q1, q2) = events.stat
      .approxQuantile("ems", Array(0.33, 0.66), 0.001)
    events.filter(col("ems") <= q1.toLong)
      .coalesce(1).write.parquet(s"$inDir/b0")
    events.filter(col("ems") > q1.toLong && col("ems") <= q2.toLong)
      .coalesce(1).write.parquet(s"$inDir/b1")
    events.filter(col("ems") > q2.toLong)
      .coalesce(1).write.parquet(s"$inDir/b2")

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$inDir/*")
    val q = StreamingSession(stream, gap)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_stream")
        .as[(Long, Long, Long, Long, Double)].collect().toSet

      // batch truth: the ev_sessionize lineage shaped to the same schema
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ems"))
      val batch = events
        .withColumn("prev", lag(col("ems"), 1).over(byUser))
        .withColumn("new_s", when(col("prev").isNull ||
          col("ems") - col("prev") > gap, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(byUser.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ems")).as("start_ms"), max(col("ems")).as("end_ms"),
          count(lit(1)).as("n_events"),
          (sum(round(col("value") * 100).cast("long")) / 100.0)
            .as("sum_value"))
        .select(col("user_id"), col("start_ms"), col("end_ms"),
          col("n_events"), col("sum_value"))
        .as[(Long, Long, Long, Long, Double)].collect().toSet

      assert(streamed.nonEmpty)
      // everything emitted matches a batch session exactly
      assert(streamed.subsetOf(batch),
        s"streaming emitted non-batch sessions: ${streamed.diff(batch).take(3)}")
      // completeness for every session closable by the second chunk's
      // watermark (guaranteed applied while the third chunk processed)
      val mustHave = batch.filter(s => s._3 + gap <= q2.toLong)
      assert(mustHave.nonEmpty)
      assert(mustHave.subsetOf(streamed),
        s"missing closed sessions: ${mustHave.diff(streamed).take(3)}")
    } finally {
      q.stop()
      events.unpersist()
    }
  }
}
