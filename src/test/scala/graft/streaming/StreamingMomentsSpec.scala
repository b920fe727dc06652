package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The streaming moments sketch: (1) windowed sketch rows maintained over
  * a stream are bit-identical to the batch aggregation, and (2) the
  * MERGEABILITY law — window sketches merged by addition fold to exactly
  * the global ev_moments_quantile estimates, bit for bit. (2) is the
  * property that makes the sketch the 100 TB quantile primitive: a daily
  * sketch table rolls up to any grain without re-reading raw data.
  */
class StreamingMomentsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed windowed sketches ≡ batch; merged fold ≡ ev_moments_quantile") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))

    val dir = Files.createTempDirectory("mom_in").toString
    val ckpt = Files.createTempDirectory("mom_ckpt").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val streamed = StreamingMoments.windowedSketch(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      "value", "ts", "1 day")
    val q = streamed.writeStream.format("memory").queryName("mom_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[org.apache.spark.sql.Row]("window")
        .getAs[java.sql.Timestamp]("start").getTime,
        r.getAs[String]("event_type"))
    def state(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n"), r.getAs[Long]("s1i"), r.getAs[Long]("s2i"),
        r.getAs[Long]("s3i"), r.getAs[Long]("s4i"))

    val aggs = StreamingMoments.sketchAggs(col("value"))
    val wantRows = events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val want = wantRows.map(r => key(r) -> state(r)).toMap
    val got = spark.table("mom_stream").collect()
      .map(r => key(r) -> state(r)).toMap
    assert(want.nonEmpty && got.nonEmpty)
    // append mode emits watermark-closed windows; every emitted window
    // must match batch exactly, and only past-watermark windows may lag
    got.foreach { case (k, st) => assert(st === want(k), s"window $k") }
    val maxMs = events.agg(max(unix_millis(col("ts")))).head.getLong(0)
    (want.keySet -- got.keySet).foreach { case (ws, et) =>
      assert(ws + 86400000L > maxMs - 10000L,
        s"closed window ($ws, $et) was never emitted")
    }

    // mergeability: window sketches → per-type global sums → CF fold
    // must reproduce the batch query's estimates BIT FOR BIT
    val merged = StreamingMoments.quantiles(
      StreamingMoments.merge(
        spark.createDataFrame(
          spark.sparkContext.parallelize(wantRows.toIndexedSeq),
          wantRows.head.schema),
        col("event_type")))
      .select(col("event_type"), col("n"), col("mean"), col("std"),
        col("q50_est"), col("q95_est"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val batch = SparkEntry.queries("ev_moments_quantile")(spark, sfDir)
      .select(col("event_type"), col("n"), col("mean"), col("std"),
        col("q50_est"), col("q95_est"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(batch.keySet === merged.keySet)
    batch.foreach { case (et, row) => assert(merged(et) === row, et) }
  }
}
