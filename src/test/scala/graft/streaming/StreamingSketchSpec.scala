package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.CountMinSketch
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Windowed count-min over a stream ≡ the batch windowed grid, and the
  * finished grids give correct (never-under) frequency estimates.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-window CMS grids are bit-identical to batch") {
    val d = 4; val w = 64
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("ts"))

    val dir = Files.createTempDirectory("cms_in").toString
    val ckpt = Files.createTempDirectory("cms_ckpt").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val streamed = StreamingSketch.windowedCountMin(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      "event_type", "ts", "1 hour", d, w)
    val q = streamed.writeStream.format("memory").queryName("cms_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("cms_stream")
      .select(col("window.start").cast("long").as("ws"), col("grid"))
      .as[(Long, Seq[Long])].collect().toMap

    val cm = udaf(new CountMinSketch(d, w))
    val want = events
      .select(col("ts"),
        CountMinSketch.bucketCols(col("event_type"), d, w).as("b"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(cm(col("b")).as("grid"))
      .select(col("window.start").cast("long").as("ws"), col("grid"))
      .as[(Long, Seq[Long])].collect().toMap

    assert(want.nonEmpty)
    // append mode emits only watermark-closed windows; every emitted
    // window must match the batch grid exactly, and most windows close
    assert(got.nonEmpty && got.size >= want.size - 1)
    got.foreach { case (ws, grid) => assert(grid === want(ws), s"window $ws") }

    // estimates from a closed window never underestimate the true count
    val someWs = got.keys.min
    val trueCounts = events
      .filter(window(col("ts"), "1 hour")("start").cast("long") === someWs)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    val grid = got(someWs)
    trueCounts.foreach { case (et, n) =>
      val est = (0 until d).map { j =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$j|$et".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        val b = (java.lang.Long.parseLong(hex, 16) % w).toInt
        grid(j * w + b)
      }.min
      assert(est >= n, s"$et underestimated: $est < $n")
    }
  }
}
