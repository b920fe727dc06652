package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.Hll
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Windowed HLL registers over a stream ≡ the batch register table, and
  * the folded estimates track the exact per-window distinct counts.
  */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private val m = 64

  test("streamed per-window registers and estimates are identical to batch") {
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id").cast("string").as("user_id"),
        col("ts"))

    val dir = Files.createTempDirectory("hll_in").toString
    val ckpt = Files.createTempDirectory("hll_ckpt").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val streamed = StreamingHll.windowedRegisters(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      "user_id", "ts", "1 hour", m)
    val q = streamed.writeStream.format("memory").queryName("hll_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val gotRegs = spark.table("hll_stream")
      .select(col("window.start").cast("long").as("ws"), col("bucket"),
        col("reg"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap

    val h = Hll.hash(col("user_id"))
    val wantRegs = events
      .select(col("ts"), Hll.bucket(h, m).as("bucket"), Hll.rho(h, m).as("rho"))
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
      .select(col("window.start").cast("long").as("ws"), col("bucket"),
        col("reg"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap

    assert(wantRegs.nonEmpty)
    // append mode emits only watermark-closed windows: every emitted
    // window's register set must match batch exactly, and the ONLY
    // windows allowed to be missing are those whose end is past the
    // final watermark (max event time − 10 s) — however many that is
    assert(gotRegs.nonEmpty)
    gotRegs.foreach { case (ws, regs) =>
      assert(regs === wantRegs(ws), s"window $ws")
    }
    val maxMs = events.agg(max(unix_millis(col("ts")))).head.getLong(0)
    (wantRegs.keySet -- gotRegs.keySet).foreach { ws =>
      assert((ws + 3600L) * 1000L > maxMs - 10000L,
        s"closed window $ws was never emitted")
    }

    // the model-sized estimate fold (the foreachBatch half) is
    // bit-identical to folding the batch registers. (Accuracy is NOT
    // asserted per window here: these windows hold 1-5 distinct users
    // and the documented RAW estimator has its known ≈α·m small-range
    // floor there — HllSpec covers accuracy at a 10k cardinality.)
    val est = StreamingHll.estimated(spark.table("hll_stream"), m)
      .select(col("window.start").cast("long").as("ws"), col("est_milli"))
      .as[(Long, Long)].collect().toMap
    val batchRegs = events
      .select(col("ts"), Hll.bucket(h, m).as("bucket"), Hll.rho(h, m).as("rho"))
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
    val wantEst = Hll.estimate(batchRegs, m, col("window"))
      .select(col("window.start").cast("long").as("ws"), col("est_milli"))
      .as[(Long, Long)].collect().toMap
    assert(est.keySet === gotRegs.keySet)
    est.foreach { case (ws, e) =>
      assert(e === wantEst(ws), s"window $ws estimate")
    }
  }
}
