package graft.streaming

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Batch ≡ streaming for the bitmap retention grid: folding event-time-
  * ordered micro-batches into the three-bitmap state must yield exactly
  * the grid ev_bitmap_retention computes from full history.
  */
class StreamingBitmapRetentionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ordered micro-batch ingest ≡ ev_bitmap_retention's grid") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ems")).cache()
    try {
      val expected = SparkEntry.queries("ev_bitmap_retention")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap

      // replay in event-time order, one file per ~2-day slice
      val inDir = Files.createTempDirectory("bmret_in").toString
      val ckpt = Files.createTempDirectory("bmret_ckpt").toString
      val sliceMs = 2L * 24 * 3600 * 1000
      val slices = e.select(expr(s"ems div $sliceMs").as("s")).distinct()
        .collect().map(_.getLong(0)).sorted
      assert(slices.length > 5)
      slices.zipWithIndex.foreach { case (sl, i) =>
        e.filter(expr(s"ems div $sliceMs") === sl)
          .coalesce(1).write.parquet(f"$inDir/b$i%03d")
        Thread.sleep(3)
      }

      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ems", LongType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
      val st = new StreamingBitmapRetention.State(64)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingBitmapRetention.ingestBatch(batch, st)
        }.start()
      try q.processAllAvailable() finally q.stop()

      val got = StreamingBitmapRetention.grid(st, spark).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(got === expected)
      assert(got.nonEmpty)
      // replaying the last slice again must not change the grid
      // (OR-merge idempotence — the at-least-once contract)
      val last = spark.read.parquet(f"$inDir/b${slices.length - 1}%03d")
      StreamingBitmapRetention.ingestBatch(last, st)
      val replayed = StreamingBitmapRetention.grid(st, spark).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(replayed === expected)
    } finally e.unpersist()
  }
}
