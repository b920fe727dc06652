package graft.streaming

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Batch ≡ streaming for the CUSUM monitor: additive count state folded
  * under the foreachBatch batchId discipline must reproduce ev_cusum's
  * table bit-for-bit on a replay sliced by USER hash (not time — addition
  * commutes, so no ordering requirement), and re-applying a committed
  * batch id must be a no-op.
  */
class StreamingCusumSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("hash-sliced micro-batch ingest ≡ ev_cusum; committed replay is a no-op") {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ems"), col("user_id")).cache()
    try {
      def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
      val expected = asMap(
        SparkEntry.queries("ev_cusum")(spark, sfDir)
          .select("event_type", "day", "n", "mean_milli", "cusum",
            "is_shift"))

      val inDir = Files.createTempDirectory("cusum_in").toString
      val ckpt = Files.createTempDirectory("cusum_ckpt").toString
      (0 until 6).foreach { b =>
        e.filter(pmod(col("user_id"), lit(6)) === b)
          .select(col("event_type"), col("ems"))
          .coalesce(1).write.parquet(f"$inDir/b$b%03d")
        Thread.sleep(3)
      }

      val schema = StructType(Seq(StructField("event_type", StringType),
        StructField("ems", LongType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
      val st = new StreamingCusum.State
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            StreamingCusum.ingestBatch(batch, id, st)
        }.start()
      try q.processAllAvailable() finally q.stop()

      val got = asMap(StreamingCusum.report(st, spark))
      assert(got === expected)
      assert(got.nonEmpty)
      // at-least-once: re-delivering an already-committed batch id must
      // not double-count
      StreamingCusum.ingestBatch(
        spark.read.parquet(f"$inDir/b000")
          .select(col("event_type"), col("ems")),
        st.lastBatch, st)
      assert(asMap(StreamingCusum.report(st, spark)) === expected)

      // one state, two reports: the seasonal-naive backtest off the same
      // counts must equal ev_forecast row-for-row
      def fMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toMap
      val fExpected = fMap(SparkEntry.queries("ev_forecast")(spark, sfDir)
        .select("event_type", "n_days", "mae_milli", "bias_milli",
          "mape_pm"))
      assert(fMap(StreamingCusum.forecastReport(st, spark)) === fExpected)
      assert(fExpected.nonEmpty)
    } finally e.unpersist()
  }
}
