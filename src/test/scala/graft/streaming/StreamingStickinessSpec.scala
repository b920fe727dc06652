package graft.streaming

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Batch ≡ streaming for the DAU/WAU stickiness table — and, because the
  * only state transition is an OR-merge, the equality must hold even on a
  * SHUFFLED replay (no event-time ordering requirement at all), plus
  * under at-least-once re-delivery.
  */
class StreamingStickinessSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("shuffled micro-batch ingest ≡ ev_stickiness; replay is a no-op") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ems")).cache()
    try {
      val expected = SparkEntry.queries("ev_stickiness")(spark, sfDir)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

      // replay sliced by USER-ID hash, not by time — deliberately out of
      // event-time order to prove the no-ordering-caveat claim
      val inDir = Files.createTempDirectory("stick_in").toString
      val ckpt = Files.createTempDirectory("stick_ckpt").toString
      (0 until 8).foreach { b =>
        e.filter(pmod(col("user_id"), lit(8)) === b)
          .coalesce(1).write.parquet(f"$inDir/b$b%03d")
        Thread.sleep(3)
      }

      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ems", LongType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
      val st = new StreamingStickiness.State(64)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingStickiness.ingestBatch(batch, st)
        }.start()
      try q.processAllAvailable() finally q.stop()

      def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val got = asMap(StreamingStickiness.report(st, spark))
      assert(got === expected)
      assert(got.nonEmpty)
      // at-least-once: re-delivering a batch must not change the table
      StreamingStickiness.ingestBatch(
        spark.read.parquet(f"$inDir/b000"), st)
      assert(asMap(StreamingStickiness.report(st, spark)) === expected)
    } finally e.unpersist()
  }
}
