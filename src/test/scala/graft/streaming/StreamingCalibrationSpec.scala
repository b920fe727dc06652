package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The streamed reliability card's cumulative per-bucket counters must
  * equal the batch `Text.calibrationOf` over the same rows under an
  * arbitrary micro-batch slicing — and both must coincide with the
  * oracle-gated txt_calibration when fed the fixture's own scores.
  */
class StreamingCalibrationSpec extends SparkSpec {

  test("streamed calibration card equals the batch card (and the query)") {
    val sfDir = "/root/testdata/sf0.001"
    // the deployed model: trained batch-side, held fixed by the monitor
    val feats = graft.queries.Text
      .lrFeatures(graft.Tables(spark, sfDir, "documents")).cache()
    val w = graft.queries.Text.lrTrain(feats)
    val scored = feats.select(col("y").cast("long").as("yy"),
      round(graft.queries.Text.lrScore(w) * 1000).cast("long")
        .as("s_milli"))

    val dir = Files.createTempDirectory("cal_in").toString
    val ckpt = Files.createTempDirectory("cal_ckpt").toString
    // an arbitrary 3-way slicing — bucket counters must not care
    scored.filter(col("s_milli") % 3 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    scored.filter(col("s_milli") % 3 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")
    scored.filter(col("s_milli") % 3 === 2).coalesce(1)
      .write.parquet(s"$dir/b2")

    val stream = spark.readStream.schema(scored.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = StreamingCalibration.card(stream)
      .writeStream.format("memory").queryName("cal_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("mean_score_milli"),
          r.getAs[Long]("pos_rate_milli"), r.getAs[Long]("gap_milli"))
    val got = spark.table("cal_stream").collect().map(key).toMap
    val want = graft.queries.Text.calibrationOf(scored)
      .collect().map(key).toMap
    assert(got === want)
    // and the monitor over the fixture scores IS the batch query's card
    val query = graft.SparkEntry.queries("txt_calibration")(spark, sfDir)
      .collect().map(key).toMap
    assert(got === query)
    assert(got.nonEmpty && got.size <= 100) // bounded state, by key domain
  }
}
