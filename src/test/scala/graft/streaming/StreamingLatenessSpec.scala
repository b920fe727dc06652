package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Batch ≡ streaming for the lateness scorer: the foreachBatch form
  * (state = one long) must reproduce the batch bucketed-watermark lineage
  * row-for-row when micro-batches align with arrival buckets — and the
  * registered ev_lateness query must be exactly the shared definition's
  * 1-minute instantiation.
  */
class StreamingLatenessSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def arrivals = Tables.events(spark, sfDir)
    .select(col("event_id"), col("event_type"), col("ems"),
      graft.queries.Events.arrivalMs.as("arr_ms"))

  test("scoreBatch over bucket-aligned micro-batches ≡ batchReference") {
    // the spec's OWN arrival synthesis, heavier than production's: a 6 h
    // jitter over 1-day buckets gives ~30 micro-batches (fast replay)
    // with real disorder (54 late events at sf0.001) — the production
    // 30-min jitter only misorders at this bucket width near boundaries,
    // which would leave the disorder branch untested
    val a = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("ems"),
        (col("ems") + pmod(conv(substring(md5(concat(lit("specarr|"),
          col("event_id")).cast("binary")), 1, 15), 16, 10).cast("long"),
          lit(21600000L))).as("arr_ms"))
      .cache()
    try {
      val bucketMs = 24L * 3600 * 1000
      val expected = StreamingLateness.batchReference(a, bucketMs)
        .select(col("event_id"), col("late_ms")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      val inDir = Files.createTempDirectory("late_in").toString
      val ckpt = Files.createTempDirectory("late_ckpt").toString
      val buckets = a.withColumn("bucket", expr(s"arr_ms div $bucketMs"))
        .select(col("bucket")).distinct().collect().map(_.getLong(0)).sorted
      assert(buckets.length > 20, s"degenerate bucketing: ${buckets.length}")
      // one file per arrival bucket, written in arrival order so the file
      // source (oldest-first) replays them as ordered micro-batches
      buckets.zipWithIndex.foreach { case (b, i) =>
        a.withColumn("bucket", expr(s"arr_ms div $bucketMs"))
          .filter(col("bucket") === b).drop("bucket")
          .coalesce(1).write.parquet(f"$inDir/b$i%03d")
        Thread.sleep(3) // strictly increasing mtimes → deterministic order
      }

      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("ems", LongType), StructField("arr_ms", LongType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")

      val wm = new AtomicLong(StreamingLateness.NoWatermark)
      val got = collection.mutable.Map.empty[Long, Long]
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingLateness.scoreBatch(batch, wm)
            .select(col("event_id"), col("late_ms")).collect()
            .foreach(r => got.synchronized {
              got(r.getLong(0)) = r.getLong(1)
            })
          // advance only after the "write" (the collect above) succeeded —
          // the retry-idempotence contract
          StreamingLateness.advance(batch, wm)
        }.start()
      try q.processAllAvailable() finally q.stop()

      assert(got.size === expected.size)
      val diff = expected.collect {
        case (id, l) if got.get(id) != Some(l) => (id, l, got.get(id))
      }
      assert(diff.isEmpty, s"first mismatches: ${diff.take(5)}")
      // the stream must have seen genuine disorder, else the twin proves
      // nothing (first-batch rows score 0 by definition)
      assert(got.valuesIterator.count(_ > 0) > 0)
    } finally a.unpersist()
  }

  test("retry-safe: score is pure until advance; advance is idempotent") {
    import spark.implicits._
    val wm = new AtomicLong(StreamingLateness.NoWatermark)
    val b1 = Seq((1L, "a", 100L), (2L, "a", 50L))
      .toDF("event_id", "event_type", "ems")
    def score(b: org.apache.spark.sql.DataFrame) =
      StreamingLateness.scoreBatch(b, wm)
        .select(col("event_id"), col("late_ms"))
        .as[(Long, Long)].collect().toMap
    // first batch: no prior watermark, all rows score 0
    assert(score(b1) === Map(1L -> 0L, 2L -> 0L))
    // a failed-write RETRY re-scores identically (nothing advanced)
    assert(score(b1) === Map(1L -> 0L, 2L -> 0L))
    StreamingLateness.advance(b1, wm)
    val w1 = wm.get()
    assert(w1 === 100L)
    // replaying an already-advanced batch is a no-op (monotone max)
    StreamingLateness.advance(b1, wm)
    assert(wm.get() === w1)
    // the next batch scores against the committed watermark
    val b2 = Seq((3L, "a", 60L), (4L, "a", 300L))
      .toDF("event_id", "event_type", "ems")
    assert(score(b2) === Map(3L -> 40L, 4L -> 0L))
  }

  test("ev_lateness ≡ sizingTable ∘ batchReference at 1-minute buckets") {
    val viaShared = StreamingLateness.sizingTable(
        StreamingLateness.batchReference(
          arrivals.drop("event_id"), 60000L))
      .collect().map(_.toSeq).toSet
    val registered = SparkEntry.queries("ev_lateness")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(registered === viaShared)
  }
}
