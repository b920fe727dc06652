package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The streaming DDSketch state ≡ the batch q28_ddsketch table
  * bit-for-bit, on a deliberately HASH-sliced replay (addition commutes
  * — no ordering requirement), plus the additive-state exactly-once
  * guard: replaying a committed batch id changes nothing.
  */
class StreamingDdsketchSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def feed = Tables(spark, sfDir, "lineitem")
    .select(col("l_returnflag").as("flag"), col("l_orderkey"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select(col("flag"), col("q"), col("est_bucket"), col("n"),
      col("n_buckets"))
    .as[(String, Int, Long, Long, Long)].collect().toSet

  test("hash-sliced replay reproduces the batch table bit-for-bit") {
    val st = new StreamingDdsketch.State
    // slice by ORDER KEY hash — interleaves flags and magnitudes, the
    // opposite of any natural arrival order
    (0 until 4).foreach { i =>
      StreamingDdsketch.ingestBatch(
        feed.filter(pmod(xxhash64(col("l_orderkey")), lit(4)) === i), i, st)
    }
    val got = rows(StreamingDdsketch.report(st, spark))
    val want = rows(graft.SparkEntry.queries("q28_ddsketch")(spark, sfDir))
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("replaying a committed batch id is a no-op") {
    val st = new StreamingDdsketch.State
    StreamingDdsketch.ingestBatch(feed, 0, st)
    val before = rows(StreamingDdsketch.report(st, spark))
    StreamingDdsketch.ingestBatch(feed, 0, st) // at-least-once re-delivery
    assert(rows(StreamingDdsketch.report(st, spark)) === before)
  }
}
