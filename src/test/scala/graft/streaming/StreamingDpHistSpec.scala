package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The streaming DP-histogram state ≡ the batch dq_dp_hist release
  * bit-for-bit on a hash-sliced replay (counts add, noise is a pure
  * function of the type name — so converged counts mean a converged
  * RELEASE, the reproducibility the seeded-noise design exists for),
  * plus the additive-state exactly-once guard and the closed-form
  * noise identity against the engine-side computation.
  */
class StreamingDpHistSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def feed = Tables.events(spark, sfDir)
    .select(col("event_id"), col("event_type"))

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select(col("event_type"), col("n"), col("epsilon_micro"),
      col("noise_micro"), col("dp_n_micro"))
    .as[(String, Long, Long, Long, Long)].collect().toSet

  test("hash-sliced replay reproduces the batch DP release bit-for-bit") {
    val st = new StreamingDpHist.State
    // slice by EVENT ID hash — interleaves types, the opposite of any
    // natural arrival order (addition commutes, so it must not matter)
    (0 until 4).foreach { i =>
      StreamingDpHist.ingestBatch(
        feed.filter(pmod(xxhash64(col("event_id")), lit(4)) === i), i, st)
    }
    val got = rows(StreamingDpHist.report(st, spark))
    val want = rows(graft.SparkEntry.queries("dq_dp_hist")(spark, sfDir))
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("replaying a committed batch id is a no-op") {
    val st = new StreamingDpHist.State
    StreamingDpHist.ingestBatch(feed, 0, st)
    val before = rows(StreamingDpHist.report(st, spark))
    StreamingDpHist.ingestBatch(feed, 0, st) // at-least-once re-delivery
    assert(rows(StreamingDpHist.report(st, spark)) === before)
  }

  test("driver-side noise equals the engine-side chain for every type") {
    // the same identity Round12OpsInvariantsSpec proves for the batch
    // query, here pinned against the STREAMING module's shared helper —
    // if either side's chain drifts (salt, scale, quantization), the
    // bit-equality test above fails loudly, and this one names WHERE
    val engine = graft.SparkEntry.queries("dq_dp_hist")(spark, sfDir)
      .select(col("event_type"), col("noise_micro"))
      .as[(String, Long)].collect()
    assert(engine.nonEmpty)
    engine.foreach { case (t, noise) =>
      assert(StreamingDpHist.noiseMicro(t) === noise, s"type $t")
    }
  }
}
