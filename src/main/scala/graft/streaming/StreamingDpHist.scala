package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Online ε-differentially-private histogram — the streaming twin of
  * `dq_dp_hist` (queries/Relational.scala): per-type event counts
  * maintained incrementally, with the seeded Laplace noise applied at
  * REPORT time. The noise is a pure function of the type name (the
  * salted-md5 draw through the exact inverse CDF), not of the count or
  * the arrival order — so once the streamed counts equal the batch
  * counts, the DP release is bit-identical too, which is exactly the
  * reproducible-release property the batch query's seeded-noise design
  * buys. State is |types| longs, forever.
  *
  * Counts merge ADDITIVELY (the StreamingCusum/StreamingDdsketch
  * contract), so the fold takes the foreachBatch `batchId` and skips
  * committed replays; within that contract the state is slicing- and
  * order-invariant, which StreamingDpHistSpec proves on a hash-sliced
  * replay against the batch query bit-for-bit.
  */
object StreamingDpHist {

  final class State {
    val counts = mutable.SortedMap.empty[String, Long]
    var lastBatch: Long = -1L
  }

  /** Fold one micro-batch carrying an `event_type` STRING column. */
  def ingestBatch(batch: DataFrame, batchId: Long, st: State): Unit = {
    if (batchId <= st.lastBatch) return // committed replay: a no-op
    batch.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().foreach { r =>
        val t = r.getString(0)
        st.counts(t) = st.counts.getOrElse(t, 0L) + r.getLong(1)
      }
    st.lastBatch = batchId
  }

  /** The batch query's noise chain, spelled once driver-side: salted
    * md5 prefix → centered 2⁶⁰ draw → exact Laplace inverse CDF with
    * b = 2 (ε = 0.5), ln micro-quantized at source. Shared by the
    * report and the spec's closed-form check.
    */
  def noiseMicro(eventType: String): Long = {
    val two59 = 576460752303423488L
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(("dpseed" + eventType).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val d = java.lang.Long.parseLong(hex, 16) - two59
    val m = math.max(two59 - math.abs(d), 1L)
    val lnq = math.round(math.log(m.toDouble) * 1e6)
    (if (d < 0) -1L else 1L) * 2L * (40895684L - lnq)
  }

  /** The current DP release — matches dq_dp_hist's schema
    * (event_type, n, epsilon_micro, noise_micro, dp_n_micro) exactly.
    */
  def report(st: State, spark: SparkSession): DataFrame = {
    val rows = st.counts.toSeq.map { case (t, n) =>
      val noise = noiseMicro(t)
      Row(t, n, 500000L, noise, n * 1000000L + noise)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("event_type", StringType),
        StructField("n", LongType),
        StructField("epsilon_micro", LongType),
        StructField("noise_micro", LongType),
        StructField("dp_n_micro", LongType))))
  }
}
