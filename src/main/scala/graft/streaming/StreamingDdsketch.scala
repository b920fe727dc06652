package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

/** Online DDSketch-layout quantiles — the streaming twin of
  * `q28_ddsketch` (queries/Relational.scala): the per-(flag, log-bucket)
  * count table maintained incrementally, with the rank-selection report
  * recomputed from that model-sized state on demand. State is
  * |flags| × |buckets| longs, and |buckets| ≈ ln(range)/ln γ (~1.2k
  * across ten decades) — bounded by the VALUE RANGE, never by row
  * count: exactly why this is the quantile sketch a p99 pipeline keeps
  * resident per key forever.
  *
  * Bucket counts merge ADDITIVELY (the StreamingCusum contract, not the
  * bitmap twins' idempotent OR), so the fold takes the foreachBatch
  * `batchId` and skips committed replays; within that contract the
  * state is slicing- and order-invariant (addition commutes), which
  * StreamingDdsketchSpec proves on a hash-sliced replay against the
  * batch query bit-for-bit.
  */
object StreamingDdsketch {

  /** `ln γ · 10⁶` for γ = 101/99 (α = 1%) — the same literal the batch
    * query inlines; the two MUST stay equal or the twins' buckets
    * diverge (spec-pinned by the bit-equality test).
    */
  val LnGammaMicro = 20001L

  final class State {
    val counts = mutable.SortedMap.empty[(String, Long), Long]
    var lastBatch: Long = -1L
  }

  /** Fold one micro-batch carrying (`flag` STRING, `cents` LONG ≥ 1)
    * into the state. The bucket map is the batch query's, spelled once
    * here in SQL so the engine (not the driver) does the arithmetic.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, st: State): Unit = {
    if (batchId <= st.lastBatch) return // committed replay: a no-op
    batch
      .select(col("flag"),
        expr(s"""(CAST(round(ln(cents) * 1000000) AS BIGINT)
                 + ${LnGammaMicro - 1}) div $LnGammaMicro""").as("bucket"))
      .groupBy(col("flag"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        st.counts(k) = st.counts.getOrElse(k, 0L) + r.getLong(2)
      }
    st.lastBatch = batchId
  }

  /** The current quantile table — matches q28_ddsketch's schema
    * (flag, q, est_bucket, n, n_buckets) exactly: for each q ∈
    * {50, 95, 99}, the smallest bucket whose cumulative count reaches
    * ⌈q·n/100⌉ (the same 100·cum ≥ q·n integer test).
    */
  def report(st: State, spark: SparkSession): DataFrame = {
    val rows = st.counts.groupBy(_._1._1).toSeq.flatMap {
      case (flag, entries) =>
        val buckets = entries.toSeq
          .map { case ((_, b), n) => (b, n) }.sortBy(_._1)
        val n = buckets.map(_._2).sum
        Seq(50, 95, 99).map { q =>
          var cum = 0L
          val est = buckets.collectFirst {
            case (b, c) if { cum += c; cum * 100 >= q.toLong * n } => b
          }.get
          Row(flag, q, est, n, buckets.length.toLong)
        }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("flag", StringType),
        StructField("q", IntegerType), StructField("est_bucket", LongType),
        StructField("n", LongType), StructField("n_buckets", LongType))))
  }
}
