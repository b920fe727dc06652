package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType,
  StructField, StructType}

/** Online CUSUM level-shift monitoring — the streaming twin of `ev_cusum`
  * (queries/Events.scala): the per-(type, day) count table maintained
  * incrementally, with the CUSUM statistic recomputed from that
  * model-sized state on demand. State is |types| × |days| longs — bounded
  * by schema × time span, never by event count.
  *
  * Counts merge ADDITIVELY, which (unlike the bitmap twins' idempotent
  * OR) would double-count under at-least-once re-delivery — so the fold
  * takes Structured Streaming's `batchId` and applies the standard
  * foreachBatch exactly-once discipline: a batch id at or below the last
  * applied one is a committed batch being replayed and is skipped.
  * Within that contract the state is slicing- and order-invariant
  * (addition commutes), which StreamingCusumSpec proves on a replay
  * sliced by USER hash rather than time.
  *
  * The report recomputes mean/cumsum/running-min driver-side over the
  * day-ordered state — the exact integer arithmetic of the batch query,
  * so the two tables agree bit-for-bit.
  */
object StreamingCusum {

  final class State {
    val counts = mutable.SortedMap.empty[(String, Long), Long]
    var lastBatch: Long = -1L
  }

  /** Fold one micro-batch (`event_type` STRING, `ems` LONG) into the
    * state; `batchId` must be the foreachBatch-provided id.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, st: State): Unit = {
    if (batchId <= st.lastBatch) return // committed replay: a no-op
    batch
      .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        st.counts(k) = st.counts.getOrElse(k, 0L) + r.getLong(2)
      }
    st.lastBatch = batchId
  }

  /** The current CUSUM table — matches ev_cusum's schema
    * (event_type, day, n, mean_milli, cusum, is_shift) exactly.
    */
  def report(st: State, spark: SparkSession): DataFrame = {
    val rows = st.counts.groupBy(_._1._1).toSeq.flatMap {
      case (tpe, entries) =>
        val days = entries.toSeq.map { case ((_, d), n) => (d, n) }.sortBy(_._1)
        val meanMilli = days.map(_._2).sum * 1000L / days.length
        var r = 0L
        var minR = Long.MaxValue // running min over r_1..r_t
        days.map { case (d, n) =>
          r += n * 1000L - meanMilli
          minR = math.min(minR, r)
          // the batch closed form: r − least(min(r) over ≤t, 0) — the
          // least folds in the empty-prefix R_0 = 0
          val cusum = r - math.min(minR, 0L)
          Row(tpe, d, n, meanMilli, cusum, cusum > meanMilli * 5)
        }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("event_type", StringType),
        StructField("day", LongType), StructField("n", LongType),
        StructField("mean_milli", LongType),
        StructField("cusum", LongType),
        StructField("is_shift", BooleanType))))
  }

  /** The seasonal-naive backtest over the SAME daily-count state — one
    * state, two reports (the ops/Dq kernel discipline): matches
    * ev_forecast's schema (event_type, n_days, mae_milli, bias_milli,
    * mape_pm) with the batch query's exact arithmetic, including the
    * join-on-(type, day−7) alignment (a missing day simply contributes
    * no scored row, never a misaligned one).
    */
  def forecastReport(st: State, spark: SparkSession): DataFrame = {
    val rows = st.counts.groupBy(_._1._1).toSeq.flatMap {
      case (tpe, entries) =>
        val byDay = entries.map { case ((_, d), n) => d -> n }.toMap
        val scored = byDay.toSeq.sortBy(_._1).flatMap { case (d, n) =>
          byDay.get(d - 7).map { fc =>
            val absErr = math.abs(n - fc)
            (absErr, n - fc, absErr * 1000L / math.max(n, 1L))
          }
        }
        if (scored.isEmpty) None
        else {
          val nd = scored.length.toLong
          Some(Row(tpe, nd,
            scored.map(_._1).sum * 1000L / nd,
            scored.map(_._2).sum.toDouble * 1000.0 / nd,
            scored.map(_._3).sum / nd))
        }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("event_type", StringType),
        StructField("n_days", LongType),
        StructField("mae_milli", LongType),
        StructField("bias_milli",
          org.apache.spark.sql.types.DoubleType),
        StructField("mape_pm", LongType))))
  }
}
