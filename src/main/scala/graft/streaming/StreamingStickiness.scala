package graft.streaming

import scala.collection.mutable

import graft.functions.BitmapSketch
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Online DAU/WAU stickiness — the streaming twin of `ev_stickiness`
  * (queries/Events.scala): the engagement ratio maintained incrementally
  * as events arrive. Cross-batch state is ONE model-sized bitmap table —
  * the distinct-user bitmap per day, `words × 8` bytes per day, bounded
  * by id space × time span, never by event count.
  *
  * Per micro-batch (`foreachBatch`): one combinable per-day BitmapSketch
  * aggregate (the only shuffle), then the driver ORs each day's bitmap
  * into the state map. OR-merge is commutative AND idempotent, so —
  * unlike the order-sensitive cohort assignment of
  * [[StreamingBitmapRetention]] — the report is invariant to batch
  * slicing, arrival order, and at-least-once replay with no ordering
  * caveat at all (StreamingStickinessSpec proves equality on a SHUFFLED
  * replay).
  *
  * The report recomputes each day's trailing-7-day union driver-side
  * over the model-sized map: WAU = popcount(OR of up to 7 day bitmaps) —
  * the exact sliding count-distinct the batch query gets from its
  * contribution explode.
  */
object StreamingStickiness {

  final class State(val words: Int) {
    val days = mutable.SortedMap.empty[Long, Array[Long]]

    private[streaming] def orInto(day: Long, bm: Array[Long]): Unit = {
      val tgt = days.getOrElseUpdate(day, new Array[Long](words))
      var i = 0
      while (i < words) { tgt(i) |= bm(i); i += 1 }
    }
  }

  /** Fold one micro-batch (`user_id` LONG, `ems` LONG) into the state. */
  def ingestBatch(batch: DataFrame, st: State): Unit = {
    val bm = udaf(new BitmapSketch(st.words))
    batch
      .select(expr("ems div 86400000").as("day"), col("user_id"))
      .groupBy(col("day")).agg(bm(col("user_id")).as("b"))
      .collect()
      .foreach(r => st.orInto(r.getLong(0), r.getSeq[Long](1).toArray))
  }

  /** The current stickiness table — matches ev_stickiness's schema
    * (day, dau, wau, stickiness_milli) exactly; driver-side popcounts
    * over the model-sized day map.
    */
  def report(st: State, spark: SparkSession): DataFrame = {
    def pop(bm: Array[Long]): Long =
      bm.map(java.lang.Long.bitCount(_).toLong).sum
    val rows = st.days.toSeq.map { case (day, dbm) =>
      val window = new Array[Long](st.words)
      (day - 6 to day).foreach(d => st.days.get(d).foreach { b =>
        var i = 0
        while (i < st.words) { window(i) |= b(i); i += 1 }
      })
      val dau = pop(dbm)
      val wau = pop(window)
      Row(day, dau, wau, dau * 1000 / wau)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("day", LongType),
        StructField("dau", LongType), StructField("wau", LongType),
        StructField("stickiness_milli", LongType))))
  }
}
