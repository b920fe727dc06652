package graft.streaming

import scala.collection.mutable

import graft.functions.BitmapSketch
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Online cohort retention — the streaming twin of `ev_bitmap_retention`
  * (queries/Events.scala): the retention grid maintained incrementally as
  * events arrive, instead of recomputed from history. Cross-batch state is
  * three model-sized bitmap tables — users ever seen, users per signup
  * cohort week, users per active week — each `words × 8` bytes per entry,
  * bounded by id space × time span, never by event count.
  *
  * Per micro-batch (`foreachBatch`, the StreamingAssetDedup
  * delta-vs-index shape):
  *  - the SEEN bitmap ships to executors as a literal column and
  *    `BitmapSketch.contains` filters first-time users there (narrow — no
  *    state store, no shuffle beyond the per-week aggregates);
  *  - new users aggregate into per-cohort-week bitmaps, all users into
  *    per-active-week bitmaps, via the combinable BitmapSketch udaf — the
  *    only rows collected are |weeks-in-batch| finished bitmaps;
  *  - the driver ORs them into the state maps (commutative/idempotent, so
  *    an at-least-once replay of a batch is a no-op).
  *
  * Cohort assignment = the user's min event-time week within their FIRST
  * batch; replaying events in arrival ≈ event-time order makes this
  * identical to the batch query's global min (StreamingBitmapRetentionSpec
  * proves grid equality on an ordered replay).
  */
object StreamingBitmapRetention {

  final class State(val words: Int) {
    val seen = new Array[Long](words)
    val cohorts = mutable.SortedMap.empty[Long, Array[Long]]
    val active = mutable.SortedMap.empty[Long, Array[Long]]

    private[streaming] def orInto(m: mutable.SortedMap[Long, Array[Long]],
        week: Long, bm: Array[Long]): Unit = {
      val tgt = m.getOrElseUpdate(week, new Array[Long](words))
      var i = 0
      while (i < words) { tgt(i) |= bm(i); i += 1 }
    }
  }

  /** Fold one micro-batch (`user_id` LONG, `ems` LONG) into the state. */
  def ingestBatch(batch: DataFrame, st: State): Unit = {
    val bm = udaf(new graft.functions.BitmapSketch(st.words))
    // first-time users: the seen bitmap filters executor-side as a literal
    val seenLit = lit(st.seen)
    val newCohorts = batch.groupBy(col("user_id"))
      .agg(min(col("ems")).as("s_ems"))
      .filter(!BitmapSketch.contains(seenLit, col("user_id")))
      .select(col("user_id"), expr("s_ems div 604800000").as("week"))
      .groupBy(col("week")).agg(bm(col("user_id")).as("b"))
      .collect()
    val newActive = batch
      .select(col("user_id"), expr("ems div 604800000").as("week"))
      .groupBy(col("week")).agg(bm(col("user_id")).as("b"))
      .collect()
    newCohorts.foreach { r =>
      val b = r.getSeq[Long](1).toArray
      st.orInto(st.cohorts, r.getLong(0), b)
      var i = 0
      while (i < st.words) { st.seen(i) |= b(i); i += 1 }
    }
    newActive.foreach(r =>
      st.orInto(st.active, r.getLong(0), r.getSeq[Long](1).toArray))
  }

  /** The current retention grid — every (cohort_week, active_week ≥ it)
    * cell as a popcount over AND, driver-side over the model-sized maps.
    * Matches ev_bitmap_retention's schema exactly.
    */
  def grid(st: State, spark: SparkSession): DataFrame = {
    val rows = for {
      (cw, cbm) <- st.cohorts.toSeq
      (w, abm) <- st.active.toSeq if w >= cw
    } yield Row(cw, w,
      cbm.map(java.lang.Long.bitCount(_).toLong).sum,
      cbm.zip(abm).map { case (a, b) =>
        java.lang.Long.bitCount(a & b).toLong
      }.sum)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cohort_week",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("week",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_signup",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_retained",
          org.apache.spark.sql.types.LongType))))
  }
}
