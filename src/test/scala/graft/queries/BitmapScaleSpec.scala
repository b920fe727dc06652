package graft.queries

import graft.SparkSpec
import graft.functions.BitmapSketch
import org.apache.spark.sql.functions._

/** Generated-corpus scale smoke for the bitmap-retention family: 900k
  * events over 100k users (12.5 KB bitmaps — 1563 words) through the
  * real BitmapSketch aggregation + grid shape, generated distributed (no
  * driver-side data), with CLOSED-FORM expectations:
  *
  * 10 cohorts of 10k users each (user u's cohort week c = u div 10k);
  * u stays active for (u mod 5) weeks after signup, 3 events per active
  * week. So the retention cell (c, w) with d = w - c ∈ [0, 4] contains
  * exactly the cohort's users with (u mod 5) ≥ d — 2000·(5 − d) users —
  * and 0 beyond d = 4. Total events = Σ_u 3·(u mod 5 + 1) = 900k.
  */
class BitmapScaleSpec extends SparkSpec {

  private val nUsers = 100000L
  private val perCohort = 10000L
  private val week0 = 2800L // absolute epoch weeks, fixture-era
  private val words = ((nUsers + 63) / 64).toInt

  // one row per (user, active-week d, repeat r): d ∈ [0, u mod 5],
  // r ∈ [0, 3) — generated as range over u*15 + slot with slot filtering
  private def corpus = spark.range(nUsers * 15).select(
      expr("id div 15").as("u"), (col("id") % 15).as("slot"))
    .withColumn("d", expr("slot div 3"))
    .filter(col("d") <= col("u") % 5)
    .select(col("u").as("user_id"),
      ((lit(week0) + expr("u div " + perCohort) + col("d")) * 604800000L +
        pmod(col("u"), lit(604800L)) * 100L + col("slot")).as("ems"))

  test("900k-event bitmap retention grid matches the closed form") {
    val e = corpus
    val bm = udaf(new BitmapSketch(words))
    val su = e.groupBy(col("user_id")).agg(min(col("ems")).as("s"))
      .select(col("user_id"), expr("s div 604800000").as("cohort_week"))
    val cohorts = su.groupBy(col("cohort_week"))
      .agg(bm(col("user_id")).as("cbm"), count(lit(1)).as("n_signup"))
    val active = e
      .select(col("user_id"), expr("ems div 604800000").as("week"))
      .groupBy(col("week")).agg(bm(col("user_id")).as("abm"))
    val grid = cohorts.join(active, col("week") >= col("cohort_week"))
      .select(col("cohort_week"), col("week"), col("n_signup"),
        BitmapSketch.cardinality(
          BitmapSketch.and(col("cbm"), col("abm"))).as("n_retained"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

    assert(e.count() === 900000L)
    // the full triangular grid: 10 cohorts × every later active week
    val cohortsN = (nUsers / perCohort).toInt
    val lastWeek = week0 + cohortsN - 1 + 4
    assert(grid.size === (for {
      c <- week0 until (week0 + cohortsN)
      w <- c to lastWeek
    } yield 1).size)
    grid.foreach { case ((c, w), (signup, retained)) =>
      assert(signup === perCohort)
      val d = w - c
      val expected = if (d <= 4) 2000L * (5 - d) else 0L
      assert(retained === expected, s"cell ($c, $w): d=$d")
    }
  }
}
