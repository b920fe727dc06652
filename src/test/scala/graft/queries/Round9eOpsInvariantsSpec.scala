package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9e time-series operators — the laws
  * behind the numbers the DuckDB hash gate only value-checks: the CUSUM
  * window identity must equal Page's sequential recursion, stickiness
  * must equal the naive sliding count-distinct it replaces, and the
  * backtest metrics must satisfy MAE ≥ |bias|.
  */
class Round9eOpsInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("ev_cusum: window closed form ≡ Page's sequential recursion, cusum ≥ 0") {
    val out = run("ev_cusum")
      .select("event_type", "day", "n", "mean_milli", "cusum")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    assert(out.forall(_._5 >= 0L))
    // sequential reference: S_t = max(0, S_{t-1} + (1000·n_t − mean))
    out.groupBy(_._1).foreach { case (_, rows) =>
      var s = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, mean, cusum) =>
        s = math.max(0L, s + (n * 1000L - mean))
        assert(s === cusum)
      }
    }
  }

  test("ev_stickiness: dau ≤ wau, and wau ≡ the naive sliding distinct") {
    val out = run("ev_stickiness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (_, dau, wau) => dau <= wau })
    val du = Tables.events(spark, sfDir)
      .select(expr("ems div 86400000").as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    out.foreach { case (day, dau, wau) =>
      val naiveWau = du.filter(p => p._1 >= day - 6 && p._1 <= day)
        .map(_._2).distinct.size.toLong
      val naiveDau = du.count(_._1 == day).toLong
      assert(dau === naiveDau)
      assert(wau === naiveWau)
    }
  }

  test("ev_forecast: MAE ≥ |bias|, days scored = days with a lag-7 base") {
    val out = run("ev_forecast").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val mae = r.getAs[Long]("mae_milli")
      val bias = r.getAs[Double]("bias_milli")
      // triangle inequality over the same day set (milli rounding slack)
      assert(mae + 1 >= math.abs(bias))
    }
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val scorable = daily.groupBy(_._1).map { case (t, rows) =>
      val days = rows.map(_._2).toSet
      t -> days.count(d => days.contains(d - 7)).toLong
    }
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") ===
        scorable(r.getAs[String]("event_type")))
    }
  }
}
