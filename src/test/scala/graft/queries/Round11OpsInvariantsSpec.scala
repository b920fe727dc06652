package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic laws of the round-11 card queries, proven with
  * first-principles recomputes at sf0.001.
  */
class Round11OpsInvariantsSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("q28_ddsketch: every estimate's bucket brackets the exact " +
      "quantile within the 1% relative-error contract") {
    // reconstruct the bucket's value interval DRIVER-SIDE (math.pow has
    // no cross-engine parity burden here) and check the exact rank
    // quantile lands inside it; the interval's relative half-width IS
    // the α=1% guarantee
    val gamma = 101.0 / 99.0
    val exact = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (f, rows) => f -> rows.map(_._2).sorted }
    run("q28_ddsketch")
      .select(col("flag"), col("q"), col("est_bucket"), col("n"))
      .as[(String, Int, Long, Long)].collect().foreach {
        case (flag, q, b, n) =>
          val vals = exact(flag)
          assert(vals.length === n)
          val rank = (q * n + 99) / 100 // ceil
          val member = vals((rank - 1).toInt).toDouble
          // bucket b covers (γ^((b-1)·lg/1e6-ish), γ^b] in the
          // micro-quantized ln domain: check via the same quantized map
          val li = math.round(math.log(member) * 1e6)
          val estLi = b * 20001L
          assert(li <= estLi && li > estLi - 20001L,
            s"$flag p$q: member $member (li $li) outside bucket $b")
          // the contract the layout exists for: the bucket's value span
          // is one γ step ⇒ ±α relative error around its midpoint
          assert(gamma - 1.0 < 0.0203) // α=1% ⇒ span ratio γ ≈ 1.0202
      }
  }

  test("ev_acf: coefficients bounded by 1 and lag-k pair counts exact") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("day"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (t, rows) => t -> rows.map(_._2).toSet }
    run("ev_acf")
      .select(col("event_type"), col("lag"), col("n_terms"), col("acf"))
      .as[(String, Int, Long, Double)].collect().foreach {
        case (t, lag, nTerms, acf) =>
          // |r_k| ≤ 1: the numerator pairs are a subset of the
          // Cauchy-Schwarz-bounded full products
          assert(math.abs(acf) <= 1.0, s"$t lag $lag acf $acf")
          // n_terms = days t where day t+lag also exists
          val days = daily(t)
          assert(nTerms === days.count(d => days.contains(d + lag)))
      }
  }

  test("dq_kanon: the card equals a first-principles recompute") {
    val classes = Tables(spark, sfDir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).as("b"))
      .as[(Int, String, Long)].collect()
      .groupBy(r => (r._1, r._2))
    val r = run("dq_kanon").collect().head
    assert(r.getAs[Long]("n_rows") === classes.values.map(_.length).sum)
    assert(r.getAs[Long]("n_classes") === classes.size)
    assert(r.getAs[Long]("k_min") === classes.values.map(_.length).min)
    assert(r.getAs[Long]("rows_at_risk") ===
      classes.values.filter(_.length < 5).map(_.length).sum)
    assert(r.getAs[Long]("l_div_min") ===
      classes.values.map(_.map(_._3).distinct.length).min)
  }

  test("dq_benford: digit shares recompute and per-mille columns agree") {
    val digits = Tables(spark, sfDir, "customer")
      .select(expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") =!= 0)
      .as[Long].collect()
      .map(c => math.abs(c).toString.head.asDigit)
    val rows = run("dq_benford")
      .select(col("digit"), col("n_obs"), col("obs_pm"), col("dev_pm"),
        col("benford_pm"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum === digits.length)
    rows.foreach { case (d, n, pm, dev, bpm) =>
      assert(n === digits.count(_ == d))
      assert(pm === n * 1000 / digits.length)
      assert(dev === math.abs(pm - bpm))
    }
    // the Benford literals are a probability vector in per-mille
    assert(rows.map(_._5).sum <= 1000)
  }
}
