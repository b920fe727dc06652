package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The bench_trend.json arithmetic: integer per-mille ratios against the
  * best prior min, regression/improvement classification at the 1.5×
  * threshold, and baseline-file round-tripping — pure JVM, no Spark.
  */
class BenchTrendSpec extends AnyFunSuite {

  test("trendJson classifies regressions, improvements, and new queries") {
    val cur = Seq(
      "q_reg" -> 3.0, // 3.0 / 1.0  = 3000‰ → regressed
      "q_ok" -> 1.2, //  1.2 / 1.0  = 1200‰ → neither
      "q_win" -> 0.5, // 0.5 / 1.0  =  500‰ ≤ 1000/1.5 → improved
      "q_edge" -> 1.5, // exactly 1500‰ → regressed (inclusive bound)
      "q_new" -> 2.0) // no baseline → new
    val base = Map("q_reg" -> 1.0, "q_ok" -> 1.0, "q_win" -> 1.0,
      "q_edge" -> 1.0)
    val json = Bench.trendJson(cur, base)
    assert(json.contains(""""regressed":["q_edge","q_reg"]"""))
    assert(json.contains(""""improved":["q_win"]"""))
    assert(json.contains(""""new":["q_new"]"""))
    assert(json.contains(""""q_reg":{"min":3.0,"best_prior":1.0,"ratio_milli":3000}"""))
    assert(json.contains(""""q_win":{"min":0.5,"best_prior":1.0,"ratio_milli":500}"""))
    assert(json.contains(""""q_new":{"min":2.0}"""))
    assert(json.contains(""""threshold_milli":1500"""))
  }

  test("ratio_milli floors (integer arithmetic, no float formatting)") {
    val json = Bench.trendJson(Seq("q" -> 1.0), Map("q" -> 3.0))
    // 1000/3 = 333.33… → 333
    assert(json.contains(""""ratio_milli":333"""))
  }

  test("zero or absent baselines never divide") {
    val json = Bench.trendJson(Seq("a" -> 1.0, "b" -> 2.0),
      Map("a" -> 0.0))
    assert(json.contains(""""new":["a","b"]"""))
    assert(!json.contains("ratio_milli"))
  }

  test("readBaseline parses the committed bench_baseline.json shape") {
    val p = Files.createTempFile("baseline", ".json")
    Files.writeString(p,
      """{"source": "round N", "queries": {"q1_agg": 0.25, "dd_exact": 1.5e0}}""")
    val m = Bench.readBaseline(p)
    assert(m === Map("q1_agg" -> 0.25, "dd_exact" -> 1.5))
    assert(Bench.readBaseline(Paths.get("/nonexistent/x.json")) === Map.empty)
    val bad = Files.createTempFile("baseline_bad", ".json")
    Files.writeString(bad, """{"source": "no queries key here"}""")
    assert(Bench.readBaseline(bad) === Map.empty)
  }

  test("the committed baseline covers the live query surface") {
    val m = Bench.readBaseline(Paths.get("bench_baseline.json"))
    assert(m.nonEmpty)
    // every baselined query still exists (stale names would mask renames);
    // new queries may legitimately lack a baseline until the next refresh
    val live = SparkEntry.queries.keySet
    val stale = m.keySet.diff(live)
    assert(stale.isEmpty, s"baseline names not in the surface: $stale")
  }
}
