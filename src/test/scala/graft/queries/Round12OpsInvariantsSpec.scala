package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic laws of the round-12 card queries, proven with
  * first-principles recomputes at sf0.001.
  */
class Round12OpsInvariantsSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("dq_dp_hist: noise equals the closed-form Laplace inverse CDF, " +
      "deterministically") {
    val rows = run("dq_dp_hist")
      .select("event_type", "n", "noise_micro", "dp_n_micro")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val two59 = 576460752303423488L
    rows.foreach { case (t, n, noise, dp) =>
      // driver-side recompute of the whole chain from the type name
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("dpseed" + t).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      val d = h - two59
      val m = math.max(two59 - math.abs(d), 1L)
      val lnq = math.round(math.log(m.toDouble) * 1e6)
      val want = (if (d < 0) -1L else 1L) * 2L * (40895684L - lnq)
      assert(noise === want, s"type $t")
      assert(dp === n * 1000000L + noise)
    }
    // b = 2 (ε = 0.5): |noise| is b·|ln(1−2|t|)| micro — astronomically
    // unlikely to exceed b·ln(2⁵⁹) ≈ 81.8 in these units, and NEVER can
    rows.foreach { case (t, _, noise, _) =>
      assert(math.abs(noise) <= 2L * 40895684L, s"type $t noise $noise")
    }
    // determinism: a second run is bit-identical (seeded draw, no RNG)
    val again = run("dq_dp_hist")
      .select("event_type", "noise_micro")
      .as[(String, Long)].collect().toMap
    rows.foreach { case (t, _, noise, _) => assert(again(t) === noise) }
    // and the noise is not degenerate: some type actually moved
    assert(rows.exists(_._3 != 0L))
  }

  test("dq_freshness: lags recompute from raw timestamps; frontier lag 0") {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_millis(col("ts")).as("ms"))
      .as[(String, Long)].collect()
    val frontier = e.map(_._2).max
    val lastByType = e.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).max
    }
    val rows = run("dq_freshness")
      .select("event_type", "n", "last_ms", "lag_ms", "stale_1d")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet === lastByType.keySet)
    rows.foreach { case (t, n, last, lag, stale) =>
      assert(last === lastByType(t))
      assert(lag === frontier - last)
      assert(stale === (if (lag > 86400000L) 1L else 0L))
      assert(n === e.count(_._1 == t).toLong)
    }
    // at least one type sits ON the frontier (lag 0 by construction)
    assert(rows.exists(_._4 === 0L))
  }

  test("mm_audio_neardup finds every planted DC twin; clusters cohere") {
    // every document plants a DC-shifted recording pair (2d, 2d+1)
    // whose fingerprints are identical (sign-of-delta is DC-invariant):
    // the near-dup output must contain ALL of them at hamming 0
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id").as[Long].collect().toSet
    val pairs = run("mm_audio_neardup")
      .select("rec_a", "rec_b", "hamming")
      .as[(Long, Long, Long)].collect()
    docs.foreach { d =>
      assert(pairs.exists(p => p._1 == d * 2 && p._2 == d * 2 + 1 &&
        p._3 == 0L), s"planted twin of doc $d missing")
    }
    assert(pairs.forall(_._3 <= 3L))
    // the ledger summarizes exactly the pair graph: member count equals
    // the distinct rec_ids in pairs, keep_id is each set's max member,
    // removals = members − survivors
    val clusters = run("mm_audio_clusters")
      .select("cluster_id", "n_members", "keep_id", "n_removed")
      .as[(Long, Long, Long, Long)].collect()
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.map(_._2).sum === inPairs.size.toLong)
    assert(clusters.forall(c => c._4 === c._2 - 1))
    assert(clusters.forall(c => inPairs.contains(c._3)))
    assert(clusters.map(_._3).toSet.size === clusters.length) // keepers unique
  }

  test("dq_completeness: per-column rates recompute; pm identity holds") {
    val docs = Tables(spark, sfDir, "documents").collect()
    val nRows = docs.length.toLong
    val rows = run("dq_completeness")
      .select("column_name", "n_rows", "n_null", "n_blank", "complete_pm")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq ===
      Seq("lang", "n_chars", "source", "text"))
    rows.foreach { case (c, nr, nNull, nBlank, pm) =>
      assert(nr === nRows)
      val wantNull = docs.count(r =>
        r.isNullAt(r.fieldIndex(c))).toLong
      assert(nNull === wantNull, s"column $c")
      if (c == "text") {
        val wantBlank = docs.count(r => !r.isNullAt(r.fieldIndex("text")) &&
          r.getString(r.fieldIndex("text")).trim.isEmpty).toLong
        assert(nBlank === wantBlank)
      } else assert(nBlank === 0L)
      assert(pm === (nRows - nNull - nBlank) * 1000 / nRows)
    }
  }
}
