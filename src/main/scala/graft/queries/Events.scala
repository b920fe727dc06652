package graft.queries

import graft.{Q, Tables}
import graft.ops.Materialize._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time operators over the `events` table — the batch form of the
  * reference's windowing stages (SURVEY.md §2 O9-O11: event-time assignment,
  * sliding/tumbling windows, window-validity filtering). The crop lineage
  * also runs under Structured Streaming with a watermark
  * (graft.streaming.StreamingCrop; StreamingCropSpec asserts batch ≡
  * streaming); batch `window()` has identical semantics on bounded data,
  * which is what the oracle checks.
  *
  * Timestamps are carried as epoch milliseconds (BIGINT) in outputs so the
  * DuckDB comparison is timezone-proof.
  */
object Events {
  import Q.{fxsum, fxsumSql}

  /** SCD2 interval construction (the CDC shape): collapse each user's
    * event stream into state runs and emit one validity interval per run
    * — ONE definition consumed by ev_scd2 (the interval table itself)
    * and ev_dwell (the occupancy report over it), so the two cannot
    * drift. Two window passes over one user_id exchange.
    */
  private[graft] def scd2Intervals(e: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ems"), col("event_id"))
    val flagged = e
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byTime).isNull ||
          lag(col("event_type"), 1).over(byTime) =!= col("event_type"),
          1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byTime.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(byTime).cast("long"))
      .withColumn("total_n", count(lit(1)).over(
        Window.partitionBy(col("user_id"))))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    flagged.filter(col("chg") === 1)
      .withColumn("valid_to", lead(col("ems"), 1).over(byRun))
      .withColumn("next_rn", lead(col("rn"), 1).over(byRun))
      .select(col("user_id"), col("run_id"),
        col("event_type").as("state"),
        col("ems").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        (coalesce(col("next_rn"), col("total_n") + 1) - col("rn"))
          .as("n_events"))
  }

  /** DuckDB mirror of [[scd2Intervals]] as a CTE chain ending in `iv` —
    * shared by the ev_scd2 and ev_dwell oracles.
    */
  private val scd2IvSql = """
        o AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ems,
                 CASE WHEN lag(event_type) OVER win IS NULL
                        OR lag(event_type) OVER win <> event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW win AS (PARTITION BY user_id ORDER BY ems, event_id)),
        r AS (
          SELECT user_id, event_type, ems, chg,
                 CAST(sum(chg) OVER win AS BIGINT) AS run_id,
                 CAST(row_number() OVER win2 AS BIGINT) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS total_n
          FROM o
          WINDOW win AS (PARTITION BY user_id ORDER BY ems, event_id
                         ROWS UNBOUNDED PRECEDING),
                 win2 AS (PARTITION BY user_id ORDER BY ems, event_id)),
        starts AS (SELECT * FROM r WHERE chg = 1),
        iv AS (
          SELECT user_id, run_id, event_type AS state, ems AS valid_from,
                 lead(ems) OVER winr AS valid_to,
                 lead(ems) OVER winr IS NULL AS is_current,
                 coalesce(lead(rn) OVER winr, total_n + 1) - rn AS n_events
          FROM starts
          WINDOW winr AS (PARTITION BY user_id ORDER BY run_id))"""

  /** ev_lateness's synthesized arrival time: event time (`ems`) plus an
    * md5-derived transport delay uniform in [0, 30 min) — the fixture has
    * no arrival column. Package-visible so the streaming twin's spec
    * (StreamingLatenessSpec) scores the SAME arrivals instead of
    * re-hardcoding the synthesis; mirrored literally in the oracle SQL.
    */
  /** ev_salted_join's hot-user threshold: users with ≥ this many events
    * get salted/replicated. Package-visible (the CentroidModulo
    * discipline) so specs and comments reference THE constant.
    */
  private[graft] val HotN = 80

  private[graft] def arrivalMs: org.apache.spark.sql.Column =
    col("ems") + pmod(conv(substring(md5(concat(lit("arr|"),
      col("event_id")).cast("binary")), 1, 15), 16, 10).cast("long"),
      lit(1800000L))

  /** DuckDB mirror of `StreamingMoments.sketchAggs` + `quantiles` over a
    * `src` relation grouped by `keys` — the sk→mm→ct→sh→qq CTE chain
    * (ends in `qq`: keys, n, m1.., stdw, skew, kurt, q50w, q95w).
    * Shared by the ev_moments_quantile and ev_moments_window oracles so
    * the fold cannot drift between grains; CF constants single-sourced
    * from the kernel object.
    */
  /** A Scala double as a DuckDB DOUBLE literal. A bare 17-digit decimal
    * literal parses as DECIMAL(17,16) and its decimal→double CONVERSION
    * can double-round one ulp away from the correctly-rounded string
    * parse (bit C3 of the CF constants: flipped exactly 1 of 150 rows
    * in ev_moments_window before this). An exponent suffix makes the
    * literal DOUBLE-typed at parse time — bit-identical to Scala's.
    */
  private def dlit(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  private def momentsCfSql(src: String, keys: String): String = {
    import graft.streaming.StreamingMoments._
    val wS = "(value / 512.0)"
    s"""sk AS (
          SELECT $keys, count(*) AS n,
                 ${fxsumSql(wS, 12)} AS s1,
                 ${fxsumSql(s"$wS * $wS", 12)} AS s2,
                 ${fxsumSql(s"($wS * $wS) * $wS", 12)} AS s3,
                 ${fxsumSql(s"(($wS * $wS) * $wS) * $wS", 12)} AS s4
          FROM $src GROUP BY $keys),
        mm AS (
          SELECT $keys, n,
                 s1 / n AS m1, s2 / n AS m2, s3 / n AS m3, s4 / n AS m4
          FROM sk),
        ct AS (
          SELECT *, greatest(m2 - (m1 * m1), 0.0) AS varc,
                 sqrt(greatest(m2 - (m1 * m1), 0.0)) AS stdw,
                 (m3 - ((3.0 * m2) * m1)) + ((2.0 * (m1 * m1)) * m1) AS m3c,
                 ((m4 - ((4.0 * m3) * m1)) + ((6.0 * m2) * (m1 * m1)))
                   - ((3.0 * (m1 * m1)) * (m1 * m1)) AS m4c
          FROM mm),
        sh AS (
          SELECT *, CASE WHEN stdw > 0.0
                         THEN m3c / ((stdw * stdw) * stdw)
                         ELSE 0.0 END AS skew,
                 CASE WHEN varc > 0.0
                      THEN (m4c / (varc * varc)) - 3.0
                      ELSE 0.0 END AS kurt
          FROM ct),
        qq AS (
          SELECT *,
                 m1 + (stdw * (${dlit(C150)} * skew)) AS q50w,
                 m1 + (stdw * (((${dlit(Z95)} + (${dlit(C1)} * skew))
                   + (${dlit(C2)} * kurt))
                   + (${dlit(C3)} * (skew * skew)))) AS q95w
          FROM sh)"""
  }

  val qs: Seq[Q] = Seq(

    // ---- tumbling window aggregate (O10 with period == size) -------------
    // One shuffle on (window, event_type); window assignment is a narrow
    // projection, so this scales as a plain hash aggregate.
    Q("ev_tumbling",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(
            window(col("ts"), "15 seconds").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), fxsum(col("value"), 2).as("sum_value"))
          .select(
            unix_millis(col("w.start")).as("window_start"),
            col("event_type"), col("n"), col("sum_value"))
      },
      Some(s"""
        SELECT CAST(floor(epoch_ms(ts) / 15000) * 15000 AS BIGINT) AS window_start,
               event_type, count(*) AS n,
               ${fxsumSql("value", 2)} AS sum_value
        FROM events GROUP BY 1, 2""")),

    // ---- sliding window aggregate (O10, size 15s / period 5s) -------------
    // Spark's window() emits size/period copies per row before the shuffle;
    // the oracle reproduces the same 3 aligned windows arithmetically.
    Q("ev_sliding",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(window(col("ts"), "15 seconds", "5 seconds").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(
            unix_millis(col("w.start")).as("window_start"),
            col("event_type"), col("n"))
      },
      Some("""
        SELECT (CAST(floor(epoch_ms(ts) / 5000) AS BIGINT) - g.i) * 5000 AS window_start,
               event_type, count(*) AS n
        FROM events, generate_series(0, 2) AS g(i)
        GROUP BY 1, 2""")),

    // ---- sessionization (gap > 30 min splits a session) --------------------
    // Classic lag + running-sum pattern: a single shuffle on user_id, then
    // two per-partition window passes and a final hash aggregate. At 100 TB
    // the only cost driver is the user_id exchange — no global sort. Skew
    // exposure: a hot user_id (same for q3's o_custkey) serializes on one
    // reducer; the window's ordering semantics pin all of a key's rows
    // together, so the mitigation is graft.ops.Salt.saltedAgg for the
    // aggregation-shaped parts plus AQE skew handling for joins — sessions
    // themselves can also be bounded by splitting on calendar day first
    // (day becomes part of the key, capping any key's row count).
    // ---- inter-event gap statistics: the session-timeout sizing table ------
    // ev_sessionize hardcodes a 30-minute gap threshold; this is the table
    // an operator reads to CHOOSE that number (and a streaming job reads
    // to size its watermark): per event_type, the distribution of gaps
    // between a user's consecutive events of that type. Quartiles only
    // (0.25/0.5/0.75 — binary-exact fractions, the q17 parity discipline:
    // both engines interpolate identically on integer ms gaps). Plan
    // shape: one (user_id, event_type) exchange for the lag window, then
    // a per-type aggregate; the exact `percentile` concentrates each
    // type's gap list on one task (documented q17 trade — q17b is the
    // sketch twin to swap in at scale).
    Q("ev_gap_stats",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ems"), col("event_id"))
        e.withColumn("prev_ems", lag(col("ems"), 1).over(byUserType))
          .filter(col("prev_ems").isNotNull)
          .withColumn("gap_ms", col("ems") - col("prev_ems"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"),
            expr("percentile(gap_ms, 0.25)").as("p25_ms"),
            expr("percentile(gap_ms, 0.5)").as("p50_ms"),
            expr("percentile(gap_ms, 0.75)").as("p75_ms"),
            max(col("gap_ms")).as("max_ms"))
      },
      Some("""
        WITH g AS (
          SELECT event_type,
                 epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_ms(ts), event_id) AS gap_ms
          FROM events)
        SELECT event_type, count(*) AS n_gaps,
               quantile_cont(gap_ms, 0.25) AS p25_ms,
               quantile_cont(gap_ms, 0.5) AS p50_ms,
               quantile_cont(gap_ms, 0.75) AS p75_ms,
               max(gap_ms) AS max_ms
        FROM g WHERE gap_ms IS NOT NULL
        GROUP BY event_type""")),

    Q("ev_sessionize",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ems"), col("event_id"))
        e.withColumn("prev_ems", lag(col("ems"), 1).over(byUser))
          .withColumn("new_s",
            when(col("prev_ems").isNull ||
              col("ems") - col("prev_ems") > 1800000L, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("new_s")).over(
              byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ems")).as("start_ms"),
            max(col("ems")).as("end_ms"),
            fxsum(col("value"), 2).as("sum_value"))
      },
      Some(s"""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems, value FROM events),
        marked AS (
          SELECT *, CASE WHEN lag(ems) OVER w IS NULL
                          OR ems - lag(ems) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ems, event_id)),
        sess AS (
          SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ems, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM marked)
        SELECT user_id, session_id, count(*) AS n_events,
               min(ems) AS start_ms, max(ems) AS end_ms,
               ${fxsumSql("value", 2)} AS sum_value
        FROM sess GROUP BY user_id, session_id""")),

    // ---- ordered funnel: signup strictly before first purchase --------------
    // Sequence-constrained funnel via min-timestamp comparison — one
    // combinable aggregation, no self-join, no ordering pass.
    Q("ev_ordered_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "signup", col("ems")))
              .as("first_signup"),
            min(when(col("event_type") === "purchase", col("ems")))
              .as("first_purchase"))
          .filter(col("first_signup").isNotNull &&
            col("first_purchase").isNotNull &&
            col("first_signup") < col("first_purchase"))
      },
      Some("""
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END)
                 AS first_signup,
               min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
                 AS first_purchase
        FROM events GROUP BY user_id
        HAVING first_signup IS NOT NULL AND first_purchase IS NOT NULL
           AND first_signup < first_purchase""")),

    // ---- as-of join: latest click at-or-before each purchase ---------------
    // ops.AsOfJoin — union-and-fill, ONE key exchange, no range explosion
    // (see AsOfJoin scaladoc for why this is the 100 TB form). The click
    // side is pre-aggregated to unique (user, time) per the operator
    // contract. Oracle = DuckDB's native ASOF LEFT JOIN.
    Q("ev_asof",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ems"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ems").as("c_ems"), col("event_id"))
          .groupBy(col("user_id"), col("c_ems"))
          .agg(max(col("event_id")).as("click_id"))
        graft.ops.AsOfJoin.asOf(purchases, clicks, "user_id", "ems", "c_ems")
          .select(col("user_id"), col("event_id"), col("ems"),
            col("r_c_ems").as("click_ms"), col("r_click_id").as("click_id"),
            (col("ems") - col("r_c_ems")).as("gap_ms"))
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, epoch_ms(ts) AS c_ems, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        SELECT p.user_id, p.event_id, p.ems, c.c_ems AS click_ms,
               c.click_id, p.ems - c.c_ems AS gap_ms
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.c_ems <= p.ems""")),

    // ---- the SAME as-of lookup through the native physical operator --------
    // ev_asof's exact query, executed by plans.AsOfJoinExec (the custom
    // LogicalPlan → SparkStrategy → SparkPlan whole-operator extension:
    // one hash exchange + sort per side, then a single-pass per-partition
    // merge) instead of the union-and-fill window. Identical oracle:
    // DuckDB's own ASOF LEFT JOIN is the judge for BOTH forms, which
    // puts the custom operator's runtime under the correctness gate, not
    // just its spec.
    Q("ev_asof_native",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ems"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ems").as("c_ems"), col("event_id"))
          .groupBy(col("user_id"), col("c_ems"))
          .agg(max(col("event_id")).as("click_id"))
        graft.plans.NativeAsOf
          .asOf(purchases, clicks, "user_id", "ems", "c_ems")
          .select(col("user_id"), col("event_id"), col("ems"),
            col("r_c_ems").as("click_ms"), col("r_click_id").as("click_id"),
            (col("ems") - col("r_c_ems")).as("gap_ms"))
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, epoch_ms(ts) AS c_ems, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        SELECT p.user_id, p.event_id, p.ems, c.c_ems AS click_ms,
               c.click_id, p.ems - c.c_ems AS gap_ms
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.c_ems <= p.ems""")),

    // ---- as-of with backward TOLERANCE: click within 1h before purchase ----
    // merge_asof(tolerance=1h) semantics on the native operator: the
    // merge still carries the single nearest prior click (O(|L|+|R|)),
    // and the per-left-row lower bound `ems - 3600000` nulls the match
    // when the nearest click is older than the window — tolerance gates
    // emission, it never widens the scan. The bound is a precomputed
    // left column, so the operator does no cross-type arithmetic. The
    // oracle states the same semantics as DuckDB's plain ASOF LEFT JOIN
    // with a post-hoc CASE (nearest-prior-then-null-if-outside ≡
    // tolerance for the backward direction: if the nearest prior is out
    // of tolerance, every older one is too).
    Q("ev_asof_tolerance",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ems"))
          .withColumn("lb", col("ems") - lit(3600000L))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ems").as("c_ems"), col("event_id"))
          .groupBy(col("user_id"), col("c_ems"))
          .agg(max(col("event_id")).as("click_id"))
        graft.plans.NativeAsOf
          .asOf(purchases, clicks, "user_id", "ems", "c_ems",
            timeBound = Some("lb"))
          .select(col("user_id"), col("event_id"), col("ems"),
            col("r_c_ems").as("click_ms"), col("r_click_id").as("click_id"))
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, epoch_ms(ts) AS c_ems, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        j AS (
          SELECT p.user_id, p.event_id, p.ems, c.c_ems, c.click_id
          FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND c.c_ems <= p.ems)
        SELECT user_id, event_id, ems,
               CASE WHEN c_ems >= ems - 3600000 THEN c_ems END AS click_ms,
               CASE WHEN c_ems >= ems - 3600000 THEN click_id END AS click_id
        FROM j""")),

    // ---- MULTI-KEY as-of: latest same-weekday click before each purchase ---
    // merge_asof(by=[user_id, dow]) on the native operator: the two by
    // columns compose into one null-guarded struct key (positional field
    // names, so both sides' types agree; a null field nulls the whole
    // key — AND-of-equalities semantics), and the plan is the identical
    // one-exchange-one-sort-per-side merge, now keyed on the struct.
    // Weekday-affinity features ("what did this user click last
    // Saturday?") are this exact shape. dow derives from integer epoch
    // arithmetic spelled identically on both engines (non-negative
    // operands, so Spark div ≡ DuckDB //).
    Q("ev_asof_multikey",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ems"),
            expr("pmod(ems div 86400000 + 4, 7)").as("dow"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ems").as("c_ems"), col("event_id"),
            expr("pmod(ems div 86400000 + 4, 7)").as("dow"))
          .groupBy(col("user_id"), col("dow"), col("c_ems"))
          .agg(max(col("event_id")).as("click_id"))
        graft.plans.NativeAsOf
          .asOfKeys(purchases, clicks, Seq("user_id", "dow"), "ems", "c_ems")
          .select(col("user_id"), col("event_id"), col("ems"), col("dow"),
            col("r_c_ems").as("click_ms"), col("r_click_id").as("click_id"))
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems,
                 (epoch_ms(ts) // 86400000 + 4) % 7 AS dow
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
                 epoch_ms(ts) AS c_ems, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3)
        SELECT p.user_id, p.event_id, p.ems, p.dow, c.c_ems AS click_ms,
               c.click_id
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.dow = c.dow
         AND c.c_ems <= p.ems""")),

    // ---- FORWARD as-of: next click at-or-after each purchase ---------------
    // merge_asof(direction='forward') on the native operator: the same
    // one-exchange-one-sort-per-side merge, with the candidate kept
    // UNCONSUMED at the right cursor head (later probes may share it)
    // instead of carried behind it. Post-purchase attribution and
    // next-touch analyses are this exact shape. DuckDB's ASOF LEFT JOIN
    // states the forward direction natively (`c_ems >= ems`), so the
    // oracle needs no post-processing.
    Q("ev_asof_forward",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ems"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ems").as("c_ems"), col("event_id"))
          .groupBy(col("user_id"), col("c_ems"))
          .agg(max(col("event_id")).as("click_id"))
        graft.plans.NativeAsOf
          .asOf(purchases, clicks, "user_id", "ems", "c_ems",
            forward = true)
          .select(col("user_id"), col("event_id"), col("ems"),
            col("r_c_ems").as("click_ms"), col("r_click_id").as("click_id"),
            (col("r_c_ems") - col("ems")).as("wait_ms"))
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, epoch_ms(ts) AS c_ems, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        SELECT p.user_id, p.event_id, p.ems, c.c_ems AS click_ms,
               c.click_id, c.c_ems - p.ems AS wait_ms
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.c_ems >= p.ems""")),

    // ---- STRICT as-of (allow_exact_matches=False) ---------------------------
    // The self-join shape where ties are the BUG: "the last click
    // strictly before this click" must never match the probe row
    // itself. merge_asof(allow_exact_matches=False) on the native
    // merge — strict semantics are exact (no arbitrary tie, unlike
    // nearest), so the operator implements them: backward-strict stops
    // consuming AT ties where inclusive consumes through. DuckDB's
    // ASOF JOIN takes the strict comparison directly, so the oracle is
    // first-class. Probing clicks against clicks makes every probe
    // time an exact-match candidate — the fixture exercises strictness
    // on EVERY row, not just coincidental collisions.
    Q("ev_asof_strict",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ems").as("c_ems"), col("event_id"))
          .groupBy(col("user_id"), col("c_ems"))
          .agg(max(col("event_id")).as("click_id"))
        val probes = clicks
          .select(col("user_id"), col("c_ems").as("ems"),
            col("click_id").as("probe_id"))
        graft.plans.NativeAsOf
          .asOf(probes, clicks, "user_id", "ems", "c_ems", strict = true)
          .select(col("user_id"), col("probe_id"), col("ems"),
            col("r_c_ems").as("prev_ms"),
            col("r_click_id").as("prev_id"),
            (col("ems") - col("r_c_ems")).as("gap_ms"))
      },
      Some("""
        WITH c AS (
          SELECT user_id, epoch_ms(ts) AS c_ems, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        p AS (
          SELECT user_id, c_ems AS ems, click_id AS probe_id FROM c)
        SELECT p.user_id, p.probe_id, p.ems, c.c_ems AS prev_ms,
               c.click_id AS prev_id, p.ems - c.c_ems AS gap_ms
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.c_ems < p.ems""")),

    // ---- NEAREST as-of with an EXPLICIT tie rule ---------------------------
    // merge_asof(direction='nearest') stays OFF the native replan because
    // stock's equidistant tie is implementation-arbitrary (min_by over
    // equal |Δ|) — there is no exact semantics to replicate. This query
    // is the deterministic alternative: COMPOSE the two well-defined
    // directions (both on the native merge) and pick the smaller gap,
    // ties to backward — a documented rule both engines state
    // identically, so even nearest is oracle-checkable. Cost: two
    // merges over the same exchanged-and-sorted purchase lineage.
    Q("ev_asof_nearest",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ems"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ems").as("c_ems"), col("event_id"))
          .groupBy(col("user_id"), col("c_ems"))
          .agg(max(col("event_id")).as("click_id"))
        val b = graft.plans.NativeAsOf
          .asOf(purchases, clicks, "user_id", "ems", "c_ems", prefix = "b_")
        val both = graft.plans.NativeAsOf
          .asOf(b, clicks, "user_id", "ems", "c_ems", prefix = "f_",
            forward = true)
        val useB = col("f_c_ems").isNull ||
          (col("b_c_ems").isNotNull &&
            col("ems") - col("b_c_ems") <= col("f_c_ems") - col("ems"))
        both.select(col("user_id"), col("event_id"), col("ems"),
          when(useB, col("b_c_ems")).otherwise(col("f_c_ems"))
            .as("near_ms"),
          when(useB, col("b_click_id")).otherwise(col("f_click_id"))
            .as("near_id"))
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, epoch_ms(ts) AS c_ems, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        b AS (
          SELECT p.user_id, p.event_id, p.ems, c.c_ems AS b_ms,
                 c.click_id AS b_id
          FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND c.c_ems <= p.ems),
        f AS (
          SELECT p.event_id, c.c_ems AS f_ms, c.click_id AS f_id
          FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND c.c_ems >= p.ems)
        SELECT b.user_id, b.event_id, b.ems,
               CASE WHEN f.f_ms IS NULL OR (b.b_ms IS NOT NULL
                      AND b.ems - b.b_ms <= f.f_ms - b.ems)
                    THEN b.b_ms ELSE f.f_ms END AS near_ms,
               CASE WHEN f.f_ms IS NULL OR (b.b_ms IS NOT NULL
                      AND b.ems - b.b_ms <= f.f_ms - b.ems)
                    THEN b.b_id ELSE f.f_id END AS near_id
        FROM b JOIN f ON f.event_id = b.event_id""")),

    // ---- range join: purchases within ±1h of each error --------------------
    // ops.RangeJoin — bin-bucketed equi-join, not BNLJ: intervals explode
    // to 2h bins, points map to one bin, exact predicate after. The
    // oracle states the same query as a plain inequality join.
    Q("ev_range_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val errs = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"),
            (col("ems") - 3600000L).as("lo"),
            (col("ems") + 3600000L).as("hi"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ems"))
        graft.ops.RangeJoin
          .rangeJoin(errs, purch, "user_id", "lo", "hi", "ems", 7200000L)
          .groupBy(col("user_id"), col("event_id"))
          .agg(count(lit(1)).as("n_near"),
            min(col("p_ems")).as("first_near_ms"))
      },
      Some("""
        WITH er AS (
          SELECT user_id, event_id, epoch_ms(ts) - 3600000 AS lo,
                 epoch_ms(ts) + 3600000 AS hi
          FROM events WHERE event_type = 'error'),
        p AS (SELECT user_id, epoch_ms(ts) AS ems
              FROM events WHERE event_type = 'purchase')
        SELECT er.user_id, er.event_id, count(*) AS n_near,
               min(p.ems) AS first_near_ms
        FROM er JOIN p ON p.user_id = er.user_id
                      AND p.ems BETWEEN er.lo AND er.hi
        GROUP BY 1, 2""")),

    // ---- range join via the native interval-sweep operator -----------------
    // The SAME query as ev_range_join, run through the second
    // whole-operator Catalyst extension (plans.IntervalJoinNode →
    // IntervalJoinExec): one exchange + sort per side, then a
    // per-partition interval sweep with memory bounded by concurrent
    // overlap — no bin-width knob, no candidate duplication, no
    // post-join re-filter. Same DuckDB inequality-join oracle;
    // NativeIntervalSpec proves row-parity with the bin-bucketed form.
    Q("ev_range_native",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val errs = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"),
            (col("ems") - 3600000L).as("lo"),
            (col("ems") + 3600000L).as("hi"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ems"))
        graft.plans.NativeIntervalJoin
          .intervalJoin(errs, purch, "user_id", "lo", "hi", "ems")
          .groupBy(col("user_id"), col("event_id"))
          .agg(count(lit(1)).as("n_near"),
            min(col("p_ems")).as("first_near_ms"))
      },
      Some("""
        WITH er AS (
          SELECT user_id, event_id, epoch_ms(ts) - 3600000 AS lo,
                 epoch_ms(ts) + 3600000 AS hi
          FROM events WHERE event_type = 'error'),
        p AS (SELECT user_id, epoch_ms(ts) AS ems
              FROM events WHERE event_type = 'purchase')
        SELECT er.user_id, er.event_id, count(*) AS n_near,
               min(p.ems) AS first_near_ms
        FROM er JOIN p ON p.user_id = er.user_id
                      AND p.ems BETWEEN er.lo AND er.hi
        GROUP BY 1, 2""")),

    // ---- session_window: Spark's native gap-session operator ----------------
    // The built-in alternative to the lag+running-sum sessionization above;
    // merge semantics verified empirically: a gap of exactly the duration
    // MERGES (new session only when gap > 30 min), window end = last event
    // + gap. Oracle mirrors via lag/cumsum + max(ems) + gap.
    Q("ev_session_window",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"),
            fxsum(col("value"), 2).as("sum_value"))
          .select(col("user_id"),
            unix_millis(col("w.start")).as("start_ms"),
            unix_millis(col("w.end")).as("end_ms"),
            col("n_events"), col("sum_value"))
      },
      Some(s"""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ems, value FROM events),
        marked AS (
          SELECT *, CASE WHEN lag(ems) OVER w IS NULL
                          OR ems - lag(ems) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ems)),
        sess AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ems
                      ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT user_id, min(ems) AS start_ms,
               max(ems) + 1800000 AS end_ms,
               count(*) AS n_events, ${fxsumSql("value", 2)} AS sum_value
        FROM sess GROUP BY user_id, sid""")),

    // ---- salted two-phase aggregation under the gate ------------------------
    // ops.Salt — the hot-key mitigation (one viral user at 100 TB), proven
    // result-identical to the plain GROUP BY oracle: phase 1 spreads each
    // user over 8 salt buckets, phase 2 merges partials; both phases
    // map-side combinable, phase-2 shuffle carries ≤8 rows per user.
    Q("ev_salted_agg",
      (s, dir) => {
        val e = Tables.events(s, dir)
        graft.ops.Salt.saltedAgg(e, Seq("user_id"), col("event_id"), 8,
          aggs = Seq(count(lit(1)).as("pn"),
            sum(round(col("value") * 100).cast("long")).as("pv")),
          merges = Seq(sum(col("pn")).as("n_events"),
            (sum(col("pv")) / 100.0).as("sum_value")))
      },
      Some(s"""
        SELECT user_id, count(*) AS n_events,
               ${fxsumSql("value", 2)} AS sum_value
        FROM events GROUP BY user_id""")),

    // ---- cohort retention (signup week × weeks-since) -----------------------
    // The classic retention triangle: users grouped by signup week, then
    // distinct active users counted at each whole-week age. Two combinable
    // aggregations; the per-user signup lookup is an aggregate joined back
    // on user_id (same decorrelated shape as q14). All integer week
    // arithmetic.
    Q("ev_retention",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val signup = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(min(expr("ems div 604800000")).as("cohort_week"))
        e.join(signup, "user_id")
          .withColumn("age_weeks",
            expr("ems div 604800000") - col("cohort_week"))
          .filter(col("age_weeks") >= 0)
          .groupBy(col("cohort_week"), col("age_weeks"))
          .agg(countDistinct(col("user_id")).as("n_active"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) // 604800000 AS wk
          FROM events),
        signup AS (
          SELECT user_id, min(wk) AS cohort_week
          FROM e WHERE event_type = 'signup' GROUP BY user_id)
        SELECT s.cohort_week, e.wk - s.cohort_week AS age_weeks,
               count(DISTINCT e.user_id) AS n_active
        FROM e JOIN signup s USING (user_id)
        WHERE e.wk >= s.cohort_week
        GROUP BY 1, 2""")),

    // ---- order-sensitive aggregation: user journey strings ------------------
    // First 8 events per user in time order, concatenated into a path
    // ("signup>view>purchase") — top-N-per-key (row_number, per-partition
    // sort) feeding an ORDER-SENSITIVE aggregate. collect_list order is
    // not defined after a shuffle, so the order is imposed by sorting
    // (ems, event_id, type) structs inside the aggregate — deterministic
    // under any partitioning, which is what lets DuckDB's ordered
    // string_agg match it.
    Q("ev_user_paths",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ems"), col("event_id"))
        e.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 8)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            concat_ws(">", transform(
              sort_array(collect_list(struct(col("ems"), col("event_id"),
                col("event_type")))),
              x => x.getField("event_type"))).as("path"))
      },
      Some("""
        WITH r AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ems, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY epoch_ms(ts), event_id) AS rn
          FROM events)
        SELECT user_id, count(*) AS n,
               string_agg(event_type, '>' ORDER BY ems, event_id) AS path
        FROM r WHERE rn <= 8 GROUP BY user_id""")),

    // ---- JSON extraction over the semi-structured props column --------------
    // get_json_object path extraction + integer aggregation (the
    // schema-on-read path; from_json with a declared StructType is the
    // fixed-schema alternative and plans identically here). DuckDB
    // mirrors with ->> text extraction.
    Q("ev_json_extract",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k, max(k) AS max_k,
               CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_high
        FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k
              FROM events)
        GROUP BY event_type""")),

    // ---- event-type funnel via conditional aggregation ---------------------
    // Per-user pivot of event counts — count(CASE) keeps it one map-side
    // combinable aggregate instead of N filtered self-joins.
    Q("ev_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
        def cnt(t: String): Column =
          count(when(col("event_type") === t, 1)).as(s"n_$t")
        e.groupBy(col("user_id"))
          .agg(cnt("signup"), cnt("purchase"), cnt("error"),
            count(lit(1)).as("n_total"))
          .filter(col("n_purchase") > 0)
      },
      Some("""
        SELECT user_id,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
               count(*) AS n_total
        FROM events GROUP BY user_id HAVING n_purchase > 0""")),

    // ---- sliding-window anomaly detection (rolling z-score) ----------------
    // Per-user rolling baseline over the 20 PRECEDING events (excluding the
    // current one — the classic online-monitoring frame): flag a value more
    // than 2σ from the trailing mean. The test is done ENTIRELY in integer
    // arithmetic on the 2-decimal fixed-point value q: multiplying
    // |q−mean| > 2σ through by n² gives (q·n − s1)² > 4·(n·s2 − s1²) with
    // s1=Σq, s2=Σq² — exact longs, so both engines agree bit-for-bit where
    // a float mean/stddev would be summation-order-dependent. Scale shape:
    // one exchange on user_id, one per-partition window pass, no global
    // sort; n ≥ 10 guards the cold-start rows.
    Q("ev_zscore",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("q", round(col("value") * 100).cast("long"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ems"), col("event_id"))
          .rowsBetween(-20, -1)
        e.withColumn("n", count(lit(1)).over(w))
          .withColumn("s1", sum(col("q")).over(w))
          .withColumn("s2", sum(col("q") * col("q")).over(w))
          .filter(col("n") >= 10)
          .withColumn("dev2",
            (col("q") * col("n") - col("s1")) * (col("q") * col("n") - col("s1")))
          .withColumn("var_n2",
            col("n") * col("s2") - col("s1") * col("s1"))
          .filter(col("dev2") > lit(4L) * col("var_n2"))
          .select(col("user_id"), col("event_id"), col("ems"), col("q"),
            col("n"), col("dev2"), col("var_n2"))
      },
      Some("""
        WITH q AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems,
                 CAST(round(value * 100) AS BIGINT) AS q
          FROM events),
        w AS (
          SELECT user_id, event_id, ems, q,
                 count(*) OVER win AS n,
                 CAST(sum(q) OVER win AS BIGINT) AS s1,
                 CAST(sum(q * q) OVER win AS BIGINT) AS s2
          FROM q
          WINDOW win AS (PARTITION BY user_id ORDER BY ems, event_id
                         ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        SELECT user_id, event_id, ems, q, n,
               (q * n - s1) * (q * n - s1) AS dev2,
               n * s2 - s1 * s1 AS var_n2
        FROM w
        WHERE n >= 10
          AND (q * n - s1) * (q * n - s1) > 4 * (n * s2 - s1 * s1)""")),

    // ---- SCD2 / change-data-capture interval construction ------------------
    // The warehouse "type-2 dimension" build: per user, collapse
    // consecutive runs of the same event_type into validity intervals
    // [valid_from, valid_to) with the last state open (valid_to NULL).
    // PURE window functions, no aggregate: a run's first event (lag
    // change flag = 1) carries the whole interval — state and valid_from
    // directly, valid_to = the next start's time, and n_events from
    // row-number differences between starts. One user_id exchange, a few
    // per-partition window passes over the same sort, then a filter —
    // no self-join, no global sort, and (deliberately) no min(string)
    // aggregate, which would force a SortAggregate pair where a window
    // over the existing sort is free.
    Q("ev_scd2",
      (s, dir) => scd2Intervals(Tables.events(s, dir)),
      Some(s"""
        WITH $scd2IvSql
        SELECT user_id, run_id, state, valid_from, valid_to, is_current,
               n_events
        FROM iv""")),

    // ---- state occupancy (dwell-time report over the SCD2 intervals) -------
    // The report CDC consumers actually read: per state, how many
    // intervals exist, how many are still open, and the total/mean
    // CLOSED dwell time — composed off the exact scd2Intervals
    // definition, so the ledger can never disagree with the interval
    // table it summarizes. One combinable aggregate over the interval
    // rows (model-sized output: |states| rows); mean is integer-exact
    // `div`.
    Q("ev_dwell",
      (s, dir) => scd2Intervals(Tables.events(s, dir))
        .groupBy(col("state"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("is_current").cast("long")).as("n_open"),
          sum(when(col("valid_to").isNotNull,
            col("valid_to") - col("valid_from")).otherwise(lit(0L)))
            .as("total_dwell_ms"),
          sum(col("n_events")).as("n_events"))
        .withColumn("mean_dwell_ms",
          call_function("div", col("total_dwell_ms"),
            greatest(col("n_intervals") - col("n_open"), lit(1L)))),
      Some(s"""
        WITH $scd2IvSql
        SELECT state, count(*) AS n_intervals,
               CAST(sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_open,
               CAST(sum(CASE WHEN valid_to IS NOT NULL
                             THEN valid_to - valid_from ELSE 0 END)
                 AS BIGINT) AS total_dwell_ms,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN valid_to IS NOT NULL
                             THEN valid_to - valid_from ELSE 0 END)
                 // greatest(count(*) - sum(CASE WHEN is_current THEN 1
                                           ELSE 0 END), 1)
                 AS BIGINT) AS mean_dwell_ms
        FROM iv GROUP BY state""")),

    // ---- windowed distinct-user estimation (HLL × event-time windows) ------
    // "Unique visitors per window" at stream scale: per (30 s tumbling
    // window, event_type), an m=64 integer HyperLogLog register table and
    // its raw estimate next to the exact distinct count. The sketch path
    // shuffles (window, type, bucket) → max — fixed m rows per group and
    // fully map-side combinable, where exact distinct must move every
    // distinct user id per window; at 100 TB the sketch IS the feasible
    // plan and the exact side is the (gradeable) accuracy check.
    Q("ev_hll_window",
      (s, dir) => {
        import graft.functions.Hll
        val m = 64
        val e = Tables.events(s, dir)
          .select((call_function("div", col("ems"), lit(30000L)) * 30000L)
              .as("window_start"),
            col("event_type"), Hll.hash(col("user_id")).as("h"))
        val regs = e
          .select(col("window_start"), col("event_type"),
            Hll.bucket(col("h"), m).as("bucket"),
            Hll.rho(col("h"), m).as("rho"))
          .groupBy(col("window_start"), col("event_type"), col("bucket"))
          .agg(max(col("rho")).as("reg"))
        val est = Hll.estimate(regs, m, col("window_start"), col("event_type"))
        val exact = e.groupBy(col("window_start"), col("event_type"))
          .agg(countDistinct(col("h")).as("n_users_exact"))
        exact.join(est, Seq("window_start", "event_type"))
          .select(col("window_start"), col("event_type"),
            col("n_users_exact"), col("est_milli"))
      },
      Some("""
        WITH h AS (
          SELECT CAST(floor(epoch_ms(ts) / 30000) * 30000 AS BIGINT)
                   AS window_start,
                 event_type,
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS h
          FROM events),
        regs AS (
          SELECT window_start, event_type, h % 64 AS bucket,
                 max(CASE WHEN (h // 64) % 4294967296 = 0 THEN 33
                          ELSE 33 - length(bin((h // 64) % 4294967296))
                     END) AS reg
          FROM h GROUP BY 1, 2, 3),
        est AS (
          SELECT window_start, event_type,
                 CAST((709 * 64 * 64 * 8589934592) //
                   (CAST(sum(1::BIGINT << CAST(33 - reg AS INTEGER))
                      AS BIGINT) +
                    (64 - count(*)) * 8589934592) AS BIGINT) AS est_milli
          FROM regs GROUP BY 1, 2)
        SELECT e.window_start, e.event_type,
               count(DISTINCT e.h) AS n_users_exact, s.est_milli
        FROM h e JOIN est s ON s.window_start = e.window_start
                           AND s.event_type = e.event_type
        GROUP BY e.window_start, e.event_type, s.est_milli""")),

    // ---- first/last-touch attribution --------------------------------------
    // The marketing-attribution primitive: per user, the first and last
    // event_type on their timeline (first_value/last_value over the
    // UNBOUNDED frame — the one window shape where the default frame is a
    // correctness trap: last_value over the default RANGE..CURRENT ROW
    // frame returns the CURRENT row's value) plus journey span. One
    // user_id exchange, one per-partition pass, then a distinct — no
    // self-join against min/max timestamps.
    Q("ev_first_touch",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ems"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        e.select(col("user_id"),
            first(col("event_type")).over(w).as("first_touch"),
            last(col("event_type")).over(w).as("last_touch"),
            min(col("ems")).over(w).as("first_ems"),
            max(col("ems")).over(w).as("last_ems"),
            count(lit(1)).over(w).as("n_events"))
          .distinct()
          .withColumn("span_ms", col("last_ems") - col("first_ems"))
      },
      Some("""
        SELECT DISTINCT user_id,
               first_value(event_type) OVER win AS first_touch,
               last_value(event_type) OVER win AS last_touch,
               min(epoch_ms(ts)) OVER win AS first_ems,
               max(epoch_ms(ts)) OVER win AS last_ems,
               count(*) OVER win AS n_events,
               max(epoch_ms(ts)) OVER win - min(epoch_ms(ts)) OVER win
                 AS span_ms
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)""")),

    // ---- Markov transition matrix over user journeys -----------------------
    // Journey analytics: global (prev event_type → next event_type)
    // transition counts and row-normalized probabilities (integer
    // millis — n·1000 div row-total, so both engines agree exactly).
    // lag per user (one user_id exchange), then a combinable hash
    // aggregate on the pair; the probability window runs over the
    // |event_types|² aggregate, not the event stream — model-sized.
    Q("ev_transitions",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ems"), col("event_id"))
        val counts = e
          .withColumn("prev", lag(col("event_type"), 1).over(byTime))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("n"))
        val byPrev = Window.partitionBy(col("prev"))
        counts
          .withColumn("p_milli", call_function("div",
            col("n") * 1000, sum(col("n")).over(byPrev)))
          .select(col("prev"), col("next"), col("n"), col("p_milli"))
      },
      Some("""
        WITH t AS (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS prev
          FROM events),
        c AS (
          SELECT prev, event_type AS next, count(*) AS n
          FROM t WHERE prev IS NOT NULL GROUP BY 1, 2)
        SELECT prev, next, n,
               CAST((n * 1000) //
                 CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT)
                 AS BIGINT) AS p_milli
        FROM c""")),

    // ---- MERGE / upsert (CDC apply onto a dimension snapshot) --------------
    // The warehouse MERGE INTO shape: a change set (each user's LATEST
    // event value — map-side WindowGroupLimit keeps one row per user
    // before any exchange) applied onto the customer snapshot with
    // matched→update / not-matched→insert / untouched→keep actions.
    // One full-outer join on the key after the change set collapses to
    // ≤|users| rows — the change set never rescans, the target scans
    // once; at production scale this is exactly Delta/Iceberg MERGE's
    // join, minus the transactional file rewrite.
    Q("ev_merge_upsert",
      (s, dir) => {
        val tgt = Tables(s, dir, "customer")
          .select(col("c_custkey").as("tkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        val byU = Window.partitionBy(col("user_id"))
          .orderBy(col("ems").desc, col("event_id").desc)
        val upd = Tables.events(s, dir)
          .withColumn("rn", row_number().over(byU)).filter(col("rn") === 1)
          .select(col("user_id").as("ukey"),
            round(col("value") * 100).cast("long").as("last_value_cents"),
            col("ems").as("last_ems"))
        // actions derive from JOIN-KEY nullness (side present/absent),
        // exactly like the SQL mirror — value columns (bal_cents,
        // last_ems) may legitimately be NULL on a matched row
        tgt.join(upd, col("ukey") === col("tkey"), "full_outer")
          .select(coalesce(col("tkey"), col("ukey")).as("key"),
            when(col("ukey").isNull, lit("keep"))
              .when(col("tkey").isNull, lit("insert"))
              .otherwise(lit("update")).as("action"),
            coalesce(col("last_value_cents"), col("bal_cents"))
              .as("new_balance_cents"),
            col("last_ems"))
      },
      Some("""
        WITH tgt AS (
          SELECT c_custkey AS key,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer),
        upd AS (
          SELECT user_id AS key, last_value_cents, last_ems FROM (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS last_value_cents,
                   epoch_ms(ts) AS last_ems,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1)
        SELECT coalesce(t.key, u.key) AS key,
               CASE WHEN u.key IS NULL THEN 'keep'
                    WHEN t.key IS NULL THEN 'insert'
                    ELSE 'update' END AS action,
               coalesce(u.last_value_cents, t.bal_cents)
                 AS new_balance_cents,
               u.last_ems
        FROM tgt t FULL OUTER JOIN upd u ON u.key = t.key""")),

    // ---- per-window trending top-k ------------------------------------------
    // The "what's trending right now" query: top-3 event types per 15s
    // tumbling window by count. Two-exchange shape and both are small: a
    // map-side-combinable (window, type) count, then a rank window
    // PARTITIONed by the time window — at 100 TB the ranked input is
    // |windows|×|types| aggregate rows, not events, and WindowGroupLimit
    // pushes the rank<=3 cut map-side before that second exchange.
    Q("ev_window_topk",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val counts = e.groupBy(window(col("ts"), "15 seconds").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_millis(col("w.start")).as("window_start"),
            col("event_type"), col("n"))
        val w = Window.partitionBy(col("window_start"))
          .orderBy(col("n").desc, col("event_type").asc)
        counts.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
      },
      Some("""
        WITH c AS (
          SELECT CAST(floor(epoch_ms(ts) / 15000) * 15000 AS BIGINT)
                   AS window_start,
                 event_type, count(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT window_start, event_type, n, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY window_start
                      ORDER BY n DESC, event_type ASC) AS rank
          FROM c) WHERE rank <= 3""")),

    // ---- hot-key salted join: the cohort-revenue report, skew-safe ---------
    // ev_salted_agg covers aggregation skew; this covers JOIN skew — the
    // viral-user case where one key's shuffle write serializes on a single
    // reducer and AQE can't help (its skew split is post-shuffle, and
    // unavailable to streaming joins). Salt.saltedJoinHot spreads ONLY the
    // pre-identified heavy keys (here: users with ≥ HotN events — in
    // production, a heavy-hitters sketch pass) across 8 salted reducers,
    // replicating just those keys' dimension rows; cold keys pay nothing.
    // The report itself is the classic cohort shape: events join each
    // user's signup time, revenue bucketed by weeks-since-signup. The
    // oracle is the PLAIN join — salting must be invisible in the result
    // (multiplicity preserved bit-for-bit); SaltSpec asserts the salted
    // shuffle key and the hot/cold replication factors directly.
    Q("ev_salted_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val perUser = e.groupBy(col("user_id"))
          .agg(min(col("ems")).as("signup_ms"), count(lit(1)).as("n_ev"))
        val signup = perUser.select(col("user_id"), col("signup_ms"))
        val hot = perUser.filter(col("n_ev") >= HotN).select("user_id")
        graft.ops.Salt.saltedJoinHot(
            e.select(col("user_id"), col("ems"), col("event_id"),
              col("value")),
            signup, Seq("user_id"), col("event_id"), 8, hot)
          .withColumn("week", expr("(ems - signup_ms) div 604800000"))
          .groupBy(col("week"))
          .agg(count(lit(1)).as("n_events"),
            fxsum(col("value"), 2).as("sum_value"))
      },
      Some(s"""
        WITH signup AS (
          SELECT user_id, min(epoch_ms(ts)) AS signup_ms
          FROM events GROUP BY user_id)
        SELECT (epoch_ms(e.ts) - s.signup_ms) // 604800000 AS week,
               count(*) AS n_events,
               ${fxsumSql("e.value", 2)} AS sum_value
        FROM events e JOIN signup s USING (user_id)
        GROUP BY 1""")),

    // ---- bitmap cohort retention: set algebra instead of re-joins ----------
    // ev_retention answers ONE cohort question with a per-user join; this
    // is the form that answers MANY: build one exact user bitmap per
    // signup cohort and one per active week — a single combinable
    // aggregation each, bitwise-OR merge, so duplicate events cost
    // nothing and NO distinct pass or per-user join ever runs — then
    // every (cohort, week) retention cell is a popcount over bitwise AND
    // on the model-sized bitmap tables (the Druid/ClickHouse groupBitmap
    // pattern; functions.BitmapSketch documents the RoaringBitmap swap
    // for sparse production id spaces). The non-equi grid join is
    // |cohort-weeks| × |active-weeks| — time-span-sized, never
    // data-sized (the txt_source_mix bound, as a BNLJ). Zero-retained
    // cells report too: a fully-churned cohort is the finding.
    Q("ev_bitmap_retention",
      (s, dir) => {
        import graft.functions.BitmapSketch
        val bm = udaf(new BitmapSketch(64)) // 4096-id space ⊇ fixture users
        val e = Tables.events(s, dir)
        val su = e.groupBy(col("user_id"))
          .agg(min(col("ems")).as("s_ems"))
          .select(col("user_id"),
            expr("s_ems div 604800000").as("cohort_week"))
        val cohorts = su.groupBy(col("cohort_week"))
          .agg(bm(col("user_id")).as("cbm"), count(lit(1)).as("n_signup"))
        val active = e
          .select(col("user_id"), expr("ems div 604800000").as("week"))
          .groupBy(col("week")).agg(bm(col("user_id")).as("abm"))
        cohorts.join(active, col("week") >= col("cohort_week"))
          .select(col("cohort_week"), col("week"), col("n_signup"),
            BitmapSketch.cardinality(
              BitmapSketch.and(col("cbm"), col("abm"))).as("n_retained"))
      },
      Some("""
        WITH su AS (
          SELECT user_id, min(epoch_ms(ts)) // 604800000 AS cohort_week
          FROM events GROUP BY user_id),
        coh AS (SELECT cohort_week, count(*) AS n_signup
                FROM su GROUP BY 1),
        wk AS (SELECT DISTINCT epoch_ms(ts) // 604800000 AS week
               FROM events),
        act AS (SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week
                FROM events),
        ret AS (
          SELECT su.cohort_week, act.week, count(*) AS n_retained
          FROM su JOIN act ON act.user_id = su.user_id
                          AND act.week >= su.cohort_week
          GROUP BY 1, 2)
        SELECT c.cohort_week, w.week, c.n_signup,
               coalesce(r.n_retained, 0) AS n_retained
        FROM coh c JOIN wk w ON w.week >= c.cohort_week
        LEFT JOIN ret r ON r.cohort_week = c.cohort_week
                       AND r.week = w.week""")),

    // ---- watermark-delay sizing: out-of-order lateness distribution --------
    // The third sizing table (after ev_gap_stats / txt_len_stats): the
    // number a streaming operator reads to CHOOSE its withWatermark delay.
    // The fixture has no arrival column (events are perfectly event-time
    // ordered), so arrival is synthesized deterministically — event time
    // plus an md5-derived transport delay uniform in [0, 30 min), the
    // dd_url_dedup synthesis discipline, mirrored exactly in the oracle.
    // Lateness is then measured the way Structured Streaming actually
    // advances watermarks — per micro-batch, not per row: arrivals bucket
    // into 1-minute batches, the watermark before bucket b is the max
    // event time over all strictly earlier buckets, and an event's
    // lateness is how far it trails that watermark. Plan shape: one
    // combinable per-bucket max (the only corpus-sized exchange), a
    // running max over the bucket table (|span|/1min rows — grows with
    // wall-clock span, not data; the txt_source_mix model-size exemption),
    // broadcast back, then a combinable per-type aggregate. The exact
    // quartiles follow the q17 binary-exact parity discipline (q17b's
    // sketch is the scale swap).
    Q("ev_lateness",
      (s, dir) => {
        // composed off the SHARED bucketed-watermark definition (the
        // ev_dwell discipline): graft.streaming.StreamingLateness holds
        // the scorer + sizing aggregate, its foreachBatch twin reproduces
        // batchReference row-for-row (StreamingLatenessSpec), and this
        // query is the 1-minute-bucket instantiation the oracle pins.
        import graft.streaming.StreamingLateness
        // widened BEFORE the md5 arrival synthesis: the per-row md5 +
        // watermark join otherwise fuse onto the single-row-group scan
        // and run serially (measured 0.47 s of the query's 1.4 s)
        val a = Tables.widen(s, dir, "events", Tables.events(s, dir),
            "event_id")
          .select(col("event_type"), col("ems"), arrivalMs.as("arr_ms"))
        StreamingLateness.sizingTable(
          StreamingLateness.batchReference(a, bucketMs = 60000L))
      },
      Some("""
        WITH a AS (
          SELECT event_type, epoch_ms(ts) AS ems,
                 (epoch_ms(ts) +
                  CAST(('0x' || substr(md5('arr|' || event_id), 1, 15))
                    AS BIGINT) % 1800000) // 60000 AS bucket
          FROM events),
        bw AS (SELECT bucket, max(ems) AS bmax FROM a GROUP BY bucket),
        wm AS (
          SELECT bucket,
                 max(bmax) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS wm_ems
          FROM bw),
        l AS (
          SELECT a.event_type,
                 greatest(0, coalesce(wm.wm_ems - a.ems, 0)) AS late_ms
          FROM a JOIN wm USING (bucket))
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_late,
               quantile_cont(late_ms, 0.25) AS p25_ms,
               quantile_cont(late_ms, 0.5) AS p50_ms,
               quantile_cont(late_ms, 0.75) AS p75_ms,
               max(late_ms) AS max_ms
        FROM l GROUP BY event_type""")),

    // ---- moments sketch: mergeable quantile estimation ---------------------
    // The moments sketch (Gan et al., VLDB 2018): per group keep only
    // {n, power sums s1..s4} — a CONSTANT-size, exactly-mergeable state,
    // vs the O(n·log n) sort (or the non-mergeable exact rank pass) a
    // true percentile needs. Quantiles are then estimated from the
    // standardized central moments via the Cornish–Fisher expansion.
    // Determinism discipline: values are pre-scaled by 2^9 (an exact
    // binary scale, so the division is one lossless IEEE op), every power
    // sum is a fixed-point fxsum (integer addition is order-independent —
    // a plain sum(double^4) over a shuffled 100 TB input is run-order-
    // dependent), and the CF constants are computed ONCE in Scala and
    // interpolated as the same shortest-repr literal into both engines.
    // The exact rank-based quantiles (the expensive truth this sketch
    // replaces: one full per-group sort) run alongside as the accuracy
    // check, with pure-integer rank thresholds (rn·20 ≥ 19·n) so both
    // engines pick the identical order statistic. Plan shape: one
    // combinable aggregate for the sketch (shuffle carries 5 longs per
    // group), one sort-window pass for the truth, and a |groups|-row
    // broadcast join to lay them side by side.
    Q("ev_moments_quantile",
      (s, dir) => {
        // sketch + CF fold are graft.streaming.StreamingMoments — ONE
        // definition shared with the windowed streaming variant; the
        // mergeability law (window-merged sums fold to THESE bits) is
        // proven in StreamingMomentsSpec.
        import graft.streaming.StreamingMoments
        val e = Tables.events(s, dir)
        val aggs = StreamingMoments.sketchAggs(col("value"))
        val m = StreamingMoments.quantiles(
          e.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*))
        // exact truth: ONE per-group sort-window pass, both order
        // statistics pulled out as conditional mins in a single
        // combinable aggregate (integer rank thresholds) — not one
        // window + filter + join per quantile
        val byV = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        val exact = e
          .withColumn("rn", row_number().over(byV).cast("long"))
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(min(when(col("rn") * 2 >= col("cnt"), col("value")))
            .as("q50_exact"),
            min(when(col("rn") * 20 >= col("cnt") * 19, col("value")))
              .as("q95_exact"))
        m.join(broadcast(exact), "event_type")
          .select(col("event_type"), col("n"), col("mean"), col("std"),
            col("skew"), col("kurt"), col("q50_est"), col("q95_est"),
            col("q50_exact"), col("q95_exact"))
      },
      Some({
        s"""
        WITH ${momentsCfSql("events", "event_type")},
        r AS (
          SELECT event_type, value,
                 CAST(row_number() OVER
                   (PARTITION BY event_type ORDER BY value, event_id)
                   AS BIGINT) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS cnt
          FROM events),
        ex AS (
          SELECT event_type,
                 min(CASE WHEN rn * 2 >= cnt THEN value END) AS q50_exact,
                 min(CASE WHEN rn * 20 >= cnt * 19 THEN value END)
                   AS q95_exact
          FROM r GROUP BY 1)
        SELECT qq.event_type, n, m1 * 512.0 AS mean, stdw * 512.0 AS std,
               skew, kurt, q50w * 512.0 AS q50_est, q95w * 512.0 AS q95_est,
               q50_exact, q95_exact
        FROM qq
        JOIN ex ON ex.event_type = qq.event_type"""
      })),

    // ---- the per-day moments grid (the streaming sketch's batch form) ------
    // StreamingMoments.windowedSketch's exact batch shape under the
    // oracle: one combinable (day, type) sketch aggregate + the shared
    // CF fold — the daily quantile-tracking table an ops dashboard
    // maintains online (StreamingMomentsSpec proves the streamed rows
    // match this aggregation bit-for-bit, and that these per-day
    // sketches MERGE by addition into ev_moments_quantile's global
    // bits). One shuffle carrying 5 longs per (day, type); no truth
    // pass here — the global query carries the accuracy check.
    Q("ev_moments_window",
      (s, dir) => {
        import graft.streaming.StreamingMoments
        val aggs = StreamingMoments.sketchAggs(col("value"))
        StreamingMoments.quantiles(
          Tables.events(s, dir)
            .withColumn("day", expr("ems div 86400000"))
            .groupBy(col("day"), col("event_type"))
            .agg(aggs.head, aggs.tail: _*))
          .select(col("day"), col("event_type"), col("n"), col("mean"),
            col("std"), col("q50_est"), col("q95_est"))
      },
      Some(s"""
        WITH ${momentsCfSql(
          "(SELECT *, epoch_ms(ts) // 86400000 AS day FROM events)",
          "day, event_type")}
        SELECT day, event_type, n, m1 * 512.0 AS mean,
               stdw * 512.0 AS std, q50w * 512.0 AS q50_est,
               q95w * 512.0 AS q95_est
        FROM qq""")),

    // ---- funnel latency: time-to-convert by signup cohort ------------------
    // Per signup-cohort-week, the signup→purchase latency distribution:
    // the moments-sketch p50/p95 (the shared StreamingMoments kernel on
    // a third grain — global, per-day, now per-cohort — one kernel,
    // three grains) next to the exact rank quantiles. Latency is carried
    // in DAYS so the kernel's 2⁹ pre-scale keeps every power ≪ 1 and
    // the fixed-point sums far from overflow at any cohort size. Plan
    // shape: two per-user first-event aggregates (combinable) joined on
    // user_id, then one combinable (week) sketch aggregate + one
    // sort-window truth pass over conversion-sized (not event-sized)
    // rows.
    Q("ev_funnel_latency",
      (s, dir) => {
        import graft.streaming.StreamingMoments
        val e = Tables.events(s, dir)
        def first(t: String, as: String) =
          e.filter(col("event_type") === t)
            .groupBy(col("user_id")).agg(min(col("ems")).as(as))
        val lat = first("signup", "s_ems")
          .join(first("purchase", "p_ems"), "user_id")
          .filter(col("p_ems") >= col("s_ems"))
          .withColumn("week", expr("s_ems div 604800000"))
          .withColumn("lat_days",
            (col("p_ems") - col("s_ems")).cast("double") / lit(86400000.0))
        val aggs = StreamingMoments.sketchAggs(col("lat_days"))
        val sk = StreamingMoments.quantiles(
          lat.groupBy(col("week")).agg(aggs.head, aggs.tail: _*))
        val byV = Window.partitionBy(col("week"))
          .orderBy(col("lat_days"), col("user_id"))
        val exact = lat
          .withColumn("rn", row_number().over(byV).cast("long"))
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy(col("week"))))
          .groupBy(col("week"))
          .agg(min(when(col("rn") * 2 >= col("cnt"), col("lat_days")))
            .as("q50_exact"),
            min(when(col("rn") * 20 >= col("cnt") * 19, col("lat_days")))
              .as("q95_exact"))
        sk.join(broadcast(exact), "week")
          .select(col("week"), col("n"), col("mean"), col("std"),
            col("q50_est"), col("q95_est"),
            col("q50_exact"), col("q95_exact"))
      },
      Some {
        val src = """
          (SELECT s.user_id, s.s_ems // 604800000 AS week,
                  CAST(p.p_ems - s.s_ems AS DOUBLE) / 86400000.0 AS value
           FROM (SELECT user_id, min(epoch_ms(ts)) AS s_ems FROM events
                 WHERE event_type = 'signup' GROUP BY 1) s
           JOIN (SELECT user_id, min(epoch_ms(ts)) AS p_ems FROM events
                 WHERE event_type = 'purchase' GROUP BY 1) p
             ON p.user_id = s.user_id
           WHERE p.p_ems >= s.s_ems)"""
        s"""
        WITH ${momentsCfSql(src, "week")},
        r AS (
          SELECT week, value,
                 CAST(row_number() OVER
                   (PARTITION BY week ORDER BY value, user_id)
                   AS BIGINT) AS rn,
                 count(*) OVER (PARTITION BY week) AS cnt
          FROM $src),
        ex AS (
          SELECT week,
                 min(CASE WHEN rn * 2 >= cnt THEN value END) AS q50_exact,
                 min(CASE WHEN rn * 20 >= cnt * 19 THEN value END)
                   AS q95_exact
          FROM r GROUP BY 1)
        SELECT qq.week, n, m1 * 512.0 AS mean, stdw * 512.0 AS std,
               q50w * 512.0 AS q50_est, q95w * 512.0 AS q95_est,
               q50_exact, q95_exact
        FROM qq JOIN ex ON ex.week = qq.week"""
      }),

    // ---- seasonality: hour-of-day uniformity (integer chi-square) ----------
    // Per event type, the 24-bin hour-of-day profile reduced to a
    // chi-square uniformity statistic — kept ENTIRELY in integers:
    // χ² = Σ(obs − n/24)²/(n/24) = Σ(24·obs − n)² / (24·n), so
    // chi2_milli = (1000·Σ(24·obs − n)²) div (24·n) is exact where a
    // float expectation would drift. The verdict flag compares against
    // the χ²₀.₉₉₉(23 dof) ≈ 49.728 critical value as an integer
    // millis literal. Two combinable aggregates ((type, hour) counts,
    // then per-type fold) — the peak hour is the min hour among max
    // bins, a deterministic argmax.
    Q("ev_seasonality",
      (s, dir) => {
        val bins = Tables.events(s, dir)
          .withColumn("hour", expr("(ems div 3600000) % 24"))
          .groupBy(col("event_type"), col("hour"))
          .agg(count(lit(1)).as("obs"))
        // windows run over the |types|×24 aggregate table (model-sized,
        // the ev_transitions exemption), never the event stream
        val wT = Window.partitionBy(col("event_type"))
        val en = bins
          .withColumn("n", sum(col("obs")).over(wT))
          .withColumn("mx", max(col("obs")).over(wT))
        en.groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            count(lit(1)).as("n_hours"),
            sum((col("obs") * 24 - col("n")) * (col("obs") * 24 - col("n")))
              .as("chi2_num"),
            max(col("obs")).as("peak_obs"),
            min(when(col("obs") === col("mx"), col("hour"))).as("peak_hour"))
          // empty bins contribute (24·0 − n)² = n² each
          .withColumn("chi2_milli", expr(
            "((chi2_num + (24 - n_hours) * (n * n)) * 1000) div (24 * n)"))
          .select(col("event_type"), col("n"), col("chi2_milli"),
            col("peak_hour"), col("peak_obs"),
            (col("chi2_milli") > 49728L).as("nonuniform"))
      },
      Some("""
        WITH bins AS (
          SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hour,
                 count(*) AS obs
          FROM events GROUP BY 1, 2),
        en AS (
          SELECT *, CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n,
                 max(obs) OVER (PARTITION BY event_type) AS mx
          FROM bins),
        f AS (
          SELECT event_type, max(n) AS n, count(*) AS n_hours,
                 CAST(sum((obs * 24 - n) * (obs * 24 - n)) AS BIGINT)
                   AS chi2_num,
                 max(obs) AS peak_obs,
                 min(CASE WHEN obs = mx THEN hour END) AS peak_hour
          FROM en GROUP BY 1)
        SELECT event_type, n,
               CAST(((chi2_num + (24 - n_hours) * (n * n)) * 1000)
                 // (24 * n) AS BIGINT) AS chi2_milli,
               peak_hour, CAST(peak_obs AS BIGINT) AS peak_obs,
               ((chi2_num + (24 - n_hours) * (n * n)) * 1000)
                 // (24 * n) > 49728 AS nonuniform
        FROM f""")),

    // ---- A/B comparison: Welch z-test between two event populations --------
    // The experiment-analysis primitive: compare mean `value` between
    // two event types with a Welch (unequal-variance) z statistic —
    // ONE combinable single-row aggregate (conditional fxsums, the
    // txt_classifier_eval confusion-matrix shape), then the z arithmetic
    // as a constant projection: sample variances from exact fixed-point
    // power sums, z = Δmean / sqrt(v_a/n_a + v_b/n_b), verdict |z| >
    // 1.96 (two-sided 5%). Every division/sqrt is one correctly-rounded
    // IEEE op over fxsum-exact inputs with mirrored association, so the
    // statistic — not just the counts — is under the hash gate.
    Q("ev_ab_test",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "view"))
        def side(t: String, sfx: String) = Seq(
          sum(when(col("event_type") === t, 1L).otherwise(0L))
            .as(s"n$sfx"),
          fxsum(when(col("event_type") === t, col("value"))
            .otherwise(lit(0.0)), 6).as(s"s1$sfx"),
          fxsum(when(col("event_type") === t, col("value") * col("value"))
            .otherwise(lit(0.0)), 6).as(s"s2$sfx"))
        val aggs = side("click", "_a") ++ side("view", "_b")
        val g = e.agg(aggs.head, aggs.tail: _*)
        def mean(sfx: String) = col(s"s1$sfx") / col(s"n$sfx")
        g.withColumn("mean_a", mean("_a")).withColumn("mean_b", mean("_b"))
          .withColumn("var_a",
            ((col("s2_a") / col("n_a")) - (col("mean_a") * col("mean_a"))) *
              (col("n_a") / (col("n_a") - 1)))
          .withColumn("var_b",
            ((col("s2_b") / col("n_b")) - (col("mean_b") * col("mean_b"))) *
              (col("n_b") / (col("n_b") - 1)))
          .withColumn("z", (col("mean_a") - col("mean_b")) /
            sqrt((col("var_a") / col("n_a")) + (col("var_b") / col("n_b"))))
          .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
            col("var_a"), col("var_b"), col("z"),
            (abs(col("z")) > lit(1.96)).as("significant"))
      },
      Some(s"""
        WITH g AS (
          SELECT
            CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
            ${fxsumSql(
              "CASE WHEN event_type = 'click' THEN value ELSE 0.0 END", 6)}
              AS s1_a,
            ${fxsumSql("CASE WHEN event_type = 'click' " +
              "THEN value * value ELSE 0.0 END", 6)} AS s2_a,
            CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b,
            ${fxsumSql(
              "CASE WHEN event_type = 'view' THEN value ELSE 0.0 END", 6)}
              AS s1_b,
            ${fxsumSql("CASE WHEN event_type = 'view' " +
              "THEN value * value ELSE 0.0 END", 6)} AS s2_b
          FROM events WHERE event_type IN ('click', 'view')),
        m AS (
          SELECT *, s1_a / n_a AS mean_a, s1_b / n_b AS mean_b FROM g),
        v AS (
          SELECT *,
            ((s2_a / n_a) - (mean_a * mean_a)) * (n_a / (n_a - 1)) AS var_a,
            ((s2_b / n_b) - (mean_b * mean_b)) * (n_b / (n_b - 1)) AS var_b
          FROM m)
        SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
               (mean_a - mean_b) /
                 sqrt((var_a / n_a) + (var_b / n_b)) AS z,
               abs((mean_a - mean_b) /
                 sqrt((var_a / n_a) + (var_b / n_b))) > 1.96 AS significant
        FROM v""")),

    // ---- experiment power analysis (the ev_ab_test companion) --------------
    // The question every A/B consumer asks next: is the sample big
    // enough? Two-sample power analysis at α=0.05 (two-sided), power
    // 0.8, for a minimal detectable effect of 5% of the control mean:
    // n_required per arm = ⌈(z_α/2 + z_β)²·(σ²_a + σ²_b)/δ²⌉. Same
    // ONE-row conditional-fxsum aggregate as ev_ab_test (the stream is
    // scanned once); variances are exact integer power sums, and the
    // power arithmetic is a constant projection of mirrored IEEE ops, so
    // the verdict BOOLEAN — not just the counts — sits under the hash.
    Q("ev_power",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "view"))
        def side(t: String, sfx: String) = Seq(
          sum(when(col("event_type") === t, 1L).otherwise(0L))
            .as(s"n$sfx"),
          fxsum(when(col("event_type") === t, col("value"))
            .otherwise(lit(0.0)), 6).as(s"s1$sfx"),
          fxsum(when(col("event_type") === t, col("value") * col("value"))
            .otherwise(lit(0.0)), 6).as(s"s2$sfx"))
        val aggs = side("click", "_a") ++ side("view", "_b")
        val g = e.agg(aggs.head, aggs.tail: _*)
        def mean(sfx: String) = col(s"s1$sfx") / col(s"n$sfx")
        def variance(sfx: String) =
          ((col(s"s2$sfx") / col(s"n$sfx")) -
            (col(s"mean$sfx") * col(s"mean$sfx"))) *
            (col(s"n$sfx") / (col(s"n$sfx") - 1))
        g.withColumn("mean_a", mean("_a")).withColumn("mean_b", mean("_b"))
          .withColumn("var_a", variance("_a"))
          .withColumn("var_b", variance("_b"))
          .withColumn("delta", col("mean_a") * 0.05)
          .withColumn("n_required",
            ceil(lit(7.848855622911983) * (col("var_a") + col("var_b")) /
              (col("delta") * col("delta"))).cast("long"))
          .select(col("n_a"), col("n_b"), col("var_a"), col("var_b"),
            col("delta"), col("n_required"),
            (least(col("n_a"), col("n_b")) >= col("n_required"))
              .as("adequately_powered"))
      },
      Some(s"""
        WITH g AS (
          SELECT
            CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
            ${fxsumSql(
              "CASE WHEN event_type = 'click' THEN value ELSE 0.0 END", 6)}
              AS s1_a,
            ${fxsumSql("CASE WHEN event_type = 'click' " +
              "THEN value * value ELSE 0.0 END", 6)} AS s2_a,
            CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b,
            ${fxsumSql(
              "CASE WHEN event_type = 'view' THEN value ELSE 0.0 END", 6)}
              AS s1_b,
            ${fxsumSql("CASE WHEN event_type = 'view' " +
              "THEN value * value ELSE 0.0 END", 6)} AS s2_b
          FROM events WHERE event_type IN ('click', 'view')),
        m AS (
          SELECT *, s1_a / n_a AS mean_a, s1_b / n_b AS mean_b FROM g),
        v AS (
          SELECT *,
            ((s2_a / n_a) - (mean_a * mean_a)) * (n_a / (n_a - 1)) AS var_a,
            ((s2_b / n_b) - (mean_b * mean_b)) * (n_b / (n_b - 1)) AS var_b,
            mean_a * 0.05e0 AS delta
          FROM m)
        SELECT n_a, n_b, var_a, var_b, delta,
               CAST(ceil(7.848855622911983e0 * (var_a + var_b) /
                 (delta * delta)) AS BIGINT) AS n_required,
               least(n_a, n_b) >= CAST(ceil(7.848855622911983e0 *
                 (var_a + var_b) / (delta * delta)) AS BIGINT)
                 AS adequately_powered
        FROM v""")),

    // ---- RFM segmentation (the lifecycle-marketing scoring table) ----------
    // Classic recency/frequency/monetary scoring, built scale-first:
    // scores do NOT come from a global ntile (a |users|-sized
    // single-partition sort); instead exact quartile THRESHOLDS are one
    // model-sized aggregate over the per-user metric table, broadcast
    // back as a 1-row side, and every score is a threshold comparison —
    // the q14 broadcast-back shape. Metrics are deterministic (integer
    // day recency, integer purchase counts, fixed-point monetary) and
    // quartile boundaries interpolate identically in both engines, so
    // the segment LABELS are hash-gated. Recency scores invert (fewer
    // days since last event = better).
    Q("ev_rfm",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val nowRow = e.agg(max(col("ems")).as("now_ms"))
        val per = e.groupBy(col("user_id")).agg(
          max(col("ems")).as("last_ms"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("f_n"),
          fxsum(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0)), 3).as("m_val"))
        val withR = per.crossJoin(broadcast(nowRow))
          .withColumn("r_days", call_function("div",
            col("now_ms") - col("last_ms"), lit(86400000L)))
          .select(col("user_id"), col("r_days"), col("f_n"), col("m_val"))
        val th = withR.agg(
          expr("percentile(r_days, 0.25D)").as("r1"),
          expr("percentile(r_days, 0.5D)").as("r2"),
          expr("percentile(r_days, 0.75D)").as("r3"),
          expr("percentile(f_n, 0.25D)").as("f1"),
          expr("percentile(f_n, 0.5D)").as("f2"),
          expr("percentile(f_n, 0.75D)").as("f3"),
          expr("percentile(m_val, 0.25D)").as("m1"),
          expr("percentile(m_val, 0.5D)").as("m2"),
          expr("percentile(m_val, 0.75D)").as("m3"))
        def sc(c: Column, q1: Column, q2: Column, q3: Column): Column =
          lit(1L) + when(c > q1, 1L).otherwise(0L) +
            when(c > q2, 1L).otherwise(0L) + when(c > q3, 1L).otherwise(0L)
        withR.crossJoin(broadcast(th))
          .withColumn("r_score", lit(5L) -
            sc(col("r_days"), col("r1"), col("r2"), col("r3")))
          .withColumn("f_score",
            sc(col("f_n"), col("f1"), col("f2"), col("f3")))
          .withColumn("m_score",
            sc(col("m_val"), col("m1"), col("m2"), col("m3")))
          .withColumn("segment",
            when(col("r_score") >= 3 && col("f_score") >= 3, "champion")
              .when(col("r_score") >= 3, "recent")
              .when(col("f_score") >= 3, "loyal_lapsed")
              .otherwise("hibernating"))
          .select(col("user_id"), col("r_days"), col("f_n"), col("m_val"),
            col("r_score"), col("f_score"), col("m_score"), col("segment"))
      },
      Some(s"""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ems, event_type, value
          FROM events),
        per AS (
          SELECT user_id, max(ems) AS last_ms,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS f_n,
                 ${fxsumSql(
                   "CASE WHEN event_type = 'purchase' THEN value " +
                     "ELSE 0.0 END", 3)} AS m_val
          FROM e GROUP BY 1),
        nw AS (SELECT max(ems) AS now_ms FROM e),
        withr AS (
          SELECT user_id, (nw.now_ms - per.last_ms) // 86400000 AS r_days,
                 f_n, m_val
          FROM per CROSS JOIN nw),
        th AS (
          SELECT quantile_cont(r_days, 0.25) AS r1,
                 quantile_cont(r_days, 0.5) AS r2,
                 quantile_cont(r_days, 0.75) AS r3,
                 quantile_cont(f_n, 0.25) AS f1,
                 quantile_cont(f_n, 0.5) AS f2,
                 quantile_cont(f_n, 0.75) AS f3,
                 quantile_cont(m_val, 0.25) AS m1,
                 quantile_cont(m_val, 0.5) AS m2,
                 quantile_cont(m_val, 0.75) AS m3
          FROM withr),
        scored AS (
          SELECT user_id, r_days, f_n, m_val,
                 5 - (1 + CASE WHEN r_days > r1 THEN 1 ELSE 0 END
                        + CASE WHEN r_days > r2 THEN 1 ELSE 0 END
                        + CASE WHEN r_days > r3 THEN 1 ELSE 0 END)
                   AS r_score,
                 1 + CASE WHEN f_n > f1 THEN 1 ELSE 0 END
                   + CASE WHEN f_n > f2 THEN 1 ELSE 0 END
                   + CASE WHEN f_n > f3 THEN 1 ELSE 0 END AS f_score,
                 1 + CASE WHEN m_val > m1 THEN 1 ELSE 0 END
                   + CASE WHEN m_val > m2 THEN 1 ELSE 0 END
                   + CASE WHEN m_val > m3 THEN 1 ELSE 0 END AS m_score
          FROM withr CROSS JOIN th)
        SELECT user_id, r_days, f_n, m_val,
               CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CASE WHEN r_score >= 3 AND f_score >= 3 THEN 'champion'
                    WHEN r_score >= 3 THEN 'recent'
                    WHEN f_score >= 3 THEN 'loyal_lapsed'
                    ELSE 'hibernating' END AS segment
        FROM scored""")),

    // ---- temporal train/eval split (leakage-safe sequential holdout) -------
    // The split a SEQUENTIAL model needs: per user, the LAST 20% of
    // events (by event time) become eval, the rest train — unlike the
    // reference's random 70/15/15 (O6), no future event can leak into a
    // training prefix, by construction: eval iff rn > (n·4) div 5 over
    // the (ems, event_id)-ordered stream, pure integer arithmetic both
    // engines share. Plan shape: one user_id exchange for the ordering
    // window, then a combinable accounting aggregate; the per-user
    // boundary invariant (max train time ≤ min eval time) is asserted in
    // the spec, not recomputed here.
    Q("ev_temporal_split",
      (s, dir) => {
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ems"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(byTime).cast("long"))
          .withColumn("n_user", count(lit(1)).over(
            Window.partitionBy(col("user_id"))))
          .withColumn("dataset",
            when(col("rn") > call_function("div",
              col("n_user") * 4, lit(5L)), "eval").otherwise("train"))
          .groupBy(col("dataset"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            min(col("ems")).as("min_ems"), max(col("ems")).as("max_ems"))
      },
      Some("""
        WITH r AS (
          SELECT event_type, user_id, epoch_ms(ts) AS ems,
                 CAST(row_number() OVER
                   (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                   AS BIGINT) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n_user
          FROM events),
        d AS (
          SELECT *, CASE WHEN rn > (n_user * 4) // 5
                         THEN 'eval' ELSE 'train' END AS dataset
          FROM r)
        SELECT dataset, event_type, count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               min(ems) AS min_ems, max(ems) AS max_ems
        FROM d GROUP BY 1, 2""")),

    // ---- robust daily anomaly detection (median/MAD, not mean/stddev) ------
    // The monitoring primitive ev_zscore's mean/variance form can't give:
    // median absolute deviation flags outlier DAYS per event type without
    // the outliers themselves dragging the threshold (a traffic spike
    // inflates a stddev but not a MAD). Everything stays integer-exact:
    // daily counts are integers, so med2 = percentile(2n, .5) is an
    // integer-valued double (midpoint of even integers), dev2 = |2n−med2|
    // likewise, and mad4 = 2·median(dev2) is integer-valued again — the
    // flag |n−med| > 3·MAD compares longs (2·dev2 vs 3·mad4 after a
    // round-trip cast), so the inequality boundary is bit-identical
    // across engines. Plan shape: one combinable (type, day) count, a
    // 5-group exact-percentile pass (model-sized — the q17 trade), and
    // two broadcast joins back; nothing wide touches the raw events
    // twice.
    Q("ev_anomaly_mad",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
          .agg(count(lit(1)).as("n"))
        val med = daily.groupBy(col("event_type"))
          .agg(expr("percentile(n * 2, 0.5D)").as("med2"))
        val dev = daily.join(broadcast(med), "event_type")
          .withColumn("dev2", abs(col("n") * 2 - col("med2")))
        val mad = dev.groupBy(col("event_type"))
          .agg((expr("percentile(dev2, 0.5D)") * 2).as("mad4"))
        dev.join(broadcast(mad), "event_type")
          .select(col("event_type"), col("day"), col("n"), col("med2"),
            col("dev2"), col("mad4"),
            (round(col("dev2") * 2).cast("long") >
              round(col("mad4")).cast("long") * 3).as("is_anomaly"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        s1 AS (
          SELECT event_type, quantile_cont(n * 2, 0.5) AS med2
          FROM d GROUP BY 1),
        j1 AS (
          SELECT d.event_type, d.day, d.n, s1.med2,
                 abs(2 * d.n - s1.med2) AS dev2
          FROM d JOIN s1 USING (event_type)),
        s2 AS (
          SELECT event_type, 2 * quantile_cont(dev2, 0.5) AS mad4
          FROM j1 GROUP BY 1)
        SELECT j1.event_type, j1.day, j1.n, j1.med2, j1.dev2, s2.mad4,
               CAST(round(2 * j1.dev2) AS BIGINT) >
                 3 * CAST(round(s2.mad4) AS BIGINT) AS is_anomaly
        FROM j1 JOIN s2 USING (event_type)""")),

    // ---- session co-occurrence lift (the "also did" recommender table) -----
    // Market-basket association over sessions: which event-type pairs
    // co-occur in one session more often than independence predicts.
    // Sessionization is ev_sessionize's exact lineage (30-min gap); the
    // pair join is SELF-keyed on (user_id, session_id), so its output is
    // bounded by (types-per-session choose 2) ≤ 10 rows per session —
    // never |sessions|², and the only exchanges are the user_id window
    // plus the (user, session) join key both sides already share after
    // it (AQE sees co-partitioned inputs). Lift is pure integer:
    // (1000·n_ab·S) div (n_a·n_b) — milli-lift, monotone with the real
    // ratio (the txt_collocations discipline), no float division under
    // the hash. n_ab ≤ min(n_a, n_b) and symmetry are spec-asserted.
    Q("ev_cooccurrence",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ems"), col("event_id"))
        val sess = Tables.events(s, dir)
          .withColumn("prev_ems", lag(col("ems"), 1).over(byUser))
          .withColumn("new_s",
            when(col("prev_ems").isNull ||
              col("ems") - col("prev_ems") > 1800000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_s")).over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("user_id"), col("session_id"), col("event_type"))
          .distinct()
          // r18: FOUR consumers (both pair sides, types, total) — without
          // truncation the sessionize window + distinct re-executes per
          // consumer (exchange reuse shares only the map side); measured
          // 4 serial ~0.2-0.4 s window stages in one run
          .materialize()
        val pairs = sess.select(col("user_id"), col("session_id"),
            col("event_type").as("type_a"))
          .join(sess.select(col("user_id"), col("session_id"),
            col("event_type").as("type_b")), Seq("user_id", "session_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_ab"))
        val types = sess.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_t"))
        val total = sess.select(col("user_id"), col("session_id")).distinct()
          .agg(count(lit(1)).as("n_sessions"))
        pairs
          .join(broadcast(types.select(col("event_type").as("type_a"),
            col("n_t").as("n_a"))), "type_a")
          .join(broadcast(types.select(col("event_type").as("type_b"),
            col("n_t").as("n_b"))), "type_b")
          .crossJoin(broadcast(total))
          .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
            col("n_b"), col("n_sessions"),
            call_function("div", lit(1000L) * col("n_ab") * col("n_sessions"),
              col("n_a") * col("n_b")).as("lift_milli"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ems, event_type
          FROM events),
        marked AS (
          SELECT *, CASE WHEN lag(ems) OVER w IS NULL
                          OR ems - lag(ems) OVER w > 1800000
                     THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ems, event_id)),
        sess AS (
          SELECT DISTINCT user_id, session_id, event_type FROM (
            SELECT user_id, event_type,
                   CAST(sum(new_s) OVER (PARTITION BY user_id
                     ORDER BY ems, event_id ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS session_id
            FROM marked)),
        pairs AS (
          SELECT x.event_type AS type_a, y.event_type AS type_b,
                 count(*) AS n_ab
          FROM sess x JOIN sess y
            ON x.user_id = y.user_id AND x.session_id = y.session_id
           AND x.event_type < y.event_type
          GROUP BY 1, 2),
        types AS (
          SELECT event_type, count(*) AS n_t FROM sess GROUP BY 1),
        total AS (
          SELECT count(*) AS n_sessions FROM
            (SELECT DISTINCT user_id, session_id FROM sess))
        SELECT p.type_a, p.type_b, p.n_ab, a.n_t AS n_a, b.n_t AS n_b,
               t.n_sessions,
               (1000 * p.n_ab * t.n_sessions) // (a.n_t * b.n_t)
                 AS lift_milli
        FROM pairs p
        JOIN types a ON a.event_type = p.type_a
        JOIN types b ON b.event_type = p.type_b
        CROSS JOIN total t""")),

    // ---- 2-step Markov reachability (the transition matrix, squared) -------
    // Where does a user land TWO events from now? ev_transitions' 1-step
    // milli-probabilities composed through every mid state — the matrix
    // square P², computed as a keyed self-join on the mid state over the
    // |types|² transition table (model-sized — the event stream is
    // touched exactly once, by the shared lag-window count). p2_micro =
    // Σ_mid pa_milli·pb_milli is a pure-integer micro-probability
    // (compounded floor matches the oracle bit-for-bit); `is_top` marks
    // each origin's most likely 2-step destination — the
    // next-next-event prediction a prefetching/funnel-forecast consumer
    // reads. Row sums stay ≤ 10⁶ by construction (flooring only loses
    // mass), spec-asserted.
    Q("ev_markov2",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ems"), col("event_id"))
        val counts = e
          .withColumn("prev", lag(col("event_type"), 1).over(byTime))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("n"))
        val byPrev = Window.partitionBy(col("prev"))
        // materialized: the |types|² probability table feeds BOTH sides
        // of the matrix-square join — without truncation the full event
        // scan + lag window would execute twice
        val p1 = counts
          .withColumn("p_milli", call_function("div",
            col("n") * 1000, sum(col("n")).over(byPrev)))
          .select(col("prev"), col("next"), col("p_milli"))
          .materialize()
        val p2 = p1.select(col("prev"), col("next").as("mid"),
            col("p_milli").as("pa"))
          .join(p1.select(col("prev").as("mid"), col("next"),
            col("p_milli").as("pb")), "mid")
          .groupBy(col("prev"), col("next"))
          .agg(sum(col("pa") * col("pb")).as("p2_micro"))
        val byOrigin = Window.partitionBy(col("prev"))
          .orderBy(col("p2_micro").desc, col("next").asc)
        p2.withColumn("is_top", row_number().over(byOrigin) === 1)
          .select(col("prev"), col("next"), col("p2_micro"), col("is_top"))
      },
      Some("""
        WITH t AS (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS prev
          FROM events),
        c AS (
          SELECT prev, event_type AS next, count(*) AS n
          FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
        p1 AS (
          SELECT prev, next,
                 CAST((n * 1000) //
                   CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT)
                   AS BIGINT) AS p_milli
          FROM c),
        p2 AS (
          SELECT a.prev, b.next,
                 CAST(sum(a.p_milli * b.p_milli) AS BIGINT) AS p2_micro
          FROM p1 a JOIN p1 b ON b.prev = a.next
          GROUP BY 1, 2)
        SELECT prev, next, p2_micro,
               row_number() OVER (PARTITION BY prev
                 ORDER BY p2_micro DESC, next ASC) = 1 AS is_top
        FROM p2""")),

    // ---- leakage-safe K-fold target encoding (the feature-store op) --------
    // Mean-target encoding is the classic high-cardinality categorical
    // feature — and the classic LEAK when a row's own target joins its
    // encoding. The fix every feature store implements: GROUP-aware
    // folds (all of a user's events share a fold — the md5-bucket O6
    // discipline, so recomputation and train/serve agree) and
    // out-of-fold means, (Σ_total − Σ_fold)/(n_total − n_fold) per
    // (category, fold). Plan: one combinable (type, fold) aggregate
    // carrying exact micro-scaled integer sums, then the totals as a
    // window over the |types|×K aggregate table (model-sized) — the raw
    // stream is touched once; the mean is two mirrored IEEE divisions
    // over exact integers.
    Q("ev_target_encode",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("fold", pmod(conv(substring(md5(concat(lit("fold|"),
            col("user_id").cast("string")).cast("binary")), 1, 15), 16, 10)
            .cast("long"), lit(5L)))
        val pf = e.groupBy(col("event_type"), col("fold"))
          .agg(count(lit(1)).as("n_f"),
            sum(round(col("value") * 1000000).cast("long")).as("s_f"))
        val wT = Window.partitionBy(col("event_type"))
        pf.withColumn("n_tot", sum(col("n_f")).over(wT))
          .withColumn("s_tot", sum(col("s_f")).over(wT))
          .select(col("event_type"), col("fold"), col("n_f"),
            (col("n_tot") - col("n_f")).as("n_oof"),
            ((col("s_tot") - col("s_f")).cast("double") /
              (col("n_tot") - col("n_f")) / 1000000.0).as("oof_mean"))
      },
      Some("""
        WITH f AS (
          SELECT event_type,
                 CAST(('0x' || substr(md5('fold|' ||
                   CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5
                   AS fold,
                 CAST(round(value * 1000000) AS BIGINT) AS v
          FROM events),
        pf AS (
          SELECT event_type, fold, count(*) AS n_f,
                 CAST(sum(v) AS BIGINT) AS s_f
          FROM f GROUP BY 1, 2),
        t AS (
          SELECT *, CAST(sum(n_f) OVER w AS BIGINT) AS n_tot,
                 CAST(sum(s_f) OVER w AS BIGINT) AS s_tot
          FROM pf WINDOW w AS (PARTITION BY event_type))
        SELECT event_type, fold, n_f, n_tot - n_f AS n_oof,
               CAST(s_tot - s_f AS DOUBLE) / (n_tot - n_f) / 1000000.0
                 AS oof_mean
        FROM t""")),

    // ---- CUSUM changepoint detection (sustained-shift monitoring) ----------
    // ev_anomaly_mad flags single outlier DAYS; CUSUM (Page 1954) flags
    // sustained LEVEL SHIFTS a per-day threshold never sees — ten days
    // each 2σ high trip a cumulative statistic long before any one day
    // trips a MAD gate. The sequential recursion S_t = max(0, S_{t-1} +
    // x_t) looks order-dependent, but the closed form S_t = R_t −
    // min_{k≤t} R_k (R = running sum of deviations) makes it TWO window
    // passes over the same (type, day) sort — no sequential fold, no
    // UDAF (the min folds in the empty prefix R_0 = 0, without which
    // an immediately-elevated series would subtract its own first
    // deviation). Everything integer: deviations are milli-scaled longs
    // against the per-type mean daily rate, so the shift flag's
    // boundary (cusum > 5·mean) is bit-identical across engines. Plan:
    // one combinable daily count (materialized — it feeds the ref
    // aggregate AND the window pass), a broadcast ref join, one window
    // exchange on event_type over the model-sized daily table.
    Q("ev_cusum",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
          .agg(count(lit(1)).as("n"))
          .materialize()
        val ref = daily.groupBy(col("event_type"))
          .agg(call_function("div", sum(col("n")) * 1000, count(lit(1)))
            .as("mean_milli"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)
        daily.join(broadcast(ref), "event_type")
          .withColumn("r",
            sum(col("n") * 1000 - col("mean_milli")).over(w))
          .withColumn("cusum",
            col("r") - least(min(col("r")).over(w), lit(0L)))
          .select(col("event_type"), col("day"), col("n"),
            col("mean_milli"), col("cusum"),
            (col("cusum") > col("mean_milli") * 5).as("is_shift"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        ref AS (
          SELECT event_type,
                 CAST((CAST(sum(n) AS BIGINT) * 1000) // count(*)
                   AS BIGINT) AS mean_milli
          FROM d GROUP BY 1),
        r AS (
          SELECT d.event_type, d.day, d.n, ref.mean_milli,
                 CAST(sum(d.n * 1000 - ref.mean_milli) OVER w AS BIGINT)
                   AS r
          FROM d JOIN ref USING (event_type)
          WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
                       ROWS UNBOUNDED PRECEDING))
        SELECT event_type, day, n, mean_milli,
               r - least(min(r) OVER w2, 0) AS cusum,
               (r - least(min(r) OVER w2, 0)) > mean_milli * 5 AS is_shift
        FROM r
        WINDOW w2 AS (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING)""")),

    // ---- DAU/WAU stickiness (the engagement-ratio KPI) ---------------------
    // Stickiness = daily actives / trailing-7-day actives — the ratio
    // product teams watch. The naive WAU is a count-distinct over a
    // RANGE window, which neither engine can window directly and which
    // degenerates to a per-day self-join at scale. The scalable shape:
    // each distinct (day, user) row CONTRIBUTES to the 7 grid days it
    // falls inside — explode the bounded 7-element day sequence and the
    // sliding distinct becomes a plain (grid_day, user) distinct count,
    // one equi-shuffle, explode factor bounded by the window length
    // regardless of data size. The (day, user) distinct frame is
    // materialized: it feeds DAU and the exploded WAU.
    Q("ev_stickiness",
      (s, dir) => {
        val du = Tables.events(s, dir)
          .select(expr("ems div 86400000").as("day"), col("user_id"))
          .distinct()
          .materialize()
        val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        val wau = du
          .select(explode(sequence(col("day"), col("day") + 6))
            .as("day"), col("user_id"))
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("wau"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau"),
            call_function("div", col("dau") * 1000, col("wau"))
              .as("stickiness_milli"))
      },
      Some("""
        WITH du AS (
          SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
          FROM events),
        dau AS (SELECT day, count(*) AS n_dau FROM du GROUP BY 1),
        wau AS (
          SELECT gday, count(DISTINCT user_id) AS n_wau FROM (
            SELECT user_id,
                   unnest(generate_series(day, day + 6)) AS gday
            FROM du)
          GROUP BY 1)
        SELECT d.day, d.n_dau AS dau, w.n_wau AS wau,
               CAST((d.n_dau * 1000) // w.n_wau AS BIGINT)
                 AS stickiness_milli
        FROM dau d JOIN wau w ON w.gday = d.day""")),

    // ---- seasonal-naive forecast backtest (the monitoring yardstick) -------
    // Before any model earns a place in a pipeline it must beat
    // seasonal-naive (forecast = the value one weekly period ago) — this
    // query IS that yardstick: per event type, MAE/bias/MAPE of the
    // lag-7 forecast over every scoreable day. The forecast joins on
    // (type, day−7) rather than a 7-ROW lag so missing days cannot
    // silently misalign the season. Integer-exact metrics: MAE and MAPE
    // are divs over non-negative longs; bias (whose numerator is
    // signed, where Spark div truncates but DuckDB // floors) is ONE
    // mirrored IEEE division over exact longs. The daily table is
    // materialized — it is both sides of the self-join.
    Q("ev_forecast",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
          .agg(count(lit(1)).as("n"))
          .materialize()
        val scored = daily
          .join(daily.select(col("event_type"), (col("day") + 7).as("day"),
            col("n").as("fc")), Seq("event_type", "day"))
          .withColumn("abs_err", abs(col("n") - col("fc")))
          .withColumn("ape_pm", call_function("div", col("abs_err") * 1000,
            greatest(col("n"), lit(1L))))
        scored.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("abs_err")).as("sae"),
            sum(col("n") - col("fc")).as("serr"),
            sum(col("ape_pm")).as("sape"))
          .select(col("event_type"), col("n_days"),
            call_function("div", col("sae") * 1000, col("n_days"))
              .as("mae_milli"),
            (col("serr").cast("double") * 1000.0 / col("n_days"))
              .as("bias_milli"),
            call_function("div", col("sape"), col("n_days")).as("mape_pm"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        j AS (
          SELECT a.event_type, a.n, f.n AS fc,
                 abs(a.n - f.n) AS abs_err,
                 CAST((abs(a.n - f.n) * 1000) // greatest(a.n, 1)
                   AS BIGINT) AS ape_pm
          FROM d a JOIN d f
            ON f.event_type = a.event_type AND f.day = a.day - 7),
        g AS (
          SELECT event_type, count(*) AS n_days,
                 CAST(sum(abs_err) AS BIGINT) AS sae,
                 CAST(sum(n - fc) AS BIGINT) AS serr,
                 CAST(sum(ape_pm) AS BIGINT) AS sape
          FROM j GROUP BY 1)
        SELECT event_type, n_days,
               CAST((sae * 1000) // n_days AS BIGINT) AS mae_milli,
               CAST(serr AS DOUBLE) * 1000.0 / n_days AS bias_milli,
               CAST(sape // n_days AS BIGINT) AS mape_pm
        FROM g""")),

    // ---- autocorrelation of the daily series (the seasonality detector) ----
    // ACF at lags 1..7 per event type — the card that TELLS you lag-7 is
    // the season ev_forecast's naive model assumes (a weekly cycle shows
    // as a positive spike at lag 7). All arithmetic exact until the last
    // step: deviations are scaled by n (d_t = n·c_t − S, an integer — no
    // fractional mean anywhere), numerator Σ d_t·d_{t+k} and denominator
    // Σ d_t² are long sums, and acf = num/den is ONE mirrored IEEE
    // division (n² cancels). Magnitudes: |d| ≤ n·max(c) ≈ 60·10⁵ at
    // sf0.1-scale, squared and summed ≈ 10¹⁵ ≪ 2⁶³. Gap days are absent
    // rows on both engines (same construction), so pairs spanning a gap
    // drop identically. Plan: one combinable (type, day) count
    // (materialized — three consumers), a |types|-row stats join-back,
    // the lag explode (×7) joined back to the SAME deviation table on
    // (type, day+lag) — aggregate-sized everywhere, the event stream is
    // scanned once.
    Q("ev_acf",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
          .agg(count(lit(1)).as("c"))
          .materialize()
        val stats = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
        val dev = daily.join(stats, Seq("event_type"))
          .select(col("event_type"), col("day"),
            (col("n") * col("c") - col("s")).as("dv"))
          .materialize()
        val den = dev.groupBy(col("event_type"))
          .agg(sum(col("dv") * col("dv")).as("den"))
        val num = dev
          .select(col("event_type"), col("day"), col("dv"),
            explode(array((1 to 7).map(lit(_)): _*)).as("lag"))
          .withColumn("tday", col("day") + col("lag"))
          .join(dev.select(col("event_type"), col("day").as("tday"),
            col("dv").as("bdv")), Seq("event_type", "tday"))
          .groupBy(col("event_type"), col("lag"))
          .agg(sum(col("dv") * col("bdv")).as("num"),
            count(lit(1)).as("n_terms"))
        num.join(den, Seq("event_type"))
          .select(col("event_type"), col("lag"), col("n_terms"),
            (col("num").cast("double") / col("den").cast("double"))
              .as("acf"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 count(*) AS c
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(c) AS BIGINT) AS s
          FROM d GROUP BY 1),
        dev AS (
          SELECT d.event_type, d.day, st.n * d.c - st.s AS dv
          FROM d JOIN st USING (event_type)),
        den AS (
          SELECT event_type, CAST(sum(dv * dv) AS BIGINT) AS den
          FROM dev GROUP BY 1),
        num AS (
          SELECT a.event_type, l.lag,
                 CAST(sum(a.dv * b.dv) AS BIGINT) AS num,
                 count(*) AS n_terms
          FROM dev a
          CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag) l
          JOIN dev b ON b.event_type = a.event_type
                    AND b.day = a.day + l.lag
          GROUP BY 1, 2)
        SELECT n.event_type, n.lag, n.n_terms,
               CAST(n.num AS DOUBLE) / CAST(d2.den AS DOUBLE) AS acf
        FROM num n JOIN den d2 USING (event_type)""")),

    // ---- per-user behavioral entropy (the diversity feature) ---------------
    // Shannon entropy of each user's event-type mix — the segmentation
    // feature that separates single-purpose users (H = 0) from
    // uniformly-mixed ones (H = ln |types|), orthogonal to ev_rfm's
    // volume axes. H = Σ (n_t/n)·ln(n/n_t) decomposes into
    // micro-quantized-at-source integer logs over COUNTS (the txt_zipf
    // rule — ln only ever applies to an exact integer, differences and
    // sums stay in longs), one final div over non-negative operands, so
    // the feature is hash-gated. Plan: ONE combinable (user, type)
    // count, a per-user total window over that |users|×|types|
    // aggregate, one per-user fold.
    Q("ev_user_entropy",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
        Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n_t"))
          .withColumn("n", sum(col("n_t")).over(byUser))
          .withColumn("qt",
            round(log(col("n_t").cast("double")) * 1000000).cast("long"))
          .withColumn("qn",
            round(log(col("n").cast("double")) * 1000000).cast("long"))
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n_events"),
            count(lit(1)).as("n_types"),
            sum(col("n_t") * (col("qn") - col("qt"))).as("s"))
          .select(col("user_id"), col("n_events"), col("n_types"),
            call_function("div", col("s"), col("n_events"))
              .as("entropy_micro"))
      },
      Some("""
        WITH c AS (
          SELECT user_id, event_type, count(*) AS n_t
          FROM events GROUP BY 1, 2),
        t AS (
          SELECT *, CAST(sum(n_t) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n,
                 CAST(round(ln(CAST(n_t AS DOUBLE)) * 1000000) AS BIGINT)
                   AS qt,
                 CAST(round(ln(CAST(sum(n_t) OVER (PARTITION BY user_id)
                   AS DOUBLE)) * 1000000) AS BIGINT) AS qn
          FROM c),
        g AS (
          SELECT user_id, max(n) AS n_events, count(*) AS n_types,
                 CAST(sum(n_t * (qn - qt)) AS BIGINT) AS s
          FROM t GROUP BY 1)
        SELECT user_id, n_events, n_types,
               CAST(s // n_events AS BIGINT) AS entropy_micro
        FROM g""")),

    // ---- Kaplan–Meier survival (churn analysis with censoring) -------------
    // The retention curve done RIGHT: users whose last event falls in
    // the final 7 days are CENSORED (still alive — we just stopped
    // watching), not churned, and the KM estimator is the standard way
    // to use them without bias: at each lifetime day t, S ×=
    // (n_risk − d)/n_risk over deaths only, while censored users leave
    // the risk set silently. Survival is carried in LOG domain —
    // log S = Σ ln((n−d)/n) — because each factor is an exact integer
    // ratio whose ln micro-quantizes at source (the txt_zipf rule); the
    // product form would compound float rounding per step. S hitting
    // exact 0 (a day where everyone at risk dies) is the one
    // log-undefined point: flagged as is_zero instead of a −∞ hack.
    // Plan: one per-user aggregate, a 1-row broadcast horizon cross,
    // one per-day aggregate, then windows over the model-sized
    // |lifetime-days| table (allowlisted global — days, never users);
    // n_risk is the DESCENDING cumulative, so no separate total pass.
    Q("ev_survival",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val per = e.groupBy(col("user_id"))
          .agg(min(col("ems")).as("first_ems"),
            max(col("ems")).as("last_ems"))
        val horizon = e.agg(max(col("ems")).as("max_ems"))
        val daily = per.crossJoin(broadcast(horizon))
          .select(expr("(last_ems - first_ems) div 86400000").as("t"),
            (col("last_ems") > col("max_ems") - lit(604800000L))
              .as("censored"))
          .groupBy(col("t"))
          .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
            sum(when(col("censored"), 1L).otherwise(0L)).as("c"))
        val wDesc = Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAsc = Window.orderBy(col("t").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        daily
          .withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
          .withColumn("qln", when(col("d") > 0 && col("n_risk") > col("d"),
            round(log((col("n_risk") - col("d")).cast("double") /
              col("n_risk")) * 1000000).cast("long")).otherwise(lit(0L)))
          .withColumn("zev", when(col("d") > 0 &&
            col("n_risk") === col("d"), 1L).otherwise(0L))
          .select(col("t"), col("n_risk"), col("d"), col("c"),
            sum(col("qln")).over(wAsc).as("log_s_micro"),
            (sum(col("zev")).over(wAsc) > 0).as("is_zero"))
      },
      Some("""
        WITH per AS (
          SELECT user_id, min(epoch_ms(ts)) AS first_ems,
                 max(epoch_ms(ts)) AS last_ems
          FROM events GROUP BY 1),
        h AS (SELECT max(epoch_ms(ts)) AS max_ems FROM events),
        f AS (
          SELECT (last_ems - first_ems) // 86400000 AS t,
                 last_ems > max_ems - 604800000 AS censored
          FROM per CROSS JOIN h),
        daily AS (
          SELECT t,
                 CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END)
                   AS BIGINT) AS d,
                 CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END)
                   AS BIGINT) AS c
          FROM f GROUP BY 1),
        r AS (
          SELECT *, CAST(sum(d + c) OVER (ORDER BY t DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
          FROM daily),
        q AS (
          SELECT *,
                 CASE WHEN d > 0 AND n_risk > d
                      THEN CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                        / n_risk) * 1000000) AS BIGINT)
                      ELSE 0 END AS qln,
                 CASE WHEN d > 0 AND n_risk = d THEN 1 ELSE 0 END AS zev
          FROM r)
        SELECT t, n_risk, d, c,
               CAST(sum(qln) OVER w AS BIGINT) AS log_s_micro,
               CAST(sum(zev) OVER w AS BIGINT) > 0 AS is_zero
        FROM q
        WINDOW w AS (ORDER BY t ASC ROWS UNBOUNDED PRECEDING)""")),

    // ---- Gini concentration (the 80/20 card, histogram-decomposed) ---------
    // How concentrated is activity across users? The textbook Gini needs
    // users SORTED by count with a global rank — the ntile trap ev_rfm
    // dodges, fatal at users-scale. The scalable identity: ranks within
    // a block of equal counts are consecutive, so Σ rank·x decomposes
    // per distinct COUNT VALUE v with multiplicity m and prior
    // cumulative R: v·(m·R + m(m+1)/2). The global sort collapses to a
    // window over the VALUE-DOMAIN histogram (bounded by max
    // events/user, never by user count — the q26_skyline discipline).
    // The same desc pass yields the top-10%-share. Everything integer:
    // G = (2W − (n+1)T) / nT emitted as a milli div, boundary
    // hash-gated. Plan: one per-user count, one histogram aggregate,
    // two windows over the histogram, one single-row fold.
    Q("ev_gini",
      (s, dir) => {
        val hist = Tables.events(s, dir)
          .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("m"))
        val wAsc = Window.orderBy(col("x").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wDesc = Window.orderBy(col("x").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        hist
          .withColumn("r_prev", coalesce(sum(col("m")).over(wAsc), lit(0L)))
          .withColumn("rd", sum(col("m")).over(wDesc))
          .withColumn("n", sum(col("m")).over(wAll))
          .withColumn("k", expr("n div 10"))
          .withColumn("in_top", least(col("m"),
            greatest(col("k") - (col("rd") - col("m")), lit(0L))))
          .groupBy()
          .agg(max(col("n")).as("n_users"),
            sum(col("x") * col("m")).as("total_events"),
            sum(col("x") * (col("m") * col("r_prev") +
              expr("(m * (m + 1)) div 2"))).as("w"),
            sum(col("x") * col("in_top")).as("e_top"),
            max(col("k")).as("k"))
          .select(col("n_users"), col("total_events"),
            call_function("div",
              (lit(2L) * col("w") - (col("n_users") + 1) *
                col("total_events")) * 1000,
              col("n_users") * col("total_events")).as("gini_milli"),
            call_function("div", col("e_top") * 1000, col("total_events"))
              .as("top10_share_milli"))
      },
      Some("""
        WITH ux AS (
          SELECT user_id, count(*) AS x FROM events GROUP BY 1),
        hist AS (SELECT x, count(*) AS m FROM ux GROUP BY 1),
        t AS (
          SELECT *,
                 CAST(coalesce(sum(m) OVER (ORDER BY x ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS r_prev,
                 CAST(sum(m) OVER (ORDER BY x DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rd,
                 CAST(sum(m) OVER () AS BIGINT) AS n
          FROM hist),
        t2 AS (
          SELECT *, n // 10 AS k,
                 least(m, greatest(n // 10 - (rd - m), 0)) AS in_top
          FROM t),
        g AS (
          SELECT max(n) AS n_users,
                 CAST(sum(x * m) AS BIGINT) AS total_events,
                 CAST(sum(x * (m * r_prev + (m * (m + 1)) // 2))
                   AS BIGINT) AS w,
                 CAST(sum(x * in_top) AS BIGINT) AS e_top
          FROM t2)
        SELECT n_users, total_events,
               CAST(((2 * w - (n_users + 1) * total_events) * 1000) //
                 (n_users * total_events) AS BIGINT) AS gini_milli,
               CAST((e_top * 1000) // total_events AS BIGINT)
                 AS top10_share_milli
        FROM g""")),

    // ---- burstiness / dispersion (the Fano factor per event type) ----------
    // Is traffic Poisson-like or bursty? The Fano factor σ²/μ of daily
    // counts answers with one number per type: 1 = Poisson baseline,
    // > 1 over-dispersed (bursts — provision for peaks, alarm with
    // CUSUM), < 1 regular (a metronome — schedule-driven). Exact
    // integer algebra end-to-end: Fano = (nΣx² − S²)/(n·S) from the
    // q19 power-sum discipline, emitted as a milli div over
    // non-negative operands (Cauchy–Schwarz makes the numerator ≥ 0),
    // so the bursty verdict's boundary is hash-gated. One combinable
    // daily count + one per-type fold.
    Q("ev_dispersion",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
          .agg(count(lit(1)).as("x"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n_days"), col("sx"),
            call_function("div", col("sx") * 1000, col("n_days"))
              .as("mean_milli"),
            call_function("div",
              (col("n_days") * col("sxx") - col("sx") * col("sx")) * 1000,
              col("n_days") * col("sx")).as("fano_milli"),
            (call_function("div",
              (col("n_days") * col("sxx") - col("sx") * col("sx")) * 1000,
              col("n_days") * col("sx")) > 1000).as("is_bursty"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 count(*) AS x
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT event_type, count(*) AS n_days,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM d GROUP BY 1)
        SELECT event_type, n_days, sx,
               CAST((sx * 1000) // n_days AS BIGINT) AS mean_milli,
               CAST(((n_days * sxx - sx * sx) * 1000) // (n_days * sx)
                 AS BIGINT) AS fano_milli,
               CAST(((n_days * sxx - sx * sx) * 1000) // (n_days * sx)
                 AS BIGINT) > 1000 AS is_bursty
        FROM g""")),

    // ---- growth accounting (new / retained / resurrected / churned) --------
    // The product-analytics ledger every DAU chart decomposes into:
    // each active (user, day) is NEW (first day ever), RETAINED (also
    // active yesterday), or RESURRECTED (active before, but not
    // yesterday); CHURNED(d) = yesterday's actives who didn't show
    // today = dau(d−1) − retained(d). The conservation law
    // dau = new + retained + resurrected holds by construction and is
    // spec-asserted. Plan: one distinct (day, user) pass (the
    // ev_stickiness frame, materialized — it feeds the lag window AND
    // the dau join), one per-user lag window, one per-day aggregate,
    // one self-join on day−1 over the model-sized daily table.
    Q("ev_growth_accounting",
      (s, dir) => {
        val du = Tables.events(s, dir)
          .select(expr("ems div 86400000").as("day"), col("user_id"))
          .distinct()
          .materialize()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val daily = du
          .withColumn("prev", lag(col("day"), 1).over(w))
          .withColumn("status",
            when(col("prev").isNull, "new")
              .when(col("prev") === col("day") - 1, "retained")
              .otherwise("resurrected"))
          .groupBy(col("day"))
          .agg(sum(when(col("status") === "new", 1L).otherwise(0L))
            .as("n_new"),
            sum(when(col("status") === "retained", 1L).otherwise(0L))
              .as("n_retained"),
            sum(when(col("status") === "resurrected", 1L).otherwise(0L))
              .as("n_resurrected"),
            count(lit(1)).as("dau"))
        daily.join(daily.select((col("day") + 1).as("day"),
            col("dau").as("dau_prev")), Seq("day"), "left")
          .select(col("day"), col("n_new"), col("n_retained"),
            col("n_resurrected"), col("dau"),
            (coalesce(col("dau_prev"), lit(0L)) - col("n_retained"))
              .as("churned_from_prev"))
      },
      Some("""
        WITH du AS (
          SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
          FROM events),
        st AS (
          SELECT day, user_id,
                 lag(day) OVER (PARTITION BY user_id ORDER BY day)
                   AS prev
          FROM du),
        daily AS (
          SELECT day,
                 CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_new,
                 CAST(sum(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_retained,
                 CAST(sum(CASE WHEN prev IS NOT NULL AND prev < day - 1
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_resurrected,
                 count(*) AS dau
          FROM st GROUP BY 1)
        SELECT d.day, d.n_new, d.n_retained, d.n_resurrected, d.dau,
               coalesce(p.dau, 0) - d.n_retained AS churned_from_prev
        FROM daily d LEFT JOIN daily p ON p.day = d.day - 1""")),

    // ---- U-shaped multi-touch attribution (position-based credit) ----------
    // ev_first_touch credits one touch; the position-based (40/40/20)
    // model marketing teams actually run credits the FIRST and LAST
    // pre-conversion touches 400‰ each and splits 200‰ across the
    // middles — all integer milli-credits with a deterministic floor
    // (div k−2), so total credit per conversion is ≤ 1000 exactly and
    // the channel ledger is hash-gated. Journeys join on user_id with
    // t_touch < t_conv — bounded by journey length × conversions per
    // user (the ev_cooccurrence key discipline), never cross-user. One
    // rank window per conversion over that bounded join.
    Q("ev_attribution_ushape",
      (s, dir) => {
        val e = Tables.events(s, dir).materialize()
        val conv = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ems").as("c_ems"),
            col("event_id").as("conv_id"))
        val touches = e.select(col("user_id"), col("event_type"),
          col("ems").as("t_ems"), col("event_id").as("t_id"))
        val j = touches.join(conv, "user_id")
          .filter(col("t_ems") < col("c_ems") ||
            (col("t_ems") === col("c_ems") && col("t_id") < col("conv_id")))
        val wc = Window.partitionBy(col("conv_id"))
          .orderBy(col("t_ems").asc, col("t_id").asc)
        val ranked = j
          .withColumn("rk", row_number().over(wc).cast("long"))
          .withColumn("k", count(lit(1)).over(
            Window.partitionBy(col("conv_id"))))
        ranked
          .withColumn("credit_milli",
            when(col("k") === 1, 1000L)
              .when(col("k") === 2, 500L)
              .when(col("rk") === 1 || col("rk") === col("k"), 400L)
              .otherwise(call_function("div", lit(200L), col("k") - 2)))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_touches"),
            sum(col("credit_milli")).as("credit_milli"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ems, event_id
          FROM events),
        conv AS (
          SELECT user_id, ems AS c_ems, event_id AS conv_id
          FROM e WHERE event_type = 'purchase'),
        j AS (
          SELECT t.event_type, c.conv_id, t.ems AS t_ems,
                 t.event_id AS t_id
          FROM e t JOIN conv c ON c.user_id = t.user_id
           AND (t.ems < c.c_ems
                OR (t.ems = c.c_ems AND t.event_id < c.conv_id))),
        ranked AS (
          SELECT event_type, conv_id,
                 CAST(row_number() OVER (PARTITION BY conv_id
                   ORDER BY t_ems, t_id) AS BIGINT) AS rk,
                 CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT)
                   AS k
          FROM j),
        credited AS (
          SELECT event_type,
                 CASE WHEN k = 1 THEN 1000
                      WHEN k = 2 THEN 500
                      WHEN rk = 1 OR rk = k THEN 400
                      ELSE 200 // (k - 2) END AS credit_milli
          FROM ranked)
        SELECT event_type, count(*) AS n_touches,
               CAST(sum(credit_milli) AS BIGINT) AS credit_milli
        FROM credited GROUP BY 1""")),

    // ---- seasonality profile (day-of-week × hour-of-day load card) ---------
    // The capacity-planning twin of ev_tumbling: where the tumbling
    // window asks "what happened each hour", this asks "what ALWAYS
    // happens at this hour" — the 168-cell weekly load profile a
    // scheduler reads to place batch work off-peak and an anomaly
    // monitor baselines against. load_pm = cell rate vs the uniform
    // 1/168 expectation as exact integer per-mille (1000 = flat;
    // ≥1500/≤500 flag peak/trough cells). ONE combinable aggregate over
    // a compile-time-bounded ≤168-cell key (dow, hr both derived by
    // codegen date functions in the scan projection), the corpus total
    // as the allowlisted 1-row broadcast cross (the dq_freshness
    // shape) — no window, no second corpus pass, nothing row-sized
    // after the scan at any event volume. Spark's dayofweek is
    // 1-based-Sunday; minus 1 aligns it with DuckDB's 0-based-Sunday
    // so both engines bucket identically.
    Q("ev_seasonality_week",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val cells = e
          .select((dayofweek(col("ts")) - 1).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"))
          .groupBy(col("dow"), col("hr"))
          .agg(count(lit(1)).as("n"))
        val tot = e.agg(count(lit(1)).as("total"))
        cells.crossJoin(broadcast(tot))
          .select(col("dow"), col("hr"), col("n"),
            expr("(n * 168 * 1000) div total").as("load_pm"),
            (expr("(n * 168 * 1000) div total") >= 1500L).cast("long")
              .as("peak"),
            (expr("(n * 168 * 1000) div total") <= 500L).cast("long")
              .as("trough"))
      },
      Some("""
        WITH c AS (
          SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
                 CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
          FROM events GROUP BY 1, 2),
        t AS (SELECT count(*) AS total FROM events)
        SELECT dow, hr, n,
               (n * 168 * 1000) // total AS load_pm,
               CAST((n * 168 * 1000) // total >= 1500 AS BIGINT) AS peak,
               CAST((n * 168 * 1000) // total <= 500 AS BIGINT) AS trough
        FROM c CROSS JOIN t"""))
  )
}
