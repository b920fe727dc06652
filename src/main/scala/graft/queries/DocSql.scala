package graft.queries

/** Shared DuckDB oracle fragments over the `documents` table, mirroring
  * graft.text.TextOps exactly (same tokenization regex, same salted-md5
  * hashes), so every text/dedup operator is hash-checkable.
  *
  * Shingle explosion uses the constant-bound generate_series + filter trick
  * (this DuckDB rejects lateral column arguments to table functions); 512
  * comfortably bounds token counts at the oracle's sf0.01 (max ~120), and
  * Verify.main asserts the invariant against the actual fixture before
  * every dump, so a longer document fails loudly instead of silently
  * diverging from the (unbounded) Spark side.
  */
private[queries] object DocSql {

  val toksSql: String =
    "SELECT doc_id, lang, regexp_extract_all(lower(text), " +
      s"'${graft.text.TextOps.TokenRegex}') AS tokens FROM documents"

  /** Exploded (doc_id, shingle) word n-grams. */
  def shinglesSql(n: Int): String = {
    val parts = (0 until n).map(k => s"tokens[g.i + $k]").mkString(" || ' ' || ")
    s"""SELECT doc_id, $parts AS shingle
        FROM ($toksSql) t
        CROSS JOIN generate_series(1, 512) AS g(i)
        WHERE g.i <= len(tokens) - ${n - 1}"""
  }

  /** Exploded (doc_id, span) non-overlapping n-token spans (stride n),
    * mirroring TextOps.strideSpans.
    */
  def spansSql(n: Int): String = {
    val parts = (0 until n).map(k => s"tokens[g.i + $k]").mkString(" || ' ' || ")
    s"""SELECT doc_id, $parts AS span
        FROM ($toksSql) t
        CROSS JOIN generate_series(1, 512, $n) AS g(i)
        WHERE g.i <= len(tokens) - ${n - 1}"""
  }

  /** MinHash signature CTE body: doc_id, mh0..mh{k-1} — numeric 20-bit
    * slices of salted md5s, mirroring TextOps.minhash (component k = hex
    * digits [5·(k%6)+1, +5) of md5((k/6)|shingle)).
    */
  def minhashSql(n: Int, k: Int): String = {
    val mins = (0 until k)
      .map { i =>
        val salt = i / 6
        val start = (i % 6) * 5 + 1
        s"min(CAST(('0x' || substr(md5('$salt|' || shingle), $start, 5)) AS BIGINT)) AS mh$i"
      }
      .mkString(", ")
    s"SELECT doc_id, $mins FROM (${shinglesSql(n)}) GROUP BY doc_id"
  }

  /** Banded rows from an in-scope `sig` CTE (doc_id, mh0..) — the body
    * bandsSql wraps, exposed separately so a SWEEP over (bands, rows)
    * configs can share ONE sig CTE across configs (dd_lsh_sweep).
    */
  def bandsFromSigSql(bands: Int, rowsPerBand: Int): String =
    (0 until bands).map { b =>
      val cat = (0 until rowsPerBand)
        .map(j => s"CAST(mh${b * rowsPerBand + j} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bh FROM sig"
    }.mkString(" UNION ALL ")

  /** Banded signature rows: doc_id, band, bh (UNION ALL over bands). */
  def bandsSql(n: Int, k: Int, rowsPerBand: Int): String =
    s"WITH sig AS (${minhashSql(n, k)}) " +
      bandsFromSigSql(k / rowsPerBand, rowsPerBand)

  /** Oracle twin of Dedup.dupSpans: merge (doc_id, start) rows of the
    * in-scope relation `src` into maximal spans (gap > n breaks) and
    * aggregate per island — shared by the dd_substring and
    * dd_substring_clean mirrors so the two cannot drift.
    */
  def spanIslandsSql(src: String, n: Int): String = s"""
    SELECT doc_id, min(start) AS span_start,
           max(start) + $n - min(start) AS span_len,
           count(*) AS n_grams
    FROM (
      SELECT doc_id, start, sum(brk) OVER (
        PARTITION BY doc_id ORDER BY start
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM (
        SELECT doc_id, start,
               CASE WHEN start - lag(start) OVER (
                 PARTITION BY doc_id ORDER BY start) > $n
               THEN 1 ELSE 0 END AS brk
        FROM $src))
    GROUP BY doc_id, island"""
}
