package graft.queries

import graft.{Q, Tables}
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the first of the four
  * LLM-training-data families (exact, MinHash+LSH, Jaccard verification,
  * SimHash). All hashes are md5-derived (see TextOps), so every stage is
  * DuckDB-checkable and recomputation-stable at 100 TB.
  */
object Dedup {

  // LSH configuration: K=12 MinHash components in 4 bands of 3 —
  // collision threshold ≈ (1/4)^(1/3) ≈ 0.63 Jaccard, tuned to surface the
  // fixture's planted near-duplicates without all-pairs work.
  private val ShingleN = 3
  private val K = 12
  private val RowsPerBand = 3

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.sharded(s, dir, "documents")

  val qs: Seq[Q] = Seq(

    // ---- exact dedup: normalized-text hash groups ---------------------------
    // Normalization = tokenize + single-space rejoin, so whitespace/case/
    // punctuation variants collapse. One map-side-combinable aggregation;
    // shuffle carries (hash, partial counts) only.
    Q("dd_exact",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          md5(concat_ws(" ", TextOps.tokens(col("text"))).cast("binary"))
            .as("text_hash"))
        .groupBy(col("text_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id")),
      Some(s"""
        SELECT md5(array_to_string(tokens, ' ')) AS text_hash,
               count(*) AS n_docs, min(doc_id) AS canonical_id
        FROM (${DocSql.toksSql})
        GROUP BY 1""")),

    // ---- near-dup candidates: MinHash + banded LSH --------------------------
    // The scale-critical property: candidates come from a shuffle join on
    // (band, band_hash) buckets — docs only meet if a full band agrees.
    // Never an all-pairs comparison.
    Q("dd_minhash_lsh",
      (s, dir) => TextOps.lshCandidates(docs(s, dir), ShingleN, K, RowsPerBand),
      Some(s"""
        WITH bands AS (${DocSql.bandsSql(ShingleN, K, RowsPerBand)})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id""")),

    // ---- candidate verification: exact n-gram Jaccard -----------------------
    // Jaccard is computed ONLY for LSH candidates (the rerank step of the
    // dedup pipeline): distinct-shingle sets joined per candidate pair.
    // Scale shape: `cand` is materialized (localCheckpoint) so the MinHash
    // DAG runs once, not once per downstream reference; the shingle table
    // is SEMI-FILTERED to candidate docs via a broadcast join BEFORE the
    // distinct + pair joins, so the expensive stages touch only docs that
    // survived LSH — at 100 TB the rerank cost tracks |candidates|, not
    // |corpus|. (The only full-corpus pass left is signature generation.)
    Q("dd_jaccard",
      (s, dir) => {
        val d = docs(s, dir)
        val cand =
          TextOps.lshCandidates(d, ShingleN, K, RowsPerBand).localCheckpoint()
        val candDocs = cand.select(col("doc_a").as("doc_id"))
          .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        val sh = TextOps.explodedShingles(d, ShingleN)
          .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          .distinct()
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = cand
          .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
            Seq("doc_b", "shingle"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
            "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
            "doc_b")
          .select(col("doc_a"), col("doc_b"), col("n_inter"),
            (col("n_inter").cast("double") /
              (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
              .as("jaccard"))
      },
      Some(s"""
        WITH bands AS (${DocSql.bandsSql(ShingleN, K, RowsPerBand)}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        sh AS (SELECT DISTINCT doc_id, shingle FROM (${DocSql.shinglesSql(ShingleN)})),
        sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c
          JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
          GROUP BY c.doc_a, c.doc_b)
        SELECT i.doc_a, i.doc_b, i.n_inter,
               CAST(i.n_inter AS DOUBLE) /
                 CAST(sa.sz + sb.sz - i.n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b""")),

    // ---- MinHash estimation accuracy (sketch eval, like sim_recall) ---------
    // For every LSH candidate pair: estimated Jaccard = fraction of
    // agreeing MinHash components vs the exact shingle Jaccard — the
    // measurement that justifies the sketch. Signatures join back to the
    // (small, checkpointed) candidate set; exact Jaccard reuses the
    // semi-filtered rerank shape of dd_jaccard.
    Q("dd_minhash_estimate",
      (s, dir) => {
        val d = docs(s, dir)
        val cand =
          TextOps.lshCandidates(d, ShingleN, K, RowsPerBand).localCheckpoint()
        val candDocs = cand.select(col("doc_a").as("doc_id"))
          .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        val sigs = TextOps.minhashSignatures(d, ShingleN, K)
          .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        val nMatch = (0 until K).map(k =>
          when(col(s"a_mh$k") === col(s"b_mh$k"), 1).otherwise(0))
          .reduce(_ + _)
        val withSigs = cand
          .join(sigs.select(col("doc_id").as("doc_a") +:
            (0 until K).map(k => col(s"mh$k").as(s"a_mh$k")): _*), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b") +:
            (0 until K).map(k => col(s"mh$k").as(s"b_mh$k")): _*), "doc_b")
          .select(col("doc_a"), col("doc_b"), nMatch.cast("long").as("n_match"))
        val sh = TextOps.explodedShingles(d, ShingleN)
          .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          .distinct()
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = cand
          .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
            Seq("doc_b", "shingle"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_inter"))
        withSigs
          .join(inter, Seq("doc_a", "doc_b"))
          .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
            "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
            "doc_b")
          .select(col("doc_a"), col("doc_b"), col("n_match"),
            (col("n_match").cast("double") / K).as("est_jaccard"),
            (col("n_inter").cast("double") /
              (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
              .as("jaccard"))
      },
      Some {
        val matches = (0 until K).map(k =>
          s"CASE WHEN a.mh$k = b.mh$k THEN 1 ELSE 0 END").mkString(" + ")
        s"""
        WITH sig AS (${DocSql.minhashSql(ShingleN, K)}),
        bands AS (${DocSql.bandsSql(ShingleN, K, RowsPerBand)}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        est AS (
          SELECT c.doc_a, c.doc_b, CAST($matches AS BIGINT) AS n_match
          FROM cand c
          JOIN sig a ON a.doc_id = c.doc_a
          JOIN sig b ON b.doc_id = c.doc_b),
        sh AS (SELECT DISTINCT doc_id, shingle
               FROM (${DocSql.shinglesSql(ShingleN)})),
        sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c
          JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
          GROUP BY c.doc_a, c.doc_b)
        SELECT e.doc_a, e.doc_b, e.n_match,
               CAST(e.n_match AS DOUBLE) / $K AS est_jaccard,
               CAST(i.n_inter AS DOUBLE) /
                 CAST(sa.sz + sb.sz - i.n_inter AS DOUBLE) AS jaccard
        FROM est e
        JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
        JOIN sz sa ON sa.doc_id = e.doc_a
        JOIN sz sb ON sb.doc_id = e.doc_b"""
      }),

    // ---- near-dup cluster assignment ---------------------------------------
    // LSH pairs → dedup groups via bounded min-label propagation
    // (ops.Components): cluster_id = smallest doc id reachable in ≤4
    // rounds. The canonical "keep one per cluster" dedup output.
    Q("dd_clusters",
      (s, dir) => graft.ops.Components.label(
        TextOps.lshCandidates(docs(s, dir), ShingleN, K, RowsPerBand),
        rounds = 4),
      Some(s"""
        WITH bands AS (${DocSql.bandsSql(ShingleN, K, RowsPerBand)}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        ${graft.ops.Components.labelSql(4)}
        SELECT doc_id, cluster_id FROM l4""")),

    // ---- train/eval contamination detection --------------------------------
    // Decontamination (the C4/GPT eval-overlap check): which held-out
    // docs (source src0) share a 5-gram with any training doc (every
    // other source), and how much. Distinct (shingle, doc) sets on both
    // sides, one equi-join on the shingle — at production scale the eval
    // side is tiny, so it broadcast-joins and the train corpus never
    // shuffles for it.
    Q("dd_contamination",
      (s, dir) => {
        val withSrc = docs(s, dir)
          .select(col("doc_id"), col("source"),
            TextOps.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("source"),
            explode(TextOps.shingles(col("toks"), 5)).as("shingle"))
        val eval_ = withSrc.filter(col("source") === "src0")
          .select(col("shingle"), col("doc_id").as("eval_doc")).distinct()
        val train = withSrc.filter(col("source") =!= "src0")
          .select(col("shingle"), col("doc_id").as("train_doc")).distinct()
        eval_.join(train, "shingle")
          .groupBy(col("eval_doc"))
          .agg(countDistinct(col("train_doc")).as("n_train_docs"),
            countDistinct(col("shingle")).as("n_shared_shingles"))
      },
      Some(s"""
        WITH sh AS (
          SELECT d.doc_id, d.source, s.shingle
          FROM documents d JOIN (${DocSql.shinglesSql(5)}) s
            ON s.doc_id = d.doc_id),
        e AS (SELECT DISTINCT shingle, doc_id AS eval_doc
              FROM sh WHERE source = 'src0'),
        t AS (SELECT DISTINCT shingle, doc_id AS train_doc
              FROM sh WHERE source <> 'src0')
        SELECT e.eval_doc, count(DISTINCT t.train_doc) AS n_train_docs,
               count(DISTINCT e.shingle) AS n_shared_shingles
        FROM e JOIN t ON t.shingle = e.shingle
        GROUP BY 1""")),

    // ---- SimHash fingerprints ----------------------------------------------
    // 32-bit locality-sensitive fingerprint per doc; identical fingerprints
    // (exact groupBy on the bit string) are near-dup groups. The 32 bit
    // sums are one combinable aggregation over exploded distinct tokens.
    Q("dd_simhash",
      (s, dir) => TextOps.simhash(docs(s, dir)),
      Some {
        val sums = (0 until TextOps.simhashBits).map(j =>
          s"sum(CASE WHEN substr(md5(token), ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$j")
          .mkString(", ")
        val bits = (0 until TextOps.simhashBits).map(j =>
          s"CASE WHEN s$j >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""
        WITH tok AS (
          SELECT DISTINCT doc_id, unnest(tokens) AS token
          FROM (${DocSql.toksSql})),
        sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id)
        SELECT doc_id, $bits AS simhash FROM sums"""
      })
  )
}
