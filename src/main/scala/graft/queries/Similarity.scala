package graft.queries

import graft.{Q, Tables}
import graft.similarity.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search operators over `embeddings` — brute-force cosine top-k
  * (correctness baseline), IVF-bucketed ANN (scale path), and
  * embedding-cosine near-dup pairs. Cosine uses VectorOps' fixed-point
  * integer arithmetic, so results are bit-identical across engines and
  * partitionings.
  */
object Similarity {

  private val ProbeLimit = 8 // probes = vec_id < 8
  private val CentroidModulo = 25 // centroids = vec_id % 25 == 0

  /** DuckDB mirrors of VectorOps.quantize/dot/cosine. */
  private val qnSql = s"""
    SELECT vec_id,
           [CAST(round(CAST(x AS DOUBLE) * ${VectorOps.Scale}) AS BIGINT)
            for x in embedding] AS qv,
           CAST(list_sum([q * q for q in
             [CAST(round(CAST(x AS DOUBLE) * ${VectorOps.Scale}) AS BIGINT)
              for x in embedding]]) AS BIGINT) AS n2
    FROM embeddings"""

  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum([$a.qv[i] * $b.qv[i] for i in generate_series(1, len($a.qv))]) AS BIGINT)"

  private def cosSql(a: String, b: String): String =
    s"CAST(${dotSql(a, b)} AS DOUBLE) / sqrt(CAST($a.n2 AS DOUBLE)) / sqrt(CAST($b.n2 AS DOUBLE))"

  /** Oracle CTE assigning every vector to its nearest centroid (IVF). */
  private val assignSql = s"""
    qn AS ($qnSql),
    cents AS (SELECT vec_id AS centroid_id, qv, n2 FROM qn
              WHERE vec_id % $CentroidModulo = 0),
    scored_c AS (
      SELECT v.vec_id, c.centroid_id, v.qv, v.n2,
             ${cosSql("v", "c")} AS ccos
      FROM qn v CROSS JOIN cents c),
    asg AS (
      SELECT vec_id, centroid_id, qv, n2 FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos DESC, centroid_id ASC) AS rn
        FROM scored_c) WHERE rn = 1)"""

  private val LshPlanes = 8
  private val Dims = 64 // fixture embedding dimensionality

  val qs: Seq[Q] = Seq(

    // ---- random-hyperplane (sign) LSH signatures ---------------------------
    // The cosine analog of the MinHash bucketing: 8 deterministic md5-derived
    // hyperplanes, bit j = sign(q·h_j). Equal signatures = one candidate
    // bucket — the brief's "LSH-bucketed variant" of similarity search.
    // Each projection is a fixedpoint_dot against a literal sign vector.
    Q("sim_lsh_sig",
      (s, dir) => VectorOps.lshSignature(
        Tables.sharded(s, dir, "embeddings"), LshPlanes, Dims),
      Some {
        val signs = VectorOps.hyperplaneSigns(LshPlanes, Dims)
        val bitExprs = (0 until LshPlanes).map { j =>
          val lst = signs(j).mkString("[", ", ", "]")
          s"""CASE WHEN list_sum([qv[i] * ($lst)[i]
                 for i in generate_series(1, $Dims)]) >= 0
              THEN '1' ELSE '0' END"""
        }.mkString(" || ")
        s"""
        WITH qn AS ($qnSql)
        SELECT vec_id, $bitExprs AS signature FROM qn"""
      }),

    // ---- brute-force cosine top-k ------------------------------------------
    // The exact baseline: a small broadcast probe set against the full
    // corpus — one corpus scan, no corpus shuffle; per-probe top-k via
    // row_number (partial top-k per partition under AQE).
    Q("sim_knn_brute",
      (s, dir) => {
        val e = Tables.sharded(s, dir, "embeddings")
        VectorOps.knnBrute(e, e.filter(col("vec_id") < ProbeLimit), k = 10)
      },
      Some(s"""
        WITH qn AS ($qnSql),
        p AS (SELECT vec_id AS probe_id, qv, n2 FROM qn
              WHERE vec_id < $ProbeLimit),
        scored AS (
          SELECT p.probe_id, c.vec_id, ${cosSql("p", "c")} AS cosine
          FROM p JOIN qn c ON c.vec_id <> p.probe_id)
        SELECT probe_id, vec_id AS neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
                      ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored) WHERE rank <= 10""")),

    // ---- IVF-bucketed approximate top-k ------------------------------------
    // The 100 TB path: centroids are a deterministic corpus subset,
    // assignment is one broadcast pass over the corpus (narrow — the corpus
    // never shuffles for it), and the search join is keyed on centroid_id,
    // so cost scales with bucket size. The centroid cross join is bounded:
    // |corpus| × |centroids|, centroids broadcast.
    Q("sim_knn_ivf",
      (s, dir) => VectorOps.knnIvf(Tables.sharded(s, dir, "embeddings"),
        col("vec_id") < ProbeLimit, CentroidModulo, k = 5),
      Some(s"""
        WITH $assignSql,
        probes AS (SELECT vec_id AS probe_id, centroid_id, qv, n2 FROM asg
                   WHERE vec_id < $ProbeLimit),
        scored AS (
          SELECT p.probe_id, c.vec_id, ${cosSql("p", "c")} AS cosine
          FROM probes p JOIN asg c ON c.centroid_id = p.centroid_id
                                  AND c.vec_id <> p.probe_id)
        SELECT probe_id, vec_id AS neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
                      ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored) WHERE rank <= 5""")),

    // ---- ANN quality evaluation: IVF recall@5 vs brute ground truth ---------
    // The metric every ANN deployment needs: per probe, the fraction of
    // the exact top-5 the bucketed search recovered (left join: a probe
    // whose bucket misses everything still reports recall 0). Both sides
    // are deterministic, so even the EVALUATION is oracle-checked.
    Q("sim_recall",
      (s, dir) => {
        val e = Tables.sharded(s, dir, "embeddings")
        val k = 5
        val truth = VectorOps.knnBrute(e, e.filter(col("vec_id") < ProbeLimit), k)
          .select(col("probe_id"), col("neighbor_id"))
        val approx = VectorOps.knnIvf(e, col("vec_id") < ProbeLimit,
            CentroidModulo, k)
          .select(col("probe_id"), col("neighbor_id"), lit(1L).as("hit"))
        truth.join(approx, Seq("probe_id", "neighbor_id"), "left")
          .groupBy(col("probe_id"))
          .agg(count(lit(1)).as("k"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("probe_id"), col("k"), col("n_hit"),
            (col("n_hit").cast("double") / col("k").cast("double"))
              .as("recall"))
      },
      Some(s"""
        WITH $assignSql,
        truth AS (
          SELECT probe_id, vec_id AS neighbor_id FROM (
            SELECT p.vec_id AS probe_id, c.vec_id,
                   row_number() OVER (PARTITION BY p.vec_id
                     ORDER BY ${cosSql("p", "c")} DESC, c.vec_id ASC) AS rank
            FROM (SELECT * FROM qn WHERE vec_id < $ProbeLimit) p
            JOIN qn c ON c.vec_id <> p.vec_id) WHERE rank <= 5),
        approx AS (
          SELECT probe_id, vec_id AS neighbor_id, 1 AS hit FROM (
            SELECT p.probe_id, c.vec_id,
                   row_number() OVER (PARTITION BY p.probe_id
                     ORDER BY ${cosSql("p", "c")} DESC, c.vec_id ASC) AS rank
            FROM (SELECT vec_id AS probe_id, centroid_id, qv, n2 FROM asg
                  WHERE vec_id < $ProbeLimit) p
            JOIN asg c ON c.centroid_id = p.centroid_id
                      AND c.vec_id <> p.probe_id) WHERE rank <= 5)
        SELECT t.probe_id, count(*) AS k,
               CAST(sum(coalesce(a.hit, 0)) AS BIGINT) AS n_hit,
               CAST(sum(coalesce(a.hit, 0)) AS DOUBLE) / count(*) AS recall
        FROM truth t LEFT JOIN approx a
          ON a.probe_id = t.probe_id AND a.neighbor_id = t.neighbor_id
        GROUP BY t.probe_id""")),

    // ---- embedding-cosine near-dup candidates ------------------------------
    // Near-dup detection in embedding space: all pairs WITHIN an IVF bucket
    // (never across the corpus), top 20 by cosine — the embedding analog of
    // LSH-bucketed text dedup.
    Q("dd_embed_cos",
      (s, dir) => {
        // materialized: the self-join below references the assignment
        // twice, and without truncation each side re-runs the full
        // corpus × centroids scoring pass (2× the dominant cost; at
        // scale you persist assignments before any bucket self-join)
        val assigned = VectorOps.assignIvf(
          Tables.sharded(s, dir, "embeddings"), CentroidModulo)
          .localCheckpoint()
        val a = assigned.select(col("centroid_id"),
          col("vec_id").as("vec_a"), col("q").as("qa"), col("n2").as("na"))
        val b = assigned.select(col("centroid_id"),
          col("vec_id").as("vec_b"), col("q").as("qb"), col("n2").as("nb"))
        val d = VectorOps.dotFn(assigned)
        a.join(b, Seq("centroid_id"))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            VectorOps.cosine(d(col("qa"), col("qb")),
              col("na"), col("nb")).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_a").asc, col("vec_b").asc)
          .limit(20)
      },
      Some(s"""
        WITH $assignSql
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ${cosSql("a", "b")} AS cosine
        FROM asg a JOIN asg b ON a.centroid_id = b.centroid_id
                             AND a.vec_id < b.vec_id
        ORDER BY cosine DESC, vec_a ASC, vec_b ASC LIMIT 20""")),

    // ---- seeded k-means (one Lloyd round) — IVF centroid TRAINING ----------
    // sim_knn_ivf consumes centroids; this op trains them: deterministic
    // seeds (8 smallest md5-hashed vec_ids) → Euclidean assignment →
    // centroid update (integer sum vectors + counts, never a float mean)
    // → reassignment against the updated centroids. Cluster sizes from
    // both rounds show the movement. Everything runs in the EXPLODED
    // (vec_id, dim, value) relational form: assignment distances are
    // equi-joins on the dimension index against a broadcast centroid
    // table — the corpus never shuffles, and the update aggregation
    // shuffles (cluster, dim) partial sums only. Round-2 distance to mean
    // S/n is compared exactly: Σ_d (q·n − S_d)² is overflow-safe integer
    // arithmetic (≤ 64·(2·10³·n)², fine to n ~ 10⁷ rows/cluster) and the
    // single final ÷n² is one correctly-rounded IEEE op — both engines
    // agree bitwise, which is what puts ITERATIVE ML under the oracle
    // gate. More rounds = repeating the same two CTEs.
    Q("sim_kmeans",
      (s, dir) => {
        val ex = VectorOps.quantized(Tables.sharded(s, dir, "embeddings"))
          .select(col("vec_id"), posexplode(col("q")).as(Seq("d", "qv")))
          .localCheckpoint() // referenced 4×; decode/quantize once
        val seeds = ex.select(col("vec_id")).distinct()
          .orderBy(md5(col("vec_id").cast("string").cast("binary")).asc,
            col("vec_id").asc)
          .limit(8)
        val c0 = ex.join(broadcast(seeds), "vec_id")
          .select(col("vec_id").as("cid"), col("d"), col("qv").as("qc"))
        def argmin(dists: org.apache.spark.sql.DataFrame) = {
          val w = Window.partitionBy(col("vec_id"))
            .orderBy(col("dist").asc, col("cid").asc)
          dists.withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).select(col("vec_id"), col("cid"))
        }
        val a1 = argmin(ex.join(broadcast(c0), "d")
          .groupBy(col("vec_id"), col("cid"))
          .agg(sum((col("qv") - col("qc")) * (col("qv") - col("qc")))
            .as("dist")))
        val n1 = a1.groupBy(col("cid")).agg(count(lit(1)).as("n_round1"))
        val c1 = ex.join(a1, "vec_id")
          .groupBy(col("cid"), col("d")).agg(sum(col("qv")).as("sd"))
          .join(n1, "cid")
        val a2 = argmin(ex.join(broadcast(c1), "d")
          .groupBy(col("vec_id"), col("cid"), col("n_round1"))
          .agg((sum((col("qv") * col("n_round1") - col("sd")) *
              (col("qv") * col("n_round1") - col("sd"))).cast("double") /
            (col("n_round1") * col("n_round1")).cast("double")).as("dist"))
          .select(col("vec_id"), col("cid"), col("dist")))
        val n2 = a2.groupBy(col("cid")).agg(count(lit(1)).as("n_round2"))
        n1.join(n2, Seq("cid"), "left")
          .select(col("cid").as("centroid_id"), col("n_round1"),
            coalesce(col("n_round2"), lit(0L)).as("n_round2"))
      },
      Some(s"""
        WITH qn AS ($qnSql),
        ex AS (
          SELECT vec_id, g.i AS d, qv[g.i] AS q
          FROM qn CROSS JOIN generate_series(1, $Dims) AS g(i)),
        seeds AS (
          SELECT vec_id FROM qn
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        c0 AS (
          SELECT e.vec_id AS cid, e.d, e.q AS qc
          FROM ex e JOIN seeds s ON s.vec_id = e.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cid,
                 CAST(sum((e.q - c.qc) * (e.q - c.qc)) AS BIGINT) AS dist
          FROM ex e JOIN c0 c ON c.d = e.d GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist, cid) AS rn FROM d1) WHERE rn = 1),
        n1 AS (SELECT cid, count(*) AS n_round1 FROM a1 GROUP BY 1),
        c1 AS (
          SELECT a.cid, e.d, CAST(sum(e.q) AS BIGINT) AS sd
          FROM ex e JOIN a1 a ON a.vec_id = e.vec_id GROUP BY 1, 2),
        d2 AS (
          SELECT e.vec_id, c.cid,
                 CAST(sum((e.q * n.n_round1 - c.sd) *
                          (e.q * n.n_round1 - c.sd)) AS DOUBLE) /
                   CAST(n.n_round1 * n.n_round1 AS DOUBLE) AS dist
          FROM ex e JOIN c1 c ON c.d = e.d
          JOIN n1 n ON n.cid = c.cid
          GROUP BY e.vec_id, c.cid, n.n_round1),
        a2 AS (
          SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist, cid) AS rn FROM d2) WHERE rn = 1),
        n2 AS (SELECT cid, count(*) AS n_round2 FROM a2 GROUP BY 1)
        SELECT n1.cid AS centroid_id, n1.n_round1,
               CAST(coalesce(n2.n_round2, 0) AS BIGINT) AS n_round2
        FROM n1 LEFT JOIN n2 ON n2.cid = n1.cid""")),

    // ---- product quantization ANN (asymmetric distance computation) ---------
    // The billion-scale memory play (IVF-PQ): each vector is compressed to
    // M=8 one-byte codes (one per 8-dim subspace, nearest of K=16
    // codebook entries), and probe→vector distance is approximated by
    // table lookups — the probe computes ONE distance table per subspace
    // (|probes|·M·K entries), then every corpus vector's approximate
    // distance is Σ_m table[m, code_m(v)], touching only its 8 codes, not
    // its 64 floats. Codebook entries are the subvectors of 16
    // hash-chosen docs (same seeding discipline as sim_kmeans — swap in
    // trained centroids without changing any plan). Every distance is an
    // exact integer sum over quantized coordinates, so encode, tables,
    // ADC, and ranking are all bit-reproducible in the oracle. Scale
    // shape: the codebook broadcasts; encode is one corpus pass; the ADC
    // join is keyed (m, code) against a broadcast-sized table — the
    // corpus shuffles once, for its own 8-row code groups.
    Q("sim_pq",
      (s, dir) => {
        val subDim = 8; val k = 16; val probeN = 4
        val ex = VectorOps.quantized(Tables.sharded(s, dir, "embeddings"))
          .select(col("vec_id"), posexplode(col("q")).as(Seq("d", "qv")))
          .withColumn("m", expr("d div 8"))
          .localCheckpoint() // referenced 3x; decode/quantize once
        val seeds = ex.select(col("vec_id")).distinct()
          .orderBy(md5(concat(lit("pq|"), col("vec_id").cast("string"))
            .cast("binary")).asc, col("vec_id").asc)
          .limit(k)
        val cb = ex.join(broadcast(seeds), "vec_id")
          .select(col("vec_id").as("code"), col("m"), col("d"),
            col("qv").as("qc"))
        // per (vector, subspace): exact distance to every codebook entry —
        // feeds BOTH the corpus encoding (argmin) and the probes' ADC
        // tables (probe rows as-is), so it is materialized once
        val dists = ex.join(broadcast(cb), Seq("m", "d"))
          .groupBy(col("vec_id"), col("m"), col("code"))
          .agg(sum((col("qv") - col("qc")) * (col("qv") - col("qc")))
            .as("dist"))
          .localCheckpoint()
        val wEnc = Window.partitionBy(col("vec_id"), col("m"))
          .orderBy(col("dist").asc, col("code").asc)
        val codes = dists.withColumn("rn", row_number().over(wEnc))
          .filter(col("rn") === 1).select(col("vec_id"), col("m"), col("code"))
        val dt = dists.filter(col("vec_id") < probeN)
          .select(col("vec_id").as("probe_id"), col("m"), col("code"),
            col("dist"))
        val adc = codes.join(broadcast(dt), Seq("m", "code"))
          .filter(col("vec_id") =!= col("probe_id"))
          .groupBy(col("probe_id"), col("vec_id"))
          .agg(sum(col("dist")).as("adc_dist"))
        val w = Window.partitionBy(col("probe_id"))
          .orderBy(col("adc_dist").asc, col("vec_id").asc)
        adc.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
          .select(col("probe_id"), col("vec_id").as("neighbor_id"),
            col("adc_dist"), col("rank"))
      },
      Some(s"""
        WITH qn AS ($qnSql),
        ex AS (
          SELECT vec_id, g.i AS d, qv[g.i] AS q, (g.i - 1) // 8 AS m
          FROM qn CROSS JOIN generate_series(1, $Dims) AS g(i)),
        seeds AS (
          SELECT vec_id FROM qn
          ORDER BY md5('pq|' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        cb AS (
          SELECT e.vec_id AS code, e.m, e.d, e.q AS qc
          FROM ex e JOIN seeds s ON s.vec_id = e.vec_id),
        dists AS (
          SELECT e.vec_id, e.m, c.code,
                 CAST(sum((e.q - c.qc) * (e.q - c.qc)) AS BIGINT) AS dist
          FROM ex e JOIN cb c ON c.m = e.m AND c.d = e.d GROUP BY 1, 2, 3),
        codes AS (
          SELECT vec_id, m, code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, m
                        ORDER BY dist, code) AS rn FROM dists) WHERE rn = 1),
        dt AS (
          SELECT vec_id AS probe_id, m, code, dist FROM dists
          WHERE vec_id < 4),
        adc AS (
          SELECT t.probe_id, c.vec_id, CAST(sum(t.dist) AS BIGINT) AS adc_dist
          FROM codes c JOIN dt t ON t.m = c.m AND t.code = c.code
          WHERE c.vec_id <> t.probe_id GROUP BY 1, 2)
        SELECT probe_id, vec_id AS neighbor_id, adc_dist, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
                      ORDER BY adc_dist, vec_id) AS rank
          FROM adc) WHERE rank <= 5"""))
  )
}
