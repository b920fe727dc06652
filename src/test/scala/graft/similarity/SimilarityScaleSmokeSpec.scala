package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empirical scale-up smoke for the embedding path (the similarity-family
  * analog of text.ScaleSmokeSpec): 50k synthetic vectors — 100× the
  * fixture — generated distributed (range + md5-derived components, no
  * driver-side data). Verifies the shape invariants that make IVF-bucketed
  * search and semantic dedup survive growth: exactly one assignment per
  * vector, bucket sizes bounded on a uniform corpus (no quadratic pair
  * blowup), and planted duplicate vectors surfacing as cosine-1
  * within-bucket pairs.
  */
class SimilarityScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val nVecs = 50000
  private val dims = 16
  private val centroidModulo = 500 // -> 100 centroids

  // component (i, d) = md5-derived int in [-100, 100] / 100; vectors with
  // id ≡ 1 (mod 1000) all duplicate vector 1 exactly (planted semantic
  // dups). The residue 1 is deliberate: residue 0 would collide with the
  // centroid ids (id ≡ 0 mod 500), making half the centroids identical
  // copies and breaking the uniform-bucket premise this smoke asserts.
  private def embeddings = spark.range(nVecs).select(
    col("id").as("vec_id"),
    transform(sequence(lit(0), lit(dims - 1)), d =>
      ((conv(substring(md5(concat(
        when(col("id") % 1000 === 1, lit(1)).otherwise(col("id"))
          .cast("string"),
        lit("|"), d.cast("string")).cast("binary")), 1, 4), 16, 10)
        .cast("long") % 201 - 100).cast("float") / 100.0f))
      .as("embedding"))

  test("IVF assignment is 1:1 and buckets stay bounded at 100x scale") {
    val assigned = VectorOps.assignIvf(embeddings, centroidModulo).cache()
    assert(assigned.count() === nVecs)
    assert(assigned.groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 1).count() === 0)
    val maxBucket = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)
    // uniform corpus over 100 centroids: mean 500/bucket; 5x mean bounds
    // the skew (the planted 50-clique lands in one bucket)
    assert(maxBucket <= 2500, s"bucket blowup: $maxBucket")
    assigned.unpersist()
  }

  test("semantic-dup pair generation finds the planted clique, no blowup") {
    val assigned = VectorOps.assignIvf(embeddings, centroidModulo)
      .localCheckpoint()
    val d = VectorOps.dotFn(assigned)
    val a = assigned.select(col("centroid_id"), col("vec_id").as("va"),
      col("q").as("qa"), col("n2").as("na"))
    val b = assigned.select(col("centroid_id"), col("vec_id").as("vb"),
      col("q").as("qb"), col("n2").as("nb"))
    val pairs = a.join(b, Seq("centroid_id"))
      .filter(col("va") < col("vb"))
      .filter(VectorOps.cosine(d(col("qa"), col("qb")),
        col("na"), col("nb")) >= 0.999)
    // vectors {1, 1001, 2001, ...} are identical: C(50, 2) pairs
    val clique = nVecs / 1000
    val expected = clique.toLong * (clique - 1) / 2
    val got = pairs.count()
    assert(got >= expected, s"missed planted dups: $got < $expected")
    assert(got <= expected + nVecs / 100,
      s"uniform corpus should not explode near-dup pairs, got $got")
  }
}
