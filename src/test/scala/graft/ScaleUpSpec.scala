package graft

import org.apache.spark.sql.functions._

/** graft.ScaleUp is part of the measurement path (scripts/bench_sf1.sh
  * feeds its output to the scaling bench), so its amplification
  * invariants are load-bearing: a generator that breaks referential
  * integrity or forgets a perturbation makes the scaling exponents in
  * BASELINE.md measure the artifact, not the engine.
  */
class ScaleUpSpec extends SparkSpec {
  private val src = "/root/testdata/sf0.001"

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("scaleup").toString
    ScaleUp.amplifyTo(spark, src, dir, factor = 3)
    dir
  }

  private def cnt(dir: String, t: String): Long =
    spark.read.parquet(s"$dir/$t.parquet").count()

  test("fact tables replicate by the factor; dimensions are copied") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(cnt(out, t) === 3 * cnt(src, t), t)
    for (t <- Seq("region", "nation"))
      assert(cnt(out, t) === cnt(src, t), t)
  }

  test("per-replica key shifts keep referential integrity") {
    val orders = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    val orphans = orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(orphans === 0L, "replica key shift broke orders->customer")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    assert(li.join(spark.read.parquet(s"$out/orders.parquet"),
      li("l_orderkey") === col("o_orderkey"), "left_anti").count() === 0L)
    // and replicas never collide: keys stay unique per table
    assert(cust.select(col("c_custkey")).distinct().count() ===
      cust.count())
  }

  test("documents are DISTINCT texts across replicas (no dedup artifact)") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select(col("text")).distinct().count() === docs.count(),
      "identical replica texts would hand the dedup family 3x exact " +
        "duplicates that a real 3x corpus does not have")
    // n_chars stays consistent with the perturbed text
    assert(docs.filter(length(col("text")).cast("long") =!=
      col("n_chars")).count() === 0L)
  }

  test("embeddings are DISTINCT vectors across replicas (no ANN ties)") {
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(emb.select(col("embedding")).distinct().count() === emb.count())
  }
}
