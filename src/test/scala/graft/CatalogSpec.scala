package graft

import org.apache.spark.sql.functions._

/** The pure-SQL front door: registered views + injected functions make
  * engine queries expressible as `spark.sql(...)` strings, and they agree
  * with the DataFrame forms.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("spark.sql over registered views ≡ DataFrame lineage") {
    Catalog.registerTables(spark, sfDir)
    val sql = spark.sql("""
      SELECT r_name, count(*) AS n, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name""").as[(String, Long, Long)].collect().toSet
    val df = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sfDir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(sql === df)
    assert(sql.nonEmpty)
  }

  test("injected functions work inside spark.sql statements") {
    Catalog.registerTables(spark, sfDir)
    val rows = spark.sql(s"""
      SELECT vec_id,
             fixedpoint_dot(
               transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)),
               transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))) AS n2
      FROM embeddings LIMIT 5""").as[(Long, Long)].collect()
    assert(rows.length === 5)
    assert(rows.forall(_._2 > 0))
  }

  test("event-time views carry the normalized ts/ems columns") {
    Catalog.registerTables(spark, sfDir)
    val n = spark.sql("""
      SELECT count(*) FROM events
      WHERE ems = unix_millis(ts) AND event_type IS NOT NULL""")
      .as[Long].head()
    assert(n > 0)
  }

  test("sketch aggregators are callable from pure SQL") {
    Catalog.registerTables(spark, sfDir)
    Catalog.registerSketches(spark)
    // count-min from SQL ≡ count-min from the DataFrame API
    val d = 4; val w = 64
    val sqlGrid = spark.sql(s"""
      SELECT count_min(array(${(0 until d).map(j =>
        s"CAST(CAST(CONV(substr(md5(CAST(concat('$j|', o_orderstatus) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % $w AS INT)")
        .mkString(", ")})) AS grid
      FROM orders""").as[Seq[Long]].head()
    val cm = udaf(new graft.functions.CountMinSketch(d, w))
    val dfGrid = Tables(spark, sfDir, "orders")
      .select(graft.functions.CountMinSketch
        .bucketCols(col("o_orderstatus"), d, w).as("b"))
      .agg(cm(col("b"))).as[Seq[Long]].head()
    assert(sqlGrid === dfGrid)
    assert(sqlGrid.sum > 0)
    // bloom + bottom_k resolve and produce correctly-shaped state
    val bloomLen = spark.sql("""
      SELECT bloom(array(CAST(o_orderkey % 16384 AS INT))) FROM orders""")
      .as[Seq[Long]].head().length
    assert(bloomLen === 256)
    val bk = spark.sql("""
      SELECT bottom_k(CAST(CONV(substr(md5(CAST(o_orderstatus AS BINARY)), 1, 15), 16, 10) AS BIGINT))
      FROM orders""").as[Seq[Long]].head()
    assert(bk.nonEmpty && bk.length <= 16)
    // bitmap popcount from SQL ≡ exact count distinct
    val (bmCard, exact) = spark.sql("""
      SELECT aggregate(transform(bitmap(o_custkey), w -> CAST(bit_count(w) AS BIGINT)),
                       CAST(0 AS BIGINT), (a, c) -> a + c),
             count(DISTINCT o_custkey)
      FROM orders""").as[(Long, Long)].head()
    assert(bmCard === exact && exact > 0)
  }
}
