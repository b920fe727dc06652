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
}
