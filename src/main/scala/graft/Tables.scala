package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the same
  * lineage definition runs unchanged at sf0.001 (smoke), sf0.01 (oracle) and
  * sf0.1 (bench) — and, at production scale, against any parquet lake path.
  * Reads are plain `spark.read.parquet`, so Catalyst pushes filters and prunes
  * columns down to the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
