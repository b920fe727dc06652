package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-domain registries; every entry that is
  * SQL-expressible carries its DuckDB oracle in `oracleSql` with identical
  * column names (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** All engine queries, each paired with its oracle when one exists. */
  def all: Seq[Q] =
    graft.queries.Groups.all

  /** Flagship smoke on /root/testdata/sf0.001; driver checks rows>0.
    * Runs the REAL end-to-end pipeline (listing → filter → label → split →
    * synthetic decode → hash-embed → full_video assembly → TFRecord sink)
    * and returns the samples read back from the written .tfrecord files.
    */
  def entry(spark: SparkSession): DataFrame =
    Main.smoke(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
