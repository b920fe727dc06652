package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed (pre-shuffled) table layout for co-located joins — the 100 TB
  * answer to "this join shuffles both sides every run": write each side
  * bucketed by the join key once, and every subsequent equi-join on that
  * key plans with NO Exchange on either side (Spark trusts the on-disk
  * hash distribution; verified by BucketingSpec's plan assertion).
  *
  * Use for fact tables joined repeatedly on the same key (lineitem ⋈
  * orders on orderkey). The write itself pays one shuffle — amortized
  * across every downstream join. Bucket count should match target
  * parallelism (a few MB–GB per bucket at scale).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Sorting within buckets
    * additionally enables sort-merge join without a per-task sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
