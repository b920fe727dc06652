package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the lake-maintenance complement of
  * [[ZOrder]]/[[Bucketing]]: given a file listing (metadata, not data),
  * assign files to rewrite groups of ≈ `targetBytes` so a follow-up job
  * can coalesce each group into one right-sized file.
  *
  * The assignment is cumulative-sum binning over a size-descending order:
  * a file joins group `cum-bytes-before div target`. One window pass over
  * the LISTING — metadata-sized input; compaction never reads data to
  * plan. Grouping is strictly WITHIN `within` partition columns (real
  * compaction never merges across partition boundaries — it would break
  * partition pruning); the per-partition window also keeps each window
  * task's input to one partition's file count. With no partition columns
  * the single global window is the small-table case (one lake partition's
  * listing), not a corpus-sized input.
  *
  * Deterministic bound, asserted in CompactionSpec: a group's total is
  * < targetBytes + its largest member (files at cum-before ∈
  * [gT, (g+1)T) sum to < T plus the last file's own size), so no group
  * ever doubles the target unless a single file already exceeds it — and
  * such a file lands alone in its group.
  */
object Compaction {

  /** Returns `files` (must carry `path` STRING, `bytes` LONG) with a
    * `group` column, numbered from 0 per `within` partition (a file
    * larger than the target fills several bins' worth of cumsum, so
    * indices after it may skip — group IDENTITY is what matters).
    */
  def plan(files: DataFrame, targetBytes: Long,
      within: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"bad compaction target: $targetBytes")
    val part: Seq[Column] =
      if (within.isEmpty) Seq(lit(0)) else within.map(col)
    val w = Window.partitionBy(part: _*)
      .orderBy(col("bytes").desc, col("path").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__cum_before",
        coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("group", expr(s"__cum_before div $targetBytes"))
      .drop("__cum_before")
  }

  /** Per-group summary of a [[plan]]: file count, total bytes, largest
    * member — the table an operator reads to sanity-check a compaction
    * run before launching it.
    */
  def stats(planned: DataFrame, within: Seq[String] = Nil): DataFrame =
    planned.groupBy((within.map(col) :+ col("group")): _*)
      .agg(count(lit(1)).as("n_files"),
        sum(col("bytes")).as("total_bytes"),
        max(col("bytes")).as("max_bytes"))
}
