package graft.pipeline

import org.apache.spark.sql.DataFrame

/** O21 — the reference's local debug sink (preprocess.py:415-416: a
  * `Map(print)` over each encoded sample when running on DirectRunner).
  *
  * Executor-side println, exactly like the reference's worker-side print:
  * nothing is collected to the driver, so it is safe to leave attached to
  * an arbitrarily large lineage (output interleaving is the same local-mode
  * caveat the reference has).
  */
object DebugSink {
  def print(df: DataFrame): Unit =
    df.foreach((r: org.apache.spark.sql.Row) => println(r))

  /** Driver-side tabular peek at `n` rows — the `df.show` idiom for
    * interactive use; bounded, never a full collect.
    */
  def show(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)
}
