package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The data-contract check kernel shared by the batch gate
  * (`dq_expectations` in queries.Relational) and the streaming monitor
  * (streaming.StreamingDq): completeness, domain-range, and
  * accepted-values violations over a lineitem-schema frame, as named
  * CONDITIONAL-SUM aggregate columns. Every check is a commutative,
  * combinable sum, so the SAME list folds identically map-side in a
  * batch HashAggregate and incrementally in a Structured Streaming
  * state store — one definition, two execution modes, zero drift.
  */
object Dq {

  /** The scan-aggregate expectations (everything except the keyed
    * dup-ledger and the referential probe, which need their own shapes).
    */
  def checkAggs: Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(when(col("l_quantity").isNull, 1L).otherwise(0L))
      .as("n_null_quantity"),
    sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
      .otherwise(0L)).as("n_range_quantity"),
    sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
      .otherwise(0L)).as("n_range_discount"),
    sum(when(year(col("l_shipdate")) < 1995 ||
      year(col("l_shipdate")) > 2001, 1L).otherwise(0L))
      .as("n_range_shipdate"),
    sum(when(col("l_returnflag").isNull ||
      !col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
      .as("n_bad_returnflag"))

  /** [[checkAggs]] plus the referential-integrity counter, computed off
    * a stream-static (or batch) LEFT OUTER probe against the orders
    * dimension — a row whose `o_orderkey` came back null is an orphan.
    * Works identically on a streaming `rows` (stateless join + one
    * global aggregation row of state) and a batch one (the spec's
    * equivalence form).
    */
  def monitored(rows: DataFrame, orders: DataFrame): DataFrame = {
    // dropDuplicates on the probe key: a dirty dimension with duplicate
    // o_orderkey rows (the exact condition a DQ monitor exists to catch)
    // must not multiply streamed fact rows, or every counter silently
    // inflates — the batch gate's anti-join is immune, this probe is not.
    val flagged = rows.join(
      broadcast(orders.select(col("o_orderkey")).dropDuplicates("o_orderkey")),
      rows("l_orderkey") === col("o_orderkey"), "left_outer")
    val aggs = checkAggs :+
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_orphans")
    flagged.groupBy().agg(aggs.head, aggs.tail: _*)
  }
}
