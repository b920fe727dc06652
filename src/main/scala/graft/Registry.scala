package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One engine query: the Spark lineage plus (when SQL-expressible) the exact
  * DuckDB oracle the driver hash-compares against. Keeping both side by side
  * is how column-name and semantics parity is maintained.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Deterministic fixed-point sum: round each term to `scale` decimals,
    * sum exactly as integers, divide once. Floating-point addition is not
    * associative, so a plain sum(double) over a shuffled 100 TB dataset is
    * run-order-dependent; this form is bit-stable across engines and runs
    * while staying a single map-side-combinable aggregate.
    */
  def fxsum(c: Column, scale: Int): Column = {
    val m = math.pow(10, scale)
    sum(round(c * m).cast("long")) / m
  }

  /** DuckDB mirror of [[fxsum]]. */
  def fxsumSql(expr: String, scale: Int): String = {
    val m = "1" + "0" * scale
    s"sum(CAST(round(($expr) * $m) AS BIGINT)) / $m.0"
  }
}
