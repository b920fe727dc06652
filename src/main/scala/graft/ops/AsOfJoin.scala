package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row `(key, t)`, attach the
  * most recent right row `(key, t')` with `t' <= t` — the time-series
  * lookup the reference's event-time model (SURVEY.md §2 O9-O11) has no
  * operator for, and Spark has no built-in for either.
  *
  * Implementation is the union-and-fill pattern, NOT a range join:
  * tag both sides, union them, and per key carry the latest right-side
  * payload forward with a running `last(ignoreNulls)` over
  * `(time, side)` ordering. Cost at any scale is ONE exchange of
  * |left|+|right| rows on the key plus a per-partition sort — no range
  * explosion, no broadcast requirement, no O(|L|×|R|) pair generation,
  * which is what makes it the 100 TB form (an inequality-join
  * formulation degenerates to BNLJ in Spark).
  *
  * Tie semantics: a right row at `t' == t` IS visible to the left row
  * (right sorts before left at equal times), matching DuckDB
  * `ASOF JOIN ... ON r.t <= l.t`. Left rows with no prior right row
  * keep null payloads (left-outer semantics).
  *
  * Contract: the right side must be unique per `(key, time)` —
  * pre-aggregate duplicates first (an as-of lookup is ill-defined under
  * same-instant duplicates). The right payload travels as one struct, so
  * the fill is row-atomic even when payload columns are null.
  */
object AsOfJoin {

  /** @param left      left rows; all columns are kept
    * @param right     right rows; columns other than `key` are attached
    *                  with `prefix` (unique per (key, rightTime))
    * @param key       equi-join key column present on both sides
    * @param leftTime  left event-time column (numeric or timestamp)
    * @param rightTime right event-time column, same type as `leftTime`
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, prefix: String = "r_"): DataFrame = {
    val lCols = left.columns.filterNot(_ == key).toSeq
    val rCols = right.columns.filterNot(_ == key).toSeq
    // Internal working columns and prefixed outputs must not collide with
    // the left schema — a silent collision would produce wrong results or
    // an opaque analysis error deep inside the union.
    val reserved = Set("_t", "_side", "_r")
    val clash = left.columns.filter(reserved) ++
      rCols.map(prefix + _).filter(left.columns.contains)
    require(clash.isEmpty,
      s"asOf: left columns collide with internal/output names: " +
        s"${clash.mkString(", ")} (reserved: _t, _side, _r; " +
        s"right columns are emitted as $prefix<name>)")
    val rStruct = struct(rCols.map(col): _*)

    val lSide = left.select(
      col(key) +: col(leftTime).cast(left.schema(leftTime).dataType).as("_t")
        +: lit(1).as("_side")
        +: (lCols.map(col) :+ lit(null).cast(
          org.apache.spark.sql.types.StructType(
            rCols.map(c => right.schema(c)))).as("_r")): _*)
    val rSide = right.select(
      col(key) +: col(rightTime).as("_t") +: lit(0).as("_side")
        +: (lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
          :+ rStruct.as("_r")): _*)

    // right rows order before left rows at equal _t, so t' == t is matched
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    lSide.unionByName(rSide)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col(key) +: lCols.map(col)
        ++: rCols.map(c => col(s"_r.$c").as(s"$prefix$c")): _*)
  }
}
