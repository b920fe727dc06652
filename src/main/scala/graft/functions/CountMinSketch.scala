package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a typed `Aggregator`: a fixed `depth × width` grid
  * of counters — bounded memory per group regardless of how many distinct
  * items flow through, the standard streaming answer to "approximate
  * frequencies / heavy hitters at 100 TB" where an exact per-item
  * `groupBy(item).count()` would shuffle every distinct key.
  *
  * Input is the item's pre-computed bucket index per depth row (computed
  * in the DataFrame from the engine-standard 60-bit md5 prefix — see
  * [[CountMinSketch.bucketCols]]), so the aggregator itself is pure
  * counter arithmetic. The estimate for an item is
  * `min over depths of grid(depth, bucket_depth(item))` — an
  * overestimate only (counters only ever add), with error ≤ εN for
  * width = ⌈e/ε⌉ at confidence 1-(1/2)^depth.
  *
  * Buffer is one flat `Array[Long]` of depth·width counters; reduce is
  * `depth` increments, merge is element-wise addition — commutative,
  * associative, map-side combinable (the shuffle carries one fixed-size
  * grid per group). Because the bucket hashes are deterministic md5
  * slices, the whole grid — and therefore the estimate — is reproducible
  * in portable SQL, so count-min sits under the DuckDB oracle gate
  * (unlike a seeded-random sketch).
  */
final class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[Seq[Int], Array[Long], Array[Long]] {

  require(depth > 0 && width > 0, s"bad sketch shape $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], buckets: Seq[Int]): Array[Long] = {
    // SQL-aggregate null semantics: a NULL item's bucket array is
    // skipped instead of an opaque NPE from inside the merge path; null
    // ELEMENTS can't reach here (callers filter null items first). A
    // WRONG-SIZED array, though, is a caller bug (bucketCols built with
    // a different depth) and must stay loud — silently skipping every
    // row would read as an all-zero sketch.
    if (buckets == null) return buf
    require(buckets.length == depth,
      s"bucket array has ${buckets.length} positions, aggregator depth is $depth")
    var j = 0
    while (j < depth) {
      buf(j * width + buckets(j)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // native columnar encoding (unsafe array), not java serialization —
  // the grid crosses the shuffle on every partial merge
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Bucket index of `item` for depth row `j`: the engine-standard 60-bit
    * numeric md5 prefix of `"j|item"`, mod width. DuckDB mirror:
    * `CAST(('0x' || substr(md5(j || '|' || item), 1, 15)) AS BIGINT) % w`.
    */
  def bucket(item: Column, j: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$j|"), item).cast("binary")),
      1, 15), 16, 10).cast("long"), lit(width.toLong)).cast("int")

  /** All `depth` bucket indices of `item` as one array column — the
    * aggregator's input row.
    */
  def bucketCols(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(bucket(item, _, width)): _*)

  /** Point estimate from a finished grid: min over depths of the counter
    * at this item's bucket (grid is the flat depth·width array).
    */
  def estimate(grid: Column, item: Column, depth: Int, width: Int): Column =
    (0 until depth).map(j =>
      element_at(grid, lit(j * width) + bucket(item, j, width) + lit(1)))
      .reduce(least(_, _))
}
