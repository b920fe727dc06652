package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k distinct sketch (the KMV / k-minimum-values cardinality
  * estimator) as a typed `Aggregator`: the buffer holds AT MOST k distinct
  * hash values — bounded memory per group regardless of input cardinality,
  * which is what makes it the 100 TB alternative to
  * `collect_set` (unbounded) for estimating distinct counts.
  *
  * Input values must be uniform hashes (e.g. the numeric 60-bit md5 prefix
  * used across this engine); the estimator is then
  * `(k-1) / u_(k)` with `u_(k)` = k-th smallest normalized hash. Because
  * the hash is deterministic, the sketch — unlike HLL — is exactly
  * reproducible in the DuckDB oracle (`list_sort(list(DISTINCT h))[1:k]`),
  * so the whole estimate is under the correctness gate.
  *
  * Buffer is a sorted, duplicate-free `Array[Long]`; insert and merge are
  * O(k). Commutative and associative, so partial aggregation (map-side
  * combine) applies — the shuffle carries ≤ k longs per group.
  */
final class BottomKSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than the current k minima
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted unique arrays, keep the k smallest
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val v = a(i); i += 1
          if (j < b.length && b(j) == v) j += 1 // drop duplicate
          v
        } else { val v = b(j); j += 1; v }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // native columnar encoding (unsafe array), not java serialization —
  // the buffer crosses the shuffle on every partial merge
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
