package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter as a typed `Aggregator`: a fixed bitset of `words × 64`
  * bits — the third bounded-memory sketch family next to KMV
  * ([[BottomKSketch]], cardinality) and count-min ([[CountMinSketch]],
  * frequency), covering set MEMBERSHIP. This is the workhorse of
  * large-corpus decontamination (the Dolma/CCNet pattern): build one
  * filter over the training corpus' n-grams, then test held-out n-grams
  * against it with zero false negatives and a tunable false-positive
  * rate — without ever materializing or joining the full training-side
  * key set on the probe path.
  *
  * Input is the item's pre-computed bit positions, one per hash function
  * (computed in the DataFrame from the engine-standard 60-bit md5 prefix —
  * see [[BloomSketch.positions]]), so the aggregator itself is pure bit
  * arithmetic. Buffer is one flat `Array[Long]`; reduce sets k bits,
  * merge is element-wise OR — commutative, associative, idempotent, and
  * map-side combinable (the shuffle carries one fixed-size bitset per
  * group, regardless of corpus size: the property that makes the build
  * side a single combinable aggregation at 100 TB).
  *
  * Because the bit positions are deterministic md5 slices, the finished
  * bitset equals the SET of positions touched by the training keys — so
  * the membership test (and its false positives!) is reproducible in
  * portable SQL as "all k probe positions ∈ the distinct train-position
  * set", putting the sketch under the DuckDB oracle gate bit-for-bit.
  */
final class BloomSketch(words: Int)
    extends Aggregator[Seq[Int], Array[Long], Array[Long]] {

  require(words > 0, s"bad bloom size: $words words")

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], positions: Seq[Int]): Array[Long] = {
    // a NULL position array (null item column) is skipped like any SQL
    // aggregate input, instead of throwing from inside the merge path;
    // null ELEMENTS can't reach here (callers filter null items — the
    // Seq[Int] encoder would reject them before reduce)
    if (positions == null) return buf
    positions.foreach { p =>
      buf(p >>> 6) |= 1L << (p & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // native columnar encoding (unsafe array), not java serialization —
  // the bitset crosses the shuffle on every partial merge
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Bit position of `item` for hash function `j`: the engine-standard
    * 60-bit numeric md5 prefix of `"j|item"`, mod the filter's bit count.
    * DuckDB mirror:
    * `CAST(('0x' || substr(md5(j || '|' || item), 1, 15)) AS BIGINT) % bits`.
    */
  def position(item: Column, j: Int, bits: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$j|"), item).cast("binary")),
      1, 15), 16, 10).cast("long"), lit(bits.toLong))

  /** All `k` bit positions of `item` as one array column — the
    * aggregator's input row.
    */
  def positions(item: Column, k: Int, bits: Int): Column =
    array((0 until k).map(position(item, _, bits).cast("int")): _*)

  /** Membership test against a finished bitset column: true iff all `k`
    * of this item's bits are set. No false negatives; false positives at
    * the classic (1 - e^(-kn/m))^k rate. Pure bit arithmetic per probe
    * row — the probe side never joins against training-side keys.
    */
  def mightContain(bloom: Column, item: Column, k: Int, bits: Int): Column =
    (0 until k).map { j =>
      val p = position(item, j, bits)
      val word = element_at(bloom, shiftright(p, 6).cast("int") + lit(1))
      call_function("shiftright", word, p.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** xxhash64 variants of [[position]]/[[positions]]/[[mightContain]] —
    * for uses where the filter never needs a DuckDB mirror (e.g. the
    * q27_bloom_join runtime filter, whose ORACLE is the plain join):
    * xxhash64 is a native codegen'd long hash, ~an order of magnitude
    * cheaper per row than the md5-string walk, and the seed column
    * makes the k functions independent. Deterministic within the
    * engine, which is all a result-invisible filter requires. Measured
    * on q27_bloom_join at sf0.1: 2.38 s → md5 probe cost dominated;
    * the fast path cuts the probe projection to plain long arithmetic.
    */
  def fastPositions(item: Column, k: Int, bits: Int): Column =
    array((0 until k).map(j =>
      pmod(xxhash64(lit(j), item), lit(bits.toLong)).cast("int")): _*)

  /** Membership against a bitset built from [[fastPositions]]. */
  def fastMightContain(bloom: Column, item: Column, k: Int,
      bits: Int): Column =
    (0 until k).map { j =>
      val p = pmod(xxhash64(lit(j), item), lit(bits.toLong))
      val word = element_at(bloom, shiftright(p, 6).cast("int") + lit(1))
      call_function("shiftright", word, p.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
