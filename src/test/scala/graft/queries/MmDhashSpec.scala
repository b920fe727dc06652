package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dHash near-dup invariants. The block-bucket search claims EXACT recall
  * (any pair within hamming ≤ 3 shares at least one of the 4 15-bit
  * blocks — pigeonhole), so the whole query is checkable against a
  * brute-force all-pairs scan at sf0.001. The hash itself is checked
  * against a driver-side recompute from the raw strings.
  */
class MmDhashSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def refDhash(text: String): Long = {
    // CODE POINTS, not UTF-16 units: the engine (both forms) and the
    // DuckDB oracle sample by code point, so a supplementary char in a
    // future fixture must not split into surrogates here
    val t = text.codePoints().toArray.take(MultimodalQ.DhashThumb)
    def at(i: Int): Int = {
      val pos = 1 + i * (MultimodalQ.DhashThumb - 1) / MultimodalQ.DhashBits
      if (pos <= t.length) t(pos - 1) else 0
    }
    (0 until MultimodalQ.DhashBits).map { i =>
      if (at(i) > at(i + 1)) 1L << i else 0L
    }.sum
  }

  private lazy val hashes: Map[Long, Long] =
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> refDhash(r.getString(1))).toMap

  test("engine dhash matches the driver-side recompute on every doc") {
    val got = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        MultimodalQ.dhash(spark, substring(col("text"), 1,
          MultimodalQ.DhashThumb)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == hashes)
  }

  test("block-bucketed search returns EXACTLY the brute-force pair set") {
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      h = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if h <= MultimodalQ.DhashMaxHamming
    } yield (a, b, h.toLong)).toSet
    val got = MultimodalQ.qs.find(_.name == "mm_dhash_neardup").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"bucketed ${got.size} pairs vs brute-force ${brute.size}: " +
        s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("cluster ledger is consistent with the pair set") {
    val pairs = MultimodalQ.qs.find(_.name == "mm_dhash_neardup").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ledger = MultimodalQ.qs.find(_.name == "mm_dhash_clusters").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // union-find ground truth from the pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.groupBy(find).map { case (_, ms) =>
      (ms.min, ms.length.toLong, ms.max, ms.length.toLong - 1)
    }.toSet
    assert(ledger.toSet == want,
      s"ledger=${ledger.toSet} vs union-find=$want")
    // every asset in a pair appears in exactly one cluster's membership
    assert(ledger.map(_._2).sum == members.length)
  }
}
