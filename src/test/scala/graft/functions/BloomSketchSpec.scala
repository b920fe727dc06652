package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  test("reduce sets one bit per hash; merge is OR and idempotent") {
    val agg = new BloomSketch(2) // 128 bits
    var buf = agg.zero
    assert(buf.length === 2)
    buf = agg.reduce(buf, Seq(0, 63, 64))
    assert(buf(0) === (1L | (1L << 63)))
    assert(buf(1) === 1L)
    // re-adding the same item changes nothing (sets are idempotent)
    val again = agg.reduce(buf.clone(), Seq(0, 63, 64))
    assert(again.toSeq === buf.toSeq)
    val other = agg.reduce(agg.zero, Seq(1, 127))
    val merged = agg.merge(buf.clone(), other)
    assert(merged(0) === (1L | 2L | (1L << 63)))
    assert(merged(1) === (1L | (1L << 63)))
  }

  test("no false negatives; false-positive rate in the expected range") {
    val k = 3; val bits = 1 << 14; val words = bits / 64
    val bl = udaf(new BloomSketch(words))
    val present = (0 until 500).map(i => s"in$i")
    val absent = (0 until 2000).map(i => s"out$i")
    val bloom = present.toDF("item")
      .select(BloomSketch.positions(col("item"), k, bits).as("pos"))
      .agg(bl(col("pos")).as("bloom"))
    val hits = bloom
      .select(explode(array((present ++ absent).map(lit): _*)).as("item"),
        col("bloom"))
      .select(col("item"),
        BloomSketch.mightContain(col("bloom"), col("item"), k, bits).as("hit"))
      .as[(String, Boolean)].collect().toMap
    present.foreach(i => assert(hits(i), s"false negative on $i"))
    // n=500, m=16384, k=3 → fp ≈ (1-e^(-3·500/16384))^3 ≈ 6.6e-4;
    // 2000 probes → expect ~1.3 false positives, bound generously
    val fps = absent.count(hits(_))
    assert(fps <= 20, s"false-positive rate implausibly high: $fps/2000")
  }

  test("bitset equals the set-of-positions formulation (oracle contract)") {
    val k = 3; val bits = 1 << 10; val words = bits / 64
    val agg = new BloomSketch(words)
    val items = (0 until 50).map(i => s"x$i")
    val posOf: String => Seq[Int] = item =>
      (0 until k).map { j =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$j|$item".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        (java.lang.Long.parseLong(hex, 16) % bits).toInt
      }
    val buf = items.foldLeft(agg.zero)((b, i) => agg.reduce(b, posOf(i)))
    val setBits = (0 until bits).filter(p => ((buf(p >>> 6) >>> (p & 63)) & 1L) == 1L)
    assert(setBits.toSet === items.flatMap(posOf).toSet)
  }
}
