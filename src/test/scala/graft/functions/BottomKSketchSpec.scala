package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BottomKSketchSpec extends SparkSpec {
  import spark.implicits._

  private val agg = new BottomKSketch(4)

  test("reduce keeps the k smallest distinct values, sorted") {
    var buf = agg.zero
    Seq(50L, 10L, 30L, 10L, 20L, 40L, 5L).foreach(v => buf = agg.reduce(buf, v))
    assert(buf.toSeq === Seq(5L, 10L, 20L, 30L))
  }

  test("merge deduplicates and keeps the k smallest of both sides") {
    val a = Array(1L, 3L, 5L, 7L)
    val b = Array(2L, 3L, 6L, 9L)
    assert(agg.merge(a, b).toSeq === Seq(1L, 2L, 3L, 5L))
    assert(agg.merge(agg.zero, b).toSeq === b.toSeq)
    assert(agg.merge(a, agg.zero).toSeq === a.toSeq)
  }

  test("sketch over a Dataset equals sorted distinct minima, buffer bounded") {
    val k = 8
    val bk = udaf(new BottomKSketch(k))
    val vals = (1L to 1000L).map(v => (v % 7, v * 37 % 501))
    val got = vals.toDF("g", "h").groupBy("g")
      .agg(bk(col("h")).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = vals.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(k)
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (g, sk) =>
      assert(sk === want(g), s"group $g")
      assert(sk.length <= k)
    }
  }
}
