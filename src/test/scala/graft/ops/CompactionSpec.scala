package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def listing(sizes: Seq[Long], part: String = "p0") =
    sizes.zipWithIndex
      .map { case (b, i) => (part, f"$part/f$i%04d.parquet", b) }
      .toDF("part", "path", "bytes")

  test("every file in exactly one group; groups dense from 0") {
    val files = listing(Seq(10L, 200L, 35L, 90L, 90L, 5L, 64L))
    val planned = Compaction.plan(files, targetBytes = 128L)
    assert(planned.count() === 7)
    assert(planned.select("path").distinct().count() === 7)
    val groups = planned.select("group").distinct()
      .as[Long].collect().sorted
    assert(groups.head === 0L)
    assert(groups === (0L until groups.length).toArray)
  }

  test("group totals bounded by target + largest member; huge file isolated") {
    val sizes = (1 to 200).map(i => (i * 37 % 150 + 1).toLong) :+ 10000L
    val stats = Compaction
      .stats(Compaction.plan(listing(sizes), targetBytes = 256L))
      .as[(Long, Long, Long, Long)].collect()
    stats.foreach { case (g, n, total, mx) =>
      assert(total < 256L + mx, s"group $g: total $total, max $mx")
      assert(n >= 1)
    }
    // the 10000-byte file exceeds the target outright → alone in group 0
    // (size-descending order puts it first, filling its own bins)
    val huge = stats.find(_._3 >= 10000L).get
    assert(huge._2 === 1L, s"oversized file shares a group: $huge")
    // total bytes conserved across groups
    assert(stats.map(_._3).sum === sizes.sum)
  }

  test("grouping never crosses partition boundaries") {
    val files = listing(Seq(100L, 100L, 100L), "a")
      .unionByName(listing(Seq(100L, 100L, 100L), "b"))
    val planned = Compaction
      .plan(files, targetBytes = 1000L, within = Seq("part"))
    // everything fits one group per partition — but never one shared one
    val byPart = planned.groupBy("part")
      .agg(countDistinct(col("group")).as("g"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map { case (p, g, n) => p -> ((g, n)) }.toMap
    assert(byPart("a") === ((1L, 3L)) && byPart("b") === ((1L, 3L)))
    // and the per-partition stats see 300 bytes each
    val st = Compaction.stats(planned, within = Seq("part"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(st.forall(_._3 === 3L) && st.forall(_._4 === 300L))
    assert(Compaction.plan(files, 1000L, Seq("part"))
      .filter(col("group") =!= 0L).count() === 0)
    intercept[IllegalArgumentException](Compaction.plan(files, 0L))
  }
}
