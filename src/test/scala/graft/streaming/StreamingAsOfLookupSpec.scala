package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The streaming temporal lookup ≡ the native batch as-of join, proven
  * on a version table with every edge the operator has: multiple
  * versions per key, events before the first version (null enrich),
  * events exactly AT a version boundary (inclusive), keys with no
  * versions at all, and a deliberately SHUFFLED micro-batch slicing
  * (user-hash, not time) — the stateless contract says slicing cannot
  * matter.
  */
class StreamingAsOfLookupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq(
    // user 1: three versions; user 2: one; user 3: none in dim
    (1L, 10L, "bronze"), (1L, 20L, "silver"), (1L, 30L, "gold"),
    (2L, 15L, "bronze"))
    .toDF("user_id", "vf", "tier")

  private val events = Seq(
    (1L, 5L, 100L), // before any version → null
    (1L, 10L, 101L), // exactly at vf=10 → bronze (inclusive)
    (1L, 25L, 102L), // between 20 and 30 → silver
    (1L, 35L, 103L), // after the last → gold
    (2L, 14L, 104L), // before user 2's only version → null
    (2L, 99L, 105L), // after it → bronze
    (3L, 50L, 106L)) // no versions for the key → null
    .toDF("user_id", "ems", "event_id")

  private def gotRows(df: org.apache.spark.sql.DataFrame) = df
    .select(col("event_id"), col("version").getField("vf").as("vf"),
      col("version").getField("tier").as("tier"))
    .as[(Long, Option[Long], Option[String])].collect().toSet

  test("batch enrich matches the native as-of join row for row") {
    val idx = StreamingAsOfLookup.versionIndex(dim, "user_id", "vf")
    val got = gotRows(
      StreamingAsOfLookup.enrich(events, idx, "user_id", "ems"))
    val want = graft.plans.NativeAsOf
      .asOf(events, dim, "user_id", "ems", "vf")
      .select(col("event_id"), col("r_vf").as("vf"),
        col("r_tier").as("tier"))
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(want.exists(_._2.isEmpty) && want.exists(_._2.nonEmpty))
    assert(got === want)
    // and the hand-checked edges
    assert(got.contains((101L, Some(10L), Some("bronze")))) // inclusive
    assert(got.contains((100L, None, None))) // before first version
    assert(got.contains((106L, None, None))) // key absent from dim
  }

  test("streamed enrich ≡ batch on a shuffled (user-hash) slicing") {
    val dir = Files.createTempDirectory("asof_in").toString
    val ckpt = Files.createTempDirectory("asof_ckpt").toString
    // slice by event id hash — interleaves users and times across
    // micro-batches, the opposite of arrival order
    (0 to 2).foreach { i =>
      events.filter(col("event_id") % 3 === i).coalesce(1)
        .write.parquet(s"$dir/b$i")
    }
    val idx = StreamingAsOfLookup.versionIndex(dim, "user_id", "vf")
    val streamed = StreamingAsOfLookup.enrich(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      idx, "user_id", "ems")
    val q = streamed.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val got = gotRows(spark.table("asof_stream"))
    val want = gotRows(
      StreamingAsOfLookup.enrich(events, idx, "user_id", "ems"))
    assert(got === want)
    assert(got.size === 7)
  }
}
