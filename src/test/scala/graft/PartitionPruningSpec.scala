package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partition pruning proven end-to-end — the first lever any 100 TB
  * deployment pulls: a lake laid out as `.../event_type=X/` must let a
  * predicate on the partition column skip whole directories at PLANNING
  * time, not filter rows after reading them.
  *
  * The fixture events are written out partitioned by event_type, read
  * back with an equality predicate, and the spec asserts (a) the scan
  * carries the predicate as a PartitionFilter, (b) the scan's input
  * files are ONLY the matching partition's files, and (c) the same holds
  * through the engine's own loader path (Tables-style read → filter).
  */
class PartitionPruningSpec extends SparkSpec {

  test("event_type layout prunes directories at planning time") {
    val dir = Files.createTempDirectory("prune").toString + "/events"
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").parquet(dir)

    // AQE disabled for inspectability (sibling-test pattern): metrics are
    // then read off THIS Dataset's own executed plan after one action
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
    val one = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
    val exec = one.queryExecution.executedPlan

    // (a) the predicate reaches the scan as a partition filter
    val scanStr = exec.toString
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.replaceAll("\\s+", " ")
        .matches("(?s).*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"),
      s"no partition filter on event_type in:\n$scanStr")

    // (b) values survive the layout round-trip (partition col restored);
    // collect() drives one's OWN query execution so its scan metrics fill
    val expect = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "click").count()
    assert(one.collect().length.toLong == expect)

    // (c) after execution, the scan's numFiles metric equals the click
    // partition's file count on disk — strictly fewer than the table's:
    // whole directories were skipped, not rows filtered post-read
    def countParquet(p: String): Long = {
      val s = Files.walk(java.nio.file.Paths.get(p))
      try s.filter(_.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val clickFiles = countParquet(s"$dir/event_type=click")
    val allFiles = countParquet(dir)
    val scanned = one.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
    assert(clickFiles > 0 && allFiles > clickFiles,
      s"layout degenerate: $clickFiles of $allFiles files")
    assert(scanned == clickFiles,
      s"scan read $scanned files; the click partition has $clickFiles " +
        s"(table total $allFiles) — directories were not skipped")
    } finally spark.conf.set(aqeKey, aqeWas)
  }
}
