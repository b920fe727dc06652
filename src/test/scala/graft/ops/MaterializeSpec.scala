package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The spark.graft.checkpointDir seam: with the conf unset every
  * materialization point is a localCheckpoint (executor memory, no files);
  * with it set, the same sites run reliable checkpoint() rooted at the
  * configured path — the cluster fault-tolerance switch PLAN_AUDIT.md's
  * 100 TB notes promise, exercised end-to-end through Components (the
  * heaviest materialization consumer: per-round lineage truncation).
  */
class MaterializeSpec extends SparkSpec {
  import Materialize._

  // a 2-cluster edge list: {1,2,3} (diameter 2) and {10,11}
  private def pairs = spark.range(0, 1).selectExpr(
    "stack(3, 1L, 2L, 2L, 3L, 10L, 11L) AS (doc_a, doc_b)")

  private def labels() =
    Components.label(pairs, rounds = 3)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("Components agrees exactly across local and reliable checkpointing") {
    val expected = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    assert(labels() === expected) // conf unset: localCheckpoint path

    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Materialize.ConfKey, dir)
    try {
      assert(labels() === expected) // conf set: reliable checkpoint path
      // the reliable path actually wrote RDD checkpoint files under dir
      val wrote = Files.walk(java.nio.file.Paths.get(dir))
        .filter(Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("materialize() truncates lineage in both modes") {
    def truncated(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().toString
        .contains("LogicalRDD")
    val base = spark.range(5).toDF("v").filter(col("v") > 1)
    assert(truncated(base.materialize()))
    val dir = Files.createTempDirectory("graft_ckpt2").toString
    spark.conf.set(Materialize.ConfKey, dir)
    try assert(truncated(base.materialize()))
    finally spark.conf.unset(Materialize.ConfKey)
  }
}
