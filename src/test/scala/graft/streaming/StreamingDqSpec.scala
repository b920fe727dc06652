package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The continuous DQ monitor's cumulative counters over a micro-batched
  * stream must equal `ops.Dq.monitored` over the same rows as one batch
  * frame — on clean AND doctored input (the violation counters must
  * actually move when bad rows arrive).
  */
class StreamingDqSpec extends SparkSpec {

  test("streamed cumulative DQ counters equal the batch monitor") {
    val sfDir = "/root/testdata/sf0.001"
    val li = Tables(spark, sfDir, "lineitem")
    val orders = Tables(spark, sfDir, "orders")

    val dir = Files.createTempDirectory("dq_in").toString
    val ckpt = Files.createTempDirectory("dq_ckpt").toString
    li.filter(col("l_orderkey") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    li.filter(col("l_orderkey") % 2 === 1)
      .unionByName(li.limit(1)
        .withColumn("l_orderkey", lit(-1L)) // orphan
        .withColumn("l_quantity", lit(999.0))) // out of range
      .coalesce(1).write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = StreamingDq.totals(stream, orders)
      .writeStream.format("memory").queryName("dq_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val gotRows = spark.table("dq_stream").collect()
    assert(gotRows.length === 1)
    val got = gotRows.head
    val want = graft.ops.Dq.monitored(
      spark.read.parquet(s"$dir/b0", s"$dir/b1"), orders).collect().head
    val fields = Seq("n_rows", "n_null_quantity", "n_range_quantity",
      "n_range_discount", "n_range_shipdate", "n_bad_returnflag",
      "n_orphans")
    fields.foreach(f =>
      assert(got.getAs[Long](f) === want.getAs[Long](f), f))
    // the doctored rows actually registered
    assert(got.getAs[Long]("n_orphans") === 1L)
    assert(got.getAs[Long]("n_range_quantity") === 1L)
    assert(got.getAs[Long]("n_rows") === li.count() + 1)
    assert(got.getAs[Long]("n_bad_returnflag") === 0L)
  }

  test("duplicate dimension keys do not inflate the monitor's counters") {
    val sfDir = "/root/testdata/sf0.001"
    val li = Tables(spark, sfDir, "lineitem")
    val orders = Tables(spark, sfDir, "orders")
    // the dirty-dimension condition the monitor exists to survive:
    // duplicated o_orderkey rows must not multiply probed fact rows
    val dirty = orders.unionByName(orders.limit(5))
    val clean = graft.ops.Dq.monitored(li, orders).collect().head
    val got = graft.ops.Dq.monitored(li, dirty).collect().head
    val fields = Seq("n_rows", "n_null_quantity", "n_range_quantity",
      "n_range_discount", "n_range_shipdate", "n_bad_returnflag",
      "n_orphans")
    fields.foreach(f =>
      assert(got.getAs[Long](f) === clean.getAs[Long](f), f))
    assert(got.getAs[Long]("n_rows") === li.count())
  }
}
