package graft.tfrecord

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class TFRecordFormatSpec extends SparkSpec {

  private def sampleDf = {
    import spark.implicits._
    Seq(
      ("a.mp4", "en", "train", Seq(0L, 500L), Seq(Seq(1f, 2f), Seq(3f, 4f))),
      ("b.mp4", "fr", "test", Seq(0L), Seq(Seq(5f, 6f))),
      ("c.mp4", "de", "val", Seq(0L, 500L, 1000L),
        Seq(Seq(7f), Seq(8f), Seq(9f))))
      .toDF("filename", "label", "dataset", "timestamp_ms", "logits")
  }

  test("write + read round-trip through format(\"tfrecord\") with partitionBy") {
    val dir = Files.createTempDirectory("tfrec").toString
    TFRecords.write(sampleDf, dir, numShards = 2)

    // O22: per-split directories exist (reference's {out}/data/{split}/)
    val splits = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(splits.toSeq === Seq("dataset=test", "dataset=train", "dataset=val"))
    val shards = new java.io.File(s"$dir/data/dataset=train").listFiles()
      .filter(_.getName.endsWith(".tfrecord"))
    assert(shards.nonEmpty)

    val schema = StructType(Seq(
      StructField("filename", StringType),
      StructField("label", StringType),
      StructField("timestamp_ms", ArrayType(LongType)),
      StructField("logits", ArrayType(ArrayType(FloatType)))))
    val back = TFRecords.read(spark, dir, schema)
      .selectExpr("filename", "label", "dataset", "timestamp_ms", "logits")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getSeq[Long](3), r.getSeq[Seq[Float]](4))).sortBy(_._1)

    assert(back.length === 3)
    assert(back(0) === (("a.mp4", "en", "train", Seq(0L, 500L),
      Seq(Seq(1f, 2f), Seq(3f, 4f)))))
    assert(back(1) === (("b.mp4", "fr", "test", Seq(0L), Seq(Seq(5f, 6f)))))
    assert(back(2)._3 === "val")
  }

  test("column pruning: reading a subset schema projects correctly") {
    val dir = Files.createTempDirectory("tfrec").toString
    TFRecords.write(sampleDf, dir, numShards = 1)
    val schema = StructType(Seq(
      StructField("filename", StringType),
      StructField("timestamp_ms", ArrayType(LongType))))
    val rows = TFRecords.read(spark, dir, schema)
      .select("filename").orderBy("filename").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a.mp4", "b.mp4", "c.mp4"))
  }

  test("pruned reads skip non-requested feature bytes at the wire level") {
    // the retrain-loop contract: TFRecord as a first-class SOURCE means
    // a narrow projection over wide records (2048-float logits) must
    // not pay to decode the floats it never asked for. Plant records
    // whose logits dwarf the filename, read only the filename, and
    // assert (a) identical rows to the full read's projection and
    // (b) the wide column's bytes were SKIPPED, not materialized.
    import spark.implicits._
    val dir = Files.createTempDirectory("tfrec_prune").toString
    val wide = Seq.tabulate(20)(i =>
      (s"v$i.mp4", "train", Seq(0L), Seq(Seq.fill(2048)(i.toFloat))))
      .toDF("filename", "dataset", "timestamp_ms", "logits")
    TFRecords.write(wide, dir, numShards = 1)
    val full = StructType(Seq(
      StructField("filename", StringType),
      StructField("timestamp_ms", ArrayType(LongType)),
      StructField("logits", ArrayType(ArrayType(FloatType)))))
    def counters() = (ExampleCodec.bytesMaterialized.sum(),
      ExampleCodec.bytesSkipped.sum())

    val (m0, s0) = counters()
    val pruned = TFRecords.read(spark, dir, full)
      .select("filename").collect().map(_.getString(0)).sorted
    val (m1, s1) = counters()
    assert(pruned.toSeq === Seq.tabulate(20)(i => s"v$i.mp4").sorted)
    // explain names only the requested column in ReadSchema
    val plan = TFRecords.read(spark, dir, full).select("filename")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("logits"), plan)
    // byte budget: each record carries 2048 floats ≈ 8 KB of logits; the
    // pruned read must materialize well under one record's logits TOTAL
    // while skipping ≈ all of them
    val matPruned = m1 - m0
    val skipped = s1 - s0
    assert(matPruned < 8 * 1024,
      s"pruned read materialized $matPruned bytes — logits leaked")
    assert(skipped > 20L * 2048 * 4,
      s"only $skipped bytes skipped — the wide column was not walked past")

    // and a query that DOES touch the wide column still materializes it
    // (pruning is projection-driven, not a lossy shortcut), identically
    val (m2, _) = counters()
    val fullRows = TFRecords.read(spark, dir, full)
      .selectExpr("filename", "size(logits) AS nf").collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted
    val (m3, _) = counters()
    assert(fullRows.map(_._1).toSeq === pruned.toSeq)
    assert(fullRows.forall(_._2 === 1)) // one feature-list entry per row
    assert(m3 - m2 > 20L * 2048 * 4) // touching logits pays full freight
  }

  test("written shards are valid TFRecord files at the byte level") {
    val dir = Files.createTempDirectory("tfrec").toString
    TFRecords.write(sampleDf, dir, numShards = 1)
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".tfrecord"))
    // read every shard with the pure-Scala frame reader: CRCs must verify
    val n = files.map { f =>
      val in = new java.io.FileInputStream(f)
      try TFRecordIO.readRecords(in).size finally in.close()
    }.sum
    assert(n === 3)
  }

  test("partition pruning: a dataset filter reaches the scan as a partition filter") {
    val dir = Files.createTempDirectory("tfrec_pp").toString
    TFRecords.write(sampleDf, dir, numShards = 1)
    val schema = StructType(Seq(
      StructField("filename", StringType),
      StructField("timestamp_ms", ArrayType(LongType))))
    val q = TFRecords.read(spark, dir, schema)
      .filter(org.apache.spark.sql.functions.col("dataset") === "train")
    val plan = q.queryExecution.executedPlan.toString
    // split directories are hive-style partitions: pruning is free — only
    // dataset=train files are listed, the others are never opened
    assert(plan.contains("PartitionFilters") && plan.contains("dataset"),
      s"expected partition filter in scan:\n$plan")
    assert(q.collect().map(_.getString(0)).toSeq === Seq("a.mp4"))
  }

  test("Example mode: flat tf.train.Example records via recordType option") {
    val dir = Files.createTempDirectory("tfrec_ex").toString
    import spark.implicits._
    val flat = Seq(("a.mp4", 1L, 0.5f), ("b.mp4", 2L, 1.5f))
      .toDF("name", "n", "score")
    flat.write.format("tfrecord").option("recordType", "Example")
      .mode("overwrite").save(dir)
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("n", LongType),
      StructField("score", FloatType)))
    val back = spark.read.schema(schema).format("tfrecord")
      .option("recordType", "Example").load(dir)
      .orderBy("name").collect()
    assert(back.map(r => (r.getString(0), r.getLong(1), r.getFloat(2)))
      .toSeq === Seq(("a.mp4", 1L, 0.5f), ("b.mp4", 2L, 1.5f)))
  }

  test("schema evolution: a column absent from the files reads as null") {
    val dir = Files.createTempDirectory("tfrec_ev").toString
    TFRecords.write(sampleDf, dir, numShards = 1)
    val widened = StructType(Seq(
      StructField("filename", StringType),
      StructField("brand_new_col", LongType), // not in the files
      StructField("timestamp_ms", ArrayType(LongType))))
    val rows = TFRecords.read(spark, dir, widened)
      .select("filename", "brand_new_col").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.isNullAt(1)))
  }

  test("gzip compression: .tfrecord.gz round-trip, smaller than plain") {
    val dPlain = Files.createTempDirectory("tfrec_pl").toString
    val dGz = Files.createTempDirectory("tfrec_gz").toString
    import spark.implicits._
    // repetitive payload so gzip has something to compress
    val df = (1 to 200).map(i => (s"f$i.mp4", Seq.fill(100)(7L)))
      .toDF("filename", "timestamp_ms")
    df.coalesce(1).write.format("tfrecord").mode("overwrite").save(dPlain)
    df.coalesce(1).write.format("tfrecord").option("compression", "gzip")
      .mode("overwrite").save(dGz)
    def files(d: String, suffix: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(suffix))
    assert(files(dGz, ".tfrecord.gz").nonEmpty)
    assert(files(dGz, ".tfrecord.gz").map(_.length).sum <
      files(dPlain, ".tfrecord").map(_.length).sum / 2)
    val schema = StructType(Seq(
      StructField("filename", StringType),
      StructField("timestamp_ms", ArrayType(LongType))))
    val back = spark.read.schema(schema).format("tfrecord").load(dGz)
    assert(back.count() === 200)
    assert(back.selectExpr("sum(size(timestamp_ms))").head().getLong(0)
      === 200L * 100)
  }

  test("invalid recordType fails loudly") {
    intercept[Exception] {
      sampleDf.write.format("tfrecord").option("recordType", "Protobuf")
        .mode("overwrite")
        .save(Files.createTempDirectory("tfrec_bad").toString)
    }
  }

  test("deterministic sharding: same seed → identical record placement") {
    val d1 = Files.createTempDirectory("tfrec").toString
    val d2 = Files.createTempDirectory("tfrec").toString
    TFRecords.write(sampleDf, d1, numShards = 2, seed = 7L)
    TFRecords.write(sampleDf, d2, numShards = 2, seed = 7L)
    def sizes(d: String) = new java.io.File(s"$d/data").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".tfrecord"))
      .map(f => f.getParentFile.getName -> f.length()).sortBy(_.toString).toSeq
    assert(sizes(d1) === sizes(d2))
  }
}
