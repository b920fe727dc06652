package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("O1/O2 file listing: binaryFile glob scan and in-memory create") {
    val dir = java.nio.file.Files.createTempDirectory("ingest_ls")
    Seq("a.mp4", "b.txt", "c.mkv").foreach { n =>
      java.nio.file.Files.write(dir.resolve(n), Array[Byte](1, 2, 3))
    }
    val listed = Ingest.listFiles(spark, s"$dir/*")
      .as[String].collect().map(_.split('/').last).sorted
    assert(listed.toSeq === Seq("a.mp4", "b.txt", "c.mkv"))

    val created = Ingest.fromList(spark, Seq("x/y/z/f.mp4", "g.avi"))
    assert(created.columns.toSeq === Seq("filename"))
    assert(created.count() === 2)
  }

  test("O4 extension filter: keeps mkv/avi/mp4, handles edge cases") {
    val files = Seq(
      "a/b/c/x.mp4", "a/b/c/x.mkv", "a/b/c/x.avi", // kept
      "a/b/c/x.MP4", // case-sensitive like the reference: dropped
      "a/b/c/x.webm", "a/b/c/x.txt", // wrong extension
      "a/b/c/mp4", // no dot: whole name is the "extension"
      "a/b/c/x.tar.mp4" // only the last segment counts: kept
    ).toDF("filename")
    val kept = Ingest.filterVideos(files).as[String].collect().sorted
    assert(kept.toSeq === Seq("a/b/c/x.avi", "a/b/c/x.mkv", "a/b/c/x.mp4",
      "a/b/c/x.tar.mp4"))
  }

  test("O5 label extraction: 3rd-from-last path segment") {
    val files = Seq("gs://bucket/videos/cats/v1/file.mp4").toDF("filename")
    val label = Ingest.withLabel(files).select("label").as[String].head()
    assert(label === "cats") // reference: preprocess.py:268-274
  }

  test("O5 short paths yield null label, not a crash") {
    val files = Seq("file.mp4", "a/file.mp4").toDF("filename")
    val labels = Ingest.withLabel(files).select("label").collect()
    assert(labels.forall(_.isNullAt(0)))
  }

  test("O6 ratio guard rejects ratios that do not sum to 1") {
    val files = Seq("a.mp4").toDF("filename")
    intercept[IllegalArgumentException] {
      Ingest.splitByHash(files, 0.7, 0.2, 0.2)
    }
    intercept[IllegalArgumentException] {
      Ingest.splitRandom(files, 0.5, 0.1, 0.1, seed = 1)
    }
  }

  test("O6 splitByHash is a partition: every row gets exactly one dataset") {
    val files = (1 to 500).map(i => s"videos/l/s/f$i.mp4").toDF("filename")
    val tagged = Ingest.splitByHash(files, 0.70, 0.15, 0.15)
    assert(tagged.count() === 500)
    assert(tagged.filter(!col("dataset").isin("train", "val", "test"))
      .count() === 0)
    // deterministic: same input → identical assignment
    val a = tagged.orderBy("filename").as[(String, String)].collect()
    val b = Ingest.splitByHash(files, 0.70, 0.15, 0.15)
      .orderBy("filename").as[(String, String)].collect()
    assert(a.sameElements(b))
    // ratios within quantization tolerance (256 buckets + sampling noise)
    val n = tagged.filter(col("dataset") === "train").count()
    assert(n > 250 && n < 450, s"train fraction wildly off: $n/500")
  }

  test("O6 property: splitByHash partitions all rows for arbitrary ratios") {
    val ratioGen = for {
      a <- Gen.choose(0.0, 1.0)
      b <- Gen.choose(0.0, 1.0 - a)
    } yield (a, b)
    val files = (1 to 100).map(i => s"v/l/s/f$i.mp4").toDF("filename")
    files.cache().count()
    val prop = Prop.forAll(ratioGen) { case (tr, va) =>
      val counts = Ingest.splitByHash(files, tr, va, 1.0 - tr - va)
        .groupBy("dataset").count().as[(String, Long)].collect().toMap
      counts.values.sum == 100L &&
        counts.keySet.subsetOf(Set("train", "val", "test"))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
    files.unpersist()
  }

  test("O6 splitRandom is seeded-reproducible and a partition") {
    val files = (1 to 200).map(i => s"v/l/s/f$i.mp4").toDF("filename")
    val a = Ingest.splitRandom(files, 0.7, 0.15, 0.15, seed = 42)
      .orderBy("filename").as[(String, String)].collect()
    val b = Ingest.splitRandom(files, 0.7, 0.15, 0.15, seed = 42)
      .orderBy("filename").as[(String, String)].collect()
    assert(a.sameElements(b))
    assert(a.map(_._2).forall(Set("train", "val", "test")))
  }

  test("O7 plumbing: URI split mirrors urlparse netloc/path semantics") {
    val got = Ingest.withUriParts(Seq(
        "gs://bkt/a/b.mp4", // the reference's exact shape
        "s3a://lake-1/x.mkv", // other scheme, digits/dash in bucket
        "gs://bkt", // bucket-only URI: empty key, not a crash
        "/abs/local.mp4", // absolute path: no scheme/bucket, '/' stripped
        "rel/local.avi") // relative path: passes through whole
        .toDF("filename"))
      .select("filename", "scheme", "bucket", "obj_key")
      .as[(String, String, String, String)].collect().toSeq
    assert(got === Seq(
      ("gs://bkt/a/b.mp4", "gs", "bkt", "a/b.mp4"),
      ("s3a://lake-1/x.mkv", "s3a", "lake-1", "x.mkv"),
      ("gs://bkt", "gs", "bkt", ""),
      ("/abs/local.mp4", "", "", "abs/local.mp4"),
      ("rel/local.avi", "", "", "rel/local.avi")))
  }
}
