package graft.streaming

import graft.{SparkSpec, Tables}
import graft.text.TextOps
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming ingest dedup against the static LSH index ≡ the batch
  * anti-join, and the per-row narrow signatures ≡ the batch aggregate
  * signatures bit-for-bit.
  */
class StreamingIndexDedupSpec extends SparkSpec {
  import spark.implicits._

  private val (n, k, rpb) = (3, 12, 3)
  private val sfDir = "/root/testdata/sf0.001"

  test("narrow per-row signatures equal the batch aggregate form") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val shingled = docs
      .withColumn("__sh", TextOps.shingles(TextOps.tokens(col("text")), n))
    val bound = shingled.select(col("doc_id") +: col("__sh") +:
      StreamingIndexDedup.digestCols(col("__sh"), k): _*)
    val narrow = bound
      .select(col("doc_id") +: StreamingIndexDedup.signatureCols(k): _*)
      .filter(col("__mh0").isNotNull)
      .toDF("doc_id" +: (0 until k).map(i => s"mh$i"): _*)
    val agg = TextOps.minhashSignatures(docs, n, k)
    assert(narrow.count() === agg.count())
    assert(narrow.except(agg).count() === 0)
    assert(agg.except(narrow).count() === 0)
  }

  test("streamed admission set equals the batch anti-join") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val index = TextOps.bandedRows(
      TextOps.minhashSignatures(docs.filter(col("doc_id") % 10 < 8), n, k),
      k, rpb).localCheckpoint()
    // the arriving batch: the other 20%, PLUS a planted clone of an
    // indexed doc (id offset to stay unique) that must be rejected
    val clone = docs.filter(col("doc_id") === 4) // %10<8 → indexed
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val arriving = docs.filter(col("doc_id") % 10 >= 8).unionByName(clone)

    val dir = Files.createTempDirectory("sid_in").toString
    val ckpt = Files.createTempDirectory("sid_ckpt").toString
    arriving.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    arriving.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val streamed = StreamingIndexDedup.novel(
      spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      index, n, k, rpb)
    val q = streamed.writeStream.format("memory").queryName("sid_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sid_stream").select(col("doc_id"))
      .as[Long].collect().toSet
    val want = StreamingIndexDedup.novel(arriving, index, n, k, rpb)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === want)
    // the planted clone shares every band with its indexed source
    assert(!got.contains(1000004L), "planted clone was admitted")
    // admitted ∪ rejected = arriving, and rejected docs collide somewhere
    assert(got.subsetOf(
      arriving.select(col("doc_id")).as[Long].collect().toSet))
  }
}
