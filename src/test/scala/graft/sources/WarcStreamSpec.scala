package graft.sources

import graft.SparkSpec
import graft.warc.WarcIO
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The `warc` table's MICRO_BATCH_READ path: shards landing in a dir
  * stream through record-for-record identically to a batch scan of the
  * final dir — including shards that land AFTER the stream started
  * (the incremental crawl-ingestion contract), with the file-count
  * offset advancing monotonically over the name-sorted listing.
  */
class WarcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeShard(dir: String, f: Int, recs: Int): Unit =
    WarcIO.writeFile(f"$dir/part-$f%05d.warc.gz",
      (0 until recs).iterator.map { i =>
        val p = s"shard $f rec $i".getBytes
        WarcIO.WarcRecord("resource", s"http://t.local/f$f/r$i",
          "2026-01-01T00:00:00Z", "text/plain", p.length.toLong, p)
      })

  test("stream ≡ batch, including shards landing mid-stream") {
    val dir = Files.createTempDirectory("warc_stream").toString
    val ckpt = Files.createTempDirectory("warc_ckpt").toString
    writeShard(dir, 0, 5)
    writeShard(dir, 1, 7)

    val q = spark.readStream.format("warc").load(dir)
      .select("filename", "target_uri", "content_length", "payload")
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val afterTwo = spark.table("warc_stream").count()
      assert(afterTwo === 12L)
      // two more shards LAND while the stream is live
      writeShard(dir, 2, 3)
      writeShard(dir, 3, 4)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("target_uri"), col("content_length"),
        md5(col("payload")).as("m"))
      .as[(String, Long, String)].collect().toSet

    val got = rows(spark.table("warc_stream"))
    val want = rows(spark.read.format("warc").load(dir))
    assert(want.size === 19)
    assert(got === want) // nothing withheld, nothing duplicated
  }

  test("checkpoint restart: offsets survive a stop, no replay, no gap") {
    val dir = Files.createTempDirectory("warc_restart").toString
    val ckpt = Files.createTempDirectory("warc_restart_ckpt").toString
    writeShard(dir, 0, 6)
    writeShard(dir, 1, 4)

    val sink = Files.createTempDirectory("warc_restart_out").toString
    // the file sink (not memory — which refuses recovery) is the
    // fault-tolerant pairing: its commit log + our serialized offsets
    // give exactly-once across process restarts
    def start() = spark.readStream.format("warc").load(dir)
      .select("target_uri", "content_length")
      .writeStream.format("parquet")
      .option("path", sink)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    // first incarnation consumes two shards, then STOPS
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(sink).count() === 10L)

    // a shard lands while no query is running
    writeShard(dir, 2, 9)

    // second incarnation resumes from the SERIALIZED offset: it must
    // pick up exactly the new shard — replay would duplicate rows,
    // a deserialization bug would gap or re-read from zero
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(sink)
      .select("target_uri").as[String].collect()
    assert(rows.length === 19, s"expected 19 rows, got ${rows.length}")
    assert(rows.toSet.size === 19, "a replayed record would duplicate")
  }

  test("e2e restart with an out-of-order landing FAILS the query instead " +
      "of silently remapping the committed range") {
    val dir = Files.createTempDirectory("warc_ooo").toString
    val ckpt = Files.createTempDirectory("warc_ooo_ckpt").toString
    val sink = Files.createTempDirectory("warc_ooo_out").toString
    writeShard(dir, 0, 3)
    writeShard(dir, 2, 4) // names part-00000, part-00002

    def start() = spark.readStream.format("warc").load(dir)
      .select("target_uri", "content_length")
      .writeStream.format("parquet")
      .option("path", sink)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(sink).count() === 7L)

    // a shard lands BETWEEN the two processed names — under the old
    // count-only offset the restart would silently re-map "2 files
    // processed" onto {00000, 00001} and re-emit 00002 while never
    // emitting 00001's place in the committed range correctly
    writeShard(dir, 1, 5)

    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(10000)
    }
    try q2.stop() catch { case _: Throwable => () }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(e).exists(m => m != null && m.contains("name order")),
      s"wrong failure: ${causes(e)}")
    // and nothing was duplicated or invented before the loud stop
    assert(spark.read.parquet(sink).count() === 7L)
  }

  // ---- anchored offsets (round-14 ADVICE fix) ------------------------------

  test("offset json round-trips the filename anchor; legacy bare-int parses") {
    val o = WarcOffset(3, """/data/part-00002 "odd" \name.warc.gz""")
    assert(WarcOffset.parse(o.json()) === o)
    assert(WarcOffset.parse("7") === WarcOffset(7, "")) // legacy checkpoint
    assert(WarcOffset.parse(WarcOffset(0).json()) === WarcOffset(0, ""))
  }

  test("a committed range that no longer maps to the same files fails " +
      "loudly instead of silently remapping") {
    def stream(listing: Array[String]) =
      new WarcMicroBatchStream(() => listing,
        Array("target_uri"), _ => true)

    val processed = Array("/d/part-00000.gz", "/d/part-00001.gz")
    val committed = WarcOffset.of(processed)

    // happy path: same listing plus a NEW file sorting after → plans
    val grown = processed :+ "/d/part-00002.gz"
    assert(stream(grown).planInputPartitions(
      committed, WarcOffset.of(grown)).nonEmpty)

    // a file LANDS BEFORE the committed position (violates the
    // monotonic-name convention): the anchor catches the remap
    val outOfOrder = Array("/d/part-00000.gz", "/d/part-00000a.gz",
      "/d/part-00001.gz")
    val e1 = intercept[IllegalStateException] {
      stream(outOfOrder).planInputPartitions(
        committed, WarcOffset.of(outOfOrder))
    }
    assert(e1.getMessage.contains("name order"))

    // a processed file DELETED: count shrinks below the committed offset
    val shrunk = Array("/d/part-00000.gz")
    val e2 = intercept[IllegalStateException] {
      stream(shrunk).planInputPartitions(
        committed, WarcOffset.of(shrunk))
    }
    assert(e2.getMessage.contains("deleted"))
  }
}
