package graft.streaming

import graft.SparkSpec
import graft.warc.WarcIO
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The streamed frontier card over the warc MICRO_BATCH source ≡ the
  * batch reduction over the same shards — including shards landing
  * mid-stream — with ≤|hosts| rows of state (complete-mode aggregate
  * over the bounded host key).
  */
class StreamingFrontierSpec extends SparkSpec {
  import spark.implicits._

  private def writeShard(dir: String, f: Int, recs: Int): Unit =
    WarcIO.writeFile(f"$dir/part-$f%05d.warc.gz",
      (0 until recs).iterator.map { i =>
        val p = s"payload $f/$i ${"z" * (i % 25)}".getBytes
        WarcIO.WarcRecord("resource",
          s"http://h${(f * recs + i) % 5}.site.local/p/$f/$i",
          "2026-01-01T00:00:00Z", "text/plain", p.length.toLong, p)
      })

  test("streamed frontier ≡ batch over the same shards, state ≤ |hosts|") {
    val dir = Files.createTempDirectory("frontier_in").toString
    val ckpt = Files.createTempDirectory("frontier_ckpt").toString
    writeShard(dir, 0, 40)
    writeShard(dir, 1, 40)

    val q = StreamingFrontier.perHost(
      spark.readStream.format("warc").load(dir))
      .writeStream.format("memory").queryName("frontier_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      writeShard(dir, 2, 33) // lands mid-stream
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("host", "n_urls", "total_bytes", "fetch_rounds")
      .as[(String, Long, Long, Long)].collect().toSet

    val got = rows(spark.table("frontier_stream"))
    val want = rows(StreamingFrontier.perHost(
      spark.read.format("warc").load(dir)))
    assert(want.nonEmpty && want.toSeq.map(_._2).sum === 113L)
    assert(got === want)
    assert(got.size <= 5) // bounded state: one row per host
  }
}
