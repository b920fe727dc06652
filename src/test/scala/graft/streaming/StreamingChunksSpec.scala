package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Chunking a document stream ≡ chunking the batch corpus, row for row —
  * the stateless-streaming contract of the narrow chunk lineage.
  */
class StreamingChunksSpec extends SparkSpec {
  import spark.implicits._

  test("streamed chunk rows are identical to batch txt_chunks") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    val dir = Files.createTempDirectory("chunks_in").toString
    val ckpt = Files.createTempDirectory("chunks_ckpt").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val streamed = StreamingChunks.chunks(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"))
    val q = streamed.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("chunk_len"), col("chunk_text"))
      .as[(Long, Long, Long, Long, String)].collect().toSet

    val got = rows(spark.table("chunk_stream"))
    val want = rows(graft.SparkEntry.queries("txt_chunks")(spark, sfDir))
    assert(want.nonEmpty)
    assert(got === want) // stateless map: nothing withheld, nothing extra
  }
}
