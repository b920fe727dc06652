package graft.streaming

import org.apache.spark.sql.DataFrame

/** RAG chunking over an unbounded document stream — the streaming form
  * of `txt_chunks`. The chunk lineage (queries.Retrieval.chunkRows) is a
  * NARROW projection — tokenize → integer chunk count → sequence explode
  * → slice — so it runs under Structured Streaming completely unchanged:
  * no state, no watermark, no shuffle; each micro-batch maps documents
  * to chunk rows independently (append-mode safe, trivially replayable).
  * This is the ingest-side shape of a streaming RAG pipeline: chunks
  * flow straight into the embed/index stages as they arrive.
  *
  * StreamingChunksSpec proves stream ≡ batch row-for-row on the fixture
  * split across micro-batches.
  */
object StreamingChunks {
  /** `docs` must be a streaming DataFrame with (doc_id, text). */
  def chunks(docs: DataFrame): DataFrame =
    graft.queries.Retrieval.chunkRows(docs)
}
