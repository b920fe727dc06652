package graft.queries

import graft.{Q, Tables}
import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal metadata surface under the correctness gate. Binary decode /
  * resize / feature extraction aren't SQL (covered by MultimodalSpec with
  * the stub decoder); what IS oracle-checkable is the metadata-only layer:
  * relational accounting over binary payload columns without decoding.
  * Assets are synthesized from `documents` (text bytes as payload, kind by
  * doc_id mod 3) so DuckDB sees identical bytes.
  */
object MultimodalQ {

  val qs: Seq[Q] = Seq(
    Q("mm_asset_stats",
      (s, dir) => Multimodal.assetStats(
        Tables.sharded(s, dir, "documents").select(
          col("doc_id").as("asset_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          col("text").cast("binary").as("content"))),
      // this DuckDB's md5() takes VARCHAR only; the payload here IS utf-8
      // text bytes, so md5(text) hashes the identical byte sequence
      Some("""
        SELECT kind, count(*) AS n_assets,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               min(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
                 AS min_content_hash
        FROM (
          SELECT doc_id AS asset_id,
                 list_extract(['image', 'audio', 'video'],
                              CAST(doc_id % 3 + 1 AS INT)) AS kind,
                 text
          FROM documents)
        GROUP BY kind""")),

    // ---- exact binary-asset dedup (content-hash groups) --------------------
    // The image/video dedup primitive: group assets by the md5 of their
    // payload BYTES, keep groups with >1 member — without decoding a
    // single pixel. Payloads here are the leading 80 text bytes (so the
    // fixture's near-dup documents, which share prefixes, yield real
    // duplicate groups — the "same thumbnail bytes" case). One
    // map-side-combinable aggregation; the shuffle carries (hash,
    // partial count, partial min), never content. At 100 TB this is the
    // first pass of any media pipeline: the payload column is read once,
    // hashed in place, and pruned before the exchange.
    Q("mm_asset_dedup",
      (s, dir) => Multimodal.dedupByContent(
        Tables.sharded(s, dir, "documents").select(
          col("doc_id").as("asset_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          substring(col("text"), 1, 80).cast("binary").as("content"))),
      Some("""
        SELECT kind, content_hash, count(*) AS n_assets,
               min(asset_id) AS canonical_id
        FROM (
          SELECT doc_id AS asset_id,
                 list_extract(['image', 'audio', 'video'],
                              CAST(doc_id % 3 + 1 AS INT)) AS kind,
                 md5(substr(text, 1, 80)) AS content_hash
          FROM documents)
        GROUP BY kind, content_hash
        HAVING count(*) >= 2"""))
  )
}
