package graft.streaming

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ingest dedup against a STATIC LSH index — the online form
  * of `dd_incremental_lsh`: documents arriving on a stream are admitted
  * only if no MinHash band collides with the already-indexed corpus.
  *
  * Everything is STATELESS on the stream side, which is the point:
  * signatures are computed per row (narrow — [[signatureCols]] takes the
  * per-band minima over the row's own shingle array, no aggregation, so
  * no watermark and no state store), and the novelty decision is a chain
  * of stream-static LEFT ANTI equi-joins, one per band, against the
  * persisted index layout (`TextOps.bandedRows` output — in production a
  * table bucketed by (band, bh), broadcast or storage-joined per batch).
  * State is zero regardless of stream length; the index updates by
  * appending admitted docs' banded rows in `foreachBatch` (same
  * persist-then-commit idempotence argument as StreamingBloom).
  *
  * Per-row minima are IDENTICAL to the batch aggregate form
  * (`TextOps.minhashSignatures`): same salted md5, same 20-bit slices,
  * min over the same shingle set — StreamingIndexDedupSpec asserts the
  * streamed admission set ≡ the batch anti-join bit-for-bit. Docs too
  * short to shingle have no signature and are admitted (nothing to
  * collide on), mirroring their absence from the batch signature table.
  */
object StreamingIndexDedup {

  /** Per-salt digest arrays (⌈k/6⌉ columns) of a shingle-array column —
    * bound as columns BEFORE the minima so each shingle pays ⌈k/6⌉ md5
    * evaluations, not k (the same bind-the-digest discipline
    * TextOps.minhash documents for the aggregate form; inlining the md5
    * into every component's lambda would re-hash 6× per shingle on the
    * per-row ingest hot path).
    */
  def digestCols(shingleCol: Column, k: Int): Seq[Column] = {
    val salts = (k + 5) / 6
    (0 until salts).map(s =>
      transform(shingleCol, sh =>
        md5(concat(lit(s"$s|"), sh).cast("binary"))).as(s"__dig$s"))
  }

  /** Narrow per-row MinHash components __mh0..__mh{k-1} from the BOUND
    * digest columns of [[digestCols]] — the streaming-safe (and
    * shuffle-free) twin of the aggregate form; values identical by
    * construction. Helper names are __-prefixed so a caller's own
    * columns can never collide.
    */
  def signatureCols(k: Int): Seq[Column] =
    (0 until k).map { i =>
      val start = (i % 6) * 5 + 1
      array_min(transform(col(s"__dig${i / 6}"), d =>
        conv(substring(d, start, 5), 16, 10).cast("long"))).as(s"__mh$i")
    }

  /** Admit only novel docs: `stream` must carry a `text` column; `index`
    * is the (doc_id, band, bh) banded layout of the indexed corpus. A
    * doc survives iff NONE of its bands' bucket hashes appear in the
    * index — `bands` chained stateless anti-joins.
    */
  def novel(stream: DataFrame, index: DataFrame, n: Int, k: Int,
      rowsPerBand: Int): DataFrame = {
    val bands = k / rowsPerBand
    val salts = (k + 5) / 6
    val withSh = stream
      .withColumn("__toks", TextOps.tokens(col("text")))
      .withColumn("__sh", TextOps.shingles(col("__toks"), n))
    val withDig = withSh.select(
      withSh.columns.map(col) ++ digestCols(col("__sh"), k): _*)
    val sigged = withDig.select(
      withDig.columns.map(col) ++ signatureCols(k): _*)
    val withBh = (0 until bands).foldLeft(sigged) { (df, b) =>
      df.withColumn(s"__bh$b", TextOps.bandHash(b, rowsPerBand, "__mh"))
    }
    // shingle-less docs have null minima — nothing to collide on; admit
    val (empty, candidates) = (withBh.filter(col("__mh0").isNull),
      withBh.filter(col("__mh0").isNotNull))
    val survived = (0 until bands).foldLeft(candidates) { (df, b) =>
      df.join(
        index.filter(col("band") === b).select(col("bh").as(s"__idx$b")),
        col(s"__bh$b") === col(s"__idx$b"), "left_anti")
    }
    val helpers = Seq("__toks", "__sh") ++
      (0 until salts).map(s => s"__dig$s") ++
      (0 until k).map(i => s"__mh$i") ++
      (0 until bands).map(b => s"__bh$b")
    survived.unionByName(empty).drop(helpers: _*)
  }
}
