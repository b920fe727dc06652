package graft.warc

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException,
  FilterOutputStream, IOException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Minimal WARC (ISO 28500 / WARC-1.1) record reader/writer — the
  * container format of Common Crawl and every web-archive training
  * corpus. Public format, implemented from the spec (the
  * Y4MDecoder/PngCodec discipline: real container, pure JVM, no deps).
  *
  * Wire shape per record:
  * {{{
  *   WARC/1.1\r\n
  *   <Name>: <value>\r\n ...          (headers, ASCII)
  *   Content-Length: N\r\n
  *   \r\n
  *   <N payload bytes>
  *   \r\n\r\n                          (record boundary)
  * }}}
  *
  * `.warc.gz` files hold ONE GZIP MEMBER PER RECORD (the Common Crawl
  * convention — it is what makes a petabyte archive splittable at
  * member boundaries); java.util.zip.GZIPInputStream reads concatenated
  * members natively, so one stream walks the whole file.
  */
object WarcIO {

  /** One parsed record. `payload` is null when read with
    * `materializePayload = false` (pruned scan); `payloadLength` is
    * always the declared Content-Length.
    */
  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      contentType: String,
      payloadLength: Long,
      payload: Array[Byte])

  private final val CRLF = "\r\n".getBytes(UTF_8)

  // ---------------------------------------------------------------- write

  /** Deterministic `urn:uuid` record id (ISO 28500 makes
    * WARC-Record-ID mandatory on every record): a name-based (type-3)
    * UUID over the record's identity fields PLUS an md5 of the payload
    * bytes. Deterministic by design — the writer's byte output stays a
    * pure function of the record, the property the fixed-bytes oracles
    * and the dedup digests rely on — and the payload digest keeps it
    * globally unique as the spec demands: two captures of the same URI
    * at the same instant whose content changed without changing LENGTH
    * (the re-crawl case a length-only id collides on) digest apart.
    */
  def recordId(r: WarcRecord, discriminator: String = ""): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val pd = java.util.Base64.getEncoder.encodeToString(md.digest(r.payload))
    "urn:uuid:" + java.util.UUID.nameUUIDFromBytes(
      (r.warcType + "\n" + r.targetUri + "\n" + r.date + "\n" +
        pd + "\n" + discriminator).getBytes(UTF_8))
  }

  /** Serialize one record to `out` (headers + payload + boundary).
    * `discriminator` (a stable corpus position: shard name + ordinal,
    * threaded by [[writeFile]]) keeps ids unique even for BYTE-IDENTICAL
    * records — a corpus's per-shard warcinfo leads, or the same page
    * captured twice at one timestamp, are distinct records under ISO
    * 28500 and must not share one "unique" id (r15 review fix). Still
    * a pure function of (record, position), so shard bytes stay
    * deterministic across task retries.
    */
  def writeRecord(out: OutputStream, r: WarcRecord,
      discriminator: String = ""): Unit = {
    val sb = new StringBuilder
    sb.append("WARC/1.1\r\n")
    sb.append("WARC-Type: ").append(r.warcType).append("\r\n")
    sb.append("WARC-Record-ID: <").append(recordId(r, discriminator))
      .append(">\r\n")
    if (r.targetUri != null && r.targetUri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(r.targetUri).append("\r\n")
    sb.append("WARC-Date: ").append(r.date).append("\r\n")
    sb.append("Content-Type: ").append(r.contentType).append("\r\n")
    sb.append("Content-Length: ").append(r.payload.length).append("\r\n")
    sb.append("\r\n")
    out.write(sb.toString.getBytes(UTF_8))
    out.write(r.payload)
    out.write(CRLF); out.write(CRLF)
  }

  /** Write records to `path`; `.gz` suffix selects one-gzip-member-per-
    * record framing (the splittable Common Crawl layout). `idSeed`
    * names the record ids' corpus position (pass the FINAL shard name
    * when writing through an attempt-temp, so retried tasks produce
    * byte-identical shards); each record also folds its ordinal, so
    * byte-identical records in one file id apart.
    */
  def writeFile(path: String, records: Iterator[WarcRecord],
      idSeed: String = ""): Unit = {
    val raw = new BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      if (path.endsWith(".gz")) {
        // one finished GZIP member per record over a close-shielded view
        val shield = new FilterOutputStream(raw) {
          override def close(): Unit = flush() // member close must not
        }                                      // close the file stream
        records.zipWithIndex.foreach { case (r, i) =>
          val gz = new GZIPOutputStream(shield)
          writeRecord(gz, r, s"$idSeed#$i")
          gz.finish(); gz.close()
        }
      } else records.zipWithIndex.foreach { case (r, i) =>
        writeRecord(raw, r, s"$idSeed#$i")
      }
    } finally raw.close()
  }

  // ----------------------------------------------------------------- read

  /** Iterate the records of a WARC stream. When `materializePayload` is
    * false the payload bytes are DISCARDED without per-record
    * allocation (plain files forward-skip; gzip must still decompress
    * to resync — inherent to the format) and `onSkippedBytes` observes
    * the count, so a pruned scan's savings are counter-provable (the
    * TFRecord pruning discipline).
    */
  def readStream(in: InputStream, materializePayload: Boolean,
      onSkippedBytes: Long => Unit = _ => ()): Iterator[WarcRecord] =
    readStreamSelective(in, _ => materializePayload, onSkippedBytes)

  /** [[readStream]] with a PER-RECORD payload decision: `wantPayload`
    * sees the record's WARC-Type after the headers parse and before
    * any payload byte is touched — the hook a pruned or type-filtered
    * scan (sources.WarcSource) uses to materialize only what survives
    * its pushed filters.
    */
  def readStreamSelective(in: InputStream, wantPayload: String => Boolean,
      onSkippedBytes: Long => Unit = _ => (),
      onMaterialized: () => Unit = () => ()): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false

      private def readLine(): String = {
        // ASCII header line up to CRLF; WARC headers are never long.
        // Totality bound: a corrupted (or hostile) stream with no CR in
        // sight must fail typed after 64 KiB, not grow a builder until
        // the heap dies — crawl-scale inputs include every corruption.
        val sb = new java.lang.StringBuilder(64)
        var b = in.read()
        if (b < 0) return null // clean EOF before a record
        while (b != '\r') {
          if (b < 0) throw new EOFException("WARC: EOF inside header line")
          if (sb.length >= 65536)
            throw new IOException(
              "WARC: header line exceeds 64 KiB — corrupt stream")
          sb.append(b.toChar)
          b = in.read()
        }
        if (in.read() != '\n')
          throw new IOException("WARC: CR without LF in header")
        sb.toString
      }

      private def expectBoundary(): Unit = {
        val b = new Array[Byte](4)
        var got = 0
        while (got < 4) {
          val k = in.read(b, got, 4 - got)
          if (k < 0) throw new EOFException("WARC: EOF at record boundary")
          got += k
        }
        if (!(b(0) == '\r' && b(1) == '\n' && b(2) == '\r' && b(3) == '\n'))
          throw new IOException("WARC: bad record boundary")
      }

      private def advance(): Unit = {
        val version = readLine()
        if (version == null) { done = true; return }
        if (!version.startsWith("WARC/"))
          throw new IOException(s"WARC: bad version line '$version'")
        var warcType, uri, date, ctype = ""
        var len = -1L
        var line = readLine()
        while (line != null && line.nonEmpty) {
          val i = line.indexOf(':')
          if (i < 0) throw new IOException(s"WARC: bad header '$line'")
          val (k, v) = (line.substring(0, i).trim.toLowerCase,
            line.substring(i + 1).trim)
          k match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = v
            case "warc-date" => date = v
            case "content-type" => ctype = v
            case "content-length" => len = v.toLong
            case _ => () // record-id, digests, etc.: not surfaced
          }
          line = readLine()
        }
        if (len < 0) throw new IOException("WARC: missing Content-Length")
        val payload =
          if (wantPayload(warcType)) {
            val p = in.readNBytes(
              if (len > Int.MaxValue) throw new IOException(
                s"WARC: payload too large for one record: $len")
              else len.toInt)
            if (p.length.toLong != len)
              throw new EOFException("WARC: truncated payload")
            onMaterialized()
            p
          } else {
            var remaining = len
            while (remaining > 0) {
              val k = in.skip(remaining)
              if (k > 0) remaining -= k
              else if (in.read() >= 0) remaining -= 1 // skip() can stall
              else throw new EOFException("WARC: truncated payload (skip)")
            }
            onSkippedBytes(len)
            null
          }
        expectBoundary()
        nextRec = WarcRecord(warcType, uri, date, ctype, len, payload)
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }

      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** Open `path` as a record-granular byte stream (gzip-sniffed by
    * suffix; multi-member `.warc.gz` inflates transparently). Caller
    * closes.
    */
  def openFile(path: String): InputStream = {
    val raw = new BufferedInputStream(
      java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path)))
    // re-buffer above the inflater: header parsing reads byte-at-a-time
    if (path.endsWith(".gz"))
      new BufferedInputStream(new GZIPInputStream(raw)) else raw
  }

  /** Open `path` and iterate its records. Caller closes the stream. */
  def readFile(path: String, materializePayload: Boolean,
      onSkippedBytes: Long => Unit = _ => ())
      : (InputStream, Iterator[WarcRecord]) = {
    val in = openFile(path)
    (in, readStream(in, materializePayload, onSkippedBytes))
  }
}
