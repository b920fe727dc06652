package graft.warc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException,
  IOException}
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import WarcIO.WarcRecord

/** The WARC container itself, independent of Spark: write→read byte
  * fidelity (plain and one-gzip-member-per-record), multi-member
  * concatenation, the selective (pruned) read's skip accounting, and
  * loud failures on truncation/corruption — a container that silently
  * resyncs is how a crawl corpus loses records without anyone noticing.
  */
class WarcIOSpec extends AnyFunSuite {

  private def rec(i: Int, body: String = null): WarcRecord = {
    val p = (if (body != null) body
      else s"<html><body>doc $i: ${"x" * (i * 7 % 90)}</body></html>")
      .getBytes(UTF_8)
    WarcRecord("resource", s"http://t.local/doc/$i",
      "2026-01-01T00:00:00Z", "text/html", p.length.toLong, p)
  }

  private def roundtrip(path: String, n: Int): Unit = {
    val in0 = (0 until n).map(rec(_))
    WarcIO.writeFile(path, in0.iterator)
    val (in, it) = WarcIO.readFile(path, materializePayload = true)
    val got = it.toVector
    in.close()
    assert(got.size === n)
    got.zip(in0).foreach { case (g, w) =>
      assert(g.warcType === w.warcType)
      assert(g.targetUri === w.targetUri)
      assert(g.date === w.date)
      assert(g.contentType === w.contentType)
      assert(g.payloadLength === w.payloadLength)
      assert(g.payload.toSeq === w.payload.toSeq)
    }
  }

  test("plain .warc roundtrips byte-exactly") {
    val d = java.nio.file.Files.createTempDirectory("warcio").toString
    roundtrip(s"$d/a.warc", 25)
  }

  test(".warc.gz roundtrips byte-exactly (one member per record)") {
    val d = java.nio.file.Files.createTempDirectory("warcio").toString
    val p = s"$d/a.warc.gz"
    roundtrip(p, 25)
    // the file really is MULTI-MEMBER gzip: >1 magic at member starts
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    var members = 0
    for (i <- 0 until bytes.length - 1)
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b)
        members += 1
    assert(members >= 25, s"expected >=25 gzip members, found $members")
  }

  test("every written record carries a mandatory, deterministic " +
      "WARC-Record-ID (ISO 28500; round-14 ADVICE fix)") {
    def bytesOf(r: WarcRecord): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      WarcIO.writeRecord(bos, r)
      bos.toByteArray
    }
    val header = new String(bytesOf(rec(1)), UTF_8)
      .split("\r\n\r\n", 2)(0)
    val idLine = header.split("\r\n").find(_.startsWith("WARC-Record-ID: "))
    assert(idLine.isDefined, s"no WARC-Record-ID in: $header")
    // spec shape: angle-bracketed urn:uuid
    assert(idLine.get.matches(
      "WARC-Record-ID: <urn:uuid:[0-9a-f-]{36}>"))
    // deterministic: same record → byte-identical output (the fixed-
    // bytes oracle property); distinct URIs → distinct ids
    assert(bytesOf(rec(1)).toSeq === bytesOf(rec(1)).toSeq)
    assert(WarcIO.recordId(rec(1)) !== WarcIO.recordId(rec(2)))
    // global uniqueness folds the payload DIGEST, not just its length
    // (r15 ADVICE fix): a re-crawl of the same URI/date whose content
    // changed but whose byte COUNT did not must still id apart
    val a = rec(1, "same-length-A")
    val b = a.copy(payload = "same-length-B".getBytes(UTF_8))
    assert(a.payload.length === b.payload.length)
    assert(WarcIO.recordId(a) !== WarcIO.recordId(b))
    // BYTE-IDENTICAL records are still distinct records (ISO 28500):
    // the per-shard warcinfo lead is the live case — writeFile folds
    // (idSeed, ordinal), so duplicates id apart within a file and the
    // same lead record ids apart across shards; same (seed, ordinal)
    // stays deterministic (the retry byte-identity contract)
    def idsOf(path: String, seed: String): Seq[String] = {
      WarcIO.writeFile(path, Iterator(rec(9), rec(9)), idSeed = seed)
      val raw = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), UTF_8)
      "<urn:uuid:[0-9a-f-]{36}>".r.findAllIn(raw).toSeq
    }
    val d = java.nio.file.Files.createTempDirectory("warcid").toString
    val s0 = idsOf(s"$d/p0.warc", "part-0")
    assert(s0.distinct.size === 2, s"duplicate ids in one shard: $s0")
    assert(idsOf(s"$d/p0b.warc", "part-0") === s0) // deterministic
    assert(idsOf(s"$d/p1.warc", "part-1").intersect(s0).isEmpty)
  }

  test("empty payloads and an empty file are legal") {
    val d = java.nio.file.Files.createTempDirectory("warcio").toString
    WarcIO.writeFile(s"$d/e.warc", Iterator(rec(1, ""), rec(2, "x")))
    val (in, it) = WarcIO.readFile(s"$d/e.warc", materializePayload = true)
    val got = it.toVector; in.close()
    assert(got.map(_.payloadLength) === Vector(0L, 1L))
    WarcIO.writeFile(s"$d/z.warc", Iterator.empty)
    val (in2, it2) = WarcIO.readFile(s"$d/z.warc", materializePayload = true)
    assert(it2.isEmpty); in2.close()
  }

  test("selective read: unwanted payloads skip with exact byte accounting") {
    val out = new ByteArrayOutputStream()
    val recs = Seq(
      rec(1).copy(warcType = "warcinfo"),
      rec(2), rec(3).copy(warcType = "warcinfo"), rec(4))
    recs.foreach(WarcIO.writeRecord(out, _))
    var skipped = 0L
    var materialized = 0
    val got = WarcIO.readStreamSelective(
      new ByteArrayInputStream(out.toByteArray),
      wantPayload = _ == "resource",
      onSkippedBytes = skipped += _,
      onMaterialized = () => materialized += 1).toVector
    assert(got.size === 4)
    // every record's METADATA arrives either way
    assert(got.map(_.warcType) ===
      Vector("warcinfo", "resource", "warcinfo", "resource"))
    assert(got.filter(_.warcType == "resource").forall(_.payload != null))
    assert(got.filter(_.warcType == "warcinfo").forall(_.payload == null))
    assert(skipped ===
      recs.filter(_.warcType == "warcinfo").map(_.payloadLength).sum)
    assert(materialized === 2)
  }

  test("truncated payload and bad boundary fail loudly") {
    val out = new ByteArrayOutputStream()
    WarcIO.writeRecord(out, rec(7))
    val full = out.toByteArray
    // cut inside the payload
    val cut = java.util.Arrays.copyOf(full, full.length - 10)
    intercept[EOFException] {
      WarcIO.readStream(new ByteArrayInputStream(cut),
        materializePayload = true).toVector
    }
    // corrupt the record boundary (last 4 bytes are \r\n\r\n)
    val bad = full.clone(); bad(full.length - 1) = 'X'
    intercept[IOException] {
      WarcIO.readStream(new ByteArrayInputStream(bad),
        materializePayload = true).toVector
    }
    // corrupt the version line
    val badv = full.clone(); badv(0) = 'X'
    intercept[IOException] {
      WarcIO.readStream(new ByteArrayInputStream(badv),
        materializePayload = true).toVector
    }
  }

  test("missing Content-Length fails loudly") {
    val raw = ("WARC/1.1\r\nWARC-Type: resource\r\n\r\n").getBytes(UTF_8)
    intercept[IOException] {
      WarcIO.readStream(new ByteArrayInputStream(raw),
        materializePayload = true).toVector
    }
  }
}
