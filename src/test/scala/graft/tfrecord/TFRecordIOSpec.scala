package graft.tfrecord

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.scalatest.funsuite.AnyFunSuite

class TFRecordIOSpec extends AnyFunSuite {

  test("CRC32C check value: crc of '123456789' is the Castagnoli constant") {
    // the canonical CRC-32C check vector (public: RFC 3720 / Castagnoli)
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes("UTF-8"))
    assert(c.getValue === 0xe3069283L)
  }

  test("masked crc matches the TFRecord spec formula") {
    val data = "123456789".getBytes("UTF-8")
    val crc = 0xe3069283L
    val expected = (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xffffffffL
    assert(TFRecordIO.maskedCrc(data) === expected)
  }

  test("round-trip: many records of varying sizes, byte-for-byte") {
    val records = Seq(
      Array.empty[Byte],
      Array[Byte](1),
      Array.tabulate(255)(_.toByte),
      Array.tabulate(100000)(i => (i * 31).toByte))
    val out = new ByteArrayOutputStream()
    records.foreach(TFRecordIO.writeRecord(out, _))
    val back = TFRecordIO.readRecords(
      new ByteArrayInputStream(out.toByteArray)).toSeq
    assert(back.size === records.size)
    records.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("framing layout: 12-byte header + data + 4-byte footer") {
    val out = new ByteArrayOutputStream()
    TFRecordIO.writeRecord(out, Array[Byte](7, 8, 9))
    val bytes = out.toByteArray
    assert(bytes.length === 12 + 3 + 4)
    // length is little-endian uint64
    assert(bytes(0) === 3.toByte)
    assert(bytes.slice(1, 8).forall(_ == 0))
  }

  test("property: arbitrary record sequences round-trip byte-for-byte") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val recordsGen = Gen.listOf(Gen.listOf(
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val prop = Prop.forAll(recordsGen) { records =>
      val out = new ByteArrayOutputStream()
      records.foreach(TFRecordIO.writeRecord(out, _))
      val back = TFRecordIO.readRecords(
        new ByteArrayInputStream(out.toByteArray)).toList
      back.size == records.size &&
        records.zip(back).forall { case (a, b) => a.sameElements(b) }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("corruption in data is detected via CRC") {
    val out = new ByteArrayOutputStream()
    TFRecordIO.writeRecord(out, Array.tabulate(64)(_.toByte))
    val bytes = out.toByteArray
    bytes(20) = (bytes(20) ^ 0x40).toByte // flip a data bit
    val e = intercept[java.io.IOException] {
      TFRecordIO.readRecords(new ByteArrayInputStream(bytes)).toSeq
    }
    assert(e.getMessage.contains("CRC"))
  }

  test("truncated stream is detected") {
    val out = new ByteArrayOutputStream()
    TFRecordIO.writeRecord(out, Array.tabulate(64)(_.toByte))
    val bytes = out.toByteArray.dropRight(10)
    intercept[java.io.EOFException] {
      TFRecordIO.readRecords(new ByteArrayInputStream(bytes)).toSeq
    }
  }
}
