package graft.tfrecord

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class ExampleCodecSpec extends AnyFunSuite {

  test("golden bytes: Example with one int64 feature matches hand-derived proto") {
    // Example { features { feature { key:"a" value { int64_list { value:[1] }}}}}
    // derived by hand from the public tensorflow/core/example proto schema
    val schema = StructType(Seq(StructField("a", LongType)))
    val codec = new ExampleCodec(schema, sequenceMode = false)
    val bytes = codec.encode(new GenericInternalRow(Array[Any](1L)))
    val expected = Array(0x0a, 0x0c, 0x0a, 0x0a, 0x0a, 0x01, 0x61, 0x12,
      0x05, 0x1a, 0x03, 0x0a, 0x01, 0x01).map(_.toByte)
    assert(bytes.sameElements(expected))
  }

  test("SequenceExample round-trip: context scalars + feature lists") {
    val schema = StructType(Seq(
      StructField("filename", StringType),
      StructField("label", StringType),
      StructField("frame_per_sec", DoubleType),
      StructField("frame_total", DoubleType),
      StructField("timestamp_ms", ArrayType(LongType)),
      StructField("logits", ArrayType(ArrayType(FloatType)))))
    val codec = new ExampleCodec(schema, sequenceMode = true)
    val row = new GenericInternalRow(Array[Any](
      UTF8String.fromString("videos/en/src0/doc_1.mp4"),
      UTF8String.fromString("en"),
      2.0, 3.0,
      new GenericArrayData(Array(0L, 500L, 1000L)),
      new GenericArrayData(Array(
        new GenericArrayData(Array(1.0f, 2.0f)),
        new GenericArrayData(Array(3.0f, 4.0f)),
        new GenericArrayData(Array(5.0f, 6.0f))))))
    val decoded = codec.decode(codec.encode(row))
    assert(decoded.getUTF8String(0).toString === "videos/en/src0/doc_1.mp4")
    assert(decoded.getUTF8String(1).toString === "en")
    assert(decoded.getDouble(2) === 2.0)
    assert(decoded.getDouble(3) === 3.0)
    assert(decoded.getArray(4).toLongArray.toSeq === Seq(0L, 500L, 1000L))
    val logits = decoded.getArray(5)
    assert(logits.numElements() === 3)
    assert(logits.getArray(1).toFloatArray.toSeq === Seq(3.0f, 4.0f))
  }

  test("promotion rules: every scalar kind round-trips as a 1-element list") {
    val schema = StructType(Seq(
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("s", ShortType), StructField("y", ByteType),
      StructField("b", BooleanType), StructField("str", StringType),
      StructField("bin", BinaryType)))
    val codec = new ExampleCodec(schema, sequenceMode = false)
    val row = new GenericInternalRow(Array[Any](
      1.5f, 2.5, 3L, 4, 5.toShort, 6.toByte, true,
      UTF8String.fromString("héllo"), Array[Byte](9, 8)))
    val d = codec.decode(codec.encode(row))
    assert(d.getFloat(0) === 1.5f)
    assert(d.getDouble(1) === 2.5)
    assert(d.getLong(2) === 3L)
    assert(d.getInt(3) === 4)
    assert(d.getShort(4) === 5.toShort)
    assert(d.getByte(5) === 6.toByte)
    assert(d.getBoolean(6) === true)
    assert(d.getUTF8String(7).toString === "héllo") // str → UTF-8 bytes
    assert(d.getBinary(8).toSeq === Seq[Byte](9, 8))
  }

  test("unsupported types are dropped with a warning, not a failure") {
    // features.py:55-56: unsupported kind → warn + drop, row survives
    val schema = StructType(Seq(
      StructField("ok", LongType),
      StructField("bad", MapType(StringType, LongType))))
    val codec = new ExampleCodec(schema, sequenceMode = false)
    val row = new GenericInternalRow(Array[Any](7L,
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        Array(UTF8String.fromString("k")), Array(1L))))
    val d = codec.decode(codec.encode(row))
    assert(d.getLong(0) === 7L)
    assert(d.isNullAt(1)) // dropped at encode → absent at decode
  }

  test("null columns are skipped and decode as null") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val codec = new ExampleCodec(schema, sequenceMode = false)
    val d = codec.decode(codec.encode(
      new GenericInternalRow(Array[Any](1L, null))))
    assert(d.getLong(0) === 1L)
    assert(d.isNullAt(1))
  }

  test("property: random values round-trip through SequenceExample bytes") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("n", LongType),
      StructField("ts", ArrayType(LongType)),
      StructField("vecs", ArrayType(ArrayType(FloatType)))))
    val codec = new ExampleCodec(schema, sequenceMode = true)
    val gen = for {
      name <- Gen.alphaNumStr
      score <- Gen.chooseNum(-1e6, 1e6)
      n <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      ts <- Gen.listOf(Gen.chooseNum(0L, 1L << 40))
      vecs <- Gen.listOfN(ts.size, Gen.listOfN(4,
        Gen.chooseNum(-1e3f, 1e3f)))
    } yield (name, score, n, ts, vecs)
    val prop = Prop.forAll(gen) { case (name, score, n, ts, vecs) =>
      val row = new GenericInternalRow(Array[Any](
        UTF8String.fromString(name), score, n,
        new GenericArrayData(ts.toArray),
        new GenericArrayData(vecs.map(v =>
          new GenericArrayData(v.toArray)).toArray)))
      val d = codec.decode(codec.encode(row))
      d.getUTF8String(0).toString == name &&
        // FLOAT kind is float32 on the wire (features.py:20-23), so a
        // double survives only to float precision — by design
        d.getDouble(1) == score.toFloat.toDouble && d.getLong(2) == n &&
        // an empty array round-trips as a present-but-empty FeatureList
        d.getArray(3).toLongArray.toSeq == ts &&
        d.getArray(4).numElements() == vecs.size &&
        (0 until vecs.size).forall(i =>
          d.getArray(4).getArray(i).toFloatArray.toSeq == vecs(i))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("value-before-key foreign layout: dropped bytes never count as skipped") {
    // Protobuf permits any field order inside a map entry; our writer and
    // TF's emit key-first, but a foreign writer may emit the VALUE first.
    // An unwanted value seen before its key is materialized defensively
    // and dropped post-loop — those bytes were copied, so crediting them
    // to bytesSkipped would overstate the in-place-skip proof. They must
    // land in bytesDropped instead.
    import ProtoWire.Writer
    def floats(vs: Array[Float]): Writer = {
      val list = new Writer; list.writePackedFloats(1, vs)
      val ft = new Writer; ft.writeMessage(2, list); ft
    }
    def example(keyFirst: Boolean, key: String): Array[Byte] = {
      val ft = floats(Array.tabulate(64)(_.toFloat))
      val entry = new Writer
      if (keyFirst) {
        entry.writeBytes(1, key.getBytes("UTF-8"))
        entry.writeMessage(2, ft)
      } else {
        entry.writeMessage(2, ft)
        entry.writeBytes(1, key.getBytes("UTF-8"))
      }
      val features = new Writer; features.writeMessage(1, entry)
      val msg = new Writer; msg.writeMessage(1, features)
      msg.toByteArray
    }
    val schema = StructType(Seq(StructField("wanted", ArrayType(FloatType))))
    val codec = new ExampleCodec(schema, sequenceMode = false)
    def counters() = (ExampleCodec.bytesMaterialized.sum(),
      ExampleCodec.bytesSkipped.sum(), ExampleCodec.bytesDropped.sum())

    // value-first + unwanted key → dropped, NOT skipped
    val (m0, s0, d0) = counters()
    codec.decode(example(keyFirst = false, key = "unwanted"))
    val (m1, s1, d1) = counters()
    assert(s1 - s0 === 0L, "defensively-copied bytes credited as in-place skips")
    assert(d1 - d0 > 0L)
    assert(m1 - m0 === 0L)

    // key-first + unwanted key → a true in-place skip, nothing dropped
    codec.decode(example(keyFirst = true, key = "unwanted"))
    val (m2, s2, d2) = counters()
    assert(s2 - s1 > 0L)
    assert(d2 - d1 === 0L)
    assert(m2 - m1 === 0L)

    // value-first + WANTED key decodes identically to key-first
    val a = codec.decode(example(keyFirst = false, key = "wanted"))
    val b = codec.decode(example(keyFirst = true, key = "wanted"))
    assert(a.getArray(0).toFloatArray.toSeq === b.getArray(0).toFloatArray.toSeq)
    assert(a.getArray(0).numElements() === 64)
  }

  test("truncated proto bytes fail with a descriptive error") {
    val schema = StructType(Seq(StructField("a", StringType)))
    val codec = new ExampleCodec(schema, sequenceMode = false)
    val bytes = codec.encode(
      new GenericInternalRow(Array[Any](UTF8String.fromString("abcdef"))))
    val e = intercept[java.io.EOFException] {
      codec.decode(bytes.dropRight(3))
    }
    assert(e.getMessage.contains("truncated"))
  }
}
