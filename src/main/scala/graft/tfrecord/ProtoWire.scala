package graft.tfrecord

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal protobuf wire-format writer/reader — just enough for the
  * tf.train.{Example, SequenceExample} message family (reference:
  * preprocess.py:82-106 builds these via the TF python API; the wire format
  * itself is the public protobuf spec, so no TensorFlow or protobuf-java
  * dependency is needed).
  *
  * Wire types used: 0 = varint, 2 = length-delimited, 5 = 32-bit.
  */
object ProtoWire {

  final class Writer {
    private val out = new ByteArrayOutputStream(64)

    def size: Int = out.size()
    def toByteArray: Array[Byte] = out.toByteArray

    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }

    def writeTag(field: Int, wireType: Int): Unit =
      writeVarint((field.toLong << 3) | wireType)

    /** length-delimited bytes field */
    def writeBytes(field: Int, data: Array[Byte]): Unit = {
      writeTag(field, 2)
      writeVarint(data.length.toLong)
      out.write(data, 0, data.length)
    }

    /** embedded message field */
    def writeMessage(field: Int, m: Writer): Unit = writeBytes(field, m.toByteArray)

    /** packed repeated float (one length-delimited run of 4-byte LE floats) */
    def writePackedFloats(field: Int, vs: Array[Float]): Unit = {
      writeTag(field, 2)
      writeVarint(4L * vs.length)
      val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < vs.length) { bb.putFloat(vs(i)); i += 1 }
      out.write(bb.array(), 0, bb.capacity())
    }

    /** packed repeated int64 (one length-delimited run of varints) */
    def writePackedInt64s(field: Int, vs: Array[Long]): Unit = {
      val body = new Writer
      var i = 0
      while (i < vs.length) { body.writeVarint(vs(i)); i += 1 }
      writeBytes(field, body.toByteArray)
    }
  }

  /** Forward-only reader over one serialized message. Every read is bounds-
    * checked against the sub-reader's `end`: truncated or malformed input
    * (possible when fed externally-produced TFRecord files) fails with a
    * descriptive error instead of silently reading sibling bytes or throwing
    * a raw ArrayIndexOutOfBoundsException.
    */
  final class Reader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start

    /** Length prefix, validated as a LONG before the Int narrowing: a
      * hostile varint like 2^33+5 would otherwise truncate to 5 and
      * silently mis-frame the rest of the message (r14 fuzz
      * discipline — misparse must be a typed error, never quiet).
      */
    private def readLen(): Int = {
      val len = readVarint()
      if (len < 0 || len > end - pos)
        throw new java.io.EOFException(
          s"truncated or mis-framed protobuf: length $len at $pos, " +
            s"message ends at $end")
      len.toInt
    }

    def hasNext: Boolean = pos < end

    private def require(n: Int): Unit =
      if (pos + n > end)
        throw new java.io.EOFException(
          s"truncated protobuf: need $n bytes at $pos, message ends at $end")

    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      while (true) {
        require(1)
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63)
          throw new java.io.IOException("malformed varint: > 10 bytes")
      }
      v
    }

    /** returns (fieldNumber, wireType) */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    /** returns a sub-reader positioned over a length-delimited field body */
    def readDelimited(): Reader = {
      val len = readLen()
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readDelimitedBytes(): Array[Byte] = {
      val len = readLen()
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      r
    }

    def readFloats(): Array[Float] = {
      val len = end - pos
      val bb = ByteBuffer.wrap(buf, pos, len).order(ByteOrder.LITTLE_ENDIAN)
      pos = end
      Array.tabulate(len / 4)(_ => bb.getFloat())
    }

    def readVarints(): Array[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (hasNext) out += readVarint()
      out.toArray
    }

    def readFixed32(): Long = {
      require(4)
      val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4
      v.toLong & 0xffffffffL
    }

    /** Skips one length-delimited field body in place, returning the
      * skipped length — the projection-aware codec's byte-budget
      * accounting hook (a skip is free; the caller wants to PROVE it).
      */
    def skipDelimited(): Int = {
      val len = readLen()
      pos += len
      len
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => require(8); pos += 8
      case 2 => pos += readLen()
      case 5 => require(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }
}
