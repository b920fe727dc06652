package graft.tfrecord

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

/** TFRecord file framing (O20's record level; reference writes it via Beam's
  * WriteToTFRecord, preprocess.py:124-128). The on-disk layout is the public
  * TFRecord spec:
  *
  *   uint64  length              (little-endian)
  *   uint32  masked_crc32c(length bytes)
  *   byte    data[length]
  *   uint32  masked_crc32c(data)
  *
  * where masked_crc(c) = rotr15(c) + 0xa282ead8 over uint32 arithmetic.
  * CRC32C (Castagnoli) comes from java.util.zip.CRC32C (JDK 9+) — no
  * TensorFlow dependency. Records are not internally splittable (no sync
  * markers), so one file = one read task; parallelism comes from sharding
  * (many files per split directory), exactly like the reference's
  * num_shards > 1 output.
  */
object TFRecordIO {

  private val MaskDelta = 0xa282ead8L

  /** Masked CRC32C of `bytes`, as an unsigned 32-bit value in a Long. */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new CRC32C
    c.update(bytes, off, len)
    val crc = c.getValue // already unsigned 32-bit in a long
    (((crc >>> 15) | (crc << 17)) + MaskDelta) & 0xffffffffL
  }

  def maskedCrc(bytes: Array[Byte]): Long = maskedCrc(bytes, 0, bytes.length)

  /** Append one framed record to `out`. */
  def writeRecord(out: OutputStream, data: Array[Byte]): Unit = {
    val header = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    header.putLong(data.length.toLong)
    header.putInt(maskedCrc(header.array(), 0, 8).toInt)
    out.write(header.array())
    out.write(data)
    val footer = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    footer.putInt(maskedCrc(data).toInt)
    out.write(footer.array())
  }

  /** Iterate the records of one TFRecord stream, verifying both CRCs.
    * Reads lazily — one record in memory at a time — so a multi-GB shard
    * streams without buffering the file.
    */
  def readRecords(in: InputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRecord: Array[Byte] = _
      private var done = false

      private def readFully(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val k = in.read(buf, off, n - off)
          if (k < 0) throw new EOFException(
            s"truncated TFRecord: expected $n bytes, got $off")
          off += k
        }
        buf
      }

      private def advance(): Unit = {
        val first = in.read()
        if (first < 0) { done = true; return }
        val rest = readFully(11)
        val header = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        header.put(first.toByte).put(rest).flip()
        val len = header.getLong(0)
        val lenCrc = header.getInt(8).toLong & 0xffffffffL
        if (maskedCrc(header.array(), 0, 8) != lenCrc)
          throw new java.io.IOException("corrupt TFRecord: bad length CRC")
        if (len < 0 || len > Int.MaxValue - 16)
          throw new java.io.IOException(s"corrupt TFRecord: length $len")
        val data = readFully(len.toInt)
        val dataCrc = ByteBuffer.wrap(readFully(4))
          .order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
        if (maskedCrc(data) != dataCrc)
          throw new java.io.IOException("corrupt TFRecord: bad data CRC")
        nextRecord = data
      }

      override def hasNext: Boolean = {
        if (!done && nextRecord == null) advance()
        !done
      }

      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRecord
        nextRecord = null
        r
      }
    }
}
