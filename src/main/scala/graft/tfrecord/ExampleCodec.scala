package graft.tfrecord

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import ProtoWire.{Reader, Writer}

/** Schema-driven codec between Spark rows and tf.train.SequenceExample /
  * tf.train.Example bytes (O18; reference: preprocess.py:82-106).
  *
  * Field-kind promotion follows the reference's to_feature_list rules
  * (features.py:39-57): float/double → FloatList, integral/boolean →
  * Int64List, string → UTF-8 BytesList, binary → BytesList, scalars are
  * promoted to one-element lists, and unsupported types are dropped with a
  * warning rather than failing the row.
  *
  * Layout: top-level ArrayType columns become `feature_lists` entries (one
  * Feature per array element — an element that is itself an array becomes a
  * multi-valued Feature, e.g. per-frame 2048-float logits); scalar columns
  * become `context` features. In `example` mode everything flattens into a
  * single `features` map (arrays → one multi-valued Feature).
  *
  * Message/field numbers are the public tensorflow/core/example protos:
  *   BytesList.value=1  FloatList.value=1(packed)  Int64List.value=1(packed)
  *   Feature{bytes_list=1,float_list=2,int64_list=3}
  *   Features.feature=1(map)   FeatureList.feature=1
  *   FeatureLists.feature_list=1(map)
  *   Example.features=1   SequenceExample{context=1,feature_lists=2}
  */
final class ExampleCodec(schema: StructType, sequenceMode: Boolean)
    extends Serializable with Logging {

  import ExampleCodec._

  // Decode-side projection: only features named in the schema are ever
  // MATERIALIZED (key parsed, value bytes skipped in place for everyone
  // else) — the codec built over Spark's pruned requiredSchema reads a
  // 2048-float logits list as a varint length + skip when the query
  // only asked for `filename`. The byte counter is the proof hook
  // TFRecordFormatSpec asserts on.
  private val wanted: Set[String] = schema.fieldNames.toSet

  @transient private lazy val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def warnOnce(field: String, dt: DataType): Unit =
    if (warned.add(field))
      logWarning(s"dropping field '$field' of unsupported type $dt")

  // ---------------------------------------------------------------- encode

  def encode(row: InternalRow): Array[Byte] = {
    val context = new Writer // Features map (context / features)
    val lists = new Writer // FeatureLists map
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      if (!row.isNullAt(i)) f.dataType match {
        case ArrayType(elem, _) if sequenceMode =>
          featureList(f.name, elem, row.getArray(i)) match {
            case Some(fl) => writeMapEntry(lists, f.name, fl)
            case None => warnOnce(f.name, f.dataType)
          }
        case ArrayType(elem, _) =>
          arrayFeature(elem, row.getArray(i)) match {
            case Some(ft) => writeMapEntry(context, f.name, ft)
            case None => warnOnce(f.name, f.dataType)
          }
        case dt =>
          scalarFeature(dt, row, i) match {
            case Some(ft) => writeMapEntry(context, f.name, ft)
            case None => warnOnce(f.name, dt)
          }
      }
      i += 1
    }
    val msg = new Writer
    if (sequenceMode) {
      if (context.size > 0) msg.writeMessage(1, context)
      if (lists.size > 0) msg.writeMessage(2, lists)
    } else {
      msg.writeMessage(1, context)
    }
    msg.toByteArray
  }

  /** map<string, M> entry: submessage { 1: key, 2: value } */
  private def writeMapEntry(map: Writer, key: String, value: Writer): Unit = {
    val entry = new Writer
    entry.writeBytes(1, key.getBytes("UTF-8"))
    entry.writeMessage(2, value)
    map.writeMessage(1, entry)
  }

  /** One Feature holding a single (promoted-to-list) scalar. */
  private def scalarFeature(dt: DataType, row: InternalRow,
      i: Int): Option[Writer] = dt match {
    case FloatType => Some(floatFeature(Array(row.getFloat(i))))
    case DoubleType => Some(floatFeature(Array(row.getDouble(i).toFloat)))
    case LongType => Some(int64Feature(Array(row.getLong(i))))
    case IntegerType => Some(int64Feature(Array(row.getInt(i).toLong)))
    case ShortType => Some(int64Feature(Array(row.getShort(i).toLong)))
    case ByteType => Some(int64Feature(Array(row.getByte(i).toLong)))
    case BooleanType =>
      Some(int64Feature(Array(if (row.getBoolean(i)) 1L else 0L)))
    case StringType =>
      Some(bytesFeature(Seq(row.getUTF8String(i).getBytes)))
    case BinaryType => Some(bytesFeature(Seq(row.getBinary(i))))
    case _ => None
  }

  /** One multi-valued Feature from a whole array (example mode / inner). */
  private def arrayFeature(elem: DataType, ad: ArrayData): Option[Writer] =
    elem match {
      case FloatType => Some(floatFeature(ad.toFloatArray()))
      case DoubleType =>
        Some(floatFeature(ad.toDoubleArray().map(_.toFloat)))
      case LongType => Some(int64Feature(ad.toLongArray()))
      case IntegerType => Some(int64Feature(ad.toIntArray().map(_.toLong)))
      case StringType =>
        Some(bytesFeature(
          Array.tabulate(ad.numElements())(j => ad.getUTF8String(j).getBytes)
            .toSeq))
      case BinaryType =>
        Some(bytesFeature(
          Array.tabulate(ad.numElements())(j => ad.getBinary(j)).toSeq))
      case _ => None
    }

  /** FeatureList: one Feature per array element. */
  private def featureList(name: String, elem: DataType,
      ad: ArrayData): Option[Writer] = {
    val n = ad.numElements()
    val fl = new Writer
    elem match {
      case FloatType =>
        var j = 0
        while (j < n) {
          fl.writeMessage(1, floatFeature(Array(ad.getFloat(j)))); j += 1
        }
      case DoubleType =>
        var j = 0
        while (j < n) {
          fl.writeMessage(1, floatFeature(Array(ad.getDouble(j).toFloat)))
          j += 1
        }
      case LongType =>
        var j = 0
        while (j < n) {
          fl.writeMessage(1, int64Feature(Array(ad.getLong(j)))); j += 1
        }
      case IntegerType =>
        var j = 0
        while (j < n) {
          fl.writeMessage(1, int64Feature(Array(ad.getInt(j).toLong))); j += 1
        }
      case StringType =>
        var j = 0
        while (j < n) {
          fl.writeMessage(1, bytesFeature(Seq(ad.getUTF8String(j).getBytes)))
          j += 1
        }
      case BinaryType =>
        var j = 0
        while (j < n) {
          fl.writeMessage(1, bytesFeature(Seq(ad.getBinary(j)))); j += 1
        }
      case inner: ArrayType =>
        var j = 0
        while (j < n) {
          arrayFeature(inner.elementType, ad.getArray(j)) match {
            case Some(ft) => fl.writeMessage(1, ft)
            case None => return None
          }
          j += 1
        }
      case _ => return None
    }
    Some(fl)
  }

  // ---------------------------------------------------------------- decode

  /** Decode one serialized (Sequence)Example into the codec's schema. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val (context, lists) = parseTopLevel(bytes)
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      values(i) = f.dataType match {
        case ArrayType(elem, _) if sequenceMode =>
          lists.get(f.name).map(featuresToArray(elem, _)).orNull
        case ArrayType(elem, _) =>
          context.get(f.name)
            .map(ft => new GenericArrayData(featureValues(elem, ft)))
            .orNull
        case dt =>
          context.get(f.name).flatMap(ft => featureValues(dt, ft).headOption)
            .orNull
      }
      i += 1
    }
    new GenericInternalRow(values)
  }

  /** context-name → Feature reader bytes; list-name → Seq[Feature bytes] */
  private def parseTopLevel(bytes: Array[Byte])
      : (Map[String, Array[Byte]], Map[String, Seq[Array[Byte]]]) = {
    var context = Map.empty[String, Array[Byte]]
    var lists = Map.empty[String, Seq[Array[Byte]]]
    val top = new Reader(bytes)
    while (top.hasNext) {
      val (field, wt) = top.readTag()
      if (field == 1 && wt == 2) { // context (or Example.features)
        val features = top.readDelimited()
        while (features.hasNext) {
          val (f2, w2) = features.readTag()
          if (f2 == 1 && w2 == 2) {
            readMapEntry(features.readDelimited()).foreach { case (k, v) =>
              context += (k -> v)
            }
          } else features.skip(w2)
        }
      } else if (field == 2 && wt == 2 && sequenceMode) { // feature_lists
        val flMap = top.readDelimited()
        while (flMap.hasNext) {
          val (f2, w2) = flMap.readTag()
          if (f2 == 1 && w2 == 2) {
            readMapEntry(flMap.readDelimited()).foreach { case (k, flBytes) =>
              val fl = new Reader(flBytes)
              var features = Vector.empty[Array[Byte]]
              while (fl.hasNext) {
                val (f3, w3) = fl.readTag()
                if (f3 == 1 && w3 == 2) features :+= fl.readDelimitedBytes()
                else fl.skip(w3)
              }
              lists += (k -> features)
            }
          } else flMap.skip(w2)
        }
      } else top.skip(wt)
    }
    (context, lists)
  }

  /** One map entry, PROJECTION-AWARE: the key always parses; the value
    * bytes are copied (and counted) only when the key is in the codec's
    * schema — a non-requested feature costs one varint read + an
    * in-place skip, never an allocation. Protobuf permits any field
    * order, so a value seen BEFORE its key (foreign writers; ours and
    * TF's emit key-first) is materialized defensively and dropped
    * post-loop if the key turns out unwanted — correct for every
    * layout, allocation-free for the common one.
    */
  private def readMapEntry(entry: Reader): Option[(String, Array[Byte])] = {
    var key: String = null
    var value: Array[Byte] = null
    while (entry.hasNext) {
      val (f, w) = entry.readTag()
      if (f == 1 && w == 2)
        key = new String(entry.readDelimitedBytes(), "UTF-8")
      else if (f == 2 && w == 2) {
        if (key != null && !wanted(key))
          ExampleCodec.bytesSkipped.add(entry.skipDelimited().toLong)
        else value = entry.readDelimitedBytes()
      } else entry.skip(w)
    }
    if (key != null && wanted(key)) {
      val v = if (value != null) value else Array.empty[Byte]
      ExampleCodec.bytesMaterialized.add(v.length.toLong)
      Some(key -> v)
    } else {
      // A value materialized defensively (seen before its key, which
      // then turned out unwanted) was COPIED, not varint-skipped —
      // crediting it to bytesSkipped would overstate in-place skips for
      // foreign key-after-value writers and quietly weaken the pruning
      // proof. It gets its own counter.
      if (value != null) ExampleCodec.bytesDropped.add(value.length.toLong)
      None
    }
  }

  /** All values of one Feature, converted to Catalyst `dt` values. */
  private def featureValues(dt: DataType, featureBytes: Array[Byte]): Seq[Any] = {
    var floats = Array.empty[Float]
    var longs = Array.empty[Long]
    var byteses = Vector.empty[Array[Byte]]
    val r = new Reader(featureBytes)
    while (r.hasNext) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 2) => // BytesList
          val bl = r.readDelimited()
          while (bl.hasNext) {
            val (f2, w2) = bl.readTag()
            if (f2 == 1 && w2 == 2) byteses :+= bl.readDelimitedBytes()
            else bl.skip(w2)
          }
        case (2, 2) => // FloatList
          val flr = r.readDelimited()
          while (flr.hasNext) {
            val (f2, w2) = flr.readTag()
            if (f2 == 1 && w2 == 2) floats ++= flr.readDelimited().readFloats()
            else if (f2 == 1 && w2 == 5) // unpacked fixed32 float
              floats :+= java.lang.Float.intBitsToFloat(flr.readFixed32().toInt)
            else flr.skip(w2)
          }
        case (3, 2) => // Int64List
          val ilr = r.readDelimited()
          while (ilr.hasNext) {
            val (f2, w2) = ilr.readTag()
            if (f2 == 1 && w2 == 2) longs ++= ilr.readDelimited().readVarints()
            else if (f2 == 1 && w2 == 0) longs :+= ilr.readVarint()
            else ilr.skip(w2)
          }
        case (_, w2) => r.skip(w2)
      }
    }
    dt match {
      case FloatType => floats.toSeq
      case DoubleType => floats.map(_.toDouble).toSeq
      case LongType => longs.toSeq
      case IntegerType => longs.map(_.toInt).toSeq
      case ShortType => longs.map(_.toShort).toSeq
      case ByteType => longs.map(_.toByte).toSeq
      case BooleanType => longs.map(_ != 0L).toSeq
      case StringType => byteses.map(UTF8String.fromBytes)
      case BinaryType => byteses
      case other =>
        throw new UnsupportedOperationException(
          s"cannot decode feature as $other")
    }
  }

  /** FeatureList → ArrayData per the element type. */
  private def featuresToArray(elem: DataType,
      features: Seq[Array[Byte]]): ArrayData = elem match {
    case ArrayType(inner, _) =>
      new GenericArrayData(features.map(ft =>
        new GenericArrayData(featureValues(inner, ft))))
    case dt =>
      new GenericArrayData(features.map(ft =>
        featureValues(dt, ft).headOption.orNull))
  }
}

object ExampleCodec {

  /** Decode-side byte accounting (per-JVM, test-visible): value bytes
    * copied into rows, vs value bytes SKIPPED truly in place (one
    * varint read, no allocation) because the feature key was not in the
    * decode schema, vs value bytes DROPPED after a defensive copy (a
    * foreign writer emitted the value BEFORE its key, and the key
    * turned out unwanted — materialized, then discarded). Keeping the
    * third bucket separate means bytesSkipped never overstates in-place
    * skips: the pruning proof in TFRecordFormatSpec reads the deltas,
    * and for our own key-first layout bytesDropped stays exactly zero.
    * Production cost: one LongAdder.add per feature.
    */
  val bytesMaterialized = new java.util.concurrent.atomic.LongAdder
  val bytesSkipped = new java.util.concurrent.atomic.LongAdder
  val bytesDropped = new java.util.concurrent.atomic.LongAdder

  private def floatFeature(vs: Array[Float]): Writer = {
    val list = new Writer
    list.writePackedFloats(1, vs)
    val ft = new Writer
    ft.writeMessage(2, list)
    ft
  }

  private def int64Feature(vs: Array[Long]): Writer = {
    val list = new Writer
    list.writePackedInt64s(1, vs)
    val ft = new Writer
    ft.writeMessage(3, list)
    ft
  }

  private def bytesFeature(vs: Seq[Array[Byte]]): Writer = {
    val list = new Writer
    vs.foreach(v => list.writeBytes(1, v))
    val ft = new Writer
    ft.writeMessage(1, list)
    ft
  }
}
