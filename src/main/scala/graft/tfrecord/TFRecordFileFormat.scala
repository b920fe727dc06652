package graft.tfrecord

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{
  FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType

/** Spark-native TFRecord source/sink (O20/O22; reference:
  * preprocess.py:109-128 writes via Beam's WriteToTFRecord).
  *
  * Registered as `format("tfrecord")`:
  *
  *   df.write.format("tfrecord").option("recordType", "SequenceExample")
  *     .partitionBy("dataset").save(out)          // O22 per-split fan-out
  *   spark.read.schema(s).format("tfrecord").load(out)
  *
  * Implemented as a classic `FileFormat` so Spark's commit protocol,
  * partitionBy fan-out, task retry and speculative-execution semantics all
  * come from the framework — on a 1000-executor cluster each task writes its
  * own shard through the committer's temp-dir dance with zero custom code.
  *
  * Options: `recordType` = `SequenceExample` (default) | `Example` — top-level
  * array columns become feature_lists vs flattened context features (the
  * promotion rules of features.py:39-57 live in [[ExampleCodec]]).
  *
  * TFRecord files carry no schema, so reads require a user-supplied schema
  * and records are NOT splittable (no sync markers): `isSplitable` = false,
  * one file per read task; write-side sharding (`repartition`) is the
  * parallelism knob, as in the reference's num_shards.
  */
final class TFRecordFileFormat extends FileFormat
    with DataSourceRegister with Serializable {

  override def shortName(): String = "tfrecord"

  override def toString: String = "TFRecord"

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = None

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean = false

  private def sequenceMode(options: Map[String, String]): Boolean =
    options.getOrElse("recordType", "SequenceExample") match {
      case "SequenceExample" => true
      case "Example" => false
      case other => throw new IllegalArgumentException(
        s"recordType must be SequenceExample or Example, got $other")
    }

  private def gzipped(options: Map[String, String]): Boolean =
    options.getOrElse("compression", "none").toLowerCase match {
      case "gzip" => true
      case "none" | "uncompressed" => false
      case other => throw new IllegalArgumentException(
        s"compression must be gzip or none, got $other")
    }

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val seqMode = sequenceMode(options)
    val gz = gzipped(options)
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String =
        if (gz) ".tfrecord.gz" else ".tfrecord"
      override def newInstance(path: String, dataSchema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new TFRecordOutputWriter(path, dataSchema, seqMode, gz, context)
    }
  }

  override def buildReader(sparkSession: SparkSession,
      dataSchema: StructType, partitionSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val seqMode = sequenceMode(options)
    val confWrapper = new SerializableHadoopConf(hadoopConf)

    (file: PartitionedFile) => {
      val path = file.toPath
      val fs = path.getFileSystem(confWrapper.value)
      val raw = fs.open(path)
      // whole-file gzip (TF's GZIP compression_type); files are already
      // non-splittable, so stream decompression costs no parallelism
      val in: java.io.InputStream =
        if (path.getName.endsWith(".gz"))
          new java.util.zip.GZIPInputStream(raw)
        else raw
      // the codec is built over the PRUNED schema, so column pruning
      // reaches the byte level: a non-requested feature's value bytes
      // are varint-skipped in place, never copied or converted — a
      // 2-column projection over frames with 2048-float logits reads
      // ~1% of each record's payload (ReadSchema in explain names the
      // pruned columns; ExampleCodec's counters prove the skip)
      val codec = new ExampleCodec(requiredSchema, seqMode)
      val records = TFRecordIO.readRecords(in)
      new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          val h = records.hasNext
          if (!h) in.close()
          h
        }
        override def next(): InternalRow = codec.decode(records.next())
      }
    }
  }
}

private final class TFRecordOutputWriter(val path: String,
    dataSchema: StructType, seqMode: Boolean, gz: Boolean,
    context: TaskAttemptContext) extends OutputWriter {

  private val codec = new ExampleCodec(dataSchema, seqMode)
  private val out: java.io.OutputStream = {
    val p = new Path(path)
    val raw = p.getFileSystem(context.getConfiguration).create(p, true)
    if (gz) new java.util.zip.GZIPOutputStream(raw) else raw
  }

  override def write(row: InternalRow): Unit =
    TFRecordIO.writeRecord(out, codec.encode(row))

  override def close(): Unit = out.close()
}

/** Hadoop's Configuration is not java-serializable; this thin wrapper ships
  * it to executors via its own writable form (the same trick Spark uses
  * internally). Public-knowledge pattern, no Spark-private API.
  */
private final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  def value: Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
