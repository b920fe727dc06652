package graft

import org.apache.spark.sql.types._

/** Fixture-schema drift guard.
  *
  * The driver regenerates `/root/testdata` fixtures between rounds, and an
  * encoding change (round 8: `events.ts` flipped from TIMESTAMP(NANOS) to
  * `timestamp[us]`) can break a whole query family at analysis time. This
  * suite reads every table's scanned schema and fails LOUDLY with the
  * expected/actual dtype per column, so the next drift is a one-line
  * message instead of a red round.
  *
  * `events.ts` is special-cased: [[Tables.events]] adapts to all three
  * historical encodings (BIGINT nanos / TIMESTAMP_NTZ / TIMESTAMP), so the
  * guard accepts exactly that set and additionally asserts the NORMALIZED
  * schema (`ems` long + `ts` timestamp) the rest of the engine relies on.
  */
class FixtureSchemaSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def fieldTypes(table: String): Map[String, DataType] =
    Tables(spark, sfDir, table).schema.fields
      .map(f => f.name -> f.dataType).toMap

  private def assertCols(table: String, expected: (String, DataType)*): Unit = {
    val actual = fieldTypes(table)
    val drift = expected.flatMap { case (name, dt) =>
      actual.get(name) match {
        case Some(`dt`) => None
        case Some(other) => Some(s"$table.$name: expected $dt, scan yields $other")
        case None => Some(s"$table.$name: MISSING (scan has ${actual.keys.mkString(", ")})")
      }
    }
    assert(drift.isEmpty, s"\nFIXTURE SCHEMA DRIFT:\n  ${drift.mkString("\n  ")}")
  }

  test("relational fixture columns keep their dtypes") {
    assertCols("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
    assertCols("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderstatus" -> StringType, "o_orderpriority" -> StringType)
    assertCols("customer",
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("supplier",
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType)
    assertCols("part",
      "p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType, "p_brand" -> StringType,
      "p_type" -> StringType)
    assertCols("nation",
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType,
      "n_name" -> StringType)
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
  }

  test("documents/embeddings fixture columns keep their dtypes") {
    assertCols("documents",
      "doc_id" -> LongType, "text" -> StringType,
      "source" -> StringType, "lang" -> StringType, "n_chars" -> LongType)
    val emb = fieldTypes("embeddings")
    assert(emb.get("vec_id").contains(LongType),
      s"embeddings.vec_id: expected LongType, got ${emb.get("vec_id")}")
    emb.get("embedding") match {
      case Some(ArrayType(FloatType, _)) => ()
      case other => fail(s"embeddings.embedding: expected array<float>, scan yields $other")
    }
  }

  test("Tables.apply normalizes drifted temporal encodings to NTZ") {
    import org.apache.spark.sql.functions._
    // synthesize a lineitem whose l_shipdate is DATE (a plausible future
    // fixture regen) and check the loader coerces it to the canonical
    // TIMESTAMP_NTZ with midnight wall-clock values
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    // drift the FULL fixture (the canonical layer also fails loudly on
    // missing columns, so a partial synthetic table no longer loads)
    Tables(spark, sfDir, "lineitem")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
      .write.parquet(s"$dir/lineitem.parquet")
    val df = Tables(spark, dir, "lineitem")
    assert(df.schema("l_shipdate").dataType == TimestampNTZType)
    assert(df.select(date_format(col("l_shipdate"),
      "HH:mm:ss")).head.getString(0) == "00:00:00")
    // current fixtures are already NTZ → coercion is a no-op passthrough
    assert(Tables(spark, sfDir, "lineitem")
      .schema("l_shipdate").dataType == TimestampNTZType)
  }

  test("events.ts stays within the encodings Tables.events adapts to") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsType = raw.schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)(tsType),
      s"\nFIXTURE SCHEMA DRIFT: events.ts is $tsType — Tables.events only " +
        "adapts to BIGINT (nanos), TIMESTAMP_NTZ, and TIMESTAMP. Teach " +
        "Tables.events the new encoding before anything else this round.")
  }

  test("Tables.events normalizes to the canonical (ems long, ts timestamp) pair") {
    val e = Tables.events(spark, sfDir)
    assert(e.schema("ems").dataType == LongType)
    assert(e.schema("ts").dataType == TimestampType)
    val row = e.selectExpr(
      "count(*)",
      "sum(cast(unix_millis(ts) = ems as long))",
      "min(ems)", "max(ems)").head
    val n = row.getLong(0)
    assert(n > 0, "events fixture is empty")
    assert(row.getLong(1) == n, "ts and ems disagree after normalization")
    // sanity: epoch-ms magnitude (year 2000..2100), catches unit mistakes
    // (micros-as-ms would land in year ~55k, nanos-as-ms far beyond)
    assert(row.getLong(2) > 946684800000L && row.getLong(3) < 4102444800000L,
      s"ems out of plausible epoch-ms range: [${row.getLong(2)}, ${row.getLong(3)}]")
  }
}
