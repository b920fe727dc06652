package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the same
  * lineage definition runs unchanged at sf0.001 (smoke), sf0.01 (oracle) and
  * sf0.1 (bench) — and, at production scale, against any parquet lake path.
  * Reads are plain `spark.read.parquet`, so Catalyst pushes filters and prunes
  * columns down to the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Temporal columns the engine's queries rely on, with their canonical
    * engine-side type (TIMESTAMP_NTZ — what the current fixtures scan as
    * and what every date filter/extract compares against). The round-8
    * events outage showed fixture timestamp encodings DO drift between
    * generations; these coercions make the relational loaders
    * drift-proof the same way [[events]] is: DATE and TIMESTAMP (under
    * the UTC session timezone every entry point pins) both cast
    * losslessly to NTZ, and the current NTZ encoding passes through
    * unchanged (coercion skipped — plans identical today).
    */
  private val temporalNtz: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    temporalNtz.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      df.schema.find(_.name == c).map(_.dataType) match {
        case Some(TimestampNTZType) | None => df // canonical (or absent)
        case Some(DateType) | Some(TimestampType) =>
          df.withColumn(c, col(c).cast(TimestampNTZType))
        case Some(other) => throw new IllegalArgumentException(
          s"$name.$c: unsupported fixture encoding $other — expected " +
            "DATE, TIMESTAMP, or TIMESTAMP_NTZ; see Tables.temporalNtz")
      }
    }
  }

  /** Read a fixture table and spread it across the session's full
    * parallelism. The fixture tables are single-row-group parquet files, so
    * the scan yields ONE input partition and everything narrow downstream
    * (regex tokenization, per-shingle hashing, fixed-point vector math,
    * window explosion) would run on one core while the rest idle. One
    * round-robin repartition of the pruned scan output buys full-width
    * parallelism for the compute-heavy stage that follows.
    *
    * Scale note: this is the "cheap input, expensive transform" pattern —
    * the shuffle moves O(input) bytes once to parallelize work that costs
    * many times that. On a production lake the input is already thousands
    * of splittable files and this loader degenerates to `apply` (drop the
    * repartition); every consumer is partitioning-agnostic — keyed
    * aggregations with deterministic tie-breaking — so the swap changes
    * no results.
    *
    * Measured boundary (sf0.1, local[32]): this wins only where per-row
    * compute dominates — the md5/shingle and fixed-point-vector families
    * (~1.5-7× per query). The wide relational fact tables LOSE with it
    * (q2 1.8s→7.9s): sort-before-repartition serializes 600k full rows
    * through the single scan task, costing more than the parallel
    * aggregation saves. Fact-table queries therefore stay on [[apply]].
    */
  def sharded(spark: SparkSession, dir: String, name: String): DataFrame =
    apply(spark, dir, name)
      .repartition(spark.sparkContext.defaultParallelism)

  /** The events table's `ts` encoding has varied across fixture
    * generations — parquet TIMESTAMP(NANOS) (read as a nanosecond long via
    * `nanosAsLong`) and plain `timestamp[us]` (read as TIMESTAMP_NTZ under
    * the default NTZ inference, or TIMESTAMP when inference is off). A real
    * lake is no different: timestamp physical encodings drift between
    * writers. Normalize whatever the scan yields to one canonical pair —
    * an epoch-millisecond `ems` long plus a millisecond-precision `ts`
    * TimestampType column — so every event-time operator downstream sees
    * one schema. Window boundaries here are all >= 1s, so ms precision is
    * exact; the floor semantics match DuckDB's `epoch_ms`.
    *
    * nanosAsLong is set at session build by every entry point (Verify /
    * Bench / Explain / test fixture); the set here is a defensive repeat
    * for sessions the driver constructs itself (idempotent, same value —
    * per-call only because this loader may be handed arbitrary sessions).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val ems = raw.schema("ts").dataType match {
      // integer div, not `/`: long/long promotes to double, which cannot
      // represent an ~1.7e18 nanosecond epoch exactly (53-bit mantissa)
      case LongType => expr("ts div 1000000")
      // NTZ fixtures carry UTC wall-clock; the session timezone is pinned
      // to UTC at every entry point, so the NTZ->LTZ cast is instant-exact.
      // unix_millis floor-divides the underlying micros, matching epoch_ms.
      case TimestampNTZType | TimestampType =>
        unix_millis(col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported fixture encoding $other — expected " +
          "BIGINT (nanos), TIMESTAMP_NTZ, or TIMESTAMP; see Tables.events")
    }
    raw.withColumn("ems", ems)
      .withColumn("ts", timestamp_millis(col("ems")))
  }}
