package graft

import org.apache.spark.sql.SparkSession

/** SQL front door: register the fixture lake as temp views so the whole
  * engine surface is reachable from `spark.sql(...)` — the relational
  * tables plus the documents/embeddings corpora, with the session's
  * graft functions (fixedpoint_dot via GraftExtensions) available inside
  * any statement. On a production lake these would be catalog tables;
  * temp views keep the same query text working against any path.
  */
object Catalog {

  /** Create one temp view per fixture table under its canonical name. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Tables.names.filterNot(_ == "events")
      .foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))
    // events gets the normalized (ts, ems) form every ev_* query uses
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Register the typed sketch `Aggregator`s as SQL aggregate functions
    * (`bottom_k(hash)`, `count_min(buckets)`, `bloom(positions)`), so the
    * bounded-memory sketch family is reachable from pure SQL alongside
    * the extension-injected scalar functions. Sketch shapes are fixed at
    * registration (they size the aggregation buffer, which must be
    * consistent across partial merges).
    */
  def registerSketches(spark: SparkSession, bottomK: Int = 16,
      cmDepth: Int = 4, cmWidth: Int = 64, bloomWords: Int = 256,
      bitmapWords: Int = 64): Unit = {
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("bottom_k",
      udaf(new functions.BottomKSketch(bottomK)))
    spark.udf.register("count_min",
      udaf(new functions.CountMinSketch(cmDepth, cmWidth)))
    spark.udf.register("bloom",
      udaf(new functions.BloomSketch(bloomWords)))
    spark.udf.register("bitmap",
      udaf(new functions.BitmapSketch(bitmapWords)))
  }
}
