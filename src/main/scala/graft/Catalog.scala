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
}
