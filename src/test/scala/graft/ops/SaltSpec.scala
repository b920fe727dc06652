package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg ≡ plain agg, with the hot key spread over buckets") {
    // heavily skewed: one key holds 90% of rows
    val df = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong)))
      .toDF("key", "v")

    val plain = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
      .as[(String, Long, Long, Long)].collect().toSet

    val salted = Salt.saltedAgg(df, Seq("key"), col("v"), buckets = 8,
      aggs = Seq(count(lit(1)).as("n"), sum("v").as("s"),
        max("v").as("mx")),
      merges = Seq(sum("n").as("n"), sum("s").as("s"), max("mx").as("mx")))
      .as[(String, Long, Long, Long)].collect().toSet

    assert(salted === plain)
    // the hot key really is spread: phase 1 produces >1 partial for it
    val partials = df
      .withColumn("salt", Salt.saltCol(col("v"), 8))
      .filter(col("key") === "hot")
      .select("salt").distinct().count()
    assert(partials > 1)
  }
}
