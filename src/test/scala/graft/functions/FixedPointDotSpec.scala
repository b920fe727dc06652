package graft.functions

import graft.SparkSpec
import graft.similarity.VectorOps
import org.apache.spark.sql.functions._

class FixedPointDotSpec extends SparkSpec {
  import spark.implicits._

  test("extension registers fixedpoint_dot in the session") {
    assert(spark.catalog.functionExists("fixedpoint_dot"))
  }

  test("native expression ≡ HOF dot on random quantized vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextLong() % 1000),
        Seq.fill(64)(rnd.nextLong() % 1000))
    }.toDF("id", "a", "b")
    val both = rows.select(
      call_function("fixedpoint_dot", col("a"), col("b")).as("native"),
      VectorOps.dot(col("a"), col("b")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("null array or mismatched lengths yield null (HOF-form parity)") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L))),
      (None, Some(Seq(1L))),
      (Some(Seq(2L, 3L)), Some(Seq(4L, 5L)))
    ).toDF("a", "b")
      .select(call_function("fixedpoint_dot", col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0)) // ragged — same as aggregate(zip_with(...))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) === 2L * 4 + 3L * 5)
  }

  test("works inside whole-stage codegen (dataframe filter + agg path)") {
    val df = (1 to 1000).map(i => (i.toLong, Seq.fill(8)(i.toLong)))
      .toDF("id", "v")
    val out = df
      .select(call_function("fixedpoint_dot", col("v"), col("v")).as("n2"))
      .agg(sum("n2")).as[Long].head()
    // sum over i of 8*i^2
    val expected = (1 to 1000).map(i => 8L * i * i).sum
    assert(out === expected)
  }

  test("sim queries use the native function when the extension is present") {
    val e = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val plan = VectorOps.knnBrute(e, e.filter(col("vec_id") === 0L), 1)
      .queryExecution.analyzed.toString
    assert(plan.contains("fixedpoint_dot"))
  }
}
