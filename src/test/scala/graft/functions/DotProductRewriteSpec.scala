package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductRewriteSpec extends SparkSpec {
  import spark.implicits._

  // built from range, not literals: a LocalRelation input would be
  // constant-folded away before the plan can be inspected
  private def vecs = spark.range(1, 21).select(col("id"),
    transform(sequence(lit(0L), lit(7L)), j => col("id") * 7 + j).as("a"),
    transform(sequence(lit(0L), lit(7L)), j => col("id") * 3 - j).as("b"))

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  test("HOF dot product is rewritten to fixedpoint_dot") {
    val q = vecs.select(hofDot.as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("fixedpoint_dot"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("aggregate("))
  }

  test("rewritten query returns the same values as the unoptimized form") {
    val got = vecs.select(col("id"), hofDot.as("d"))
      .as[(Long, Long)].collect().toMap
    val want = vecs.as[(Long, Seq[Long], Seq[Long])].collect().map {
      case (id, a, b) => id -> a.zip(b).map { case (x, y) => x * y }.sum
    }.toMap
    assert(got === want)
  }

  test("non-dot aggregations are left alone") {
    // merge is acc + 2*v: not a sum-of-products — must NOT rewrite
    val q = vecs.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v * 2).as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("fixedpoint_dot"))
    // element-wise ADD zip: also not a dot product
    val q2 = vecs.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x + y),
      lit(0L), (acc, v) => acc + v).as("d"))
    assert(!q2.queryExecution.optimizedPlan.toString.contains("fixedpoint_dot"))
  }

  test("VectorOps.dot (the library's HOF form) gets the native plan") {
    val q = vecs.select(graft.similarity.VectorOps.dot(col("a"), col("b")))
    assert(q.queryExecution.optimizedPlan.toString.contains("fixedpoint_dot"))
  }
}
