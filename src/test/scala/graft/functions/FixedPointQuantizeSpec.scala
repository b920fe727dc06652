package graft.functions

import graft.SparkSpec
import graft.similarity.VectorOps
import org.apache.spark.sql.functions._

/** Native fixedpoint_quantize ≡ the HOF transform form, bitwise — on the
  * fixture, on generated floats, and on the ugly edge classes (NaN, ±Inf,
  * null elements, null arrays, negatives, exact .5 ties).
  */
class FixedPointQuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("native ≡ HOF on the embeddings fixture") {
    assume(spark.catalog.functionExists("fixedpoint_quantize"))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val diff = emb.select(
        call_function("fixedpoint_quantize", col("embedding")).as("n"),
        VectorOps.quantize(col("embedding")).as("p"))
      .filter(not(col("n") <=> col("p"))).count()
    assert(diff == 0L)
  }

  test("native ≡ HOF on finite-domain edge classes") {
    assume(spark.catalog.functionExists("fixedpoint_quantize"))
    val cases: Seq[Seq[java.lang.Float]] = Seq(
      null,
      Seq.empty,
      Seq(1.0f, -1.0f, 0.0f, -0.0f),
      Seq(0.0005f, -0.0005f, 0.0015f, -0.0015f), // .5 ties both signs
      Seq(null, 0.123f, null),
      Seq(123.456f, -987.654f, Float.MinPositiveValue))
    val diff = cases.toDF("embedding").select(
        call_function("fixedpoint_quantize", col("embedding")).as("n"),
        VectorOps.quantize(col("embedding")).as("p"))
      .filter(not(col("n") <=> col("p"))).count()
    assert(diff == 0L)
  }

  test("out-of-domain values: native truncates where ANSI HOF throws") {
    assume(spark.catalog.functionExists("fixedpoint_quantize"))
    // the documented divergence: a stray NaN coordinate must produce a
    // deterministic value, not abort the corpus job
    val weird: Seq[Seq[java.lang.Float]] =
      Seq(Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity))
    val got = weird.toDF("embedding")
      .select(call_function("fixedpoint_quantize", col("embedding")))
      .head.getSeq[Long](0)
    assert(got == Seq(0L, Long.MaxValue, Long.MinValue))
    val hof = intercept[Exception] {
      weird.toDF("embedding")
        .select(VectorOps.quantize(col("embedding"))).collect()
    }
    assert(hof.getMessage.contains("CAST_OVERFLOW"))
  }

  test("quantized() keeps its scan projection inside WholeStageCodegen") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    val exec = try {
      spark.conf.set(aqeKey, "false")
      VectorOps.quantized(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
        .queryExecution.executedPlan
    } finally spark.conf.set(aqeKey, aqeWas)
    def region(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case _: org.apache.spark.sql.execution.InputAdapter => Nil
      case other => other +: other.children.flatMap(region)
    }
    val inRegion = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.flatMap(s => region(s.child))
    val bare = exec.collect {
      case pr: org.apache.spark.sql.execution.ProjectExec
          if !inRegion.exists(_ eq pr) => pr
    }
    assert(bare.isEmpty,
      s"quantize projection fell out of codegen:\n${bare.mkString("\n")}")
  }
}
