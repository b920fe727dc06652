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

  // skewed fact + small dim with duplicate dim keys (multiplicity trap:
  // a bad salting doubles or drops the fan-out rows)
  private def joinFixture = {
    val big = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong)))
      .toDF("key", "v")
    val dim = Seq(("hot", 1L), ("hot", 2L), ("k1", 10L), ("k2", 20L),
      ("zzz", 99L)).toDF("key", "d")
    (big, dim)
  }

  test("saltedJoin ≡ plain join (inner and left), multiplicities intact") {
    val (big, dim) = joinFixture
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(dim, Seq("key"), jt)
        .as[(String, Long, Option[Long])].collect()
        .groupMapReduce(identity)(_ => 1)(_ + _)
      val salted = Salt.saltedJoin(big, dim, Seq("key"), col("v"), 8, jt)
        .as[(String, Long, Option[Long])].collect()
        .groupMapReduce(identity)(_ => 1)(_ + _)
      assert(salted === plain, s"joinType=$jt")
    }
    intercept[IllegalArgumentException](
      Salt.saltedJoin(big, dim, Seq("key"), col("v"), 8, "right"))
  }

  test("saltedJoinHot ≡ plain join; only hot keys salt and replicate") {
    val (big, dim) = joinFixture
    val hot = Seq("hot").toDF("key")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(dim, Seq("key"), jt)
        .as[(String, Long, Option[Long])].collect()
        .groupMapReduce(identity)(_ => 1)(_ + _)
      val salted = Salt
        .saltedJoinHot(big, dim, Seq("key"), col("v"), 8, hot, jt)
        .as[(String, Long, Option[Long])].collect()
        .groupMapReduce(identity)(_ => 1)(_ + _)
      assert(salted === plain, s"joinType=$jt")
    }
    // the big side's hot key really spreads over >1 salt; cold keys don't
    val hotB = broadcast(hot.withColumn("__hot", lit(true)))
    val saltsPerKey = big.join(hotB, Seq("key"), "left")
      .withColumn("salt", when(col("__hot"),
        Salt.saltCol(col("v"), 8)).otherwise(lit(0)))
      .groupBy("key").agg(countDistinct(col("salt")).as("ns"))
      .as[(String, Long)].collect().toMap
    assert(saltsPerKey("hot") > 1)
    assert(saltsPerKey.filterNot(_._1 == "hot").values.forall(_ === 1L))
    // dim inflation is |hot keys|·buckets + |cold rows|, not |dim|·buckets:
    // 2 hot rows ×8 + 3 cold rows ×1
    val inflated = dim.join(hotB, Seq("key"), "left")
      .withColumn("__salt", explode(when(col("__hot"),
        sequence(lit(0), lit(7))).otherwise(array(lit(0)))))
    assert(inflated.count() === 2 * 8 + 3)
  }

  test("ev_salted_join shuffles on (key, salt) when the join is SMJ") {
    // the whole point of the salt: the shuffle key gains a second
    // expression, so a hot user's rows spread across reducers. Disable
    // broadcast to surface the shuffle-based join this op exists for.
    val sfDir = "/root/testdata/sf0.001"
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.enabled"
    val (bcWas, aqeWas) = (spark.conf.get(bcKey), spark.conf.get(aqeKey))
    try {
      spark.conf.set(bcKey, "-1")
      spark.conf.set(aqeKey, "false")
      val exec = graft.SparkEntry.queries("ev_salted_join")(spark, sfDir)
        .queryExecution.executedPlan
      val smjKeys = exec.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.leftKeys.size > 1 => j.leftKeys
      }
      assert(smjKeys.nonEmpty, "no multi-key SortMergeJoin in the plan")
      assert(smjKeys.exists(_.size === 2)) // (user_id, __salt)
    } finally {
      spark.conf.set(bcKey, bcWas); spark.conf.set(aqeKey, aqeWas)
    }
  }
}
