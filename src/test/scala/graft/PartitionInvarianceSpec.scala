package graft

/** The determinism contract behind every oracle hash: results must be
  * INDEPENDENT of physical partitioning. One representative per family
  * (integer-ranked retrieval, windowed sessions, banded LSH, phrase
  * mining, the native sweep) runs under two different
  * shuffle-partition settings; collected rows must match exactly —
  * the property that lets the same lineage run at local[32] today and
  * 1000 executors tomorrow without changing a single answer.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val names = Seq("sim_bitext", "ev_cooccurrence",
    "dd_minhash_lsh", "txt_keyphrase", "ev_range_native", "sim_mmr")

  test("representative queries return identical rows at 5 and 32 shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val was = spark.conf.get(key)
    def runAll(): Map[String, Seq[String]] =
      names.map { n =>
        n -> SparkEntry.queries(n)(spark, sfDir).collect()
          .map(_.toString).sorted.toSeq
      }.toMap
    try {
      spark.conf.set(key, "5")
      val at5 = runAll()
      spark.conf.set(key, "32")
      val at32 = runAll()
      names.foreach { n =>
        assert(at5(n).nonEmpty, n)
        assert(at5(n) === at32(n), n)
      }
    } finally spark.conf.set(key, was)
  }
}
