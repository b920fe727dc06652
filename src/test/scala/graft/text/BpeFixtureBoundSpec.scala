package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The BPE oracles (txt_bpe_merges / txt_bpe_iterate / txt_bpe_encode)
  * enumerate pair positions with a CONSTANT `generate_series(1, 16)`
  * bound, because DuckDB's generate_series cannot take a lateral column
  * bound. That cap is exact iff no fixture token exceeds
  * Text.BpeMaxTokenLen (= 17) chars. This spec pins the assumption to the
  * real fixtures at every scale factor the driver runs, so a fixture
  * change that would silently diverge the oracles fails loudly here
  * instead.
  */
class BpeFixtureBoundSpec extends SparkSpec {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"no $sf document token exceeds the BPE oracle series cap") {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(s"$dir/documents.parquet").exists())
      val row = Tables.sharded(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .agg(max(length(col("token"))).as("m")).collect()(0)
      val maxLen = if (row.isNullAt(0)) 0 else row.getInt(0)
      assert(maxLen <= graft.queries.Text.BpeMaxTokenLen,
        s"a $maxLen-char token breaks the generate_series cap in the " +
          "BPE oracles — raise Text.BpePairPositions")
    }
  }
}
