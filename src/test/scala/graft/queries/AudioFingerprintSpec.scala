package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused audio-fingerprint kernel (MultimodalQ.audioFingerprint —
  * synth → WAV encode → WAV decode → 60-bit sign-of-delta, one JVM
  * call) must be VALUE-IDENTICAL to the Catalyst lineage it replaced
  * (transform/sequence sample synthesis, two array-boxing UDF crossings
  * through the WAV codec, aggregate-over-sequence bit fold) — the
  * mm_audio_* oracle gates were built on that lineage's semantics.
  */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("fused kernel ≡ the original Catalyst lineage, doc_id sweep") {
    val wavEnc = udf((xs: Seq[Long]) =>
      graft.pipeline.WavCodec.encode(xs.map(_.toShort).toArray, 8000))
    val wavDec = udf((b: Array[Byte]) =>
      graft.pipeline.WavCodec.decode(b)._3.map(_.toLong).toSeq)
    // doc_ids spanning small, large, and odd values; both v variants
    val ids = (Seq(0L, 1L, 2L, 7L, 59L, 1234L, 99991L, 1000003L) ++
      (1 to 40).map(i => i * 37L + 5)).distinct
    val legacy = ids.toDF("doc_id")
      .select(col("doc_id"), explode(array(lit(0), lit(1))).as("v"))
      .withColumn("samples", expr(
        "transform(sequence(0L, 159L), i -> " +
          "(doc_id * (i * i * 101 + i * 31 + 7)) % 65000 " +
          "- 32500 + IF(v = 1, 3L, 0L))"))
      .withColumn("decoded", wavDec(wavEnc(col("samples"))))
      .select(col("doc_id"), col("v"), expr(
        "aggregate(sequence(0, 59), 0L, (acc, b) -> acc + " +
          "IF(element_at(decoded, CAST(((b + 1) * 159) div 60 " +
          "AS INT) + 1) > element_at(decoded, CAST((b * 159) " +
          "div 60 AS INT) + 1), shiftleft(1L, b), 0L))").as("f"))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    val fused = legacy.map { case (d, v, _) =>
      (d, v, MultimodalQ.audioFingerprint(d, v))
    }
    assert(legacy.toSeq === fused.toSeq)
    // and the fingerprint really has sign-of-delta structure (not all
    // zeros — the codec round-trip preserved the samples)
    assert(legacy.map(_._3).distinct.length > 10)
  }
}
