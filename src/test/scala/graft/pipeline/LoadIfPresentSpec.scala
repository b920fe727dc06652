package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The production decoder/embedder bind their native runtimes (JavaCV,
  * ONNX Runtime) reflectively. This offline container has neither, which
  * is exactly the environment the graceful seam exists for: the `or*`
  * factories must fall back to the deterministic implementations, and the
  * hard constructors must fail with an actionable message — never an
  * opaque ClassNotFoundException from deep inside a Spark task.
  */
class LoadIfPresentSpec extends AnyFunSuite {

  test("FFmpeg seam falls back to the synthetic decoder offline") {
    assert(!FfmpegFrameDecoder.available)
    assert(FfmpegFrameDecoder.orSynthetic().isInstanceOf[SyntheticFrameDecoder])
    val e = intercept[IllegalArgumentException](
      new FfmpegFrameDecoder().decode("x.mp4", null, 500).toList)
    assert(e.getMessage.contains("orSynthetic"))
  }

  test("ONNX seam falls back to the hash embedder offline") {
    assert(!OnnxEmbedder.available)
    val fallback = OnnxEmbedder.orHash("/models/m.onnx", Seq(299, 299, 3),
      dim = 32)
    assert(fallback.isInstanceOf[HashEmbedder])
    assert(fallback.dim === 32)
    val e = intercept[IllegalArgumentException](
      new OnnxEmbedder("/models/m.onnx", Seq(299, 299, 3)).setup())
    assert(e.getMessage.contains("orHash"))
  }

  test("uninitialized OnnxEmbedder refuses to embed outside Embed.run") {
    val e = intercept[IllegalArgumentException](
      new OnnxEmbedder("/m.onnx", Seq(2)).embed(Seq(Array(1f, 2f))))
    assert(e.getMessage.contains("Embed.run"))
  }
}
