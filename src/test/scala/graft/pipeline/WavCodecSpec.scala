package graft.pipeline

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** [[WavCodec]]: real RIFF/WAVE PCM16, cross-validated in BOTH
  * directions against the JRE's own `javax.sound.sampled` WAVE
  * reader/writer (the Npy-vs-numpy discipline) — pure JVM, no Spark.
  */
class WavCodecSpec extends AnyFunSuite {

  private val pcm: Array[Short] =
    Array.tabulate(200)(i => ((i * i * 37 + 11 * i) % 65536 - 32768).toShort)

  test("encode -> decode round-trips bit-exactly, canonical 44-byte header") {
    val bytes = WavCodec.encode(pcm, 8000)
    assert(bytes.length === 44 + 2 * pcm.length) // the minimal layout
    val (sr, ch, back) = WavCodec.decode(bytes)
    assert(sr === 8000 && ch === 1)
    assert(back.toSeq === pcm.toSeq)
    // stereo interleave round-trips too
    val st = WavCodec.encode(pcm, 44100, channels = 2)
    val (sr2, ch2, back2) = WavCodec.decode(st)
    assert(sr2 === 44100 && ch2 === 2 && back2.toSeq === pcm.toSeq)
  }

  test("the JRE's own WAVE reader decodes our bytes to the same PCM") {
    val bytes = WavCodec.encode(pcm, 8000)
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate === 8000f)
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    val raw = ais.readAllBytes()
    assert(raw.length === 2 * pcm.length)
    val theirs = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val out = new Array[Short](pcm.length)
    theirs.get(out)
    assert(out.toSeq === pcm.toSeq)
  }

  test("our reader decodes the JRE writer's bytes to the same PCM") {
    // AudioSystem writes its own WAVE layout (it may differ from the
    // canonical minimal one) — the chunk-walking reader must not care
    val fmt = new AudioFormat(16000f, 16, 1, true, false) // signed LE
    val raw = new Array[Byte](2 * pcm.length)
    val bb = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    pcm.foreach(bb.putShort)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, pcm.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val (sr, ch, back) = WavCodec.decode(out.toByteArray)
    assert(sr === 16000 && ch === 1)
    assert(back.toSeq === pcm.toSeq)
  }

  test("malformed input fails loudly") {
    intercept[IllegalArgumentException](
      WavCodec.decode("not audio at all".getBytes))
    val good = WavCodec.encode(pcm, 8000)
    intercept[IllegalArgumentException](
      WavCodec.decode(good.dropRight(3))) // truncated data chunk
    // a float-PCM tag (3) is rejected by NAME, not misread as int16
    val bad = good.clone()
    bad(20) = 3 // fmt audioFormat tag
    val e = intercept[IllegalArgumentException](WavCodec.decode(bad))
    assert(e.getMessage.contains("format tag 3"))
    intercept[IllegalArgumentException](
      WavCodec.encode(pcm, 8000, channels = 3)) // 200 % 3 != 0
  }
}
