package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codec for RIFF/WAVE PCM16 — the audio rung of the
  * multimodal family's "real format, pure JVM, provable offline" rule
  * (y4m covers raw video, MJPEG-AVI compressed video, `.npy` model
  * weights; WAV is how raw audio actually ships). PCM16 is lossless,
  * so an encode→decode round trip is BIT-EXACT — which is what lets
  * `mm_audio_features` push its feature math through REAL container
  * bytes and still hash-match a DuckDB oracle that never saw them.
  *
  * Format (public spec: RIFF WAVE, fmt chunk per the Microsoft
  * WAVEFORMAT layout): `RIFF <size> WAVE`, a 16-byte `fmt ` chunk
  * (PCM tag 1, channels, sample rate, byte rate, block align, 16
  * bits), then `data` with little-endian 16-bit samples. The writer
  * emits the canonical minimal layout — exactly 44 + 2·n bytes for
  * mono — and the reader walks chunks, so extra metadata chunks
  * (LIST/INFO, fact) from other writers parse fine. WavCodecSpec
  * cross-validates BOTH directions against `javax.sound.sampled`
  * (every JRE ships a WAVE reader/writer), the Npy-vs-numpy
  * discipline.
  */
object WavCodec {

  /** True iff `bytes` is a RIFF WAVE stream. */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
      bytes(11) == 'E'

  /** Mono-or-interleaved PCM16 samples → one WAV file's bytes. */
  def encode(samples: Array[Short], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    require(sampleRate > 0, s"sample rate must be positive, got $sampleRate")
    require(channels > 0, s"channels must be positive, got $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not divide into $channels channels")
    val dataLen = 2 * samples.length
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1) // PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2 * channels) // byte rate
    b.putShort((2 * channels).toShort) // block align
    b.putShort(16) // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** WAV bytes → (sampleRate, channels, interleaved PCM16 samples).
    * Rejects anything outside PCM16 loudly — silently misread audio is
    * the worst failure mode for a feature extractor.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(sniff(bytes), "not a RIFF WAVE stream")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    var sampleRate = 0
    var channels = 0
    var samples: Array[Short] = null
    var pos = 12
    val end = math.min(bytes.length.toLong, u32(4) + 8).toInt
    while (pos + 8 <= end) {
      val fcc = new String(bytes, pos, 4, "US-ASCII")
      val len = u32(pos + 4)
      require(len <= Int.MaxValue && pos + 8 + len <= end,
        s"WAV chunk $fcc at byte $pos overruns the file")
      val l = len.toInt
      if (fcc == "fmt ") {
        require(l >= 16, s"fmt chunk too short: $l bytes")
        val tag = u16(pos + 8)
        require(tag == 1, s"unsupported WAV format tag $tag (want 1 = PCM)")
        channels = u16(pos + 10)
        sampleRate = u32(pos + 12).toInt
        val bits = u16(pos + 22)
        require(bits == 16, s"unsupported bit depth $bits (want 16)")
      } else if (fcc == "data") {
        require(sampleRate > 0,
          "WAV data chunk before fmt — unsupported layout")
        val buf = ByteBuffer.wrap(bytes, pos + 8, l)
          .order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
        samples = new Array[Short](l / 2)
        buf.get(samples)
      }
      pos += 8 + l + (l & 1) // RIFF even padding
    }
    require(samples != null, "WAV carries no data chunk")
    require(channels > 0, "WAV carries no fmt chunk")
    (sampleRate, channels, samples)
  }
}
