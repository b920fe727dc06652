package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** PngCodec vs the JRE's own PNG reader/writer, BOTH directions — the
  * Npy-vs-numpy / WavCodec-vs-javax.sound discipline: two independent
  * implementations of the public spec agreeing byte-for-byte on pixels
  * is the strongest offline proof a sandbox permits. The ImageIO
  * encoder picks scanline filters adaptively, so decoding ITS output
  * exercises the Sub/Up/Average/Paeth reconstruction paths our writer
  * (filter 0 only) never emits.
  */
class PngCodecSpec extends AnyFunSuite {

  /** Deterministic gradient-plus-noise pixels: gradients make adaptive
    * encoders choose predictive filters, the hash term stops the image
    * from being trivially flat.
    */
  private def pixels(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      var v = seed * 0x9E3779B9 + i * 0x85EBCA6B
      v ^= (v >>> 15)
      val r = (x * 255 / math.max(w - 1, 1)) & 0xff
      val g = (y * 255 / math.max(h - 1, 1)) & 0xff
      val b = v & 0xff
      (r << 16) | (g << 8) | b
    }

  private def toImage(w: Int, h: Int, rgb: Array[Int],
      imgType: Int = BufferedImage.TYPE_INT_RGB): BufferedImage = {
    val img = new BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, 0xff000000 | rgb(y * w + x))
    img
  }

  private def fromImage(img: BufferedImage): Array[Int] =
    Array.tabulate(img.getWidth * img.getHeight)(i =>
      img.getRGB(i % img.getWidth, i / img.getWidth) & 0xffffff)

  private def imageIoPng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out), "JRE PNG writer unavailable")
    out.toByteArray
  }

  test("our encode → JRE decode: pixels byte-identical") {
    for ((w, h, seed) <- Seq((16, 9, 1), (1, 1, 2), (33, 7, 3))) {
      val rgb = pixels(w, h, seed)
      val img = ImageIO.read(new ByteArrayInputStream(
        PngCodec.encode(w, h, rgb)))
      assert(img.getWidth === w && img.getHeight === h)
      assert(fromImage(img).toSeq === rgb.toSeq, s"${w}x$h")
    }
  }

  test("JRE encode → our decode: pixels byte-identical (adaptive filters)") {
    for ((w, h, seed) <- Seq((64, 48, 4), (5, 40, 5))) {
      val rgb = pixels(w, h, seed)
      val (gw, gh, got) = PngCodec.decode(imageIoPng(toImage(w, h, rgb)))
      assert((gw, gh) === ((w, h)))
      assert(got.toSeq === rgb.toSeq, s"${w}x$h")
    }
  }

  test("JRE ARGB encode (color type 6) → our decode drops alpha, RGB exact") {
    val (w, h) = (24, 10)
    val rgb = pixels(w, h, 6)
    val bytes = imageIoPng(toImage(w, h, rgb, BufferedImage.TYPE_INT_ARGB))
    val (gw, gh, got) = PngCodec.decode(bytes)
    assert((gw, gh) === ((w, h)))
    assert(got.toSeq === rgb.toSeq)
  }

  test("lossless round trip through our own writer") {
    val rgb = pixels(31, 17, 7)
    val (w, h, got) = PngCodec.decode(PngCodec.encode(31, 17, rgb))
    assert((w, h) === ((31, 17)))
    assert(got.toSeq === rgb.toSeq)
  }

  test("sniff + corruption fail loudly, never fabricate pixels") {
    val good = PngCodec.encode(8, 8, pixels(8, 8, 8))
    assert(PngCodec.sniff(good))
    assert(!PngCodec.sniff("not a png".getBytes))
    // flip one IDAT payload byte: the chunk CRC must catch it
    val flipped = good.clone()
    flipped(60) = (flipped(60) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(flipped))
    assert(e.getMessage.contains("CRC"))
    // truncation fails loudly too
    intercept[IllegalArgumentException](
      PngCodec.decode(good.dropRight(20)))
  }
}
