package graft.pipeline

/** Minimal reader/writer for NumPy's `.npy` array format (public spec:
  * numpy/lib/format.py — magic `\x93NUMPY`, version, ASCII header dict,
  * raw data) restricted to the weights-shipping subset: little-endian
  * float32 (`<f4`), C order, 1-D or 2-D. This is how real model weights
  * move between tools, and parsing it needs no dependency — the
  * [[LinearEmbedder]] companion to the y4m decoder's "real format, pure
  * JVM, provable offline" rule.
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte) ++ "NUMPY".getBytes("US-ASCII")

  /** (shape, row-major data). Rejects anything outside the supported
    * subset loudly — a silently misread weight matrix is the worst
    * possible failure mode for inference.
    */
  def read(bytes: Array[Byte]): (Seq[Int], Array[Float]) = {
    require(bytes.length > 10 &&
      Magic.indices.forall(i => bytes(i) == Magic(i)), "not an NPY file")
    val major = bytes(6)
    require(major == 1, s"unsupported NPY version $major (want 1.0)")
    val headerLen =
      (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8) // uint16 LE
    val header = new String(bytes, 10, headerLen, "US-ASCII")
    require(header.contains("'descr': '<f4'"),
      s"unsupported dtype in NPY header (want '<f4'): $header")
    require(header.contains("'fortran_order': False"),
      s"Fortran-order NPY not supported: $header")
    val shapeRe = "'shape':\\s*\\(([0-9, ]*)\\)".r
    val shape = shapeRe.findFirstMatchIn(header)
      .getOrElse(throw new IllegalArgumentException(
        s"no shape in NPY header: $header"))
      .group(1).split(',').map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    require(shape.nonEmpty && shape.size <= 2,
      s"only 1-D/2-D NPY supported, got shape $shape")
    val n = shape.product
    val dataOff = 10 + headerLen
    require(bytes.length == dataOff + 4 * n,
      s"NPY data size mismatch: ${bytes.length - dataOff} bytes for $n floats")
    val buf = java.nio.ByteBuffer.wrap(bytes, dataOff, 4 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    val out = new Array[Float](n)
    buf.get(out)
    (shape, out)
  }

  /** Row-major float32 `.npy` bytes (v1.0, 64-byte-aligned header as the
    * spec prescribes).
    */
  def write(shape: Seq[Int], data: Array[Float]): Array[Byte] = {
    require(shape.product == data.length,
      s"shape $shape does not cover ${data.length} floats")
    val shapeStr = shape.mkString("(", ", ", if (shape.size == 1) ",)" else ")")
    val base = s"{'descr': '<f4', 'fortran_order': False, " +
      s"'shape': $shapeStr, }"
    // pad with spaces + trailing \n so (10 + len) % 64 == 0
    val padded = base + " " * ((64 - (10 + base.length + 1) % 64) % 64) + "\n"
    val out = java.nio.ByteBuffer
      .allocate(10 + padded.length + 4 * data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(1.toByte).put(0.toByte)
      .putShort(padded.length.toShort)
      .put(padded.getBytes("US-ASCII"))
    data.foreach(out.putFloat)
    out.array()
  }
}

/** REAL model inference, pure JVM, provable offline — the [[Embedder]]
  * that closes the seam [[OnnxEmbedder]] can only exercise with runtime
  * jars present: an actual forward pass (feature extraction → dense →
  * ReLU → dense) over weights loaded from `.npy` files, not a hash stub.
  * Mirrors the reference's embedding stage shape (preprocess.py:192-265:
  * load weights once per worker in setup, embed shape-keyed batches).
  *
  * The feature extractor is shape-agnostic so ONE weight set serves every
  * (height, width) batch key: per channel, global mean/std/min/max (12
  * features) plus a 4×4 average-pooled grid (48), totalling 60. Then
  * `relu(f·W1 + b1)·W2 + b2`. Deterministic: plain float arithmetic in a
  * fixed order, no parallel reduction inside an image — identical logits
  * for identical pixels on any partitioning (LinearEmbedSpec asserts
  * both the golden forward pass and the partition invariance).
  *
  * `weightsDir` holds W1 (60×hidden), b1 (hidden), W2 (hidden×dim),
  * b2 (dim); [[LinearEmbedder.writeWeights]] generates a deterministic
  * seeded set for tests and smoke deployments.
  */
final class LinearEmbedder(weightsDir: String, override val dim: Int)
    extends Embedder {

  import LinearEmbedder.Features

  @transient private var w1: Array[Float] = _ // Features × hidden, row-major
  @transient private var b1: Array[Float] = _
  @transient private var w2: Array[Float] = _ // hidden × dim, row-major
  @transient private var b2: Array[Float] = _
  @transient private var hidden: Int = _

  override def cacheKey: String =
    s"${getClass.getName}#weights=$weightsDir#dim=$dim"

  override def setup(): Unit = {
    def load(name: String, wantRows: Option[Int]): (Seq[Int], Array[Float]) = {
      val p = java.nio.file.Paths.get(weightsDir, s"$name.npy")
      val (shape, data) = Npy.read(java.nio.file.Files.readAllBytes(p))
      wantRows.foreach(r => require(shape.head == r,
        s"$name.npy: expected leading dim $r, got ${shape.head}"))
      (shape, data)
    }
    val (s1, d1) = load("W1", Some(Features))
    require(s1.size == 2, s"W1 must be 2-D, got $s1")
    hidden = s1(1)
    w1 = d1
    b1 = load("b1", Some(hidden))._2
    val (s2, d2) = load("W2", Some(hidden))
    require(s2.size == 2 && s2(1) == dim,
      s"W2 must be ${hidden}x$dim, got $s2")
    w2 = d2
    b2 = load("b2", Some(dim))._2
  }

  override def embed(images: Seq[Array[Float]]): Seq[Array[Float]] = {
    require(w1 != null, "setup() not called — embed through Embed.run, " +
      "which initializes the per-JVM singleton")
    images.map { img =>
      val f = LinearEmbedder.features(img)
      val h = new Array[Float](hidden)
      var j = 0
      while (j < hidden) {
        var acc = b1(j).toDouble
        var i = 0
        while (i < Features) { acc += f(i) * w1(i * hidden + j); i += 1 }
        h(j) = math.max(0.0, acc).toFloat // ReLU
        j += 1
      }
      val out = new Array[Float](dim)
      var k = 0
      while (k < dim) {
        var acc = b2(k).toDouble
        var j2 = 0
        while (j2 < hidden) { acc += h(j2) * w2(j2 * dim + k); j2 += 1 }
        out(k) = acc.toFloat
        k += 1
      }
      out
    }
  }
}

object LinearEmbedder {

  /** 3 channels × (mean, std, min, max) + 3 channels × 4×4 pooled grid. */
  val Features: Int = 12 + 48

  /** Shape-agnostic feature vector of an interleaved-RGB float image.
    * Pixel count is derived from the array (images arrive as H·W·3
    * floats); the 4×4 grid treats the image as row-major with width
    * unknown — cells partition the PIXEL SEQUENCE, which for row-major
    * data is a horizontal banding (deterministic, shape-stable, and
    * sufficient for a projection feature; a real conv stem would need
    * H/W, which the caller has and a future Embedder can thread
    * through).
    */
  private[pipeline] def features(img: Array[Float]): Array[Float] = {
    val n = img.length / 3
    require(n > 0 && img.length % 3 == 0,
      s"image must be interleaved RGB floats, got length ${img.length}")
    val f = new Array[Float](Features)
    var c = 0
    while (c < 3) {
      var sum = 0.0; var sq = 0.0
      var mn = Float.MaxValue; var mx = Float.MinValue
      var i = 0
      while (i < n) {
        val v = img(i * 3 + c)
        sum += v; sq += v * v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      val mean = sum / n
      f(c * 4) = mean.toFloat
      f(c * 4 + 1) = math.sqrt(math.max(0.0, sq / n - mean * mean)).toFloat
      f(c * 4 + 2) = mn
      f(c * 4 + 3) = mx
      // 4×4 pooled grid over the pixel sequence, 16 cells per channel
      var cell = 0
      while (cell < 16) {
        val s = cell * n / 16
        val e = math.max(s + 1, (cell + 1) * n / 16)
        var acc = 0.0
        var p = s
        while (p < e && p < n) { acc += img(p * 3 + c); p += 1 }
        f(12 + c * 16 + cell) = (acc / math.max(1, math.min(e, n) - s)).toFloat
        cell += 1
      }
      c += 1
    }
    f
  }

  /** Deterministic seeded weight set (xorshift over the seed) written as
    * `.npy` files — a reproducible "model" for tests and smoke
    * deployments; swap the directory for trained weights in production.
    */
  def writeWeights(dir: String, hidden: Int, dim: Int,
      seed: Long = 42L): Unit = {
    var x = seed | 1L
    def next(): Float = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (((x >>> 16) & 0xffff) / 65536.0f - 0.5f) * 0.2f
    }
    def gen(n: Int): Array[Float] = Array.fill(n)(next())
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    def put(name: String, shape: Seq[Int]): Unit =
      java.nio.file.Files.write(d.resolve(s"$name.npy"),
        Npy.write(shape, gen(shape.product)))
    put("W1", Seq(Features, hidden))
    put("b1", Seq(hidden))
    put("W2", Seq(hidden, dim))
    put("b2", Seq(dim))
  }
}
