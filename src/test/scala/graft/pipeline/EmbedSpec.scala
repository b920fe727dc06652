package graft.pipeline

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicInteger

/** Records setup() calls so the per-JVM singleton contract is observable. */
class CountingEmbedder(override val dim: Int) extends Embedder {
  override def setup(): Unit = { CountingEmbedder.setups.incrementAndGet(); () }
  override def embed(images: Seq[Array[Float]]): Seq[Array[Float]] = {
    CountingEmbedder.batches.add(images.size)
    images.map(img => Array.fill(dim)(img.headOption.getOrElse(0f)))
  }
}
object CountingEmbedder {
  val setups = new AtomicInteger(0)
  val batches = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
}

class EmbedSpec extends SparkSpec {
  import spark.implicits._

  private def frame(f: String, ts: Long, h: Int = 2, w: Int = 2,
      ds: String = "train") =
    FrameRow(f, "l", ds, ts, 2.0, 1.0, h, w,
      Array.fill(h * w * 3)(ts.toFloat))

  test("O8 batching: full batches plus straggler flush cover every row") {
    CountingEmbedder.batches.clear()
    val frames = (1 to 7).map(i => frame("a.mp4", i.toLong))
    val ds = spark.createDataset(frames).repartition(1)
    val out = Embed.run(ds, new CountingEmbedder(8), batchSize = 3).collect()
    assert(out.length === 7)
    // one partition: 3+3 full batches then a 1-row end-of-iterator flush
    val sizes = {
      import scala.jdk.CollectionConverters._
      CountingEmbedder.batches.asScala.map(_.toInt).toSeq.sorted
    }
    assert(sizes === Seq(1, 3, 3))
    assert(out.forall(_.logits.length === 8))
    // logits preserve row identity (stub embeds first pixel = timestamp)
    assert(out.map(e => (e.timestamp_ms, e.logits(0).toLong)).toSeq.sorted ===
      (1 to 7).map(i => (i.toLong, i.toLong)))
  }

  test("O8 shape-keyed batching: mixed shapes never share a batch") {
    CountingEmbedder.batches.clear()
    val frames = (1 to 4).map(i => frame("a.mp4", i.toLong, h = 2)) ++
      (5 to 8).map(i => frame("a.mp4", i.toLong, h = 4))
    val ds = spark.createDataset(frames).repartition(1)
    val out = Embed.run(ds, new CountingEmbedder(4), batchSize = 10).collect()
    assert(out.length === 8)
    // batchSize 10 never reached → exactly one flush per shape key
    import scala.jdk.CollectionConverters._
    assert(CountingEmbedder.batches.asScala.map(_.toInt).toSeq.sorted ===
      Seq(4, 4))
  }

  test("O8 singleton: setup runs once per JVM per cacheKey, not per task") {
    val before = CountingEmbedder.setups.get()
    val frames = (1 to 20).map(i => frame("a.mp4", i.toLong))
    val ds = spark.createDataset(frames).repartition(4)
    Embed.run(ds, new CountingEmbedder(8), batchSize = 4).collect()
    Embed.run(ds, new CountingEmbedder(8), batchSize = 4).collect()
    // local[2]: tasks run in this JVM; 8 task-level deserialized copies but
    // at most one setup() for this (class, dim) key
    assert(CountingEmbedder.setups.get() - before <= 1)
  }

  test("O8 differently-configured embedders get distinct singletons") {
    val a = Embed.shared(new CountingEmbedder(4))
    val b = Embed.shared(new CountingEmbedder(16))
    assert(a.dim === 4)
    assert(b.dim === 16) // pre-fix both keys collapsed to the class name
  }

  test("O8 HashEmbedder is deterministic and image-sensitive") {
    val e = new HashEmbedder(dim = 32)
    val img1 = Array.fill(12)(0.5f)
    val img2 = Array.fill(12)(0.25f)
    assert(e.embed(Seq(img1))(0).sameElements(e.embed(Seq(img1))(0)))
    assert(!e.embed(Seq(img1))(0).sameElements(e.embed(Seq(img2))(0)))
  }
}
