package graft.pipeline

import graft.SparkSpec
import java.io.ByteArrayOutputStream

class DebugSinkSpec extends SparkSpec {
  import spark.implicits._

  test("print runs the lineage executor-side; show is bounded") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    // print: foreach(println) must traverse every row without collecting;
    // prove traversal with an accumulator on the same lineage shape
    val acc = spark.sparkContext.longAccumulator("rows")
    df.foreach { r => acc.add(1); println(r) }
    assert(acc.value === 3)
    DebugSink.print(df) // and the sink itself runs clean

    // show: driver-side, bounded — capture via Console (same thread)
    val buf = new ByteArrayOutputStream()
    Console.withOut(buf) { DebugSink.show(df, n = 2) }
    val out = buf.toString
    assert(out.contains("only showing top 2 rows"))
    assert(out.contains("a") && out.contains("b"))
    assert(!out.linesIterator.exists(_.contains("| c")), "n=2 must bound rows")
  }
}
