package graft.ops

import org.apache.spark.sql.DataFrame

/** The one materialization seam for every lineage-truncation point in the
  * engine (iterative Components rounds, shared LSH signature passes, IVF
  * quantization reused by codebook + probes + candidates).
  *
  * Local mode runs `localCheckpoint()` — executor-memory blocks, no
  * filesystem, and `local[]` has no executor loss to survive. On a real
  * cluster, executor loss makes localCheckpoint blocks irrecoverable and
  * the now-truncated lineage cannot recompute them, failing the job; set
  * `spark.graft.checkpointDir` to a cluster-visible path (HDFS/object
  * store) and every site routes through reliable `checkpoint()` instead —
  * same plan-size and recompute guarantees, plus fault tolerance. One
  * config flip, no code change: exactly the 100 TB note PLAN_AUDIT.md
  * carries, made executable.
  */
object Materialize {

  /** Spark SQL conf key: when set, [[materialize]] uses reliable
    * `checkpoint()` rooted here; when absent, `localCheckpoint()`.
    */
  val ConfKey = "spark.graft.checkpointDir"

  implicit final class MaterializeOps(private val df: DataFrame)
      extends AnyVal {

    /** Truncate lineage and materialize `df` eagerly, reliably when
      * [[ConfKey]] is set. The SparkContext checkpoint dir is pointed at
      * the configured root on first use (checkpoint() requires it;
      * setCheckpointDir appends a per-context unique subdir, so the first
      * materialize wins and later conf edits in the same context are
      * ignored rather than scattering files).
      */
    def materialize(): DataFrame = {
      val spark = df.sparkSession
      spark.conf.getOption(ConfKey) match {
        case Some(dir) if dir.nonEmpty =>
          val sc = spark.sparkContext
          if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
          df.checkpoint()
        case _ => df.localCheckpoint()
      }
    }
  }

  /** Materialize INDEPENDENT frames concurrently (guide §2.6: actions
    * are only sequential because the driver calls them sequentially).
    * Each checkpoint is its own Spark job; submitting them from a small
    * thread pool lets the second job's tasks back-fill executors idled
    * by the first job's tail — the two LSH passes that share one
    * shingle checkpoint (signatures, ground-truth pairs) overlap this
    * way. Callers must pass frames with NO dependency on each other's
    * materialization (both may share already-materialized upstreams).
    * FIFO scheduling preserves back-fill; results return in input
    * order; a failure in any job rethrows.
    */
  def materializeAll(dfs: DataFrame*): Seq[DataFrame] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    if (dfs.sizeIs <= 1) dfs.map(_.materialize())
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(dfs.size)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      try Await.result(
        Future.sequence(dfs.map(df => Future(df.materialize()))),
        Duration.Inf)
      finally pool.shutdown()
    }
  }
}
