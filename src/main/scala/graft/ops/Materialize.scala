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
}
