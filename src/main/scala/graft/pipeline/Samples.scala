package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O9-O17 — sample assembly: regroup frames into training samples by mode,
  * sort each sample's frames by timestamp, and pivot list-of-frames into
  * struct-of-arrays (reference: preprocess.py:283-368, 399-406).
  *
  * All three modes are single-shuffle (or shuffle-free for single_frame):
  * the group key is (window,)? filename (+ functionally-dependent context
  * columns, grouped rather than re-joined), the per-sample sort happens on
  * the collected array via `sort_array` — never a global sort — and the
  * pivot is a pure projection (`transform`) over the sorted array, exactly
  * the plan shape that survives a 100× scale-up.
  */
object Samples {

  /** Context columns: per-video scalars (reference features.py:30-35). */
  val contextCols: Seq[String] =
    Seq("filename", "label", "dataset", "frame_per_sec", "frame_total")

  /** O16+O17 — given a grouped array of frame structs, emit one column per
    * list feature, each sorted by timestamp_ms. `sort_array` on an array of
    * structs orders by fields in struct order, so timestamp_ms is placed
    * first to make it the sort key (ties then break deterministically on the
    * remaining fields).
    */
  private def pivoted(listCols: Seq[String]): Seq[Column] = {
    val sorted = sort_array(col("frames"))
    listCols.map(c => transform(sorted, f => f(c)).as(c))
  }

  private def frameStruct(listCols: Seq[String]): Column =
    struct((col("timestamp_ms") +: listCols.filter(_ != "timestamp_ms")
      .map(col)): _*).as("frames")

  /** O15 — single_frame mode: every frame is its own sample; the "lists"
    * are one-element arrays. Shuffle-free.
    */
  def singleFrame(frames: DataFrame, listCols: Seq[String]): DataFrame =
    frames
      .withColumn("frames", array(frameStruct(listCols)))
      .select(contextCols.map(col) ++ pivoted(listCols): _*)

  /** O14 — full_video mode: all frames of one video form one sample. */
  def fullVideo(frames: DataFrame, listCols: Seq[String]): DataFrame =
    frames
      .groupBy(contextCols.map(col): _*)
      .agg(collect_list(frameStruct(listCols)).as("frames"))
      .select(contextCols.map(col) ++ pivoted(listCols): _*)

  /** O9-O13 — crop_video mode: sliding event-time windows over each video's
    * timeline; a (window, video) group is one sample. A window is kept iff
    * its end equals the sequence length OR it lies entirely inside the video
    * (start >= 0 and end <= video_length) — the reference's exact rule
    * (preprocess.py:293-296; video_length = 1000 * frame_total /
    * frame_per_sec).
    *
    * The validity predicate runs BEFORE the groupBy: both its inputs
    * (window bounds, per-video length) exist pre-aggregation, so invalid
    * windows' frames — up to size/period copies per frame — are filtered out
    * ahead of the shuffle instead of being collected into arrays and thrown
    * away after it.
    *
    * `period == sequenceLength` degenerates to tumbling windows, like the
    * reference's default (preprocess.py:330).
    */
  def cropVideo(frames: DataFrame, listCols: Seq[String],
      sequenceLengthMs: Long, periodMs: Long): DataFrame =
    cropAssemble(
      frames.withColumn("ts", timestamp_millis(col("timestamp_ms"))),
      listCols, sequenceLengthMs, periodMs)

  /** Shared crop_video core over a frame set that already carries an
    * event-time `ts` column — the batch path adds `ts` directly; the
    * Structured Streaming path (graft.streaming.StreamingCrop) adds it plus
    * a watermark. Same lineage otherwise, which is what makes batch ≡
    * streaming checkable.
    *
    * The groupBy keys on the `window()` struct itself (not the unpacked
    * millis): in streaming, state eviction by watermark requires the
    * window column; in batch the plan is identical either way.
    */
  private[graft] def cropAssemble(framesWithTs: DataFrame,
      listCols: Seq[String], sequenceLengthMs: Long,
      periodMs: Long): DataFrame = {
    val videoLengthMs = lit(1000.0) * col("frame_total") / col("frame_per_sec")
    framesWithTs
      .withColumn("w", window(col("ts"),
        s"$sequenceLengthMs milliseconds", s"$periodMs milliseconds"))
      .filter(unix_millis(col("w.end")) === lit(sequenceLengthMs) ||
        (unix_millis(col("w.start")) >= 0 &&
          unix_millis(col("w.end")) <= videoLengthMs))
      .groupBy((col("w") +: contextCols.map(col)): _*)
      .agg(collect_list(frameStruct(listCols)).as("frames"))
      .select((Seq(unix_millis(col("w.start")).as("window_start"),
        unix_millis(col("w.end")).as("window_end")) ++
        contextCols.map(col) ++ pivoted(listCols)): _*)
  }
}
