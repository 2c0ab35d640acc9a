package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Windows

/**
 * Streaming window aggregation — the Structured-Streaming twins of
 * [[graft.operators.Windows]] (SURVEY.md §2.3 W3-W9). Watermarks replace
 * the reference's timestamp extractors (§2.6): ascending → "0 seconds",
 * BoundedOutOfOrderness(n) → "n seconds"; allowedLateness(60 s) (W7) →
 * a watermark delayed by the lateness horizon + update output mode, which
 * re-emits the corrected (key, window) row exactly like the reference's
 * own late-update dedup fix (HotUrlApp2.java:111-190).
 */
object StreamWindows {

  /** W3/W4 — sliding event-time window count per key, watermarked.
    * Late rows inside the delay re-fire the window in update mode;
    * rows later than the watermark are dropped and counted in
    * `StreamingQueryProgress.stateOperators.numRowsDroppedByWatermark`
    * (the W8 side-output accounting). */
  def slidingCountStream(df: DataFrame, tsCol: String, keys: Seq[String],
                         size: String, slide: String,
                         watermarkDelay: String): DataFrame = {
    val w = window(col(tsCol), size, slide)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((w +: keys.map(col)): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(keys.map(col) :+ col("window.end").cast("long").as("window_end") :+ col("cnt"): _*)
  }

  /** W5/W6 — tumbling event-time window count (empty keys = all-window). */
  def tumblingCountStream(df: DataFrame, tsCol: String, keys: Seq[String],
                          size: String, watermarkDelay: String): DataFrame = {
    val w = window(col(tsCol), size)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((w +: keys.map(col)): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(keys.map(col) :+ col("window.end").cast("long").as("window_end") :+ col("cnt"): _*)
  }

  /** A5 streaming — exact distinct per tumbling window via
    * watermark-scoped dropDuplicates (state is evicted once the window
    * falls behind the watermark; the reference buffered a HashSet per
    * window, UvCountApp.java:58-79). */
  def distinctCountStream(df: DataFrame, tsCol: String, distinctCol: String,
                          size: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(Seq(distinctCol, tsCol))
      .groupBy(window(col(tsCol), size))
      .agg(count(lit(1)).as("uv"))
      .select(col("window.end").cast("long").as("window_end"), col("uv"))

  /** A7 streaming — approximate distinct per window (HLL++), replaces the
    * bloom-filter + Redis bitmap (UvCountWithBloomFilterApp.java:87-161). */
  def approxDistinctStream(df: DataFrame, tsCol: String, distinctCol: String,
                           size: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), size))
      .agg(approx_count_distinct(col(distinctCol)).as("uv_approx"))
      .select(col("window.end").cast("long").as("window_end"), col("uv_approx"))

  /**
   * A6 streaming — Top-N per window via `foreachBatch`: rank-over-update
   * isn't supported inside an append streaming plan (SURVEY.md §7.4), so
   * each micro-batch of *updated window counts* is re-ranked and handed to
   * `sink`. With update output mode this reproduces the reference's
   * per-watermark Top-N emission (TopNItemIdCountProcessFunc,
   * HotItemApp.java:107-179): later batches re-emit a corrected ranking
   * for a window when late data lands inside the watermark delay.
   */
  def topNPerWindowStream(counts: DataFrame, partCols: Seq[String],
                          orderCol: String, tieBreak: String, n: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    counts.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        sink(Windows.topNPerWindow(batch, partCols, orderCol, tieBreak, n), batchId)
    }

  /** Convenience: run an AvailableNow pass writing top-N per window into an
    * in-memory list via the sink callback (tests / bounded replay). */
  def runTopNAvailableNow(counts: DataFrame, partCols: Seq[String],
                          orderCol: String, tieBreak: String, n: Int)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    topNPerWindowStream(counts, partCols, orderCol, tieBreak, n)(sink)
      .trigger(Trigger.AvailableNow()).start()
}
