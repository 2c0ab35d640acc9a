package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

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

  /**
   * Streaming form of `Windows.slidingCountRollup`: two chained stateful
   * window aggregations (Spark ≥3.4 supports `window()` over a window
   * column) — rows aggregate into tumbling slide-width slices, closed
   * slices roll up into the sliding windows containing them. Shuffle and
   * state volume scale with |keys × slices|, not size/slide × rows.
   * Append mode: a window emits once its last slice's watermark passes.
   */
  def slidingCountRollupStream(df: DataFrame, tsCol: String, keys: Seq[String],
                               sizeSec: Long, slideSec: Long,
                               watermarkDelay: String): DataFrame = {
    require(sizeSec % slideSec == 0, "size must be a multiple of slide")
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), s"$slideSec seconds") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("_slice_cnt"))
      .groupBy((window(col("window"), s"$sizeSec seconds", s"$slideSec seconds") +: keys.map(col)): _*)
      .agg(sum(col("_slice_cnt")).as("cnt"))
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
      // dedup key = (value, containing window): the window struct derives
      // from the watermarked event time, so dedup state for a window is
      // evicted once the watermark passes it
      .withColumn("_w", window(col(tsCol), size))
      .dropDuplicates(distinctCol, "_w")
      .groupBy(col("_w"))
      .agg(count(lit(1)).as("uv"))
      .select(col("_w.end").cast("long").as("window_end"), col("uv"))

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

  /** Per-window bloom-bitmap UV state: fixed-size bitmap + running count —
    * the reference's Redis bitmap (`setbit`/`getbit`,
    * UvCountWithBloomFilterApp.java:100-126) as Spark-managed state. */
  final case class BloomUvState(bitmap: Array[Byte], uv: Long)

  final case class UvUpdate(window_end: Long, uv: Long)

  /**
   * W9/A7/K3 — per-event UV emission (FIRE_AND_PURGE parity,
   * UvCountWithBloomFilterApp.java:64-161): keyed by tumbling window end,
   * every arriving event tests-and-sets its user's bit in a bounded bitmap
   * and emits the running UV. Memory is `2^bitsLog2 / 8` bytes per open
   * window regardless of cardinality (the reference used 2^29 bits in
   * Redis); collisions undercount exactly like the reference's bloom.
   * Event-time timeout evicts a window's bitmap once the watermark passes.
   *
   * `events` needs `ts` (timestamp) and `user` columns.
   */
  def perEventUv(events: DataFrame, windowSize: String,
                 watermarkDelay: String, bitsLog2: Int = 20): Dataset[UvUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val sizeBytes = 1 << (bitsLog2 - 3)
    val mask = (1L << bitsLog2) - 1L
    events
      .select(window(col("ts"), windowSize).getField("end").as("we"),
        col("user").cast("long").as("user"))
      .withWatermark("we", watermarkDelay)
      .as[(java.sql.Timestamp, Long)]
      .groupByKey(_._1.getTime / 1000L)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (windowEnd: Long, rows: Iterator[(java.sql.Timestamp, Long)],
         state: GroupState[BloomUvState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(BloomUvState(new Array[Byte](sizeBytes), 0L))
            val out = ArrayBuffer.empty[UvUpdate]
            rows.foreach { case (_, user) =>
              // reference's 31-polynomial hash intent → any stable hash; use
              // a mixed multiplicative hash of the user id
              val h = (java.lang.Long.rotateLeft(user * 0x9E3779B97F4A7C15L, 31) & mask).toInt
              val byteIdx = h >>> 3
              val bit = (1 << (h & 7)).toByte
              val seen = (st.bitmap(byteIdx) & bit) != 0
              if (!seen) {
                st.bitmap(byteIdx) = (st.bitmap(byteIdx) | bit).toByte
                st = BloomUvState(st.bitmap, st.uv + 1)
              }
              out += UvUpdate(windowEnd, st.uv) // emit per event (FIRE_AND_PURGE)
            }
            state.update(st)
            // evict this window's bitmap once the watermark passes its end
            state.setTimeoutTimestamp(math.max(windowEnd * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }
}
