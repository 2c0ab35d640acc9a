package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Windows
import graft.streaming.StreamWindows

/**
 * HotUrl query family (HotUrlApp.java:110-192, HotUrlApp2.java:111-190):
 * top-5 URLs per sliding 10 min / 5 s window over apache access logs,
 * GET requests only, 1 s bounded out-of-orderness; the App2 variant adds
 * allowedLateness(60 s) + late-update dedup (W7/W8).
 *
 * Batch form runs on a parsed apache log DataFrame (CsvSources.apacheLog);
 * the streaming form takes the same shape with a watermark. The reference's
 * 60 s allowedLateness maps to `watermarkDelay = "61 seconds"` + update
 * mode (SURVEY.md §2.3 W7).
 */
object HotUrl {

  /** Batch: filter GET → sliding 10min/5s per-url counts → top-5/window. */
  def hotUrls(apacheLog: DataFrame, n: Int = 5,
              size: String = "10 minutes", slide: String = "5 seconds"): DataFrame = {
    val gets = apacheLog.filter(col("method") === "GET").select(col("ts"), col("url"))
    val counts = Windows.slidingCount(gets, "ts", Seq("url"), size, slide)
    Windows.topNPerWindow(counts, Seq("window_end"), "cnt", "url", n)
      .select(col("url"), col("window_end"), col("cnt"), col("rn"))
  }

  /** Streaming: same pipeline over a streaming apache-log DataFrame;
    * returns the windowed counts (rank happens in foreachBatch — see
    * [[StreamWindows.topNPerWindowStream]]). `watermarkDelay` = "1 second"
    * for HotUrlApp parity, "61 seconds" for the allowedLateness variant. */
  def hotUrlCountsStream(apacheLog: DataFrame,
                         watermarkDelay: String = "1 second",
                         size: String = "10 minutes", slide: String = "5 seconds"): DataFrame = {
    val gets = apacheLog.filter(col("method") === "GET").select(col("ts"), col("url"))
    StreamWindows.slidingCountStream(gets, "ts", Seq("url"), size, slide, watermarkDelay)
  }

  /**
   * The reference's full HotUrlApp topology (HotUrlApp.java:52-72): the main
   * windowed path plus the TAGGED LATE STREAM as data. Spark has no in-plan
   * stream split, so the side output maps to a second consumer of the same
   * source (each query keeps its own offsets — the standard Structured
   * Streaming fan-out): the first element is the windowed-counts stream
   * (start it with [[StreamWindows.topNPerWindowStream]] for the rank), the
   * second a writer that surfaces rows behind the watermark to `lateSink`
   * as DataFrames via [[StreamWindows.lateRowSideOutput]].
   */
  def hotUrlCountsWithLate(apacheLog: DataFrame, delaySec: Long = 1L,
                           size: String = "10 minutes", slide: String = "5 seconds")(
      lateSink: (DataFrame, Long) => Unit):
      (DataFrame, DataStreamWriter[org.apache.spark.sql.Row]) = {
    val gets = apacheLog.filter(col("method") === "GET").select(col("ts"), col("url"))
    val counts = StreamWindows.slidingCountStream(
      gets, "ts", Seq("url"), size, slide, s"$delaySec seconds")
    val lateWriter = StreamWindows.lateRowSideOutput(gets, "ts", delaySec)(
      onTime = (_, _) => (), lateSink = lateSink)
    (counts, lateWriter)
  }
}
