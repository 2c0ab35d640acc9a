package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
