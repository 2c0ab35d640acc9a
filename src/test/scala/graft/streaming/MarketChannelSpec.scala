package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.Windows

/** MarketByChannelApp parity (SURVEY.md §2: S3 generator, F3 negation
  * filter, W2/W4 composite-key sliding window) over the deterministic
  * batch twin of the generator source; plus K1/K4 sink smoke. */
class MarketChannelSpec extends SparkSuite {

  import spark.implicits._

  test("market channel stats: F3 filter + composite-key sliding window") {
    val events = StreamSources.marketBehaviorBatch(spark, n = 2000, startMs = 0L)
      .filter(col("behavior") =!= "UNINSTALL") // F3 (MarketByChannelApp.java:31)
      .select((col("timestamp") / 1000).cast("timestamp").as("ts"),
        col("channel"), col("behavior"))
    val counts = Windows.slidingCount(events, "ts", Seq("channel", "behavior"),
      "1 minute", "30 seconds")
    val rows = counts.as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_._2 == "UNINSTALL"), "negation filter must hold")
    assert(rows.map(_._1).toSet.subsetOf(Set("app store", "wechat", "weibo", "tieba")))
    // 2000 events over 200s at 100ms cadence; every event lands in exactly
    // two 1min/30s windows → total count is 2 × (non-UNINSTALL events)
    val kept = StreamSources.marketBehaviorBatch(spark, 2000, 0L)
      .filter(col("behavior") =!= "UNINSTALL").count()
    assert(rows.map(_._4).sum === 2 * kept)
  }

  test("K1/K4 sink wrappers run (console append + update)") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    input.addData(Seq(1L, 2L, 3L))
    val q1 = StreamSources.consoleSink(input.toDS(), "k1smoke")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(30000); assert(q1.exception.isEmpty)
    val counts = input.toDS().toDF("v").groupBy("v").count()
    val q2 = StreamSources.retractSink(counts.as[(Long, Long)], "k4smoke")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(30000); assert(q2.exception.isEmpty)
  }
}
