package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.Windows
import graft.sources.CsvSources

/** Flagship end-to-end streaming pipeline (HotItemApp §3.1): file-source
  * replay of the UserBehavior fixture → pv filter → watermarked sliding
  * 1h/5m counts → foreachBatch top-5 rank → final state ≡ batch flagship. */
class HotItemsStreamE2ESpec extends SparkSuite {

  import spark.implicits._

  test("streaming HotItems ≡ batch HotItems on the UserBehavior fixture") {
    // file SOURCE (S1 streaming form) reads a directory; stage the fixture
    val dir = fixture("UserBehavior.csv")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_ub")
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir),
      streamDir.resolve("UserBehavior.csv"))
    val src = StreamSources.csvStream(spark, streamDir.toString,
        CsvSources.userBehaviorSchema)
    val pv = CsvSources.withEventTime(src, "timestamp")
      .filter(col("behavior") === "pv").select(col("ts"), col("itemId"))
    val counts = StreamWindows.slidingCountStream(pv, "ts", Seq("itemId"),
      "1 hour", "5 minutes", watermarkDelay = "0 seconds")

    val perBatch = scala.collection.mutable.Map[(Long, Long), (Long, Int)]()
    val q = StreamWindows.topNPerWindowStream(counts, Seq("window_end"), "cnt", "itemId", 5,
        java.nio.file.Files.createTempDirectory("graft_topn_e2e").toString) {
      (ranked: DataFrame, _: Long) =>
        ranked.select("itemId", "window_end", "cnt", "rn")
          .as[(Long, Long, Long, Int)].collect()
          .foreach { case (item, we, cnt, rn) => perBatch((item, we)) = (cnt, rn) }
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty, s"stream failed: ${q.exception}")

    val streamed = perBatch.map { case ((item, we), (cnt, rn)) => (item, we, cnt, rn) }.toSet

    val behavior = CsvSources.userBehavior(spark, dir)
    val batchPv = behavior.filter(col("behavior") === "pv").select(col("ts"), col("itemId"))
    val batchCounts = Windows.slidingCount(batchPv, "ts", Seq("itemId"), "1 hour", "5 minutes")
    val batch = Windows.topNPerWindow(batchCounts, Seq("window_end"), "cnt", "itemId", 5)
      .select(col("itemId"), col("window_end"), col("cnt"), col("rn"))
      .as[(Long, Long, Long, Int)].collect().toSet

    assert(streamed === batch,
      s"stream/batch diff: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
  }
}
