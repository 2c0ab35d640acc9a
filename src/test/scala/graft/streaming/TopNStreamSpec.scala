package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Windows

/** A6 streaming — Top-N per window through foreachBatch over the upserted
  * state table. The assertions trust the OPERATOR'S emitted (item, cnt, rn)
  * rows directly — no sink-side re-rank — across multiple micro-batches,
  * so a rank computed against an incomplete per-batch competitor set (the
  * r2 bug) fails here. */
class TopNStreamSpec extends SparkSuite {

  import spark.implicits._

  test("multi-batch streaming top-2 emits merged-state ranks ≡ batch top-2") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (item, sec)
    val src = input.toDS()
      .select(col("_1").as("item"), col("_2").cast("timestamp").as("ts"))
    val counts = StreamWindows.tumblingCountStream(src, "ts", Seq("item"),
      "60 seconds", "5 seconds")

    // record each batch's emission verbatim; the LAST batch touching a
    // window must already carry the fully-merged, correctly-ranked rows
    val perBatch = scala.collection.mutable.Map[Long, Set[(Long, Long, Long, Int)]]()
    val statePath = java.nio.file.Files.createTempDirectory("graft_topn_spec").toString
    val q = StreamWindows.topNPerWindowStream(
        counts, Seq("window_end"), "cnt", "item", 2, statePath) {
      (ranked: DataFrame, batchId: Long) =>
        perBatch(batchId) = ranked.select("item", "window_end", "cnt", "rn")
          .as[(Long, Long, Long, Int)].collect().toSet
    }.start()
    try {
      input.addData(Seq((1L, 10L), (1L, 11L), (2L, 12L), (3L, 13L)))
      q.processAllAvailable()
      // batch 2 updates ONLY item 3 — its batch rows alone can't rank
      // window 60 correctly; the merged state must supply items 1 and 2
      input.addData(Seq((3L, 20L), (3L, 21L)))
      q.processAllAvailable()
    } finally q.stop()

    val batchOracle = Windows.topNPerWindow(
        Windows.tumblingCount(
          Seq((1L, 10L), (1L, 11L), (2L, 12L), (3L, 13L), (3L, 20L), (3L, 21L)).toDF("item", "sec")
            .select(col("item"), timestamp_seconds(col("sec")).as("ts")),
          "ts", Seq("item"), "60 seconds"),
        Seq("window_end"), "cnt", "item", 2)
      .select("item", "window_end", "cnt", "rn")
      .as[(Long, Long, Long, Int)].collect().toSet

    // final emission per window = the last batch's rows for that window
    val lastEmission = perBatch.toSeq.sortBy(_._1).flatMap { case (_, rows) => rows }
      .groupBy(_._2).map { case (we, _) =>
        perBatch.toSeq.sortBy(_._1).reverse
          .collectFirst { case (_, rows) if rows.exists(_._2 == we) =>
            rows.filter(_._2 == we) }.get
      }.flatten.toSet

    assert(lastEmission === batchOracle,
      s"operator-emitted ranks $lastEmission must equal batch oracle $batchOracle")
  }

  test("exact-lateness fires drive the rank table: a late element corrects the leader") {
    implicit val sqlCtx = spark.sqlContext
    // the reference's HotUrl2 composition end to end: allowedLateness
    // window fires (append mode, per-late-element re-fires) upserted into
    // the top-N state table — a late burst flips the window's rank 1
    val input = MemoryStream[(String, Long)]
    val fires = StreamWindows.allowedLatenessCount(
      input.toDS().select(col("_1").as("url"),
        col("_2").cast("timestamp").as("ts")),
      "url", "ts", windowSize = "60 seconds", watermarkDelaySec = 0L,
      latenessSec = 121L).toDF()
    val perBatch = scala.collection.mutable.ArrayBuffer[Set[(String, Long, Long, Int)]]()
    val statePath = java.nio.file.Files.createTempDirectory("graft_topn_late").toString
    val q = StreamWindows.topNPerWindowStream(
        fires, Seq("window_end"), "cnt", "key", 1, statePath,
        outputMode = "append") {
      (ranked: DataFrame, _: Long) =>
        perBatch += ranked.select("key", "window_end", "cnt", "rn")
          .as[(String, Long, Long, Int)].collect().toSet
    }.start()
    try {
      input.addData(Seq(("/a", 10L), ("/b", 11L), ("/b", 12L)))
      q.processAllAvailable()                // window [0,60): a=1, b=2
      input.addData(Seq(("/x", 150L)))       // window-end wm 180 → 59
      q.processAllAvailable()
      input.addData(Seq(("/x", 160L)))       // timers fire → mains emitted
      q.processAllAvailable()
      val afterMain = perBatch.flatten.filter(_._2 == 60L)
      assert(afterMain.exists(r => r._1 == "/b" && r._3 == 2L && r._4 == 1),
        s"on-time leader of window 60 must be /b with 2, got $afterMain")
      // TWO late /a elements in one batch: re-fires 2 then 3; the upsert
      // must keep the LAST (3) and flip rank 1 to /a
      input.addData(Seq(("/a", 20L), ("/a", 30L)))
      q.processAllAvailable()
      val finalW60 = perBatch.reverse.collectFirst {
        case rows if rows.exists(_._2 == 60L) => rows.filter(_._2 == 60L)
      }.get
      assert(finalW60 === Set(("/a", 60L, 3L, 1)),
        s"the late burst must make /a the corrected leader with 3, got $finalW60")
    } finally q.stop()
  }

  test("retain predicate bounds the state table without touching live windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val src = input.toDS()
      .select(col("_1").as("item"), col("_2").cast("timestamp").as("ts"))
    val counts = StreamWindows.tumblingCountStream(src, "ts", Seq("item"),
      "60 seconds", "5 seconds")
    val statePath = java.nio.file.Files.createTempDirectory("graft_topn_ret").toString
    // keep only windows within 120s of the newest window in the batch
    val retain = (state: org.apache.spark.sql.DataFrame,
                  batch: org.apache.spark.sql.DataFrame) => {
      val newest = batch.agg(max(col("window_end"))).head().getLong(0)
      state.filter(col("window_end") >= newest - 120L)
    }
    val emitted = scala.collection.mutable.Map[Long, Set[(Long, Long, Long, Int)]]()
    val q = StreamWindows.topNPerWindowStream(
        counts, Seq("window_end"), "cnt", "item", 2, statePath, retain) {
      (ranked, batchId) =>
        emitted(batchId) = ranked.select("item", "window_end", "cnt", "rn")
          .as[(Long, Long, Long, Int)].collect().toSet
    }.start()
    try {
      input.addData(Seq((1L, 10L), (2L, 12L)))   // window 60
      q.processAllAvailable()
      input.addData(Seq((3L, 600L), (3L, 610L))) // window 660 — 60 evicts
      q.processAllAvailable()
    } finally q.stop()
    // the state table holds only the live window's rows after eviction
    val vdirs = new java.io.File(statePath).listFiles().filter(_.getName.startsWith("v"))
    assert(vdirs.length === 1)
    val state = spark.read.parquet(vdirs.head.toString)
      .select("item", "window_end").as[(Long, Long)].collect().toSet
    assert(state === Set((3L, 660L)), s"evicted state must only keep window 660: $state")
    // and the live window's emission is still correctly ranked
    assert(emitted.values.flatten.toSet.contains((3L, 660L, 2L, 1)))
  }
}
