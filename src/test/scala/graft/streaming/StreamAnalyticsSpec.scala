package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Analytics
import graft.streaming.StreamAnalytics.{FunnelEvent, FunnelReach}

/**
 * Stream ≡ batch equivalence for the k-step funnel, including the case
 * the fold-as-arrive CEP discipline cannot get right: cross-batch
 * disorder inside the watermark delay. The buffer-until-watermark fold
 * must reproduce [[Analytics.funnelUserTimes]] bit-exactly on the same
 * rows, whatever the arrival batching.
 */
class StreamAnalyticsSpec extends SparkSuite {

  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  /** Stream `batches` through funnelReachStream; a final flush event
    * (non-step type, far-future ts) pushes the watermark past every real
    * event so held buffers fold and the final state is comparable. */
  private def streamReach(batches: Seq[Seq[FunnelEvent]], horizon: Long,
                          delaySec: Int = 30): Set[(Long, Int, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = StreamAnalytics.funnelReachStream(input.toDS(), steps, horizon,
      watermarkDelay = s"$delaySec seconds")
    val name = s"fr${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val flushTs = batches.flatten.map(_.ts).max + delaySec + 100L
      input.addData(Seq(FunnelEvent(-1L, flushTs, "zz"),
        FunnelEvent(-2L, flushTs + delaySec + 100L, "zz")))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[FunnelReach].collect()
      .map(r => (r.userId, r.step, r.t1, r.tStep)).toSet
  }

  /** The batch operator's reach set in the same (user, step, t1, tStep)
    * shape. */
  private def batchReach(events: Seq[FunnelEvent],
                         horizon: Long): Set[(Long, Int, Long, Long)] = {
    val df = events.toDF("userId", "ts", "eventType")
    Analytics.funnelUserTimes(df, "userId", "ts", "eventType", steps, horizon)
      .zipWithIndex.flatMap { case (f, idx) =>
        val i = idx + 1
        f.collect().map(r => (r.getLong(r.fieldIndex("u")), i,
          r.getLong(r.fieldIndex("t1")), r.getLong(r.fieldIndex(s"t$i"))))
      }.toSet
  }

  // Every fixture starts at ts ≥ 1000: an event at exactly epoch second
  // 0 equals the query's INITIAL watermark and Spark's stateful late
  // filter (LessThanOrEqual(eventTime, watermark)) drops it before the
  // operator — see the funnelReachStream scaladoc.

  test("stream ≡ batch on a seeded fixture with cross-batch disorder") {
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "noise")
    val events = (0 until 400).map { i =>
      FunnelEvent(rnd.nextInt(40).toLong, 1000L + i,
        types(rnd.nextInt(types.length)))
    }
    // batch by time window, then displace ~20% of events one batch later:
    // disorder bounded by the 20-second batch span, under the 30-second
    // watermark delay, so nothing is dropped — only reordered
    val batched = events.groupBy { e =>
      val b = (e.ts / 20).toInt
      if (rnd.nextInt(5) == 0) b + 1 else b
    }.toSeq.sortBy(_._1).map(_._2)
    val streamed = streamReach(batched, horizon = 50L)
    val batch = batchReach(events, horizon = 50L)
    assert(batch.exists(_._2 == 3), "fixture must complete some funnels")
    assert(streamed === batch)
  }

  test("a late-but-in-delay entry event re-chains: CEP fold-order would miss it") {
    // click (ts=105) arrives a batch BEFORE its view (ts=100): an
    // arrival-order fold at the click sees no open chain; the
    // watermark-ordered fold must still reach step 2
    val streamed = streamReach(Seq(
      Seq(FunnelEvent(1L, 105L, "click")),
      Seq(FunnelEvent(1L, 100L, "view")),
      Seq(FunnelEvent(1L, 110L, "purchase"))), horizon = 0L)
    assert(streamed === Set((1L, 1, 100L, 100L), (1L, 2, 100L, 105L),
      (1L, 3, 100L, 110L)))
  }

  test("horizon is entry-anchored and excludes the over-horizon tail") {
    val streamed = streamReach(Seq(Seq(
      FunnelEvent(1L, 1000L, "view"), FunnelEvent(1L, 1040L, "click"),
      FunnelEvent(1L, 1120L, "purchase"), // past 1000 + 100
      FunnelEvent(2L, 1000L, "view"), FunnelEvent(2L, 1040L, "click"),
      FunnelEvent(2L, 1090L, "purchase"))), horizon = 100L)
    assert(streamed === Set((1L, 1, 1000L, 1000L), (1L, 2, 1000L, 1040L),
      (2L, 1, 1000L, 1000L), (2L, 2, 1000L, 1040L), (2L, 3, 1000L, 1090L)))
  }

  test("completed users never start a second chain") {
    val streamed = streamReach(Seq(
      Seq(FunnelEvent(1L, 1000L, "view"), FunnelEvent(1L, 1001L, "click"),
        FunnelEvent(1L, 1002L, "purchase")),
      Seq(FunnelEvent(1L, 1200L, "view"), FunnelEvent(1L, 1201L, "click"))),
      horizon = 0L)
    assert(streamed === Set((1L, 1, 1000L, 1000L), (1L, 2, 1000L, 1001L),
      (1L, 3, 1000L, 1002L)))
  }

  // ---- re-entry funnel (funnelAttemptsStream ≡ Analytics.funnelAttempts) ----

  private def streamAttempts(batches: Seq[Seq[FunnelEvent]], horizon: Long,
                             maxAttempts: Int = 4, delaySec: Int = 30)
      : Set[(Long, Int, Long, Int, Option[Long])] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = StreamAnalytics.funnelAttemptsStream(input.toDS(), steps,
      horizon, maxAttempts, watermarkDelay = s"$delaySec seconds")
    val name = s"fa${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // flush past max ts + horizon + delay: every open conversion
      // window must turn watermark-final so incomplete attempts emit
      val flushTs = batches.flatten.map(_.ts).max + horizon + delaySec + 100L
      input.addData(Seq(FunnelEvent(-1L, flushTs, "zz"),
        FunnelEvent(-2L, flushTs + delaySec + 100L, "zz")))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[StreamAnalytics.FunnelAttempt].collect()
      .map(r => (r.userId, r.attempt, r.t1, r.reached, r.tDone)).toSet
  }

  private def batchAttempts(events: Seq[FunnelEvent], horizon: Long,
                            maxAttempts: Int = 4)
      : Set[(Long, Int, Long, Int, Option[Long])] = {
    val df = events.toDF("userId", "ts", "eventType")
    Analytics.funnelAttempts(df, "userId", "ts", "eventType", steps,
        horizon, maxAttempts)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
  }

  test("re-entry attempts: completion and timeout re-anchor; maxAttempts truncates; in-window entries absorb") {
    val events = Seq(
      FunnelEvent(1L, 1000L, "view"),      // attempt 1 anchors
      FunnelEvent(1L, 1005L, "view"),      // in-window entry: absorbed
      FunnelEvent(1L, 1010L, "click"),
      FunnelEvent(1L, 1020L, "purchase"),  // attempt 1 completes, end 1020
      FunnelEvent(1L, 1030L, "view"),      // attempt 2 anchors (> 1020)
      FunnelEvent(1L, 1200L, "view"),      // attempt 3 (> 1030 + 100)
      FunnelEvent(1L, 1210L, "click"))     // reaches 2, times out at 1300
    val expected4 = Set[(Long, Int, Long, Int, Option[Long])](
      (1L, 1, 1000L, 3, Some(1020L)),
      (1L, 2, 1030L, 1, None),
      (1L, 3, 1200L, 2, None))
    assert(batchAttempts(events, horizon = 100L) === expected4,
      "batch fixture sanity")
    assert(streamAttempts(Seq(events), horizon = 100L) === expected4)
    // deterministic truncation: only the FIRST maxAttempts attempts emit
    val expected2 = expected4.filter(_._2 <= 2)
    assert(batchAttempts(events, 100L, maxAttempts = 2) === expected2)
    assert(streamAttempts(Seq(events), 100L, maxAttempts = 2) === expected2)
  }

  test("re-entry attempts: stream ≡ batch on a seeded fixture with cross-batch disorder") {
    val rnd = new scala.util.Random(17)
    val types = Seq("view", "click", "purchase", "noise")
    val events = (0 until 500).map { i =>
      FunnelEvent(rnd.nextInt(12).toLong, 1000L + i,
        types(rnd.nextInt(types.length)))
    }
    val batched = events.groupBy { e =>
      val b = (e.ts / 20).toInt
      if (rnd.nextInt(5) == 0) b + 1 else b
    }.toSeq.sortBy(_._1).map(_._2)
    val batch = batchAttempts(events, horizon = 60L, maxAttempts = 3)
    assert(batch.exists(_._2 >= 2), "fixture must re-anchor some users")
    assert(batch.exists(_._5.isDefined), "fixture must complete some attempts")
    assert(batch.exists(t => t._5.isEmpty), "fixture must time some out")
    assert(streamAttempts(batched, horizon = 60L, maxAttempts = 3) === batch)
  }

  test("re-entry attempts: a late entry inside the delay re-anchors (fold order, not arrival order)") {
    // the click arrives a batch BEFORE the view that anchors attempt 2:
    // an arrival-order fold would miss the re-anchor entirely
    val streamed = streamAttempts(Seq(
      Seq(FunnelEvent(1L, 1000L, "view")),   // attempt 1: times out at 1100
      Seq(FunnelEvent(1L, 1210L, "click")),
      Seq(FunnelEvent(1L, 1205L, "view"))),  // arrives later, folds first
      horizon = 100L)
    assert(streamed === Set[(Long, Int, Long, Int, Option[Long])](
      (1L, 1, 1000L, 1, None),
      (1L, 2, 1205L, 2, None)))
  }

  test("reach emissions are monotone: one row per (user, step)") {
    val rnd = new scala.util.Random(11)
    val events = (0 until 200).map { i =>
      FunnelEvent(rnd.nextInt(10).toLong, 1000L + i,
        Seq("view", "click", "purchase")(rnd.nextInt(3)))
    }
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = StreamAnalytics.funnelReachStream(input.toDS(), steps, 0L,
      watermarkDelay = "10 seconds")
    val name = s"mono${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      events.grouped(50).foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Seq(FunnelEvent(-1L, 10000L, "zz"),
        FunnelEvent(-2L, 20000L, "zz")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).as[FunnelReach].collect()
    assert(rows.map(r => (r.userId, r.step)).distinct.length === rows.length,
      "duplicate (user, step) reach emission")
  }
}
