package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model._
import graft.operators.{Detectors, Joins}
import graft.sources.CsvSources

/**
 * Stream ≡ batch-oracle equivalence for every flatMapGroupsWithState
 * detector, over the reference's own fixture CSVs (FIXTURES.md family A).
 * Set-compare, order-insensitive — Spark fires event-time timers at
 * micro-batch boundaries, so only final state is comparable (SURVEY §7.4).
 */
class StreamDetectorsSpec extends SparkSuite {

  import spark.implicits._

  /** Run an append-mode streaming Dataset to completion over MemoryStream
    * input batches, advancing the watermark with each batch. */
  def runStream[I: org.apache.spark.sql.Encoder, O: org.apache.spark.sql.Encoder](
      batches: Seq[Seq[I]])(pipe: Dataset[I] => Dataset[O]): Seq[O] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[I]
    val out = pipe(input.toDS())
    val name = s"t${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[O].collect().toSeq
  }

  // --- J4/J5 login-fail ------------------------------------------------

  test("loginFailStream ≡ batch consecutiveFailures on LoginLog.csv") {
    val df = CsvSources.logins(spark, fixture("LoginLog.csv"))
    val batch = Detectors.consecutiveFailures(
        df.withColumn("usec", col("timestamp") * 1000000L),
        "userId", "usec", "eventType", col("eventType") === "fail", 2L)
      .select(col("userId"), (col("first_fail_usec") / 1000000L).cast("long").as("first"),
        (col("second_fail_usec") / 1000000L).cast("long").as("second"))
      .as[(Long, Long, Long)].collect().toSet

    val events = df.as[LoginEvent].collect().toSeq
    val streamed = runStream(Seq(events)) { ds: Dataset[LoginEvent] =>
      StreamDetectors.loginFailStream(ds, maxGapSec = 2L)
    }.map(w => (w.userId, w.firstFailTs, w.secondFailTs)).toSet

    assert(batch.nonEmpty, "fixture must produce at least one alarm")
    assert(streamed === batch)
  }

  // --- J3/J6 order-timeout ---------------------------------------------

  test("orderTimeoutStream ≡ batch sequenceTimeout on OrderLog.csv") {
    val df = CsvSources.orders(spark, fixture("OrderLog.csv"))
    val creates = df.filter(col("eventType") === "create")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("start_usec"))
    val pays = df.filter(col("eventType") === "pay")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("pay_usec"))
    val batch = Detectors.sequenceTimeout(creates, pays, "orderId",
        "start_usec", "pay_usec", 900L)
      .select(col("orderId"), col("status")).as[(Long, String)].collect().toSet
    val strayPays = pays.join(creates, Seq("orderId"), "left_anti")
      .select(col("orderId")).as[Long].collect().toSet

    val events = df.as[OrderEvent].collect().toSeq
    val maxTs = events.map(_.eventTime).max
    // two sentinel batches push the watermark past every create+900 deadline
    val s1 = OrderEvent(9999901L, "create", "", maxTs + 100000L)
    val s2 = OrderEvent(9999902L, "create", "", maxTs + 200000L)
    val streamed = runStream(Seq(events, Seq(s1), Seq(s2))) { ds: Dataset[OrderEvent] =>
      StreamDetectors.orderTimeoutStream(ds, timeoutSec = 900L)
    }.filter(_.orderId < 9999900L)

    val streamPayed = streamed.filter(_.resultType == "payed").map(_.orderId).toSet
    val streamTimeout = streamed.filter(_.resultType == "pay timeout").map(_.orderId).toSet
    val streamStray = streamed.filter(_.resultType == "payed timeout").map(_.orderId).toSet

    assert(streamPayed === batch.collect { case (id, "payed") => id })
    assert(streamTimeout === batch.collect { case (id, "timeout") => id })
    assert(streamStray === strayPays)
  }

  test("duplicate-create orders: one result per create run on BOTH engines") {
    // MALFORMED input shape — two create events for one orderId. The
    // reference's WithState app silently OVERWRITES createTs
    // (OrderTimeoutAppWithState.java:79-84); both our engines instead keep
    // one run per create (FlinkCEP-style sliding runs — the documented
    // deliberate divergence, StreamDetectors.scala J3/J6 notes). This spec
    // pins the row MULTIPLICITY on both engines so a refactor can't
    // silently change the semantics again (it already changed once, in the
    // r7 CEP unification).
    val es = Seq(
      OrderEvent(1L, "create", "", 1000L),
      OrderEvent(1L, "create", "", 1100L), // duplicate create — paid order
      OrderEvent(1L, "pay", "tx1", 1200L), // within 900 s of BOTH creates
      OrderEvent(2L, "create", "", 1000L),
      OrderEvent(2L, "create", "", 1100L)) // duplicate create — unpaid

    val df = es.toDF()
    val creates = df.filter(col("eventType") === "create")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("start_usec"))
    val pays = df.filter(col("eventType") === "pay")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("pay_usec"))
    val batch = Detectors.sequenceTimeout(creates, pays, "orderId",
        "start_usec", "pay_usec", 900L)
      .select(col("orderId"), col("status")).as[(Long, String)]
      .collect().toSeq.groupBy(identity).view.mapValues(_.size).toMap
    assert(batch === Map((1L, "payed") -> 2, (2L, "timeout") -> 2),
      "batch: one verdict per CREATE row, not per order id")

    // sentinels push the watermark past every create+900 deadline
    val s1 = OrderEvent(9999901L, "create", "", 100000L)
    val s2 = OrderEvent(9999902L, "create", "", 200000L)
    val streamed = runStream(Seq(es, Seq(s1), Seq(s2))) { ds: Dataset[OrderEvent] =>
      StreamDetectors.orderTimeoutStream(ds, timeoutSec = 900L)
    }.filter(_.orderId < 9999900L)
      .groupBy(r => (r.orderId, r.resultType)).view.mapValues(_.size).toMap
    assert(streamed === Map((1L, "payed") -> 2, (2L, "pay timeout") -> 2),
      "stream: one result per NFA run, one run per create")
  }

  // --- J2 reconcile ------------------------------------------------------

  test("reconcileStream ≡ batch reconcile on OrderLog+ReceiptLog") {
    val orders = CsvSources.orders(spark, fixture("OrderLog.csv"))
    val receipts = CsvSources.receipts(spark, fixture("ReceiptLog.csv"))
    val pays = orders.filter(col("eventType") === "pay" && col("txId") =!= "")

    val batch = Joins.reconcile(
        pays.select(col("txId"), (col("eventTime") * 1000000L).as("pay_usec")),
        receipts.select(col("txId").as("rtx"), (col("timestamp") * 1000000L).as("receipt_usec"))
          .withColumnRenamed("rtx", "txId"),
        "txId", "pay_usec", "receipt_usec", 3L, 5L,
        leftName = "pay_no_receipt", rightName = "receipt_no_pay")
      .select(coalesce(col("l.txId"), col("r.txId")).as("txId"), col("status"))
      .as[(String, String)].collect().toSet

    val payEvents = pays.as[OrderEvent].collect().toSeq
    val receiptEvents = receipts.as[ReceiptEvent].collect().toSeq
    val maxTs = (payEvents.map(_.eventTime) ++ receiptEvents.map(_.timestamp)).max

    implicit val sqlCtx = spark.sqlContext
    val payIn = MemoryStream[OrderEvent]
    val receiptIn = MemoryStream[ReceiptEvent]
    val out = StreamDetectors.reconcileStream(payIn.toDS(), receiptIn.toDS(), 3L, 5L)
    val q = out.writeStream.format("memory").queryName("rec").outputMode("append").start()
    try {
      payIn.addData(payEvents); receiptIn.addData(receiptEvents); q.processAllAvailable()
      payIn.addData(OrderEvent(9999901L, "pay", "sentinel1", maxTs + 100000L)); q.processAllAvailable()
      payIn.addData(OrderEvent(9999902L, "pay", "sentinel2", maxTs + 200000L)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("rec").as[StreamDetectors.ReconcileResult]
      .collect().filterNot(_.txId.startsWith("sentinel"))
      .map(r => (r.txId, r.status)).toSet

    assert(streamed === batch)
  }

  // --- F5 blacklist -------------------------------------------------------

  test("blacklistStream: warn-once + forwarded counts on AdClickLog.csv") {
    val clicks = CsvSources.adClicks(spark, fixture("AdClickLog.csv")).as[AdClickEvent]
    val events = clicks.collect().toSeq
    val out = runStream(Seq(events)) { ds: Dataset[AdClickEvent] =>
      StreamDetectors.blacklistStream(ds, threshold = 100L)
    }
    val warnings = out.filter(_.status == "warning")
    // the fixture's deliberate hot key: user 937166 / ad 1715, 121 clicks
    // (FIXTURES.md A2 names user 543462 — that's just the first row; the
    // actual repeating pair in the CSV is 937166/1715)
    assert(warnings.map(w => (w.userId, w.adId)).toSet === Set((937166L, 1715L)))
    assert(warnings.size === 1, "warn-once: exactly one warning row")
    val hotForwarded = out.count(o => o.status == "click" && o.userId == 937166L && o.adId == 1715L)
    assert(hotForwarded === 100L, "exactly `threshold` clicks forwarded before blocking")
  }

  test("blacklistStream: UTC+8 daily reset") {
    // threshold 2; three clicks on day d, two on day d+1 (UTC+8 boundary at
    // 16:00 UTC): day-1 forwards 2 + warns once, day-2 forwards 2 (reset).
    val day1 = 1600000000L // 2020-09-13 12:26:40 UTC
    val day2Start = ((day1 + 8 * 3600) / 86400 + 1) * 86400 - 8 * 3600 // next UTC+8 midnight
    val es = Seq(
      AdClickEvent(1L, 7L, "p", "c", day1),
      AdClickEvent(1L, 7L, "p", "c", day1 + 10),
      AdClickEvent(1L, 7L, "p", "c", day1 + 20),
      AdClickEvent(1L, 7L, "p", "c", day2Start + 5),
      AdClickEvent(1L, 7L, "p", "c", day2Start + 15))
    val out = runStream(Seq(es)) { ds: Dataset[AdClickEvent] =>
      StreamDetectors.blacklistStream(ds, threshold = 2L)
    }
    assert(out.count(_.status == "click") === 4) // 2 per day
    assert(out.count(_.status == "warning") === 1) // day-1 warn-once; day-2 never crosses
    assert(StreamDetectors.utc8Day(day2Start) === StreamDetectors.utc8Day(day1) + 1)
  }
}
