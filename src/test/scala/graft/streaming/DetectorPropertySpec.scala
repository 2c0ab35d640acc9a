package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite
import graft.model.LoginEvent
import graft.operators.Detectors

/** ScalaCheck property: the streaming login-fail state machine is
  * equivalent to the batch `lag` oracle on random event streams
  * (SURVEY.md §5 test strategy, item 4). Few iterations — each sample
  * runs a full streaming query. */
class DetectorPropertySpec extends SparkSuite {

  import spark.implicits._

  private val eventGen: Gen[List[LoginEvent]] = for {
    n <- Gen.choose(5, 40)
    events <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 3L)
      typ <- Gen.frequency(2 -> Gen.const("fail"), 1 -> Gen.const("success"))
      gap <- Gen.choose(0L, 4L)
    } yield (user, typ, gap))
  } yield {
    var ts = 1000000L
    events.map { case (u, t, gap) => ts += gap; LoginEvent(u, "1.2.3.4", t, ts) }
  }

  test("loginFailStream ≡ batch lag-oracle on random streams") {
    val prop = Prop.forAll(eventGen) { events =>
      val df = events.toDF()
      val batch = Detectors.consecutiveFailures(
          df.withColumn("usec", col("timestamp") * 1000000L),
          "userId", "usec", "eventType", col("eventType") === "fail", 2L)
        .select(col("userId"),
          (col("first_fail_usec") / 1000000L).cast("long"),
          (col("second_fail_usec") / 1000000L).cast("long"))
        .as[(Long, Long, Long)].collect().toSet

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[LoginEvent]
      val out = StreamDetectors.loginFailStream(input.toDS(), maxGapSec = 2L)
      val name = s"p${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      try { input.addData(events); q.processAllAvailable() } finally q.stop()
      val streamed = spark.table(name).as[graft.model.LoginFailWarning]
        .collect().map(w => (w.userId, w.firstFailTs, w.secondFailTs)).toSet

      streamed == batch
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  private val orderGen: Gen[List[graft.model.OrderEvent]] = for {
    n <- Gen.choose(4, 20)
    events <- Gen.listOfN(n, for {
      order <- Gen.choose(1L, 6L)
      typ <- Gen.oneOf("create", "pay")
      gap <- Gen.choose(0L, 400L)
    } yield (order, typ, gap))
  } yield {
    var ts = 1000000L
    events.map { case (o, t, gap) => ts += gap
      graft.model.OrderEvent(o, t, if (t == "pay") s"tx$o" else "", ts) }
  }

  test("orderTimeoutStream ≡ batch sequenceTimeout on random streams") {
    val prop = Prop.forAll(orderGen) { events =>
      // Batch oracle applies per (order, create) pair; the stream state
      // machine keeps ONE create per order (later create overwrites) and
      // consumes state on pay — restrict generated streams to at most one
      // create and one pay per order to compare like-for-like.
      val dedup = events.groupBy(e => (e.orderId, e.eventType))
        .map(_._2.minBy(_.eventTime)).toList.sortBy(_.eventTime)
      val df = dedup.toDF()
      val creates = df.filter(col("eventType") === "create")
        .select(col("orderId"), (col("eventTime") * 1000000L).as("start_usec"))
      val pays = df.filter(col("eventType") === "pay")
        .select(col("orderId"), (col("eventTime") * 1000000L).as("pay_usec"))
      val batch = Detectors.sequenceTimeout(creates, pays, "orderId",
          "start_usec", "pay_usec", 900L)
        .select(col("orderId"), col("status")).as[(Long, String)].collect().toSet
      // A pay is "payed timeout" (reference: pay with no create flag) when
      // no create exists OR the create is later than the pay — in both
      // cases the state machine sees the pay with no live create state.
      val stray = pays.join(creates, Seq("orderId"), "left_outer")
        .filter(col("start_usec").isNull || col("start_usec") > col("pay_usec"))
        .select("orderId").as[Long].collect().toSet

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[graft.model.OrderEvent]
      val out = StreamDetectors.orderTimeoutStream(input.toDS(), timeoutSec = 900L)
      val name = s"ot${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      val maxTs = dedup.map(_.eventTime).max
      try {
        input.addData(dedup); q.processAllAvailable()
        input.addData(graft.model.OrderEvent(9999901L, "create", "", maxTs + 100000L))
        q.processAllAvailable()
        input.addData(graft.model.OrderEvent(9999902L, "create", "", maxTs + 200000L))
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(name).as[graft.model.OrderResult]
        .collect().filter(_.orderId < 9999900L)

      val payedOk = streamed.filter(_.resultType == "payed").map(_.orderId).toSet ==
        batch.collect { case (id, "payed") => id }
      val timeoutOk = streamed.filter(_.resultType == "pay timeout").map(_.orderId).toSet ==
        batch.collect { case (id, "timeout") => id }
      val strayOk = streamed.filter(_.resultType == "payed timeout").map(_.orderId).toSet == stray
      payedOk && timeoutOk && strayOk
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  private val reconcileGen: Gen[(List[graft.model.OrderEvent], List[graft.model.ReceiptEvent])] =
    for {
      n <- Gen.choose(2, 8)
      specs <- Gen.listOfN(n, for {
        kind <- Gen.oneOf("pay", "receipt", "both")
        payTs <- Gen.choose(100000L, 100100L)
        offset <- Gen.choose(-10L, 12L)
      } yield (kind, payTs, offset))
    } yield {
      val pays = scala.collection.mutable.ListBuffer.empty[graft.model.OrderEvent]
      val receipts = scala.collection.mutable.ListBuffer.empty[graft.model.ReceiptEvent]
      specs.zipWithIndex.foreach { case ((kind, payTs, offset), i) =>
        val tx = s"tx$i"
        if (kind != "receipt") pays += graft.model.OrderEvent(i.toLong, "pay", tx, payTs)
        if (kind != "pay") receipts += graft.model.ReceiptEvent(tx, "wechat", payTs + offset)
      }
      (pays.toList, receipts.toList)
    }

  test("reconcileStream ≡ batch reconcile on random two-sided streams") {
    val prop = Prop.forAll(reconcileGen) { case (pays, receipts) =>
      (pays.nonEmpty || receipts.nonEmpty) ==> {
        val payDf = pays.toDF().select(col("txId"), (col("eventTime") * 1000000L).as("pay_usec"))
        val rcptDf = receipts.toDF().select(col("txId"), (col("timestamp") * 1000000L).as("receipt_usec"))
        val batch = graft.operators.Joins.reconcile(payDf, rcptDf, "txId",
            "pay_usec", "receipt_usec", 3L, 5L,
            leftName = "pay_no_receipt", rightName = "receipt_no_pay")
          .select(coalesce(col("l.txId"), col("r.txId")).as("txId"), col("status"))
          .as[(String, String)].collect().toSet

        implicit val sqlCtx = spark.sqlContext
        val payIn = MemoryStream[graft.model.OrderEvent]
        val rcptIn = MemoryStream[graft.model.ReceiptEvent]
        val out = StreamDetectors.reconcileStream(payIn.toDS(), rcptIn.toDS(), 3L, 5L)
        val name = s"rp${System.nanoTime()}"
        val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
        val maxTs = (pays.map(_.eventTime) ++ receipts.map(_.timestamp)).max
        try {
          if (pays.nonEmpty) payIn.addData(pays)
          if (receipts.nonEmpty) rcptIn.addData(receipts)
          q.processAllAvailable()
          payIn.addData(graft.model.OrderEvent(9999901L, "pay", "s1", maxTs + 100000L))
          q.processAllAvailable()
          payIn.addData(graft.model.OrderEvent(9999902L, "pay", "s2", maxTs + 200000L))
          q.processAllAvailable()
        } finally q.stop()
        val streamed = spark.table(name).as[StreamDetectors.ReconcileResult]
          .collect().filterNot(r => r.txId == "s1" || r.txId == "s2")
          .map(r => (r.txId, r.status)).toSet
        streamed == batch
      }
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }
}
