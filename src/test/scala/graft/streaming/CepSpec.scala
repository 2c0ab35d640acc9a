package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model._
import graft.operators.Detectors
import graft.sources.CsvSources
import graft.streaming.Cep.{CepMatch, Pattern}

/**
 * Generalized CEP combinator: the two reference detectors re-expressed as
 * `Pattern` expressions must reproduce their batch oracles EXACTLY
 * (LoginFailAppWithCep.java:61-75, OrderTimeoutAppWithCep.java:46-56),
 * and a third pattern (3 fails in 10 s) must work without any new state
 * machine — the whole point of the combinator.
 */
class CepSpec extends SparkSuite {

  import spark.implicits._

  def runStream[I: org.apache.spark.sql.Encoder, O: org.apache.spark.sql.Encoder](
      batches: Seq[Seq[I]])(pipe: Dataset[I] => Dataset[O]): Seq[O] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[I]
    val out = pipe(input.toDS())
    val name = s"cep${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[O].collect().toSeq
  }

  private val loginPattern: Pattern[LoginEvent] =
    Pattern.begin[LoginEvent]("fail")(_.eventType == "fail")
      .times(2).consecutive().within(2L)

  test("login-fail pattern ≡ batch consecutiveFailures oracle (J4/J5)") {
    val df = CsvSources.logins(spark, fixture("LoginLog.csv"))
    val batch = Detectors.consecutiveFailures(
        df.withColumn("usec", col("timestamp") * 1000000L),
        "userId", "usec", "eventType", col("eventType") === "fail", 2L)
      .select(col("userId"), (col("first_fail_usec") / 1000000L).cast("long").as("first"),
        (col("second_fail_usec") / 1000000L).cast("long").as("second"))
      .as[(Long, Long, Long)].collect().toSet

    val events = df.as[LoginEvent].collect().toSeq
    val streamed = runStream(Seq(events)) { ds: Dataset[LoginEvent] =>
      Cep.detect[LoginEvent, Long](ds, _.userId, "timestamp", _.timestamp,
        loginPattern, tieBreak = _.eventType)
    }.filter(_.status == "matched")
      .map(m => (m.key, m.stageTs.head, m.stageTs.last)).toSet

    assert(batch.nonEmpty, "fixture must produce at least one alarm")
    assert(streamed === batch)
  }

  test("create→pay pattern ≡ batch sequenceTimeout oracle (J3/J6)") {
    val df = CsvSources.orders(spark, fixture("OrderLog.csv"))
    val creates = df.filter(col("eventType") === "create")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("start_usec"))
    val pays = df.filter(col("eventType") === "pay")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("pay_usec"))
    val batch = Detectors.sequenceTimeout(creates, pays, "orderId",
        "start_usec", "pay_usec", 900L)
      .select(col("orderId"), col("status")).as[(Long, String)].collect().toSet

    val pattern = Pattern.begin[OrderEvent]("create")(_.eventType == "create")
      .followedBy("pay")(_.eventType == "pay")
      .within(900L)

    val events = df.as[OrderEvent].collect().toSeq
    val maxTs = events.map(_.eventTime).max
    // sentinel batches push the watermark past every create+900 deadline
    val s1 = OrderEvent(9999901L, "create", "", maxTs + 100000L)
    val s2 = OrderEvent(9999902L, "create", "", maxTs + 200000L)
    val streamed = runStream(Seq(events, Seq(s1), Seq(s2))) { ds: Dataset[OrderEvent] =>
      Cep.detect[OrderEvent, Long](ds, _.orderId, "eventTime", _.eventTime,
        pattern, tieBreak = _.eventType)
    }.filter(_.key < 9999900L)
      .map(m => (m.key, if (m.status == "matched") "payed" else "timeout"))
      .toSet

    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("NEW pattern, no new state machine: 3 fails within 10 s") {
    val pattern = Pattern.begin[LoginEvent]("fail")(_.eventType == "fail")
      .times(3).consecutive().within(10L)
    val ev = Seq(
      LoginEvent(1L, "ip", "fail", 100L),
      LoginEvent(1L, "ip", "fail", 103L),
      LoginEvent(1L, "ip", "fail", 106L),  // (100,103,106) and start of next
      LoginEvent(1L, "ip", "fail", 109L),  // (103,106,109)
      LoginEvent(2L, "ip", "fail", 100L),
      LoginEvent(2L, "ip", "success", 101L), // breaks contiguity for user 2
      LoginEvent(2L, "ip", "fail", 102L),
      LoginEvent(2L, "ip", "fail", 103L),
      LoginEvent(3L, "ip", "fail", 100L),
      LoginEvent(3L, "ip", "fail", 105L),
      LoginEvent(3L, "ip", "fail", 111L))  // 111-100 > 10: window blown

    val streamed = runStream(Seq(ev)) { ds: Dataset[LoginEvent] =>
      Cep.detect[LoginEvent, Long](ds, _.userId, "timestamp", _.timestamp,
        pattern, tieBreak = _.eventType)
    }
    val matched = streamed.filter(_.status == "matched")
      .map(m => (m.key, m.stageTs)).toSet
    assert(matched === Set(
      (1L, Seq(100L, 103L, 106L)),
      (1L, Seq(103L, 106L, 109L))))

    // ordered batch runner agrees event-for-event (shared step function)
    val batchAll = ev.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
      Cep.detectOrdered[LoginEvent, Long](u,
        es.sortBy(e => (e.timestamp, e.eventType)), _.timestamp, pattern)
    }
    assert(batchAll.filter(_.status == "matched")
      .map(m => (m.key, m.stageTs)).toSet === matched)
    // user 3's blown-window run surfaces as a timeout, never a match
    assert(batchAll.exists(m => m.key == 3L && m.status == "timeout"))
  }

  test("times(min,max) emits every length in the range (FlinkCEP semantics)") {
    val pattern = Pattern.begin[LoginEvent]("fail")(_.eventType == "fail")
      .times(2, 3).consecutive().within(10L)
    val ev = Seq(
      LoginEvent(1L, "ip", "fail", 100L),
      LoginEvent(1L, "ip", "fail", 101L),
      LoginEvent(1L, "ip", "fail", 102L))
    val got = Cep.detectOrdered[LoginEvent, Long](1L, ev, _.timestamp, pattern)
      .filter(_.status == "matched").map(_.stageTs).toSet
    assert(got === Set(
      Seq(100L, 101L), Seq(101L, 102L),     // the two length-2 runs
      Seq(100L, 101L, 102L)))               // and the length-3 run
  }

  test("optional() stage matches both with and without it") {
    val pattern = Pattern.begin[LoginEvent]("a")(_.eventType == "a")
      .followedBy("b")(_.eventType == "b").optional()
      .followedBy("c")(_.eventType == "c")
    val withB = Seq(
      LoginEvent(1L, "ip", "a", 100L),
      LoginEvent(1L, "ip", "b", 101L),
      LoginEvent(1L, "ip", "c", 102L))
    val gotWith = Cep.detectOrdered[LoginEvent, Long](1L, withB, _.timestamp, pattern)
      .map(m => (m.stageNames, m.stageTs)).toSet
    assert(gotWith === Set(
      (Seq("a", "c"), Seq(100L, 102L)),        // b skipped (optional absent)
      (Seq("a", "b", "c"), Seq(100L, 101L, 102L))))
    val withoutB = Seq(
      LoginEvent(1L, "ip", "a", 100L),
      LoginEvent(1L, "ip", "c", 102L))
    val gotWithout = Cep.detectOrdered[LoginEvent, Long](1L, withoutB, _.timestamp, pattern)
      .map(_.stageTs)
    assert(gotWithout === Seq(Seq(100L, 102L)))
  }

  test("login pattern NFA ≡ independent adjacent-pair oracle on random streams") {
    import org.scalacheck.{Gen, Prop}
    val gen: Gen[List[LoginEvent]] = for {
      n <- Gen.choose(5, 60)
      events <- Gen.listOfN(n, for {
        user <- Gen.choose(1L, 3L)
        typ <- Gen.frequency(2 -> Gen.const("fail"), 1 -> Gen.const("success"))
        gap <- Gen.choose(0L, 4L)
      } yield (user, typ, gap))
    } yield {
      var ts = 1000000L
      events.map { case (u, t, gap) => ts += gap; LoginEvent(u, "1.2.3.4", t, ts) }
    }
    val prop = Prop.forAll(gen) { events =>
      events.groupBy(_.userId).forall { case (u, es) =>
        val sorted = es.sortBy(e => (e.timestamp, e.eventType))
        // independent oracle: adjacent fail pairs within the gap, computed
        // by a plain sliding scan — a different algorithm shape entirely
        val expected = sorted.sliding(2).collect {
          case Seq(a, b) if a.eventType == "fail" && b.eventType == "fail" &&
            b.timestamp - a.timestamp <= 2L => (a.timestamp, b.timestamp)
        }.toList.sorted
        val got = Cep.detectOrdered[LoginEvent, Long](u, sorted, _.timestamp,
            loginPattern)
          .filter(_.status == "matched")
          .map(m => (m.stageTs.head, m.stageTs.last)).sorted
        got == expected
      }
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("notFollowedBy: matches when the window closes without the event") {
    val pattern = Pattern.begin[LoginEvent]("a")(_.eventType == "a")
      .notFollowedBy("b")(_.eventType == "b")
      .within(10L)
    val ev = Seq(
      LoginEvent(1L, "ip", "a", 100L),  // b at 105 kills this run
      LoginEvent(1L, "ip", "b", 105L),
      LoginEvent(1L, "ip", "a", 200L),  // no b within 10 s → MATCH
      LoginEvent(1L, "ip", "x", 205L),
      LoginEvent(1L, "ip", "b", 215L),  // outside the window: irrelevant
      LoginEvent(1L, "ip", "a", 300L))  // end of input closes it → MATCH
    val got = Cep.detectOrdered[LoginEvent, Long](1L, ev, _.timestamp, pattern)
    assert(got.map(m => (m.status, m.stageTs)) === Seq(
      ("matched", Seq(200L)), ("matched", Seq(300L))))
  }

  test("notFollowedBy(create→no pay) ≡ sequenceTimeout's timeout rows (streaming)") {
    val df = CsvSources.orders(spark, fixture("OrderLog.csv"))
    val creates = df.filter(col("eventType") === "create")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("start_usec"))
    val pays = df.filter(col("eventType") === "pay")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("pay_usec"))
    val batchTimeouts = Detectors.sequenceTimeout(creates, pays, "orderId",
        "start_usec", "pay_usec", 900L)
      .filter(col("status") === "timeout")
      .select(col("orderId")).as[Long].collect().toSet

    val pattern = Pattern.begin[OrderEvent]("create")(_.eventType == "create")
      .notFollowedBy("pay")(_.eventType == "pay")
      .within(900L)
    val events = df.as[OrderEvent].collect().toSeq
    val maxTs = events.map(_.eventTime).max
    val s1 = OrderEvent(9999901L, "create", "", maxTs + 100000L)
    val s2 = OrderEvent(9999902L, "create", "", maxTs + 200000L)
    val streamed = runStream(Seq(events, Seq(s1), Seq(s2))) { ds: Dataset[OrderEvent] =>
      Cep.detect[OrderEvent, Long](ds, _.orderId, "eventTime", _.eventTime,
        pattern, tieBreak = _.eventType)
    }.filter(m => m.key < 9999900L && m.status == "matched").map(_.key).toSet

    assert(batchTimeouts.nonEmpty)
    assert(streamed === batchTimeouts,
      "the negative pattern must emit exactly the orders that never paid in-window")
  }

  test("where() AND-refines; withMaxPartials keeps the newest runs") {
    // where(): only fails from the flagged ip count
    val refined = Pattern.begin[LoginEvent]("fail")(_.eventType == "fail")
      .where(_.ip == "bad").times(2).consecutive().within(10L)
    val ev = Seq(
      LoginEvent(1L, "bad", "fail", 100L),
      LoginEvent(1L, "ok", "fail", 101L),   // pred fails → consecutive resets
      LoginEvent(1L, "bad", "fail", 102L),
      LoginEvent(1L, "bad", "fail", 103L))
    val got = Cep.detectOrdered[LoginEvent, Long](1L, ev, _.timestamp, refined)
      .filter(_.status == "matched").map(_.stageTs)
    assert(got === Seq(Seq(102L, 103L)))

    // eviction backstop: 300 same-ts starts against a 4-run cap — the
    // NEWEST open runs survive, so the final pairs still emit and state
    // never exceeds the cap
    val capped = Pattern.begin[LoginEvent]("a")(_.eventType == "a")
      .followedBy("b")(_.eventType == "b").within(1000L)
      .withMaxPartials(4)
    val flood = (1 to 300).map(i => LoginEvent(1L, "ip", "a", 100L + i)) :+
      LoginEvent(1L, "ip", "b", 500L)
    val matches = Cep.detectOrdered[LoginEvent, Long](1L, flood, _.timestamp, capped)
      .filter(_.status == "matched")
    assert(matches.length === 4, "only the 4 retained runs can complete")
    assert(matches.map(_.stageTs.head).toSet === Set(397L, 398L, 399L, 400L),
      "retained runs must be the NEWEST starts")
  }

  test("maxPartials evictions emit observable 'dropped' rows (never silent)") {
    val capped = Pattern.begin[LoginEvent]("a")(_.eventType == "a")
      .followedBy("b")(_.eventType == "b").within(1000L)
      .withMaxPartials(4)
    val flood = (1 to 10).map(i => LoginEvent(1L, "ip", "a", 100L + i)) :+
      LoginEvent(1L, "ip", "b", 500L)
    val out = Cep.detectOrdered[LoginEvent, Long](1L, flood, _.timestamp, capped)
    val dropped = out.filter(_.status == "dropped")
    val matched = out.filter(_.status == "matched")
    // starts 5..10 each push the OLDEST open run over the cap
    assert(dropped.length === 6, "every evicted run must surface")
    assert(dropped.map(_.stageTs.head) === Seq(101L, 102L, 103L, 104L, 105L, 106L),
      "evictions are oldest-first and carry the run's consumed trail")
    assert(matched.map(_.stageTs.head).toSet === Set(107L, 108L, 109L, 110L))
    assert(dropped.length + matched.length === 10,
      "dropped + matched must account for every started run")
  }

  test("streaming times(2,4)+notFollowedBy with out-of-order arrivals ≡ detectBatch") {
    // 2-4 consecutive fails never followed by a success inside the window.
    // Delivery is scrambled WITHIN each batch and later batches carry
    // earlier event times for other keys (global disorder, per-key events
    // sorted only by the NFA's in-batch sort + watermark GC) — the match
    // set must still equal the batch fold of the same data.
    val pattern = Pattern.begin[LoginEvent]("fail")(_.eventType == "fail")
      .times(2, 4).consecutive()
      .notFollowedBy("success")(_.eventType == "success")
      .within(20L)
    val u1 = Seq( // success inside every window → no matches at all
      LoginEvent(1L, "ip", "fail", 100L),
      LoginEvent(1L, "ip", "fail", 101L),
      LoginEvent(1L, "ip", "fail", 102L),
      LoginEvent(1L, "ip", "success", 103L))
    val u2 = Seq( // three clean fails → (200,201),(201,203),(200,201,203)
      LoginEvent(2L, "ip", "fail", 200L),
      LoginEvent(2L, "ip", "fail", 201L),
      LoginEvent(2L, "ip", "fail", 203L))
    val all = u1 ++ u2
    // large delay so the cross-batch time reversal is never "late data";
    // sentinels far enough out to close every within-window
    val s1 = LoginEvent(90001L, "ip", "fail", 5000L)
    val s2 = LoginEvent(90002L, "ip", "fail", 6000L)
    val streamed = runStream(Seq(
        Seq(u2(2), u2(0), u2(1)),             // u2 scrambled
        Seq(u1(1), u1(3), u1(0), u1(2)),      // u1 scrambled, EARLIER times
        Seq(s1), Seq(s2))) { ds: Dataset[LoginEvent] =>
      Cep.detect[LoginEvent, Long](ds, _.userId, "timestamp", _.timestamp,
        pattern, tieBreak = _.eventType, watermarkDelay = "120 seconds")
    }.filter(_.key < 90000L)
    val batch = Cep.detectBatch[LoginEvent, Long](
      all.toDS(), _.userId, _.timestamp, pattern).collect().toSeq

    val key = (m: CepMatch[Long]) => (m.key, m.status, m.stageTs)
    assert(streamed.map(key).toSet === batch.map(key).toSet)
    assert(streamed.filter(_.status == "matched").map(m => (m.key, m.stageTs)).toSet
      === Set((2L, Seq(200L, 201L)), (2L, Seq(201L, 203L)),
        (2L, Seq(200L, 201L, 203L))))
  }

  test("emitUnmatched: dead-letter rows only for events that touched no run") {
    val pattern = Pattern.begin[OrderEvent]("create")(_.eventType == "create")
      .followedBy("pay")(_.eventType == "pay")
      .within(900L)
      .emitUnmatched(_.eventType == "pay")
    val ev = Seq(
      OrderEvent(1L, "pay", "t", 100L),     // no run anywhere → unmatched
      OrderEvent(1L, "create", "", 200L),
      OrderEvent(1L, "pay", "t", 205L),     // completes the run → matched
      OrderEvent(1L, "pay", "t", 210L),     // run consumed → unmatched
      OrderEvent(1L, "create", "", 2000L),
      OrderEvent(1L, "pay", "t", 2950L))    // expires the run → timeout ONLY
    val got = Cep.detectOrdered[OrderEvent, Long](1L, ev, _.eventTime, pattern)
      .map(m => (m.status, m.stageTs))
    assert(got === Seq(
      ("unmatched", Seq(100L)),
      ("matched", Seq(200L, 205L)),
      ("unmatched", Seq(210L)),
      ("timeout", Seq(2000L))))
  }

  test("next() strict boundary vs followedBy() relaxed boundary") {
    val strict = Pattern.begin[LoginEvent]("a")(_.eventType == "a")
      .next("b")(_.eventType == "b")
    val relaxed = Pattern.begin[LoginEvent]("a")(_.eventType == "a")
      .followedBy("b")(_.eventType == "b")
    val ev = Seq(
      LoginEvent(1L, "ip", "a", 100L),
      LoginEvent(1L, "ip", "x", 101L), // intervening event
      LoginEvent(1L, "ip", "b", 102L))
    def run(p: Pattern[LoginEvent]): Seq[CepMatch[Long]] =
      Cep.detectOrdered[LoginEvent, Long](1L, ev, _.timestamp, p)
    assert(run(strict).isEmpty, "next() must kill the run on x")
    assert(run(relaxed).map(_.stageTs) === Seq(Seq(100L, 102L)))
  }
}
