package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

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
}
