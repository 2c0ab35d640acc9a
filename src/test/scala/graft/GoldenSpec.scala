package graft

import org.apache.spark.sql.functions._

import graft.operators.{Detectors, Joins}
import graft.sources.CsvSources

/**
 * Frozen golden outputs over the reference's own fixture CSVs
 * (FIXTURES.md golden-output protocol) — hard literals, independently
 * derived from the raw CSVs, so a simultaneous drift of operator and
 * streaming twin cannot pass unnoticed.
 */
class GoldenSpec extends SparkSuite {

  import spark.implicits._

  test("golden: LoginLog 2s-adjacent-fail alarms") {
    val df = CsvSources.logins(spark, fixture("LoginLog.csv"))
    val alarms = Detectors.consecutiveFailures(
        df.withColumn("usec", col("timestamp") * 1000000L),
        "userId", "usec", "eventType", col("eventType") === "fail", 2L)
      .select(col("userId"), (col("first_fail_usec") / 1000000L).cast("long"),
        (col("second_fail_usec") / 1000000L).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(alarms === Set(
      (1035L, 1558430842L, 1558430843L),
      (1035L, 1558430843L, 1558430844L)))
  }

  test("golden: OrderLog 15-minute timeouts and stray pay") {
    val df = CsvSources.orders(spark, fixture("OrderLog.csv"))
    val creates = df.filter(col("eventType") === "create")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("start_usec"))
    val pays = df.filter(col("eventType") === "pay")
      .select(col("orderId"), (col("eventTime") * 1000000L).as("pay_usec"))
    val res = Detectors.sequenceTimeout(creates, pays, "orderId",
        "start_usec", "pay_usec", 900L)
      .select(col("orderId"), col("status")).as[(Long, String)].collect()
    assert(res.count(_._2 == "payed") === 37)
    assert(res.filter(_._2 == "timeout").map(_._1).toSet === Set(34756L, 34767L))
    val stray = pays.join(creates, Seq("orderId"), "left_anti")
      .select("orderId").as[Long].collect().toSet
    assert(stray === Set(34768L))
  }

  test("golden: pay↔receipt reconcile within [-3s, +5s]") {
    val orders = CsvSources.orders(spark, fixture("OrderLog.csv"))
    val receipts = CsvSources.receipts(spark, fixture("ReceiptLog.csv"))
    val pays = orders.filter(col("eventType") === "pay" && col("txId") =!= "")
    val res = Joins.reconcile(
        pays.select(col("txId"), (col("eventTime") * 1000000L).as("pay_usec")),
        receipts.select(col("txId"), (col("timestamp") * 1000000L).as("receipt_usec")),
        "txId", "pay_usec", "receipt_usec", 3L, 5L,
        leftName = "pay_no_receipt", rightName = "receipt_no_pay")
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(res("matched") === 4L)
    assert(res("matched") + res("pay_no_receipt") === 39L,
      "39 pays with txId (38 paired + the stray 34768)")
    assert(res("matched") + res("receipt_no_pay") === 40L,
      "40 receipt rows (the file has no trailing newline — wc -l says 39)")
  }

  test("golden: hash-seeded dedup/ANN gates are frozen exactly at sf0.001") {
    // These gates are rows-only at the driver (xxhash64 has no DuckDB
    // twin), but their outputs are fully DETERMINISTIC (fixed seeds,
    // partitioning-independent — verified across local[3]/local[8] and
    // 7/8 shuffle partitions). Freezing (row count, order-independent
    // content checksum) pins the exact result a rows-only check cannot:
    // any drift in shingling, signatures, banding, or tie-breaks fails
    // here even if the row count happens to survive.
    val dir = "/root/testdata/sf0.001"
    def checksum(name: String): (Long, Long) = {
      val df = SparkEntry.queries(name)(spark, dir)
      val cols = df.columns.sorted.map(col)
      val h = df.select(xxhash64(cols.map(_.cast("string")): _*).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
      (df.count(), h)
    }
    assert(checksum("dedup_minhash") === ((28L, -1118636273946113449L)))
    assert(checksum("dedup_simhash") === ((1176L, -4002432343246860937L)))
    assert(checksum("sim_lsh_topk") === ((14L, -5669993828419624227L)))
    assert(checksum("sim_near_dup") === ((14L, 943452110657249372L)))
  }
}
