package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.{OrderEvent, ReceiptEvent}
import graft.operators.Joins
import graft.sources.CsvSources

/** J1 stream-stream interval join ≡ batch interval join on the reference
  * fixtures (final-state set equivalence). */
class StreamJoinsSpec extends SparkSuite {

  import spark.implicits._

  test("intervalJoinStream ≡ batch intervalJoin on OrderLog+ReceiptLog") {
    val orders = CsvSources.orders(spark, fixture("OrderLog.csv"))
    val receipts = CsvSources.receipts(spark, fixture("ReceiptLog.csv"))
    val pays = orders.filter(col("eventType") === "pay" && col("txId") =!= "")

    val batch = Joins.intervalJoin(
        pays.select(col("txId"), (col("eventTime") * 1000000L).as("pay_usec")),
        receipts.select(col("txId"), (col("timestamp") * 1000000L).as("receipt_usec")),
        "txId", "pay_usec", "receipt_usec", 3L, 5L)
      .select(col("l.txId"), (col("pay_usec") / 1000000L).cast("long"),
        (col("receipt_usec") / 1000000L).cast("long"))
      .as[(String, Long, Long)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val payIn = MemoryStream[OrderEvent]
    val rcptIn = MemoryStream[ReceiptEvent]
    val joined = StreamJoins.intervalJoinStream(payIn.toDS(), rcptIn.toDS(), 3L, 5L)
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      payIn.addData(pays.as[OrderEvent].collect().toSeq)
      rcptIn.addData(receipts.as[ReceiptEvent].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ssj")
      .select("txId", "pay_sec", "receipt_sec")
      .as[(String, Long, Long)].collect().toSet

    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("enrichStream: static dim broadcast-joins into every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (item, sec)
    val facts = input.toDS()
      .select(col("_1").as("item"), col("_2").cast("timestamp").as("ts"))
    val dim = Seq((1L, "shoe"), (2L, "hat")).toDF("item", "label")
    val q = StreamJoins.enrichStream(facts, dim, "item")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      input.addData(Seq((1L, 10L), (2L, 11L), (9L, 12L)))
      q.processAllAvailable()
      input.addData(Seq((2L, 20L))) // second batch re-joins the dim
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enr").select("item", "label")
      .as[(Long, Option[String])].collect().toSeq
    assert(got.sorted === Seq((1L, Some("shoe")), (2L, Some("hat")),
      (2L, Some("hat")), (9L, None)).sorted)
  }

  test("dedupStream: first fingerprint occurrence passes, replays drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)] // (text, sec)
    val src = input.toDS()
      .select(col("_1").as("text"), col("_2").cast("timestamp").as("ts"))
    val q = StreamJoins.dedupStream(src, "ts", "text", "10 seconds")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData(Seq(("aaa", 10L), ("bbb", 11L), ("aaa", 12L)))
      q.processAllAvailable()
      input.addData(Seq(("aaa", 13L), ("ccc", 14L))) // replay across batches drops too
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sdedup").select("text").as[String].collect().toSeq
    assert(got.sorted === Seq("aaa", "bbb", "ccc"))
  }

  test("intervalJoinOuterStream: unmatched pay emits null receipt after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val payIn = MemoryStream[OrderEvent]
    val rcptIn = MemoryStream[ReceiptEvent]
    val joined = StreamJoins.intervalJoinOuterStream(payIn.toDS(), rcptIn.toDS(), 3L, 5L)
    val q = joined.writeStream.format("memory").queryName("ssjo").outputMode("append").start()
    try {
      // tx1 matches inside [-3s,+5s]; tx2 has no receipt ever
      payIn.addData(OrderEvent(1L, "pay", "tx1", 100L), OrderEvent(2L, "pay", "tx2", 101L))
      rcptIn.addData(ReceiptEvent("tx1", "wechat", 103L))
      q.processAllAvailable()
      // push both watermarks far past tx2's horizon, then one more batch
      // so the null row for tx2 can be finalized and emitted
      payIn.addData(OrderEvent(9L, "pay", "tx9", 1000L))
      rcptIn.addData(ReceiptEvent("tx9", "cash", 1001L))
      q.processAllAvailable()
      payIn.addData(OrderEvent(10L, "pay", "tx10", 2000L))
      rcptIn.addData(ReceiptEvent("tx10", "cash", 2001L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjo")
      .select("txId", "payChannel")
      .as[(String, Option[String])].collect().toMap
    assert(got("tx1") === Some("wechat"), "matched pair keeps its receipt")
    assert(got.contains("tx2") && got("tx2").isEmpty,
      "unmatched pay must emit with null receipt once the watermark passes")
  }

  test("asofJoinStream ≡ batch asofJoin, multi-batch replay with out-of-order rights") {
    // deterministic many-key data; rights unique per (key, ts)
    val lefts = (0 until 300).map(i => (i % 7L, 100L + (i * 37) % 400))
    val rights = (0 until 150).map(i => (i % 7L, 90L + (i * 53) % 420, i / 10.0))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (key, ts)

    val batchL = lefts.toDF("k", "lu")
      .select($"k", ($"lu" * 1000000L).as("lu")) // batch form takes usec
    val batchR = rights.toDF("k", "ru", "v")
      .select($"k", ($"ru" * 1000000L).as("ru"), $"v")
    val batch = graft.operators.Joins
      .asofJoin(batchL, batchR, "k", "lu", "ru", Seq("v"))
      .select($"k", ($"lu" / 1000000L).cast("long"),
        ($"ru" / 1000000L).cast("long"), $"v")
      .as[(Long, Long, Option[Long], Option[Double])].collect()
      .groupBy(identity).view.mapValues(_.length).toMap

    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Long)]
    val rIn = MemoryStream[(Long, Long, Double)]
    val joined = StreamJoins.asofJoinStream(
      lIn.toDS().toDF("k", "ls"), rIn.toDS().toDF("k", "rs", "v"),
      "k", "ls", "rs", "v", watermarkDelay = "30 seconds")
    val q = joined.writeStream.format("memory").queryName("asof_s")
      .outputMode("append").start()
    try {
      // replay in TIME order, chunked into sequential micro-batches — the
      // out-of-orderness is the shuffle WITHIN a chunk, which stays inside
      // the 30 s watermark delay; a replay more disordered than the
      // declared delay would (correctly) drop rights as late. A far-future
      // flush batch then pushes every pending left across the watermark.
      val tagged =
        lefts.map(e => ("l", e._1, e._2, 0.0)) ++
          rights.map(e => ("r", e._1, e._2, e._3))
      tagged.sortBy(_._3).grouped(90).foreach { chunk =>
        val (lch, rch) = chunk.partition(_._1 == "l")
        if (lch.nonEmpty) lIn.addData(lch.map(e => (e._2, e._3)))
        if (rch.nonEmpty) rIn.addData(rch.map(e => (e._2, e._3, e._4)))
        q.processAllAvailable()
      }
      lIn.addData(Seq((999L, 100000L)))
      q.processAllAvailable()
      lIn.addData(Seq((999L, 200000L))) // push watermark past the flush row
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("asof_s")
      .filter($"key" =!= 999L)
      .select("key", "left_sec", "right_sec", "right_value")
      .as[(Long, Long, Option[Long], Option[Double])].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(streamed === batch, "stream must equal batch as-of per-row multiset")
    assert(batch.keys.exists(_._3.isDefined) && batch.keys.exists(_._3.isEmpty),
      "fixture exercises both matched and unmatched lefts")
  }

  test("asofJoinStream ≡ batch under randomized shapes (seeded scenarios)") {
    // five seeded random corpora × random chunk sizes; disorder stays
    // inside the declared watermark delay by chunking in time order
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val nKeys = 1 + rnd.nextInt(9)
      val lefts = (0 until 120 + rnd.nextInt(200)).map(_ =>
        (rnd.nextInt(nKeys).toLong, 50L + rnd.nextInt(3000).toLong))
      val rights = (0 until 40 + rnd.nextInt(120)).map(_ =>
        (rnd.nextInt(nKeys).toLong, 40L + rnd.nextInt(3100).toLong,
          rnd.nextInt(100) / 10.0))
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val tol = if (rnd.nextBoolean()) Some(100L + rnd.nextInt(500).toLong) else None

      val batch = graft.operators.Joins.asofJoin(
          lefts.toDF("k", "lu").select($"k", ($"lu" * 1000000L).as("lu")),
          rights.toDF("k", "ru", "v").select($"k", ($"ru" * 1000000L).as("ru"), $"v"),
          "k", "lu", "ru", Seq("v"), toleranceUsec = tol.map(_ * 1000000L))
        .select($"k", ($"lu" / 1000000L).cast("long"),
          ($"ru" / 1000000L).cast("long"), $"v")
        .as[(Long, Long, Option[Long], Option[Double])].collect()
        .groupBy(identity).view.mapValues(_.length).toMap

      implicit val sqlCtx = spark.sqlContext
      val lIn = MemoryStream[(Long, Long)]
      val rIn = MemoryStream[(Long, Long, Double)]
      val joined = StreamJoins.asofJoinStream(
        lIn.toDS().toDF("k", "ls"), rIn.toDS().toDF("k", "rs", "v"),
        "k", "ls", "rs", "v", watermarkDelay = "20 seconds",
        toleranceSec = tol)
      val qn = s"asof_rand_$seed"
      val q = joined.writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        val tagged = lefts.map(e => ("l", e._1, e._2, 0.0)) ++
          rights.map(e => ("r", e._1, e._2, e._3))
        tagged.sortBy(_._3).grouped(40 + rnd.nextInt(120)).foreach { chunk =>
          val (lch, rch) = chunk.partition(_._1 == "l")
          if (lch.nonEmpty) lIn.addData(lch.map(e => (e._2, e._3)))
          if (rch.nonEmpty) rIn.addData(rch.map(e => (e._2, e._3, e._4)))
          q.processAllAvailable()
        }
        lIn.addData(Seq((999L, 500000L))); q.processAllAvailable()
        lIn.addData(Seq((999L, 900000L))); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(qn).filter($"key" =!= 999L)
        .select("key", "left_sec", "right_sec", "right_value")
        .as[(Long, Long, Option[Long], Option[Double])].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(streamed === batch, s"seed $seed (tol=$tol) diverged")
    }
  }
}
