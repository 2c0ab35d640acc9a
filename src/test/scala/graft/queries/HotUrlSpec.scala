package graft.queries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.CsvSources

/** HotUrl family over the deterministic apache.log fixture: batch top-5,
  * SQL-surface ≡ DSL, and streaming windowed counts ≡ batch counts. */
class HotUrlSpec extends SparkSuite {

  import spark.implicits._

  private lazy val logs = CsvSources.apacheLog(spark, fixture("apache.log"))

  test("apacheLog parser: schema + GET share") {
    val rows = logs.collect()
    assert(rows.length === 1000)
    assert(logs.filter(col("method") === "GET").count() > 800)
    assert(logs.filter(col("ts").isNull).count() === 0, "every date must parse")
  }

  test("hotUrls: at most 5 per window, rank order correct") {
    val res = HotUrl.hotUrls(logs).cache()
    val perWindow = res.groupBy("window_end").count().agg(max("count")).as[Long].head()
    assert(perWindow <= 5)
    // within a window, rank follows cnt desc (tie: url asc)
    val w = res.filter(col("window_end") === res.select(max("window_end")).head().getLong(0))
      .orderBy("rn").select("cnt").as[Long].collect()
    assert(w.sameElements(w.sorted(Ordering[Long].reverse)))
    res.unpersist()
  }

  test("W7 lateness horizon: 61s watermark absorbs the fixture's 70s-late rows' drops seen at 1s") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // replay in ORIGINAL FILE ORDER (the fixture plants rows 3s and 70s
    // out of order) in 47-row micro-batches so the watermark advances
    // between batches like a live stream. 47 is prime so the planted late
    // rows (every 331st raw row) land at varying offsets within batches —
    // a drop only happens when a late row lands EARLY in a batch, where
    // its event time falls behind the previous batch's max − delay.
    val ordered = logs.filter(col("method") === "GET")
      .select(col("url"), col("ts").cast("long"))
      .as[(String, Long)].collect().toSeq // parser preserves file order per file
    def droppedWith(delay: String): Long = {
      val input = MemoryStream[(String, Long)]
      val counts = HotUrl.hotUrlCountsStream(
        input.toDS().select(col("_2").cast("timestamp").as("ts"), col("_1").as("url"))
          .withColumn("method", lit("GET")), watermarkDelay = delay)
      val q = counts.writeStream.format("memory")
        .queryName(s"lw${System.nanoTime()}").outputMode("update").start()
      try {
        ordered.grouped(47).foreach { b => input.addData(b); q.processAllAvailable() }
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      } finally q.stop()
    }
    val strict = droppedWith("1 second")
    val lenient = droppedWith("61 seconds")
    assert(strict > 0, "1s watermark must drop some planted late rows")
    assert(lenient < strict,
      s"61s lateness horizon must absorb drops: strict=$strict lenient=$lenient")
  }

  test("W8 topology: late GET rows surface as data alongside the main path") {
    implicit val sqlCtx = spark.sqlContext
    // two consumers of one source = the reference's split topology; replay
    // in file order so the planted 70s-late rows land behind the watermark
    val ordered = logs.filter(col("method") === "GET")
      .select(col("url"), col("ts").cast("long"))
      .as[(String, Long)].collect().toSeq
    val input = MemoryStream[(String, Long)]
    val src = input.toDS()
      .select(col("_2").cast("timestamp").as("ts"), col("_1").as("url"))
      .withColumn("method", lit("GET"))
    val late = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val (counts, lateWriter) = HotUrl.hotUrlCountsWithLate(src, delaySec = 1L) {
      (df, _) => late ++= df.select(col("url"), col("ts").cast("long"))
        .as[(String, Long)].collect()
    }
    val qMain = counts.writeStream.format("memory").queryName("wl_main")
      .outputMode("update").start()
    val qLate = lateWriter.start()
    try {
      ordered.grouped(47).foreach { b =>
        input.addData(b); qMain.processAllAvailable(); qLate.processAllAvailable()
      }
    } finally { qMain.stop(); qLate.stop() }
    assert(late.nonEmpty, "the fixture's planted 70s-late rows must surface as data")
    // every captured late row really is behind the watermark built from the
    // rows before its batch (file order: compare against the prior max ts)
    val maxBefore = ordered.map(_._2).scanLeft(Long.MinValue)(math.max)
    val lateSet = late.toSet
    assert(lateSet.subsetOf(ordered.zipWithIndex.collect {
      case ((u, t), i) if t < maxBefore(i) - 1 => (u, t) }.toSet),
      "late branch must only carry genuinely out-of-horizon rows")
    assert(spark.table("wl_main").count() > 0, "main branch still aggregates")
  }

  test("streaming windowed counts ≡ batch (single replay batch)") {
    implicit val sqlCtx = spark.sqlContext
    // (url, epoch-second) tuples — MemoryStream needs a product encoder
    val rows = logs.filter(col("method") === "GET")
      .select(col("url"), col("ts").cast("long")).as[(String, Long)].collect().toSeq
    val input = MemoryStream[(String, Long)]
    val streamed = HotUrl.hotUrlCountsStream(
      input.toDS().select(col("_2").cast("timestamp").as("ts"), col("_1").as("url"))
        .withColumn("method", lit("GET")))
    val q = streamed.writeStream.format("memory").queryName("hoturl")
      .outputMode("update").start()
    try { input.addData(rows); q.processAllAvailable() } finally q.stop()
    val stream = spark.table("hoturl")
      .select("url", "window_end", "cnt").as[(String, Long, Long)].collect().toSet

    val batch = graft.operators.Windows.slidingCount(
        logs.filter(col("method") === "GET").select(col("ts"), col("url")),
        "ts", Seq("url"), "10 minutes", "5 seconds")
      .select("url", "window_end", "cnt").as[(String, Long, Long)].collect().toSet
    assert(stream === batch)
  }
}
