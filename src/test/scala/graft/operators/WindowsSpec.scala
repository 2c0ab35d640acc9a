package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Window operator semantics on small deterministic data. */
class WindowsSpec extends SparkSuite {

  import spark.implicits._

  // events at :00:10, :04:50, :05:10, :59:50, 1:00:10 for two keys
  private lazy val events = Seq(
    ("a", 10L), ("a", 290L), ("b", 310L), ("a", 3590L), ("b", 3610L)
  ).toDF("k", "sec").withColumn("ts", timestamp_seconds(col("sec")))

  test("tumblingCount: 1h windows, per-key and global") {
    val perKey = Windows.tumblingCount(events, "ts", Seq("k"), "1 hour")
      .as[(String, Long, Long)].collect().toSet
    assert(perKey === Set(("a", 3600L, 3L), ("b", 3600L, 1L), ("b", 7200L, 1L)))
    val global = Windows.tumblingCount(events.select("ts"), "ts", Seq.empty, "1 hour")
      .as[(Long, Long)].collect().toSet
    assert(global === Set((3600L, 4L), (7200L, 1L)))
  }

  test("slidingCount: each row lands in size/slide windows") {
    val res = Windows.slidingCount(events.filter(col("k") === "b"), "ts",
        Seq("k"), "10 minutes", "5 minutes")
      .as[(String, Long, Long)].collect().toSet
    // row at 310s → windows ending 600 and 900; row at 3610 → 3900, 4200
    assert(res === Set(("b", 600L, 1L), ("b", 900L, 1L), ("b", 3900L, 1L), ("b", 4200L, 1L)))
  }

  test("slidingCountRollup ≡ slidingCount (slice roll-up is exact)") {
    val big = spark.range(2000).selectExpr("cast(id % 7 as string) as k",
      "timestamp_seconds(id * 37 % 9000) as ts")
    val direct = Windows.slidingCount(big, "ts", Seq("k"), "1 hour", "5 minutes")
      .as[(String, Long, Long)].collect().toSet
    val rollup = Windows.slidingCountRollup(big, "ts", Seq("k"), 3600L, 300L)
      .as[(String, Long, Long)].collect().toSet
    assert(rollup === direct)
  }

  test("slidingCountRollup ≡ slidingCount at high fan-out (spread branch)") {
    // fanout = 120 ≥ 16 exercises the r16 pinned-width repartition
    // before the slice explode (the hot_urls regime); the branch is a
    // pure plan change, so the result set must stay identical to the
    // naive replicate-every-row form — including keys whose slices fan
    // into overlapping windows.
    val big = spark.range(1500).selectExpr("cast(id % 5 as string) as k",
      "timestamp_seconds(id * 13 % 3000) as ts")
    // reference side under interpreted execution: window() at 120×
    // replication compiles an Expand wide enough that codegen splits it
    // into a nested class that trips Janino's protected-field access
    // (IllegalAccessError on BufferedRowIterator.partitionIndex) — a
    // Spark codegen artifact of the TEST's reference computation only;
    // the production operator under test is the explode-based rollup.
    val wscg = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(wscg, "true")
    val direct =
      try {
        spark.conf.set(wscg, "false")
        Windows.slidingCount(big, "ts", Seq("k"), "600 seconds", "5 seconds")
          .as[(String, Long, Long)].collect().toSet
      } finally spark.conf.set(wscg, prev)
    val rollup = Windows.slidingCountRollup(big, "ts", Seq("k"), 600L, 5L)
      .as[(String, Long, Long)].collect().toSet
    assert(rollup === direct)
  }

  test("exactDistinct vs approxDistinct on duplicated keys") {
    val dup = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("uid")
      .withColumn("ts", timestamp_seconds(lit(100L)))
    assert(Windows.exactDistinct(dup, "ts", "uid", "1 hour")
      .select("uv").as[Long].head() === 3L)
    assert(Windows.approxDistinct(dup, "ts", "uid", "1 hour")
      .select("uv_approx").as[Long].head() === 3L) // HLL exact at tiny n
  }

  test("topNPerWindow: deterministic tie-break") {
    val counts = Seq(("x", 100L, 5L), ("y", 100L, 5L), ("z", 100L, 9L), ("w", 100L, 1L))
      .toDF("item", "window_end", "cnt")
    val top = Windows.topNPerWindow(counts, Seq("window_end"), "cnt", "item", 3)
      .orderBy("rn").select("item").as[String].collect().toSeq
    assert(top === Seq("z", "x", "y")) // tie x/y broken by item asc
  }

  test("saltedCount ≡ plain count") {
    val df = Seq("a", "a", "a", "b").toDF("k")
    val salted = Windows.saltedCount(df, Seq("k"), 8)
      .as[(String, Long)].collect().toSet
    assert(salted === Set(("a", 3L), ("b", 1L)))
  }

  test("HLL sketch rollup: hourly union ≈ exact daily; merge ≡ direct daily sketch") {
    val df = spark.range(20000).selectExpr(
      "timestamp_seconds(1000000 + (id % 200000) * 2) as ts",
      "(id * 2654435761) % 7000 as uid")
    val hourly = Windows.distinctSketches(df, "ts", "uid", "1 hour")
    val daily = Windows.rollupSketches(hourly, 86400L)
    val exact = df
      .withColumn("bucket_end",
        (ceil((col("ts").cast("long") + 0.0) / 86400) * 86400).cast("long"))
      .groupBy("bucket_end").agg(countDistinct("uid").as("exact_uv"))
    val joined = daily.join(exact, "bucket_end")
      .select($"bucket_end", $"uv_est", $"exact_uv")
      .as[(Long, Double, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (b, est, ex) =>
      assert(math.abs(est - ex) / ex.toDouble < 0.05,
        s"bucket $b: est $est vs exact $ex")
    }
    // mergeability: union of hourly sketches estimates like a direct daily sketch
    val direct = Windows.distinctSketches(df, "ts", "uid", "1 day")
      .select($"window_end".as("bucket_end"),
        hll_sketch_estimate($"uv_sketch").as("direct_est"))
    val cmp = daily.join(direct, "bucket_end")
      .select($"uv_est", $"direct_est").as[(Double, Double)].collect()
    cmp.foreach { case (u, d) =>
      assert(math.abs(u - d) / d < 0.02, s"union $u vs direct $d")
    }
  }
}
