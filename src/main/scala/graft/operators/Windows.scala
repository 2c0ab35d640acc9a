package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-time window aggregation operators — the Spark-first re-expression of
 * the reference's keyed/global window + incremental-aggregate + window-function
 * stack (SURVEY.md §2.3, W1-W9 / A1-A7; e.g. HotItemApp.java:53-61,
 * PageViewApp.java:39-48, UvCountApp.java:46-58).
 *
 * Design notes for scale:
 *  - Everything is declarative `groupBy(window(...), keys).agg(...)` —
 *    Catalyst plans a partial (map-side) HashAggregate before the single
 *    shuffle, so a hot key (the reference hand-salted this, PageViewApp2)
 *    is already combined per-partition before the exchange.
 *  - A sliding window of size S and slide L replicates each row S/L times
 *    *after* filter/projection — keep the projected row narrow (we project
 *    to key + ts before windowing).
 *  - Top-N re-shuffles by windowEnd only (second exchange), mirroring the
 *    reference's two-stage keyBy(itemId) → keyBy(windowEnd) topology
 *    (HotItemApp.java:55,60) — but the rank runs as a window function over
 *    sorted partitions, no per-key driver loops.
 */
object Windows {

  /** windowEnd as epoch seconds (bigint) — canonical, engine-portable window
    * label (raw timestamps don't round-trip parquet ns vs µs cleanly). */
  private def windowEndSec(c: Column): Column = c.getField("end").cast("long")

  /** Tumbling event-time window count per key (W5/W6 + A1/A3).
    * `keys` empty → global window (reference's timeWindowAll). */
  def tumblingCount(df: DataFrame, tsCol: String, keys: Seq[String], size: String,
                    countName: String = "cnt"): DataFrame = {
    val w = window(col(tsCol), size)
    df.groupBy((w +: keys.map(col)): _*)
      .agg(count(lit(1)).as(countName))
      .select(keys.map(col) :+ windowEndSec(col("window")).as("window_end") :+ col(countName): _*)
  }

  /** Sliding event-time window count per key (W3/W4 + A1/A2). */
  def slidingCount(df: DataFrame, tsCol: String, keys: Seq[String],
                   size: String, slide: String, countName: String = "cnt"): DataFrame = {
    val w = window(col(tsCol), size, slide)
    df.groupBy((w +: keys.map(col)): _*)
      .agg(count(lit(1)).as(countName))
      .select(keys.map(col) :+ windowEndSec(col("window")).as("window_end") :+ col(countName): _*)
  }

  /**
   * Sliding count via slice roll-up — the scale form of [[slidingCount]].
   * `window(ts, size, slide)` replicates every INPUT ROW size/slide times
   * before the exchange; here rows first aggregate into tumbling
   * slide-width slices (partial agg → one exchange of ~|keys × slices|
   * rows), then each aggregated slice fans out to the size/slide sliding
   * windows containing it and re-sums. At 100 TB the shuffle volume drops
   * by the replication factor (12× for 1h/5m); results are identical —
   * every sliding window is a disjoint union of slide-aligned slices.
   */
  def slidingCountRollup(df: DataFrame, tsCol: String, keys: Seq[String],
                         sizeSec: Long, slideSec: Long,
                         countName: String = "cnt"): DataFrame = {
    require(sizeSec % slideSec == 0, "size must be a multiple of slide")
    val fanout = (sizeSec / slideSec).toInt
    val slices = df
      .groupBy((window(col(tsCol), s"$slideSec seconds") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("_slice_cnt"))
      .select(keys.map(col) :+ windowEndSec(col("window")).as("_slice_end") :+ col("_slice_cnt"): _*)
    // Pin the explode stage's width at high fan-out (r16, guide §2.5):
    // the slice frame's exchange is byte-tiny by construction (it is the
    // PRE-aggregated form — that's the operator's point), so AQE's
    // size-based coalescing folds it to one partition and the ×fanout
    // row explosion plus the second partial aggregate then run on ONE
    // task (measured on hot_urls at sf0.1: a 2.0 s single-task stage in
    // a 5 s query — and the same fold happens on a cluster, coalescing
    // is size-based everywhere). An explicit REPARTITION_BY_NUM on the
    // slice keys is exempt from coalescing and costs one slice-sized
    // (i.e. ≤ 1/fanout of the explode output) exchange. Only at high
    // fan-out: at the 12× family the explode CPU is too small to buy
    // back an extra stage.
    val spread =
      if (fanout >= 16) {
        val n = df.sparkSession.sessionState.conf.numShufflePartitions
        slices.repartition(n, (keys.map(col) :+ col("_slice_end")): _*)
      } else slices
    spread
      .withColumn("window_end",
        explode(sequence(col("_slice_end"),
          col("_slice_end") + lit((fanout - 1) * slideSec), lit(slideSec))))
      .groupBy((keys.map(col) :+ col("window_end")): _*)
      .agg(sum(col("_slice_cnt")).as(countName))
  }

  /** Tumbling-window exact distinct count (A5 — the reference buffers the
    * whole window in a HashSet, UvCountApp.java:58-79; Spark's distinct
    * aggregate does a two-stage shuffle instead and never materializes the
    * set on one node). */
  def exactDistinct(df: DataFrame, tsCol: String, distinctCol: String, size: String,
                    name: String = "uv"): DataFrame =
    df.groupBy(window(col(tsCol), size))
      .agg(countDistinct(col(distinctCol)).as(name))
      .select(windowEndSec(col("window")).as("window_end"), col(name))

  /** Tumbling-window approximate distinct count (A7 — replaces the
    * reference's hand-rolled bloom-filter + Redis bitmap,
    * UvCountWithBloomFilterApp.java:87-161, with built-in HLL++; bounded
    * memory per window at any scale, no external KV round-trips). */
  def approxDistinct(df: DataFrame, tsCol: String, distinctCol: String, size: String,
                     rsd: Double = 0.02, name: String = "uv_approx"): DataFrame =
    df.groupBy(window(col(tsCol), size))
      .agg(approx_count_distinct(col(distinctCol), rsd).as(name))
      .select(windowEndSec(col("window")).as("window_end"), col(name))

  /**
   * Mergeable distinct-count SKETCH COLUMNS (DataSketches HLL): build one
   * sketch per (keys, fine window), then ROLL THEM UP to any coarser
   * window by unioning the sketch binaries — re-aggregation without
   * re-scanning the raw data. This is the sketch-column pattern that
   * makes distinct counts tractable at 100 TB: the hourly sketch table is
   * |keys × hours| rows of ~KB sketches; daily/weekly/monthly distincts
   * derive from it with a sketch-width shuffle instead of another pass
   * over the corpus (`approx_count_distinct` alone gives a NUMBER — it
   * can't be re-aggregated; sketches can, losslessly for the union).
   */
  def distinctSketches(df: DataFrame, tsCol: String, distinctCol: String,
                       size: String, keys: Seq[String] = Nil,
                       lgK: Int = 12): DataFrame =
    df.groupBy((window(col(tsCol), size) +: keys.map(col)): _*)
      .agg(hll_sketch_agg(col(distinctCol), lit(lgK)).as("uv_sketch"))
      .select(keys.map(col) ++ Seq(
        windowEndSec(col("window")).as("window_end"), col("uv_sketch")): _*)

  /** Roll fine-window sketches up to `bucketSec`-wide windows: union the
    * sketches, then estimate. `window_end` of the coarse bucket follows the
    * same end-labeled convention as every window operator here. */
  def rollupSketches(sketches: DataFrame, bucketSec: Long,
                     keys: Seq[String] = Nil,
                     name: String = "uv_est"): DataFrame =
    sketches
      .withColumn("bucket_end",
        (ceil(col("window_end").cast("double") / bucketSec) * bucketSec).cast("long"))
      .groupBy((col("bucket_end") +: keys.map(col)): _*)
      .agg(hll_union_agg(col("uv_sketch"), lit(true)).as("_merged"))
      .select(keys.map(col) ++ Seq(col("bucket_end"),
        hll_sketch_estimate(col("_merged")).as(name)): _*)

  /** Top-N rows per window/partition by a measure (A6 — replaces the
    * reference's ListState-buffer + timer + ArrayList.sort per windowEnd,
    * HotItemApp.java:107-179). `tieBreak` makes rank deterministic. */
  def topNPerWindow(df: DataFrame, partCols: Seq[String], orderCol: String,
                    tieBreak: String, n: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieBreak).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Session windows (gap-based) — beyond the reference's fixed windows
    * (SURVEY.md §2.6 notes none used); included for engine completeness.
    * Emits (keys..., session_start, session_end, cnt) in epoch seconds. */
  def sessionCount(df: DataFrame, tsCol: String, keys: Seq[String], gap: String,
                   countName: String = "cnt"): DataFrame = {
    val w = session_window(col(tsCol), gap)
    df.groupBy((w +: keys.map(col)): _*)
      .agg(count(lit(1)).as(countName))
      .select(keys.map(col) ++ Seq(
        col("session_window").getField("start").cast("long").as("session_start"),
        col("session_window").getField("end").cast("long").as("session_end"),
        col(countName)): _*)
  }

  /** Two-phase salted aggregation (P3/A4 — the reference's hand-rolled
    * hot-key fix, PageViewApp2.java:55-64,111-147). Kept as an explicit
    * operator for skew cases where the *measure* is not algebraic enough
    * for map-side partial agg; for plain counts Spark's partial aggregation
    * makes this a no-op semantically (result is identical). */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                  countName: String = "cnt"): DataFrame = {
    val salted = df.withColumn("_salt", (rand(seed = 42) * saltBuckets).cast("int"))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(countName))
  }
}
