package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch forms of the reference's stateful detectors (SURVEY.md §2.4 J3-J6,
 * §2.2 F5). Streaming forms (flatMapGroupsWithState state machines) live in
 * graft.streaming; these batch forms double as their oracles.
 *
 * All use integer event time (epoch µs) and an id tie-break so ordering is
 * total and deterministic — required for the DuckDB correctness gate.
 */
object Detectors {

  /**
   * Consecutive-failure detector (J4/J5 — LoginFailAppWithCep.java:61-75,
   * LoginFailApp2.java:59-99): two *adjacent* failures for the same key
   * within `maxGapSec`. Strict contiguity = any intervening non-fail event
   * resets the pair, which `lag` over the full event stream gives exactly.
   *
   * Scale: one shuffle on the key, one sort per partition — the window
   * function never materializes more than a partition in memory, and the
   * lag frame is O(1) per row.
   */
  def consecutiveFailures(df: DataFrame, keyCol: String, usecCol: String,
                          idCol: String, isFail: Column, maxGapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(usecCol), col(idCol))
    df.withColumn("_fail", isFail)
      .withColumn("prev_fail", lag(col("_fail"), 1).over(w))
      .withColumn("first_fail_usec", lag(col(usecCol), 1).over(w))
      .filter(col("_fail") && col("prev_fail") &&
        col(usecCol) - col("first_fail_usec") <= lit(maxGapSec * 1000000L))
      .select(col(keyCol), col("first_fail_usec"),
        col(usecCol).as("second_fail_usec"))
  }

  /**
   * Sequence-timeout detector (J3/J6 — OrderTimeoutAppWithCep.java:46-65,
   * OrderTimeoutAppWithState.java:57-111): for every `start` event, find the
   * first `follow` event with the same key at-or-after it (the reference
   * matches a pay in the same second as its create — file arrival order)
   * and within `windowSec`; emit status "payed" (with the follow time) or
   * "timeout".
   *
   * Batch shape: left equi-join + range filter + min-aggregate back to one
   * row per start event. The equi key carries the shuffle; at scale this is
   * a plain sort-merge join, no state store.
   */
  def sequenceTimeout(starts: DataFrame, follows: DataFrame, key: String,
                      startUsec: String, followUsec: String,
                      windowSec: Long,
                      matchedName: String = "payed",
                      timeoutName: String = "timeout"): DataFrame = {
    val s = starts.alias("s")
    val f = follows.alias("f")
    s.join(f,
        col(s"s.$key") === col(s"f.$key") &&
          col(s"f.$followUsec") >= col(s"s.$startUsec") &&
          col(s"f.$followUsec") <= col(s"s.$startUsec") + lit(windowSec * 1000000L),
        "left_outer")
      .groupBy(col(s"s.$key").as(key), col(s"s.$startUsec").as(startUsec))
      .agg(min(col(s"f.$followUsec")).as("follow_usec"))
      .withColumn("status",
        when(col("follow_usec").isNotNull, lit(matchedName)).otherwise(lit(timeoutName)))
  }

  /**
   * Count-threshold blacklist (F5 — AdClickKeyProcessFunc,
   * AdClickByProvinceApp.java:112-180: block a (user, ad) pair after 100
   * clicks in a day). Batch form: group + having. The reference's daily
   * UTC+8 reset maps to an optional day-bucket key computed by the caller
   * (e.g. `(sec + 8*3600) div 86400` — SURVEY.md §2.6).
   */
  def countBlacklist(df: DataFrame, keys: Seq[String], threshold: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("clicks"))
      .filter(col("clicks") >= threshold)
      .withColumn("warning",
        concat(lit("click count "), col("clicks"), lit(" >= threshold "), lit(threshold)))
}
