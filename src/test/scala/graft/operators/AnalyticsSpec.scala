package graft.operators

import graft.SparkSuite

/**
 * Funnel conversion + cohort retention: hand-computed fixtures pinning the
 * strictly-after ordering rule, the entry-anchored horizon, greedy
 * earliest-first matching, and the floor-division cohort bucketing.
 */
class AnalyticsSpec extends SparkSuite {

  import spark.implicits._

  private def ev(rows: (String, Long, String)*) =
    rows.toDF("user", "ts", "et")

  private def report(rows: (String, Long, String)*)(horizon: Long = 0L) =
    Analytics.funnelSteps(ev(rows: _*), "user", "ts", "et",
        Seq("a", "b", "c"), horizon)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet

  test("steps must be strictly ordered in time: b before a does not count") {
    val r = report(
      ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 30L, "c"), // full funnel
      ("u2", 20L, "b"), ("u2", 30L, "a"),                   // b precedes a
      ("u3", 10L, "a"), ("u3", 10L, "b")                    // tie is not after
    )()
    assert(r === Set((1, "a", 3L, 0L), (2, "b", 1L, 10L), (3, "c", 1L, 20L)))
  }

  test("horizon is anchored at funnel ENTRY, not the previous step") {
    // u1: b at t1+50, c at t1+90 — inside a 100-s horizon even though
    // c-b gap alone is small; u2: b inside, c at t1+150 — outside.
    val r = report(
      ("u1", 0L, "a"), ("u1", 50L, "b"), ("u1", 90L, "c"),
      ("u2", 0L, "a"), ("u2", 50L, "b"), ("u2", 150L, "c")
    )(horizon = 100L)
    assert(r === Set((1, "a", 2L, 0L), (2, "b", 2L, 100L), (3, "c", 1L, 90L)))
  }

  test("greedy earliest-first matching never loses a longer completion") {
    // earliest a at 0 has no c after its earliest b? u has a=0, b=5,
    // c=3: c precedes the earliest b, so step 3 unreached — and no
    // alternative (later-b) assignment could reach it either, since any
    // b is >= 5. Contrast u2: a=0, b=2, c=4 completes.
    val r = report(
      ("u1", 0L, "a"), ("u1", 5L, "b"), ("u1", 3L, "c"),
      ("u2", 0L, "a"), ("u2", 2L, "b"), ("u2", 4L, "c")
    )()
    assert(r === Set((1, "a", 2L, 0L), (2, "b", 2L, 7L), (3, "c", 1L, 4L)))
  }

  test("repeat events use the earliest qualifying occurrence") {
    val r = report(
      ("u1", 0L, "a"), ("u1", 100L, "a"), // second a ignored for t1
      ("u1", 40L, "b"), ("u1", 60L, "b"), // earliest-after wins: 40
      ("u1", 50L, "c")                    // after t2=40 -> reached at 50
    )()
    assert(r === Set((1, "a", 1L, 0L), (2, "b", 1L, 40L), (3, "c", 1L, 50L)))
  }

  test("empty tail steps report zero users and zero lag") {
    val r = report(("u1", 0L, "a"))()
    assert(r === Set((1, "a", 1L, 0L), (2, "b", 0L, 0L), (3, "c", 0L, 0L)))
  }

  test("cohort retention: floor-division buckets, offsets from first bucket") {
    val e = Seq(
      ("u1", 10L), ("u1", 86400L + 5L), ("u1", 3 * 86400L),  // d0, d1, d3
      ("u1", 86400L + 7L),                                   // dup (u1, d1)
      ("u2", 86400L), ("u2", 2 * 86400L - 1L)                // d1, d1 dup
    ).toDF("user", "ts")
    val r = Analytics.cohortRetention(e, "user", "ts")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r === Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L), (1L, 0L, 1L)))
  }

  test("cohort retention counts users, not events, per cell") {
    val e = Seq(("u1", 0L), ("u2", 5L), ("u1", 86401L), ("u2", 86402L))
      .toDF("user", "ts")
    val r = Analytics.cohortRetention(e, "user", "ts")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r === Set((0L, 0L, 2L), (0L, 1L, 2L)))
  }
}
