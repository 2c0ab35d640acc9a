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

  // ---- single-scan twin (r12): frame-for-frame equality with the k-scan
  // form, across step depths and horizons, on a seeded random event log
  // that mixes repeats, out-of-order steps, non-funnel noise events, and
  // users missing arbitrary steps.

  private def assertOneScanEqual(steps: Seq[String], horizon: Long,
                                 rows: Seq[(String, Long, String)]): Unit = {
    val df = rows.toDF("user", "ts", "et")
    val a = Analytics.funnelUserTimes(df, "user", "ts", "et", steps, horizon)
    val b = Analytics.funnelUserTimesOneScan(df, "user", "ts", "et", steps,
      horizon)
    assert(a.length === b.length)
    a.zip(b).zipWithIndex.foreach { case ((fa, fb), i) =>
      assert(fa.columns.toSeq === fb.columns.toSeq, s"frame $i columns")
      assert(fa.exceptAll(fb).isEmpty && fb.exceptAll(fa).isEmpty,
        s"frame $i rows differ (steps=$steps horizon=$horizon)")
    }
  }

  private def randomLog(seed: Long, users: Int, events: Int,
                        types: Seq[String]): Seq[(String, Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to events).map { _ =>
      (s"u${rnd.nextInt(users)}", rnd.nextInt(1000).toLong,
        types(rnd.nextInt(types.length)))
    }
  }

  test("one-scan funnel equals the k-scan form at k=3, no horizon") {
    assertOneScanEqual(Seq("a", "b", "c"), 0L,
      randomLog(7L, 40, 600, Seq("a", "b", "c", "x", "y")))
  }

  test("one-scan funnel equals the k-scan form at k=3 with horizon") {
    assertOneScanEqual(Seq("a", "b", "c"), 120L,
      randomLog(11L, 40, 600, Seq("a", "b", "c", "x")))
  }

  test("one-scan funnel equals the k-scan form at k=6 (deep funnel)") {
    val steps = Seq("s1", "s2", "s3", "s4", "s5", "s6")
    assertOneScanEqual(steps, 0L,
      randomLog(13L, 30, 1500, steps :+ "noise"))
    assertOneScanEqual(steps, 400L,
      randomLog(17L, 30, 1500, steps :+ "noise"))
  }

  test("one-scan funnel: tie at t_{i-1} is not after; entry-anchored horizon") {
    assertOneScanEqual(Seq("a", "b", "c"), 100L, Seq(
      ("u1", 0L, "a"), ("u1", 0L, "b"), ("u1", 5L, "c"),   // tie not after
      ("u2", 0L, "a"), ("u2", 50L, "b"), ("u2", 150L, "c") // c outside horizon
    ))
  }

  test("re-entry funnel: completion and timeout both close the window; in-window entries absorb; truncation") {
    // u1: attempt 1 completes (0/50/90 → end 90); the entry at 95 opens
    // attempt 2 (no b after 95 within 195 → reached 1, end 195); the
    // entry at 150 is INSIDE attempt 2's window — absorbed, no anchor;
    // the entry at 300 opens attempt 3, b at 310, no c → reached 2.
    // u2: b outside the window never converts; no second entry.
    // u3: entry events only at 0/50/120/250/360 — timeout chain anchors
    // greedily (0 → end 100; 120 → end 220; 250 → end 350) and
    // maxAttempts = 3 truncates the 360 tail.
    val rows = Seq(
      ("u1", 90L, "c"), ("u1", 0L, "a"), ("u1", 50L, "b"),
      ("u1", 95L, "a"), ("u1", 150L, "a"), ("u1", 300L, "a"),
      ("u1", 310L, "b"),
      ("u2", 0L, "a"), ("u2", 200L, "b"),
      ("u3", 0L, "a"), ("u3", 50L, "a"), ("u3", 120L, "a"),
      ("u3", 250L, "a"), ("u3", 360L, "a"),
      ("u4", 10L, "b"), ("u4", 20L, "c")) // no entry event: no attempts
    val got = Analytics.funnelAttempts(ev(rows: _*), "user", "ts", "et",
        Seq("a", "b", "c"), horizon = 100L, maxAttempts = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getInt(3), Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    assert(got === Set(
      ("u1", 1, 0L, 3, Some(90L)),
      ("u1", 2, 95L, 1, None),
      ("u1", 3, 300L, 2, None),
      ("u2", 1, 0L, 1, None),
      ("u3", 1, 0L, 1, None),
      ("u3", 2, 120L, 1, None),
      ("u3", 3, 250L, 1, None)))
    // horizon is required: an incomplete attempt must be closeable
    intercept[IllegalArgumentException] {
      Analytics.funnelAttempts(ev(rows: _*), "user", "ts", "et",
        Seq("a", "b", "c"), horizon = 0L)
    }
  }

  test("re-entry funnel equals a sequential reference model on random logs") {
    // the distributed column-chain unrolling vs a straight-line scala
    // fold of the same greedy semantics — per user: anchor at the first
    // entry after the previous attempt's end (completion time, else
    // anchor + horizon), chain greedily within the window, truncate at
    // maxAttempts. Random logs have duplicate timestamps, interleaved
    // noise, and users missing whole steps.
    val steps = Seq("a", "b", "c")
    def ref(events: Seq[(Long, String)], h: Long, maxA: Int)
        : Set[(Int, Long, Int, Option[Long])] = {
      val perStep = steps.map(s =>
        events.filter(_._2 == s).map(_._1).sorted)
      val out = Seq.newBuilder[(Int, Long, Int, Option[Long])]
      var lastEnd = Long.MinValue
      var a = 1
      var open = perStep.head.nonEmpty
      while (open && a <= maxA) {
        perStep.head.find(_ > lastEnd) match {
          case None => open = false
          case Some(t1) =>
            var prev = t1
            var reached = 1
            var alive = true
            (1 until steps.length).foreach { i =>
              if (alive) perStep(i).find(x => x > prev && x <= t1 + h) match {
                case Some(t) => prev = t; reached = i + 1
                case None => alive = false
              }
            }
            val tdone = if (reached == steps.length) Some(prev) else None
            out += ((a, t1, reached, tdone))
            lastEnd = tdone.getOrElse(t1 + h)
            a += 1
        }
      }
      out.result().toSet
    }
    for (seed <- Seq(3L, 11L, 29L); h <- Seq(40L, 200L)) {
      val log = randomLog(seed, 12, 400, steps ++ Seq("x", "y"))
      val got = Analytics.funnelAttempts(ev(log: _*), "user", "ts", "et",
          steps, horizon = h, maxAttempts = 3)
        .collect()
        .map(r => (r.getString(0), (r.getInt(1), r.getLong(2), r.getInt(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val byUser = log.groupBy(_._1)
        .view.mapValues(_.map(e => (e._2, e._3)).toSeq).toMap
      byUser.foreach { case (u, evs) =>
        val expected = ref(evs, h, 3)
        assert(got.getOrElse(u, Set.empty) === expected,
          s"seed=$seed h=$h user=$u")
      }
      assert(got.keySet.subsetOf(byUser.keySet))
    }
  }
}
