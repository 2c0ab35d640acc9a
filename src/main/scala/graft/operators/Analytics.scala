package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-log product analytics: ordered funnel conversion and cohort
 * retention. The reference computes the single-pair version of the funnel
 * twice — OrderPayDetectApp chains create→pay inside a 15-minute horizon
 * (CEP and process-function variants, reference
 * gmall-flink-200621/gmall-realtime/…/OrderPayDetectApp; see
 * [[graft.streaming.Cep]] for the streaming mapping) — this generalizes
 * that two-step pattern to a k-step batch funnel, and adds the cohort
 * retention matrix every event-analytics suite pairs with it.
 *
 * Engine-parity conventions (SURVEY.md §7.4): event time is an integer
 * epoch-seconds column, the retention bucket is integer floor-division,
 * and every aggregate is a count or an integer sum — both operators are
 * bit-exact in ANSI SQL with no rounding epsilon.
 */
object Analytics {

  /**
   * Per-user earliest-completion times of an ordered funnel: `t1` is the
   * user's first `steps(0)` event; `t_i` is the first `steps(i-1)` event
   * STRICTLY after `t_{i-1}` (the reference's create→pay rule: the pay
   * must follow the create) and, with `horizon > 0`, within `horizon`
   * seconds of `t1` (the 15-minute-timeout generalization). Greedy
   * earliest-first matching: taking the earliest completion of every
   * prefix can never lose a completion of a longer prefix, so reach
   * counts are maximal GIVEN the fixed anchor `t1` = the user's first
   * entry event. There is no re-entry: a user whose first entry times
   * out but whose later re-entry would complete within its own horizon
   * counts as not converting — the reference's order-timeout semantics
   * (one order, one 15-minute clock), which differs from the re-entry-
   * window funnels some analytics tools offer (ADVICE r11).
   *
   * Returns one frame per step: frame i has `(u, t1 … t_i)`, one row per
   * user who reached step i.
   *
   * Scale shape: every join and aggregate is keyed on the user column —
   * frame i never exceeds one row per user, the event log is filtered to
   * a single step type before it shuffles, and the carried `t_j` columns
   * are functionally dependent on `u` (no row growth through the
   * chain). No window over the raw log, no per-user event collection:
   * memory per task is one group row, so a power user with millions of
   * events costs aggregation time, not heap.
   */
  def funnelUserTimes(df: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String],
                      horizon: Long = 0L): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct: $steps")
    val base = df.select(col(userCol).as("u"),
      col(tsCol).cast("long").as("ts"), col(typeCol).as("et"))
    val frames = Seq.newBuilder[DataFrame]
    var reach = base.filter(col("et") === steps.head)
      .groupBy("u").agg(min("ts").as("t1"))
    frames += reach
    for (i <- 2 to steps.length) {
      val within: Column =
        if (horizon > 0L) col("ts") <= col("t1") + horizon else lit(true)
      reach = base.filter(col("et") === steps(i - 1))
        .join(reach, Seq("u"))
        .filter(col("ts") > col(s"t${i - 1}") && within)
        .groupBy(col("u") +: (1 until i).map(j => col(s"t$j")): _*)
        .agg(min("ts").as(s"t$i"))
      frames += reach
    }
    frames.result()
  }

  /**
   * Single-scan twin of [[funnelUserTimes]] for DEEP funnels (r11
   * VERDICT #6): the k-frame form filters the event log once per step —
   * the right trade at k ≤ 3 (bounded memory: one group row per user,
   * ever), but k full scans of a 100 TB log at k = 6+. This form reads
   * the log ONCE: events are filtered to funnel step types BEFORE the
   * shuffle, grouped per (user, step) into sorted time arrays, and the
   * greedy chain walks those arrays in one codegen'd expression per
   * user. The trade is heap-shaped, not scan-shaped: per-user state is
   * the user's own funnel-step timestamps (power users cost array
   * memory here, where the k-scan form costs them nothing) — pick by
   * corpus: deep funnel over bounded per-user activity → this; shallow
   * funnel or unbounded per-user event counts → [[funnelUserTimes]].
   * Output is IDENTICAL (spec-pinned equality at several k × horizon
   * points): one frame per step, frame i = (u, t1 … t_i).
   */
  def funnelUserTimesOneScan(df: DataFrame, userCol: String, tsCol: String,
                             typeCol: String, steps: Seq[String],
                             horizon: Long = 0L): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct: $steps")
    val stepIdx = steps.zipWithIndex.toMap
    val idxCol = steps.foldLeft(lit(-1)) { (acc, s) =>
      when(col("et") === s, lit(stepIdx(s))).otherwise(acc)
    }
    // one scan, one shuffle: (u, step) sorted time arrays
    val perStep = df.select(col(userCol).as("u"),
        col(tsCol).cast("long").as("ts"), col(typeCol).as("et"))
      .filter(col("et").isin(steps: _*))
      .select(col("u"), col("ts"), idxCol.as("si"))
      .groupBy(col("u"), col("si"))
      .agg(sort_array(collect_list(col("ts"))).as("tss"))
      .groupBy(col("u"))
      .pivot("si", steps.indices.map(i => i: Any))
      .agg(first(col("tss")))
    // greedy chain: t1 = first step-0 time; t_i = first step-(i-1) time
    // strictly after t_{i-1} (and ≤ t1 + horizon when set). filter() +
    // array_min on the sorted per-step array IS the "first after" scan.
    val named = steps.indices.foldLeft(perStep) { (d, i) =>
      d.withColumnRenamed(i.toString, s"_a$i")
    }
    val withT1 = named.filter(col("_a0").isNotNull)
      .withColumn("t1", element_at(col("_a0"), 1))
    val frames = Seq.newBuilder[DataFrame]
    var cur = withT1
    frames += cur.select(col("u"), col("t1"))
    for (i <- 2 to steps.length) {
      val prev = col(s"t${i - 1}")
      val hi: Column =
        if (horizon > 0L) col("t1") + horizon else lit(Long.MaxValue)
      cur = cur
        .withColumn(s"t$i", array_min(filter(col(s"_a${i - 1}"),
          x => x > prev && x <= hi)))
        .filter(col(s"t$i").isNotNull)
      frames += cur.select(col("u") +: (1 to i).map(j => col(s"t$j")): _*)
    }
    frames.result()
  }

  /**
   * RE-ENTRY funnel (the variant [[funnelUserTimes]]' scaladoc scopes
   * out): a user whose attempt times out — or completes — may start
   * again, the convention of conversion-window analytics tools. An
   * ATTEMPT anchors at the first `steps(0)` event STRICTLY AFTER the
   * previous attempt's END (completion time if it completed, anchor +
   * `horizon` otherwise; the first attempt anchors at the user's first
   * entry), and runs the same greedy chain as the fixed-anchor funnel:
   * `t_i` = first `steps(i-1)` event strictly after `t_{i-1}` and
   * ≤ anchor + `horizon`. `horizon > 0` is REQUIRED — without a
   * conversion window an incomplete attempt never ends and re-entry is
   * undefined (the fixed-anchor forms are the `horizon = 0` tools).
   *
   * `maxAttempts` bounds the static unrolling: only the FIRST
   * `maxAttempts` attempts per user are emitted (deterministic
   * truncation in anchor order — a power user's tail attempts drop,
   * never a middle one). Entry events INSIDE a running attempt do not
   * anchor (they are absorbed by the open window) — the Amplitude-style
   * non-overlapping-windows convention.
   *
   * Output: one row per attempt — `(u, attempt, t1, reached, t_done)`;
   * `attempt` is 1-based in anchor order, `reached` ∈ [1, k] the
   * deepest step index the attempt hit, `t_done` the completion time
   * when `reached = k`, else null.
   *
   * Scale shape: the [[funnelUserTimesOneScan]] layout — one log scan
   * filtered to step types BEFORE the shuffle, per-(user, step) sorted
   * time arrays, then the attempt chain as `maxAttempts × k` array
   * min/filter COLUMNS (each referencing the previous column, so the
   * plan grows linearly in attempts × steps). Per-task memory is the
   * user's own step timestamps — the one-scan trade, stated there.
   */
  def funnelAttempts(df: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, steps: Seq[String], horizon: Long,
                     maxAttempts: Int = 4): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct: $steps")
    require(horizon > 0L,
      "re-entry needs a conversion window: an incomplete attempt ends at" +
        " anchor + horizon — use the fixed-anchor funnel for horizon = 0")
    require(maxAttempts >= 1, s"need at least one attempt: $maxAttempts")
    val k = steps.length
    val stepIdx = steps.zipWithIndex.toMap
    val idxCol = steps.foldLeft(lit(-1)) { (acc, s) =>
      when(col("et") === s, lit(stepIdx(s))).otherwise(acc)
    }
    val perStep = df.select(col(userCol).as("u"),
        col(tsCol).cast("long").as("ts"), col(typeCol).as("et"))
      .filter(col("et").isin(steps: _*))
      .select(col("u"), col("ts"), idxCol.as("si"))
      .groupBy(col("u"), col("si"))
      .agg(sort_array(collect_list(col("ts"))).as("tss"))
      .groupBy(col("u"))
      .pivot("si", steps.indices.map(i => i: Any))
      .agg(first(col("tss")))
    val named = steps.indices.foldLeft(perStep) { (d, i) =>
      d.withColumnRenamed(i.toString, s"_a$i")
    }
    var cur = named.filter(col("_a0").isNotNull)
    for (a <- 1 to maxAttempts) {
      val anchor =
        if (a == 1) element_at(col("_a0"), 1)
        else array_min(filter(col("_a0"), x => x > col(s"_e${a - 1}")))
      cur = cur.withColumn(s"_t${a}_1", anchor)
      for (i <- 2 to k) {
        // null anchors/predecessors propagate: a null comparison makes
        // the filter predicate null (dropped), array_min(empty) is null
        cur = cur.withColumn(s"_t${a}_$i",
          array_min(filter(col(s"_a${i - 1}"),
            x => x > col(s"_t${a}_${i - 1}")
              && x <= col(s"_t${a}_1") + horizon)))
      }
      cur = cur.withColumn(s"_e$a",
        coalesce(col(s"_t${a}_$k"), col(s"_t${a}_1") + horizon))
    }
    val attempts = (1 to maxAttempts).map { a =>
      val reached = (2 to k).foldLeft(lit(1)) { (acc, i) =>
        when(col(s"_t${a}_$i").isNotNull, lit(i)).otherwise(acc)
      }
      struct(lit(a).as("attempt"), col(s"_t${a}_1").as("t1"),
        reached.as("reached"),
        (if (k >= 2) col(s"_t${a}_$k")
         else col(s"_t${a}_1")).as("t_done"))
    }
    cur.select(col("u"), explode(array(attempts: _*)).as("_at"))
      .filter(col("_at.t1").isNotNull)
      .select(col("u"), col("_at.attempt").as("attempt"),
        col("_at.t1").as("t1"), col("_at.reached").as("reached"),
        col("_at.t_done").as("t_done"))
  }

  /**
   * The funnel report over [[funnelUserTimes]]: per step, how many users
   * reached it and the total seconds from funnel entry (`Σ (t_i − t1)`,
   * an exact integer — divide by `users` downstream for the mean lag;
   * the sum is emitted instead of the mean so the gate stays
   * epsilon-free). Output `(step, step_name, users, sum_lag)`.
   */
  def funnelSteps(df: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  horizon: Long = 0L): DataFrame =
    stepReport(funnelUserTimes(df, userCol, tsCol, typeCol, steps, horizon),
      steps)

  /** [[funnelSteps]] over the single-scan reach frames — identical
    * output (the frames are spec-pinned equal), one log scan instead of
    * k. Gate-certified against the same exact oracle as the k-scan
    * form. */
  def funnelStepsOneScan(df: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, steps: Seq[String],
                         horizon: Long = 0L): DataFrame =
    stepReport(
      funnelUserTimesOneScan(df, userCol, tsCol, typeCol, steps, horizon),
      steps)

  private def stepReport(frames: Seq[DataFrame],
                         steps: Seq[String]): DataFrame =
    frames.zipWithIndex.map { case (f, idx) =>
        val i = idx + 1
        f.agg(count(lit(1)).as("users"),
            coalesce(sum(col(s"t$i") - col("t1")), lit(0L)).as("sum_lag"))
          .select(lit(i).as("step"), lit(steps(idx)).as("step_name"),
            col("users"), col("sum_lag"))
      }.reduce(_ unionByName _)

  /**
   * Cohort retention matrix: bucket time by integer floor-division
   * (`bucket` seconds per cell, default daily), cohort a user at their
   * first active bucket, and count distinct users active at each
   * `(cohort, offset)` cell. Output `(cohort_day, day_offset, users)`
   * with integer day indices (epoch-day, not a date type — timezone-free
   * and bit-identical across engines).
   *
   * Scale shape: the one unavoidable big shuffle is the `(user, day)`
   * distinct over the raw log (map-side partial distinct first); after
   * it every frame is ≤ users × active-days rows. The cohort join is
   * keyed on the user column against a one-row-per-user frame, and the
   * final aggregate needs no `countDistinct` — the join preserves the
   * distinctness of `(u, d)`, so a plain count suffices.
   */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      bucket: Long = 86400L): DataFrame = {
    require(bucket > 0L, s"bucket must be positive: $bucket")
    val act = df.select(col(userCol).as("u"),
        floor(col(tsCol).cast("long") / lit(bucket)).cast("long").as("d"))
      .distinct()
    val first = act.groupBy("u").agg(min("d").as("cohort"))
    act.join(first, Seq("u"))
      .withColumn("day_offset", col("d") - col("cohort"))
      .groupBy("cohort", "day_offset")
      .agg(count(lit(1)).as("users"))
      .select(col("cohort").as("cohort_day"), col("day_offset"), col("users"))
  }
}
