package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The automatic slice roll-up rewrite: results bit-identical to the
  * direct sliding-window aggregation, plan provably two-level, and the
  * rule declines every shape it can't rewrite exactly. */
class SliceRollupRuleSpec extends SparkSuite {

  import spark.implicits._

  private def events: DataFrame =
    spark.range(500).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(col("id") * 37 % 10000).as("ts"),
      (col("id") % 11).cast("double").as("v"))

  private def aggCount(plan: LogicalPlan): Int =
    plan.collect { case a: Aggregate => a }.length

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(SliceRollupRule)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  test("sliding count/sum/min/max rewrite to two aggregates, same result") {
    def q = events
      .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .select(col("k"), col("window.end").cast("long").as("we"),
        col("cnt"), col("s"), col("mn"), col("mx"))
    val baseline = q.collect().toSet
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 2,
        "rule must split the aggregation:\n" + q.queryExecution.optimizedPlan)
      assert(q.collect().toSet === baseline)
    }
  }

  test("rewrite survives downstream references (orderBy over the agg output)") {
    def q = events
      .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("k"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("k"), col("window"))
      .limit(20)
      .select(col("k"), col("window.end").cast("long").as("we"), col("cnt"))
    val baseline = q.collect().toSeq
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 2)
      assert(q.collect().toSeq === baseline)
    }
  }

  test("avg rewrites via sum+count partials, same result (incl. null groups)") {
    def q = events
      // nulls exercise Average's ignore-null semantics through the split
      .withColumn("v", when(col("k") === 3, lit(null)).otherwise(col("v")))
      .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("k"))
      .agg(avg(col("v")).as("a"), count(col("v")).as("c"))
      .select(col("k"), col("window.end").cast("long").as("we"),
        col("a"), col("c"))
    val baseline = q.collect().toSet
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 2,
        "avg must rewrite:\n" + q.queryExecution.optimizedPlan)
      assert(q.collect().toSet === baseline)
    }
  }

  test("decimal avg rewrites: same result type, same values (incl. nulls)") {
    def q = events
      .withColumn("d", when(col("k") === 3, lit(null))
        .otherwise(col("v")).cast("decimal(10,2)"))
      .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("k"))
      .agg(avg(col("d")).as("a"))
      .select(col("k"), col("window.end").cast("long").as("we"), col("a"))
    val baseline = q.collect().toSet
    val baseSchema = q.schema
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 2,
        "decimal avg must rewrite:\n" + q.queryExecution.optimizedPlan)
      assert(q.schema === baseSchema, "result type must not widen")
      assert(q.collect().toSet === baseline)
    }
  }

  test("declines: size not a multiple of slide (bounds filter present)") {
    def q = events
      .groupBy(window(col("ts"), "10 minutes", "3 minutes"), col("k"))
      .agg(count(lit(1)).as("cnt"))
    val baseline = q.collect().toSet
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 1,
        "ceil-expansion with bounds filter must not rewrite")
      assert(q.collect().toSet === baseline)
    }
  }

  test("decimal sum rewrites: same result type, same values") {
    def q = events
      .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("k"))
      .agg(sum(col("v").cast("decimal(18,2)")).as("s"))
      .select(col("k"), col("window.end").cast("long").as("we"), col("s"))
    val baseline = q.collect().toSet
    val baseSchema = q.schema
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 2,
        "decimal sum must rewrite:\n" + q.queryExecution.optimizedPlan)
      assert(q.schema === baseSchema, "result type must not widen")
      assert(q.collect().toSet === baseline)
    }
  }

  test("decimal sum slice overflow: null, never a silently wrong value") {
    // Two +6e37 rows share one slice (their partial sum needs 39 digits →
    // overflow → null under non-ANSI), a −7e37 row sits in another. A
    // naive outer re-sum would SKIP the overflowed slice and return −7e37
    // for windows covering all three rows — the guard must return null
    // (or the true value) there, never that silently wrong number. Under
    // ANSI (the session default) overflow throws instead of nulling, so
    // the silent-skip hazard only exists with ANSI off.
    val big = "60000000000000000000000000000000000000" // 6e37
    val neg = "-70000000000000000000000000000000000000" // −7e37
    def q = Seq((60L, big), (61L, big), (120L, neg)).toDF("sec", "raw")
      .select(timestamp_seconds(col("sec")).as("ts"),
        col("raw").cast("decimal(38,0)").as("d"))
      .groupBy(window(col("ts"), "10 minutes", "1 minute"))
      .agg(sum(col("d")).as("s"))
      .select(col("window.end").cast("long").as("we"), col("s"))
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val baseline = q.collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      withRule {
        assert(aggCount(q.queryExecution.optimizedPlan) === 2,
          "decimal sum must still rewrite:\n" + q.queryExecution.optimizedPlan)
        val rewritten = q.collect().map(r => r.getLong(0) -> r.getDecimal(1))
        assert(rewritten.map(_._1).toSet === baseline.keySet)
        rewritten.foreach { case (we, s) =>
          assert(s == null || s == baseline(we),
            s"window end=$we: rewritten $s must be null or the baseline value " +
              s"${baseline(we)} — a non-null mismatch is the silent-skip bug")
        }
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  test("max(window.end) is group-constant: rewrites as an outer projection") {
    // Regression history: rewriting max(window.end) once crashed execution
    // with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND (the partial landed below
    // the Expand where the window struct doesn't exist). Now the rule
    // recognizes the aggregate as group-constant and emits the expression
    // itself in the outer aggregate — the rewrite still fires.
    def q = events
      .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("k"))
      .agg(count(lit(1)).as("cnt"), max(col("window.end").cast("long")).as("we"))
    val baseline = withClue("baseline must run without the rule") {
      q.collect().toSet
    }
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 2,
        "group-constant max must not block the rewrite:\n" +
          q.queryExecution.optimizedPlan)
      assert(q.collect().toSet === baseline)
    }
  }

  test("declines: aggregate mixing window and value references") {
    // sum(v + window.end) is neither decomposable below the Expand (the
    // window struct doesn't exist there) nor group-constant — must bail.
    def q = events
      .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("k"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("v") + col("window.end").cast("long")).as("s"))
    val baseline = withClue("baseline must run without the rule") {
      q.collect().toSet
    }
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 1,
        "mixed-reference aggregate must not rewrite")
      assert(q.collect().toSet === baseline)
    }
  }

  test("declines: streaming plans (watermark metadata would be lost)") {
    // Regression: with the rule enabled session-wide (hot_items_sql_auto
    // adds it), a STREAMING sliding-window aggregation must not be
    // rewritten — the outer aggregate's rebuilt window struct drops the
    // event-time metadata and the query fails Spark's append-mode
    // watermark check at start. The rule must decline on isStreaming.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    mem.addData((1L, 1.0), (2L, 2.0))
    val q = mem.toDF()
      .select(timestamp_seconds(col("_1") * 60).as("ts"), col("_2").as("v"))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 minutes", "1 minute"))
      .agg(count(lit(1)).as("cnt"))
    withRule {
      val query = q.writeStream.format("memory").outputMode("append")
        .queryName("rollup_stream_decline")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination() // throws STREAM_FAILED if the rule rewrote it
      assert(spark.table("rollup_stream_decline").columns.contains("cnt"))
    }
  }

  test("tumbling windows are untouched") {
    def q = events.groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("cnt"))
    val baseline = q.collect().toSet
    withRule {
      assert(aggCount(q.queryExecution.optimizedPlan) === 1)
      assert(q.collect().toSet === baseline)
    }
  }
}
