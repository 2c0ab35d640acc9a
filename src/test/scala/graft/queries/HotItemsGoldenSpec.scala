package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Windows
import graft.sources.CsvSources

/** Flagship HotItems (SURVEY.md §3.1) over the regenerated UserBehavior
  * fixture: CSV parse (P1), pv filter (F1), 1h/5m sliding count (W3/A1/A2),
  * top-5 per window (A6), SQL-surface parity (§2.5). */
class HotItemsGoldenSpec extends SparkSuite {

  import spark.implicits._

  private lazy val behavior = CsvSources.userBehavior(spark, fixture("UserBehavior.csv"))

  private def hotItems = {
    val pv = behavior.filter(col("behavior") === "pv").select(col("ts"), col("itemId"))
    val counts = Windows.slidingCount(pv, "ts", Seq("itemId"), "1 hour", "5 minutes")
    Windows.topNPerWindow(counts, Seq("window_end"), "cnt", "itemId", 5)
      .select(col("itemId"), col("window_end"), col("cnt"), col("rn"))
  }

  test("parse: schema and row count") {
    assert(behavior.count() === 8000L)
    assert(behavior.filter(col("ts").isNull).count() === 0)
    assert(behavior.select("behavior").distinct().count() === 4)
  }

  test("hot items: 5 per closed window, counts consistent with raw data") {
    val res = hotItems.cache()
    // every full window has exactly 5 ranked items (item cardinality >> 5)
    val sizes = res.groupBy("window_end").count().select("count").as[Long].collect()
    assert(sizes.forall(_ <= 5) && sizes.max === 5)
    // spot-check: rank-1 count of one window equals a direct filtered count
    val row = res.filter(col("rn") === 1).orderBy(col("window_end")).limit(50)
      .collect().last // a mid-stream window, fully populated
    val we = row.getAs[Long]("window_end")
    val item = row.getAs[Long]("itemId")
    val cnt = row.getAs[Long]("cnt")
    val direct = behavior.filter(col("behavior") === "pv" && col("itemId") === item &&
        unix_timestamp(col("ts")) >= we - 3600 && unix_timestamp(col("ts")) < we)
      .count()
    assert(cnt === direct, s"window $we item $item: ranked count $cnt vs direct $direct")
    res.unpersist()
  }

  test("SQL surface ≡ DSL (HotItemsWithSQLApp parity)") {
    behavior.createOrReplaceTempView("user_behavior")
    val sql = spark.sql(
      """SELECT itemId, window_end, cnt, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY window_end ORDER BY cnt DESC, itemId ASC) AS rn
        |  FROM (
        |    SELECT itemId, CAST(window.end AS LONG) AS window_end, count(*) AS cnt
        |    FROM user_behavior WHERE behavior = 'pv'
        |    GROUP BY itemId, window(ts, '1 hour', '5 minutes')
        |  )
        |) WHERE rn <= 5""".stripMargin)
      .as[(Long, Long, Long, Int)].collect().toSet
    val dsl = hotItems.as[(Long, Long, Long, Int)].collect().toSet
    assert(sql === dsl)
  }
}
