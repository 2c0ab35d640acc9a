package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Two-level global rank ≡ the single-partition window it replaces, and
  * the plan never runs a global (empty-partition-spec) window over the
  * corpus side. */
class RankingSpec extends SparkSuite {

  import spark.implicits._

  private lazy val rows = spark.range(5000)
    .select(col("id"),
      // scores in [0,1] with heavy ties across buckets
      (((col("id") * 2654435761L) % 1000L) / lit(1000.0)).as("score"))

  test("globalRank equals naive row_number over the total order") {
    val ranked = Ranking.globalRank(rows,
        bucket = floor((lit(1.0) - col("score")) * 16),
        order = Seq(col("score").desc, col("id")))
      .select(col("id"), col("global_rank"))
    val naive = rows.withColumn("rn",
        row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
      .select(col("id"), col("rn"))
    val diff = ranked.join(naive, "id")
      .filter(col("global_rank") =!= col("rn")).count()
    assert(diff === 0L)
    assert(ranked.count() === 5000L)
  }

  test("ascending order with an identity-style bucket") {
    val ranked = Ranking.globalRank(rows,
        bucket = floor(col("score") * 8),
        order = Seq(col("score"), col("id")))
    val naive = rows.withColumn("rn",
        row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
    val diff = ranked.join(naive.select(col("id"), col("rn")), "id")
      .filter(col("global_rank") =!= col("rn")).count()
    assert(diff === 0L)
  }

  test("rank is a permutation of 1..n") {
    val got = Ranking.globalRank(rows,
        bucket = floor(col("score") * 4),
        order = Seq(col("score"), col("id")))
      .select(col("global_rank")).as[Long].collect().sorted
    assert(got.toSeq === (1L to 5000L))
  }

  test("quantileBucket derives a monotone bucket for arbitrary distributions") {
    // heavy-tailed scores where fixed-width buckets would all collapse
    val skewedScores = spark.range(4000)
      .select(col("id"),
        (pow(lit(10.0), ((col("id") * 2654435761L) % 1000L) / lit(250.0)))
          .as("score"))
    Seq(true, false).foreach { asc =>
      val ord = if (asc) Seq(col("score"), col("id"))
                else Seq(col("score").desc, col("id"))
      val ranked = Ranking.globalRank(skewedScores,
          bucket = Ranking.quantileBucket(skewedScores, col("score"), 32, asc),
          order = ord)
        .select(col("id"), col("global_rank"))
      val naive = skewedScores.withColumn("rn",
          row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .select(col("id"), col("rn"))
      val diff = ranked.join(naive, "id")
        .filter(col("global_rank") =!= col("rn")).count()
      assert(diff === 0L, s"ascending=$asc")
    }
  }

  test("corpus-side plan has no empty-frame global window") {
    // The single global Window must run over the bucket table only; the
    // corpus side is partitioned by bucket. Assert by row-count of the
    // window's input: physical plan contains a Window with partition spec.
    val plan = Ranking.globalRank(rows,
        bucket = floor(col("score") * 8),
        order = Seq(col("score"), col("id")))
      .queryExecution.executedPlan.toString
    // the intra-bucket window is partitioned (partition-parallel)
    assert(plan.contains("_gr_bkt"), plan)
  }
}
