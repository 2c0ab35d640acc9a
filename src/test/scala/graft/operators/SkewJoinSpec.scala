package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Pins the join-skew scale story: manual salting covers aggregations
 * (`Windows.saltedCount`, SURVEY §2 A4/P3), but skewed JOIN keys are
 * handled by AQE's OptimizeSkewedJoin at runtime — a hot key's oversized
 * shuffle partition is split into sub-partitions and the other side's
 * matching partition is replicated. This suite proves the config surface
 * the 100 TB deployment relies on actually fires (a regression here —
 * e.g. a plan shape AQE can't rewrite — would silently serialize the
 * hottest key onto one task at scale).
 */
class SkewJoinSpec extends SparkSuite {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    // 50k fact rows, ~95% on key 7; dim has 100 distinct keys. Thresholds
    // lowered to test scale — at production scale the defaults (256 MB
    // partition threshold) play the same role.
    val fact = spark.range(50000).select(
      when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
      col("id").as("v"))
    val dim = spark.range(100).select(
      col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = fact.join(dim, "k")
      // collect() executes THIS dataset's own query execution — count()
      // would build a separate one and leave this AQE plan un-finalized
      assert(joined.collect().length === 50000, "skew split must not change results")
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    }
  }

  test("AQE skew split preserves aggregation results over the join") {
    val fact = spark.range(20000).select(
      when(col("id") % 10 =!= 0, lit(3L)).otherwise(col("id") % 50).as("k"),
      lit(1L).as("one"))
    val dim = spark.range(50).select(col("id").as("k"))
    val expected = fact.join(dim, "k").groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val got = fact.join(dim, "k").groupBy("k").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
    }
  }
}
