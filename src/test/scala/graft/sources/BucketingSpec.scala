package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucketing = the pay-once shuffle: two tables bucketed on the join key
  * sort-merge-join with zero Exchange on either side. */
class BucketingSpec extends SparkSuite {

  test("partitioned write prunes directories on partition filter") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("etype", col("event_type"))
    BucketedTables.writePartitioned(e, dir, "etype")
    val scan = spark.read.parquet(dir).filter(col("etype") === "view")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("etype"),
      s"partition filter must reach the scan:\n${plan.take(600)}")
    assert(scan.count() > 0)
  }

  test("bucketed fact-fact join plans without exchanges") {
    val dir = Files.createTempDirectory("graft_bucket").toString
    val sfDir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")

    BucketedTables.writeBucketed(li, "li_b", s"$dir/li", 8, "l_orderkey")
    BucketedTables.writeBucketed(o, "o_b", s"$dir/o", 8, "o_orderkey")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the exchange (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
