package graft.apps

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one registry/soak query against a data directory
  * and print its EXECUTED physical plan (final AQE decisions included) —
  * the drill-down companion to SoakAudit's exchange counts. This is how
  * the r10 inStars sort-merge demotion was localized after the audit
  * flagged the shape change: `runMain graft.apps.PlanDump <dir> <query>`
  * at two scales, diff the join strategies. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val registry = graft.SparkEntry.queries ++ SoakAudit.soakQueries
    val df = registry(name)(spark, dir)
    df.count()
    // executed plan with final AQE decisions
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
