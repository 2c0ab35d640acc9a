package graft

import org.apache.spark.sql.SparkSession

object TmpTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("dedup_clusters")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      // warmup-free single timing
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[tmptime] $name rows=$n sec=$sec%.2f")
    }
    spark.stop()
  }
}
