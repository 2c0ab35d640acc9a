package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r17): is the PQ-build hot stage the embeddings SCAN
  * (array<double> decode) or the declarative encode expression? Times
  * three noop sinks: raw scan, scan+sum (forces full decode), and
  * scan+coarse-assign+pq-encode as the build gates run it. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    println("rows=" + emb.count() + " dim=" +
      emb.select(size(col("embedding"))).head().getInt(0))
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("raw scan")(emb)
    time("scan+aggregate-sum")(emb.select(expr("aggregate(embedding, 0d, (a,x) -> a + x)")))
    val (model, _) = graft.operators.Similarity.buildPqIndex(
      emb, "vec_id", "embedding",
      nCentroids = 16, m = 8, kSub = 16, trainIters = 0, pqIters = 1)
    println("index built; timing encode-only pass over frozen model")
    time("full index encode")(
      graft.operators.Similarity.encodePqIndex(model, emb, "vec_id", "embedding"))
    spark.stop()
  }
}
