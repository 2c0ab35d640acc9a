package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.StreamWindows

/** Bitmap-UV Aggregator: exactness below collision range, bounded-buffer
  * undercount semantics, and batch ≡ streaming-twin hash behavior. */
class BitmapUvSpec extends SparkSuite {

  import spark.implicits._

  test("equals exact distinct when the bitmap is far from full") {
    val df = spark.range(20000)
      .select((col("id") % 7).as("g"), (col("id") % 997).as("user"))
    val got = df.groupBy("g").agg(BitmapUv.uv(col("user")).as("uv"))
      .as[(Long, Long)].collect().toMap
    val exact = df.groupBy("g").agg(countDistinct(col("user")).as("uv"))
      .as[(Long, Long)].collect().toMap
    assert(got === exact, "2^20 bits vs ≤997 distinct: collisions ≈ 0")
  }

  test("tiny bitmap undercounts but never overcounts (bounded state)") {
    val df = spark.range(5000).select(lit(1L).as("g"), col("id").as("user"))
    val got = df.groupBy("g").agg(BitmapUv.uv(col("user"), bitsLog2 = 10).as("uv"))
      .as[(Long, Long)].collect().head._2
    assert(got <= 1024L, "a 2^10-bit bitmap can never report past its size")
    assert(got > 900L, "near-full bitmap still counts most bits")
  }

  test("batch aggregator matches the streaming perEventUv final count") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val users = Seq(1L, 2L, 1L, 3L, 2L, 9L, 4L)
    val input = MemoryStream[(Long, Long)]
    val uv = StreamWindows.perEventUv(
      input.toDS().select(col("_1").as("user"), col("_2").cast("timestamp").as("ts")),
      windowSize = "60 seconds", watermarkDelay = "5 seconds")
    val q = uv.writeStream.format("memory").queryName("buv")
      .outputMode("append").start()
    try {
      input.addData(users.zipWithIndex.map { case (u, i) => (u, 10L + i) })
      q.processAllAvailable()
    } finally q.stop()
    val streamFinal = spark.table("buv").as[StreamWindows.UvUpdate]
      .collect().map(_.uv).max
    val batch = users.toDF("user").agg(BitmapUv.uv(col("user")).as("uv"))
      .as[Long].collect().head
    assert(batch === streamFinal, "same hash → same (possibly-colliding) count")
  }
}
