package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Small-file compaction: bin-packs a fragmented table to size-targeted
  * files; the sorted variant restores disjoint per-file key ranges so
  * parquet min/max pruning works again. */
class CompactionSpec extends SparkSuite {

  import spark.implicits._

  private def partFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("compact bin-packs many small files into the size-targeted count") {
    val src = Files.createTempDirectory("compact_src").toString
    val dst = Files.createTempDirectory("compact_dst").toString
    // 40 one-row-group files of ~1 KB each
    spark.range(4000).select(col("id"), (col("id") % 97).as("k"))
      .repartition(40).write.mode("overwrite").parquet(src)
    assert(partFiles(src).length === 40)
    val srcBytes = partFiles(src).map(_.length).sum
    val target = srcBytes / 4 // expect ceil(bytes/target) = 4 or 5 files
    val n = BucketedTables.compact(spark, src, dst, targetBytes = target)
    assert(n === math.ceil(srcBytes.toDouble / target).toInt)
    assert(partFiles(dst).length === n)
    assert(partFiles(dst).length < 10)
    // row parity
    assert(spark.read.parquet(dst).count() === 4000L)
    assert(spark.read.parquet(dst).agg(sum("id")).as[Long].head() ===
      spark.read.parquet(src).agg(sum("id")).as[Long].head())
  }

  test("compact with sortCol yields disjoint per-file key ranges") {
    val src = Files.createTempDirectory("compact_sort_src").toString
    val dst = Files.createTempDirectory("compact_sort_dst").toString
    spark.range(5000).select(col("id"), rand(7).as("x"))
      .repartition(25).write.mode("overwrite").parquet(src)
    val srcBytes = partFiles(src).map(_.length).sum
    BucketedTables.compact(spark, src, dst,
      targetBytes = srcBytes / 3, sortCol = Some("id"))
    val ranges = partFiles(dst).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("id"), max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.length >= 2, "expected multiple output files")
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file key ranges overlap: $hi >= $lo2")
      case _ =>
    }
    assert(spark.read.parquet(dst).count() === 5000L)
  }
}
