package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order layout: every output file must cover a small RECTANGLE of the
  * two-column value space (both per-file ranges shrink), vs a single-column
  * sort where the second column's per-file range stays global. */
class ZOrderSpec extends SparkSuite {

  import spark.implicits._

  test("z-ordered files bound BOTH columns; row multiset preserved") {
    val n = 1 << 14
    val df = spark.range(n).selectExpr(
      "id", "(id * 2654435761) % 1024 as a", "(id * 40503) % 1024 as b")
    val base = Files.createTempDirectory("zorder")
    val zPath = base.resolve("z").toString
    val sPath = base.resolve("s").toString
    BucketedTables.writeZOrdered(df, zPath, "a", "b", numFiles = 16)
    // contrast: sorted by a alone, same file count
    df.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(sPath)

    def perFileRanges(path: String): Seq[(Long, Long)] = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max($"a") - min($"a"), max($"b") - min($"b"))
          .as[(Long, Long)].head()
        r
      }
    }
    val zr = perFileRanges(zPath)
    val sr = perFileRanges(sPath)
    val zAvgA = zr.map(_._1).sum.toDouble / zr.size
    val zAvgB = zr.map(_._2).sum.toDouble / zr.size
    val sAvgB = sr.map(_._2).sum.toDouble / sr.size
    // single-column sort leaves b unconstrained (~full 0..1023 range)
    assert(sAvgB > 900, s"contrast layout should not bound b, got $sAvgB")
    // z-order bounds both: each file covers ~a quarter of each axis
    assert(zAvgA < 600, s"z-order must bound a, got $zAvgA")
    assert(zAvgB < 600, s"z-order must bound b, got $zAvgB")
    // correctness: same rows
    val back = spark.read.parquet(zPath).select("id").as[Long].collect().sorted
    assert(back === (0L until n).toArray)
  }
}
