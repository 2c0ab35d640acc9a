package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ScaleData dev tool: per-key-space offsets preserve referential
  * integrity exactly — every copy joins only itself, so a scaled join
  * produces factor× the base join's rows, never cross-copy rows. */
class ScaleDataSpec extends SparkSuite {

  test("2x scale doubles tables and preserves join cardinalities") {
    val src = "/root/testdata/sf0.001"
    val dst = Files.createTempDirectory("scale2x").toString
    graft.apps.ScaleData.main(Array(src, dst, "2"))

    def cnt(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    Seq("lineitem", "orders", "customer", "documents").foreach { t =>
      assert(cnt(dst, t) === 2 * cnt(src, t), s"$t must double")
    }
    // fixed dims copy through unscaled
    assert(cnt(dst, "nation") === cnt(src, "nation"))

    def joinRows(dir: String): Long =
      spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
    assert(joinRows(dst) === 2 * joinRows(src),
      "per-copy key offsets must keep every lineitem joined to exactly " +
        "its own copy's order — factor x base join rows, no cross-copy hits")
  }
}
