package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Misra–Gries guarantees pinned against exact counts, across partition
  * layouts (the merge path) and under the exact-fit regime. */
class FreqSketchSpec extends SparkSuite {

  import spark.implicits._

  // zipf-ish corpus: term t_i appears ~ N/i times
  private lazy val corpus = {
    val words = (1 to 40).flatMap(i => Seq.fill(1200 / i)(s"t$i"))
    words.zipWithIndex
      .map { case (w, j) => (j.toLong, w) }
      .toDF("id", "text")
  }

  private def exact: Map[String, Long] =
    corpus.groupBy("text").count().as[(String, Long)].collect().toMap

  test("every term above n/(k+1) survives; estimates are lower bounds within n/(k+1)") {
    val k = 16
    val n = corpus.count()
    val eps = n.toDouble / (k + 1)
    val est = FreqSketch.sketchTerms(corpus, "text", k)
      .as[(String, Long)].collect().toMap
    val truth = exact
    truth.foreach { case (t, c) =>
      if (c > eps) assert(est.contains(t), s"heavy term $t (count $c > eps $eps) missing")
    }
    est.foreach { case (t, e) =>
      val c = truth(t)
      assert(e <= c, s"estimate for $t must lower-bound the true count")
      assert(c - e <= eps + 1e-9, s"undercount for $t exceeds n/(k+1)")
    }
    assert(est.size <= k)
  }

  test("guarantee holds across different partition layouts (merge path)") {
    val k = 8
    val n = corpus.count()
    val eps = n.toDouble / (k + 1)
    val truth = exact
    Seq(1, 3, 7).foreach { parts =>
      val est = FreqSketch.sketchTerms(corpus.repartition(parts, col("id")), "text", k)
        .as[(String, Long)].collect().toMap
      truth.foreach { case (t, c) =>
        if (c > eps) assert(est.contains(t), s"[$parts parts] heavy term $t missing")
      }
      est.foreach { case (t, e) =>
        assert(e <= truth(t) && truth(t) - e <= eps + 1e-9, s"[$parts parts] bound broken for $t")
      }
    }
  }

  test("exact when the vocabulary fits the counter budget") {
    val small = Seq.fill(50)("a").map((0L, _)) ++ Seq.fill(30)("b").map((1L, _)) ++
      Seq.fill(5)("c").map((2L, _))
    val df = small.toDF("id", "text")
    val est = FreqSketch.sketchTerms(df, "text", 10)
      .as[(String, Long)].collect().toMap
    assert(est === Map("a" -> 50L, "b" -> 30L, "c" -> 5L),
      "|vocab| <= k must degrade to exact counting under any merge order")
  }
}
