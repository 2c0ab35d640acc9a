package graft.operators

import graft.SparkSuite

/**
 * Median/MAD outlier screen: hand-computed fixture pinning the robust
 * center/scale arithmetic, the planted-outlier flag, the MAD=0
 * degenerate feature (null z, never flags), and exact ≡ approx at
 * small n (the sketch is exact below its accuracy budget).
 */
class RobustStatsSpec extends SparkSuite {

  import spark.implicits._

  // 9 inliers at 100±{0..4} plus one planted monster. Interpolated
  // median of the 10 values (sorted 98..105, 1000) is 101.5; MAD =
  // interpolated median of |x-101.5| = {0.5×3, 1.5×2, 2.5×2, 3.5×2,
  // 898.5} = 2.0
  private val xs =
    Seq(100L, 101L, 102L, 99L, 103L, 98L, 104L, 105L, 101L, 1000L)
  private lazy val df = xs.zipWithIndex
    .map { case (x, i) => (i.toLong, x, 7L) } // f2 constant -> MAD 0
    .toDF("id", "f1", "f2")

  test("robust z: median center, MAD*1.4826 scale, planted outlier flagged") {
    val out = RobustStats.robustOutliers(df, "id", Seq("f1", "f2"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          r.getLong(3), r.getBoolean(4))).toMap
    // monster: z = (1000 - 101.5) / (2 * 1.4826) = 303.01...
    val mz = out(9L)._1.get
    assert(math.abs(mz - 898.5 / (2 * 1.4826)) < 1e-4)
    assert(out(9L)._3 === 1L && out(9L)._4, "monster must flag")
    // a near-median inlier: z small, no flag
    assert(math.abs(out(0L)._1.get - (-1.5 / (2 * 1.4826))) < 1e-4)
    assert(!out(0L)._4)
    // constant feature: MAD 0 -> null z everywhere, never a flag
    assert(out.values.forall(_._2.isEmpty), "MAD=0 feature must yield null z")
    assert(out.values.map(_._3).sum === 1L, "only the monster flags")
  }

  test("approx twin: same verdicts, close z (sketch median is an element, not interpolated)") {
    // approx_percentile returns an ACTUAL element (101), where the exact
    // percentile interpolates (101.5) — so z's differ slightly by design;
    // the verdicts and the outlier magnitude must agree.
    def byId(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toMap
    val exact = byId(RobustStats.robustOutliers(df, "id", Seq("f1", "f2")))
    val approx = byId(RobustStats.robustOutliersApprox(df, "id", Seq("f1", "f2")))
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (id, (ez, eo)) =>
      assert(approx(id)._2 === eo, s"verdict mismatch for $id")
      assert(math.abs(approx(id)._1.get - ez.get) <= 0.5 + 0.01 * math.abs(ez.get),
        s"z too far for $id: ${approx(id)._1} vs $ez")
    }
  }

  test("winsorize clamps to hand-computed percentile cut points; nulls stay null") {
    // 1..20 plus a null: quantile_cont(0.05) over 1..20 = 1.95,
    // quantile_cont(0.95) = 19.05 — values below/above clamp, inner
    // values pass through, the null row stays null.
    val rows = (1 to 20).map(i => (i.toLong, Some(i.toDouble))) :+
      (21L, None: Option[Double])
    val d = rows.toDF("id", "f1")
    val w = RobustStats.winsorize(d, "id", Seq("f1"), pLo = 0.05, pHi = 0.95)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(w(1L) === Some(1.95) && w(2L) === Some(2.0))
    assert(w(20L) === Some(19.05) && w(19L) === Some(19.0))
    assert(w(10L) === Some(10.0))
    assert(w(21L) === None, "null feature values must stay null")
    assert(w.size === 21)
  }

  test("winsorize approx twin: element cut points within one inter-element gap") {
    // the sketch cut point is an ACTUAL element, the exact one
    // interpolates — on a dense fixture they differ by at most one
    // inter-element gap. (On a heavy tail the two cut points can be far
    // apart by design — the sketch clamps at a data value; certify with
    // the exact gate, run the sketch at corpus scale.)
    val d = (1 to 20).map(i => (i.toLong, i.toLong)).toDF("id", "f1")
    val exact = RobustStats.winsorize(d, "id", Seq("f1"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = RobustStats.winsorizeApprox(d, "id", Seq("f1"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (id, e) =>
      assert(math.abs(approx(id) - e) <= 1.0, s"$id: ${approx(id)} vs $e")
    }
  }

  test("quantileBins: dense values spread evenly, ties fall to the lower bin, nulls stay null") {
    // 1..10 with nBins=5: interior cuts at p20/p40/p60/p80 over 1..10 =
    // 2.8, 4.6, 6.4, 8.2 -> bins {1,2}=0 {3,4}=1 {5,6}=2 {7,8}=3 {9,10}=4
    val rows = (1 to 10).map(i => (i.toLong, Some(i.toDouble))) :+
      (11L, None: Option[Double])
    val d = rows.toDF("id", "f1")
    val b = RobustStats.quantileBins(d, "id", Seq("f1"), nBins = 5)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    (1 to 10).foreach { i =>
      assert(b(i.toLong) === Some(((i - 1) / 2).toLong), s"value $i")
    }
    assert(b(11L) === None, "null feature -> null bin")
    // heavy ties: a constant feature lands entirely in bin 0
    val const = (0 until 8).map(i => (i.toLong, 5.0)).toDF("id", "f1")
    assert(RobustStats.quantileBins(const, "id", Seq("f1"), nBins = 4)
      .collect().forall(_.getLong(1) === 0L))
  }

  test("winsorizeBy: per-group cut points; null group yields null clamps") {
    // group A = 1..10 (cuts 1.45/9.55 at p05/p95), group B = 101..110
    // (cuts 101.45/109.55): each group clamps within ITS band — a global
    // clamp would leave all of A at the low cut. One null-group row.
    val rows = (1 to 10).map(i => (i.toLong, "A", i.toDouble)) ++
      (1 to 10).map(i => (100L + i, "B", 100.0 + i)) :+
      (999L, null.asInstanceOf[String], 5.0)
    val d = rows.toDF("id", "g", "f1")
    val w = RobustStats.winsorizeBy(d, "id", "g", Seq("f1"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(w(1L) === Some(1.45) && w(10L) === Some(9.55))
    assert(w(5L) === Some(5.0))
    assert(w(101L) === Some(101.45) && w(110L) === Some(109.55))
    assert(w(999L) === None, "null group has no calibration population")
    assert(w.size === 21)
  }

  test("quantileBinsBy: per-group bins; null group and null feature refuse; approx twin within one bin") {
    // group A = 1..10 with nBins=5 (interior cuts 2.8/4.6/6.4/8.2),
    // group B = 101..110 — identical per-group bin layout; GLOBAL cuts
    // would put all of A in bin 0 (the multilingual-curriculum failure).
    // One null-group row and one null-feature row.
    val rows = (1 to 10).map(i => (i.toLong, "A", Some(i.toDouble))) ++
      (1 to 10).map(i => (100L + i, "B", Some(100.0 + i))) ++
      Seq((999L, null.asInstanceOf[String], Some(5.0)),
        (998L, "A", None: Option[Double]))
    val d = rows.toDF("id", "g", "f1")
    val b = RobustStats.quantileBinsBy(d, "id", "g", Seq("f1"), nBins = 5)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    (1 to 10).foreach { i =>
      assert(b(i.toLong) === Some(((i - 1) / 2).toLong), s"A value $i")
      assert(b(100L + i) === Some(((i - 1) / 2).toLong), s"B value $i")
    }
    assert(b(999L) === None, "null group has no calibration population")
    assert(b(998L) === None, "null feature -> null bin")
    assert(b.size === 22)
    // sketch twin: element cut points vs interpolated — at most one bin
    // apart on a dense fixture, null refusals identical
    val a = RobustStats.quantileBinsByApprox(d, "id", "g", Seq("f1"),
        nBins = 5)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(a.keySet === b.keySet)
    b.foreach {
      case (id, Some(e)) =>
        val av = a(id).get.asInstanceOf[Long]
        assert(math.abs(e.asInstanceOf[Long] - av) <= 1L,
          s"$id: approx bin $av vs exact $e")
      case (id, None) => assert(a(id) === None, s"$id must refuse in both")
    }
  }

  test("winsorizeByApprox: per-group element cut points within one inter-element gap") {
    val rows = (1 to 20).map(i => (i.toLong, "A", i.toDouble)) ++
      (1 to 20).map(i => (200L + i, "B", 200.0 + i))
    val d = rows.toDF("id", "g", "f1")
    val exact = RobustStats.winsorizeBy(d, "id", "g", Seq("f1")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val approx = RobustStats.winsorizeByApprox(d, "id", "g", Seq("f1"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (id, e) =>
      assert(math.abs(approx(id) - e) <= 1.0, s"$id: ${approx(id)} vs $e")
    }
  }

  test("corrMatrix: hand-checked signs and magnitudes; constant feature yields null") {
    // y = 2x exactly (corr 1), z = -x (corr -1 with x), w constant
    val d = (1 to 12).map(i => (i.toLong, 2L * i, -i.toLong, 7L))
      .toDF("x", "y", "z", "w")
    val m = RobustStats.corrMatrix(d, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2)))
      .toMap
    assert(m(("x", "y")) === Some(1.0))
    assert(m(("x", "z")) === Some(-1.0))
    assert(m(("y", "z")) === Some(-1.0))
    assert(m(("x", "w")) === None, "constant feature has no direction")
    assert(m.size === 6, "one row per unordered pair")
  }

  test("all-outlier-free corpus flags nothing") {
    val calm = (0 until 20).map(i => (i.toLong, 50L + (i % 5))).toDF("id", "f1")
    val out = RobustStats.robustOutliers(calm, "id", Seq("f1"))
    assert(out.filter(col("is_outlier")).count() === 0L)
    assert(out.count() === 20L)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
