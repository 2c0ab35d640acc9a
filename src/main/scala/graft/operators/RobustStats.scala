package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Robust-statistics outlier screening for quality filtering: per-feature
 * z-scores centered on the MEDIAN and scaled by the MAD (median absolute
 * deviation × 1.4826, the normal-consistency constant), so a handful of
 * pathological documents — megabyte boilerplate blobs, token-bomb spam —
 * cannot drag the screen's own calibration the way mean/stddev z-scores
 * let them (the classic quality-filter failure: the outliers define the
 * "normal" band and excuse themselves). The reference's pipelines filter
 * on fixed thresholds (UserBehaviorApp-family predicates); this is the
 * data-derived generalization every large-corpus curation pass runs
 * before hand-tuned rules exist.
 *
 * Two-pass shape, no driver collect: pass 1 aggregates every feature's
 * exact median into ONE row (broadcast cross join — the
 * [[Relevance]] single-row pattern); pass 2 aggregates the MADs against
 * those medians the same way; scoring is then map-side. A feature whose
 * MAD is 0 (over half the corpus shares one value) has no robust scale:
 * its z is NULL and it never flags an outlier — deciding on a
 * degenerate scale would flag half the corpus.
 *
 * Exactness: Spark's `percentile` (sort-based, interpolating) matches
 * DuckDB `quantile_cont` bit-for-bit at the 6-dp rounding contract (the
 * `value_percentiles` precedent), and z-scores round AFTER the full-
 * precision chain, so the gate is exact. Exact medians buffer per-group
 * value multisets in the aggregate — fine per-corpus-scan here (one
 * global group), but the 100 TB path is [[robustOutliersApprox]]'s
 * `approx_percentile` twin (bounded-memory mergeable sketches, the
 * `value_percentiles_approx` precedent): certify with the exact gate at
 * test scale, run the sketch form at corpus scale.
 *
 * Output: `(idCol, <f>_z … per feature, n_outlier_feats, is_outlier)`
 * with z rounded to 6 dp; `is_outlier` = any |z| > `zThreshold`.
 */
object RobustStats {

  private[graft] val NormalConsistency = 1.4826

  def robustOutliers(df: DataFrame, idCol: String, featureCols: Seq[String],
                     zThreshold: Double = 3.5): DataFrame =
    score(df, idCol, featureCols, zThreshold,
      f => expr(s"percentile($f, 0.5)"))

  /** [[robustOutliers]] with `approx_percentile` medians/MADs — the
    * bounded-memory scale path; approximate ⇒ rows-only gate. */
  def robustOutliersApprox(df: DataFrame, idCol: String,
                           featureCols: Seq[String],
                           zThreshold: Double = 3.5,
                           accuracy: Int = 10000): DataFrame =
    score(df, idCol, featureCols, zThreshold,
      f => expr(s"approx_percentile($f, 0.5, $accuracy)").cast("double"))

  /**
   * Winsorization — the screen's complement: instead of FLAGGING tail
   * rows ([[robustOutliers]]), clamp every feature into its
   * [pLo, pHi] percentile band so downstream statistics (means,
   * regressions, per-feature normalizers) are computed on capped
   * values. The standard pre-normalization step a feature pipeline
   * runs over heavy-tailed corpus features (doc length, link counts).
   *
   * One aggregation pass collects BOTH cut points of every feature
   * into a single broadcast row (the [[robustOutliers]] pattern — no
   * driver collect); clamping is then map-side `least`/`greatest`.
   * Exactness matches the screen: Spark `percentile` ≡ DuckDB
   * `quantile_cont` under the 6-dp rounding contract; a NULL feature
   * value stays NULL. The exact form buffers the value multiset in the
   * aggregate (one global group — fine at gate scale); the
   * 100 TB path is [[winsorizeApprox]] (mergeable sketch cut points,
   * rows-only by design).
   *
   * Output: `(idCol, <f>_w … per feature)`, 6 dp.
   */
  def winsorize(df: DataFrame, idCol: String, featureCols: Seq[String],
                pLo: Double = 0.05, pHi: Double = 0.95): DataFrame =
    clampAt(df, idCol, featureCols, pLo, pHi,
      (f, p) => expr(s"percentile($f, $p)"))

  /** [[winsorize]] with `approx_percentile` cut points — the
    * bounded-memory scale path; approximate ⇒ rows-only gate. */
  def winsorizeApprox(df: DataFrame, idCol: String,
                      featureCols: Seq[String],
                      pLo: Double = 0.05, pHi: Double = 0.95,
                      accuracy: Int = 10000): DataFrame =
    clampAt(df, idCol, featureCols, pLo, pHi,
      (f, p) => expr(s"approx_percentile($f, $p, $accuracy)").cast("double"))

  /**
   * Per-group winsorization: cut points computed WITHIN each
   * `groupCol` value (language, source, shard) — the form a
   * multilingual corpus needs, where a global p95 on doc length is
   * dominated by the verbose languages and clamps the terse ones to
   * nothing. One groupBy aggregation pass for all cut points (exact
   * percentiles, same engine-parity contract as [[winsorize]]), then a
   * join back on the group key. The cut-point frame has one row per
   * group, and `broadcastCuts = true` (default) makes the broadcast a
   * CONTRACT rather than a planner courtesy (r14, VERDICT r13 #5: the
   * hint-free form silently demoted to a shuffle join when the
   * one-row-per-group frame's size estimate crossed the threshold —
   * output identical, corpus re-shuffled). The stated bound: group keys
   * here are language/source/shard-tier columns, at most ~10⁵ groups ×
   * a few doubles — driver-trivial; pass `false` for a genuinely
   * high-cardinality key (e.g. per-user groups) to fall back to the
   * shuffle join, both correct. Rows with a NULL group get NULL clamped
   * values (no population to calibrate against — same refusal
   * discipline as the MAD-0 z). Output:
   * `(idCol, groupCol, <f>_w … per feature)`.
   */
  def winsorizeBy(df: DataFrame, idCol: String, groupCol: String,
                  featureCols: Seq[String],
                  pLo: Double = 0.05, pHi: Double = 0.95,
                  broadcastCuts: Boolean = true): DataFrame =
    clampByAt(df, idCol, groupCol, featureCols, pLo, pHi,
      (f, p) => expr(s"percentile($f, $p)"), broadcastCuts)

  /** [[winsorizeBy]] with `approx_percentile` cut points — the
    * bounded-memory per-group scale path (one mergeable sketch per
    * (group, feature) instead of a buffered value multiset, so a
    * high-cardinality group key cannot OOM the cut-point aggregation);
    * approximate ⇒ rows-only gate, exact twin certifies the arithmetic. */
  def winsorizeByApprox(df: DataFrame, idCol: String, groupCol: String,
                        featureCols: Seq[String],
                        pLo: Double = 0.05, pHi: Double = 0.95,
                        accuracy: Int = 10000,
                        broadcastCuts: Boolean = true): DataFrame =
    clampByAt(df, idCol, groupCol, featureCols, pLo, pHi,
      (f, p) => expr(s"approx_percentile($f, $p, $accuracy)").cast("double"),
      broadcastCuts)

  private def clampByAt(df: DataFrame, idCol: String, groupCol: String,
                        featureCols: Seq[String], pLo: Double, pHi: Double,
                        cut: (String, Double) => org.apache.spark.sql.Column,
                        broadcastCuts: Boolean)
      : DataFrame = {
    require(featureCols.nonEmpty, "winsorize needs at least one feature")
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1: ($pLo, $pHi)")
    val base = df.select(col(idCol) +: col(groupCol).as("_g") +:
      featureCols.map(f => col(f).cast("double").as(f)): _*)
    val cutExprs = featureCols.flatMap(f => Seq(
      cut(f, pLo).as(s"_lo_$f"), cut(f, pHi).as(s"_hi_$f")))
    val cuts0 = base.filter(col("_g").isNotNull)
      .groupBy(col("_g")).agg(cutExprs.head, cutExprs.tail: _*)
    val cuts = if (broadcastCuts) broadcast(cuts0) else cuts0
    base.join(cuts, Seq("_g"), "left")
      .select(col(idCol) +: col("_g").as(groupCol) +:
        featureCols.map(f =>
          when(col(f).isNull || col("_g").isNull, lit(null)).otherwise(
            round(least(greatest(col(f), col(s"_lo_$f")), col(s"_hi_$f")), 6))
            .as(s"${f}_w")): _*)
  }

  /**
   * Per-group equal-frequency binning: interior cut points computed
   * WITHIN each `groupCol` value — [[quantileBins]]' multilingual form,
   * for exactly [[winsorizeBy]]'s reason: global decile cuts on doc
   * length put every document of a terse language in bin 0 and every
   * verbose-language document in bin 9, so a "curriculum by length
   * decile" is really a curriculum by language. Same shape (one groupBy
   * aggregation for all cut points, join back on the group key — the
   * one-row-per-group cuts frame is explicitly `broadcast()` under the
   * same `broadcastCuts` contract as [[winsorizeBy]], r14), same
   * tie-to-lower-bin arithmetic, same engine-parity contract, same
   * null-group refusal: a NULL group has no population to calibrate
   * against, so its bins are NULL.
   * Output: `(idCol, groupCol, <f>_bin … per feature)` as longs.
   */
  def quantileBinsBy(df: DataFrame, idCol: String, groupCol: String,
                     featureCols: Seq[String], nBins: Int = 10,
                     broadcastCuts: Boolean = true): DataFrame =
    binsByAt(df, idCol, groupCol, featureCols, nBins,
      (f, p) => expr(s"percentile($f, $p)"), broadcastCuts)

  /** [[quantileBinsBy]] with `approx_percentile` cut points — the
    * bounded-memory per-group scale path; approximate ⇒ rows-only gate,
    * the exact twin certifies the arithmetic. */
  def quantileBinsByApprox(df: DataFrame, idCol: String, groupCol: String,
                           featureCols: Seq[String], nBins: Int = 10,
                           accuracy: Int = 10000,
                           broadcastCuts: Boolean = true): DataFrame =
    binsByAt(df, idCol, groupCol, featureCols, nBins,
      (f, p) => expr(s"approx_percentile($f, $p, $accuracy)").cast("double"),
      broadcastCuts)

  private def binsByAt(df: DataFrame, idCol: String, groupCol: String,
                       featureCols: Seq[String], nBins: Int,
                       cut: (String, Double) => org.apache.spark.sql.Column,
                       broadcastCuts: Boolean)
      : DataFrame = {
    require(featureCols.nonEmpty, "binning needs at least one feature")
    require(nBins >= 2, s"need at least 2 bins: $nBins")
    val base = df.select(col(idCol) +: col(groupCol).as("_g") +:
      featureCols.map(f => col(f).cast("double").as(f)): _*)
    val cutExprs = featureCols.flatMap(f => (1 until nBins).map(i =>
      cut(f, i.toDouble / nBins).as(s"_c${i}_$f")))
    val cuts0 = base.filter(col("_g").isNotNull)
      .groupBy(col("_g")).agg(cutExprs.head, cutExprs.tail: _*)
    val cuts = if (broadcastCuts) broadcast(cuts0) else cuts0
    base.join(cuts, Seq("_g"), "left")
      .select(col(idCol) +: col("_g").as(groupCol) +:
        featureCols.map { f =>
          val bin = (1 until nBins).map(i =>
            (col(f) > col(s"_c${i}_$f")).cast("long")).reduce(_ + _)
          when(col(f).isNull || col("_g").isNull, lit(null)).otherwise(bin)
            .as(s"${f}_bin")
        }: _*)
  }

  private def clampAt(df: DataFrame, idCol: String,
                      featureCols: Seq[String], pLo: Double, pHi: Double,
                      cut: (String, Double) => org.apache.spark.sql.Column)
      : DataFrame = {
    require(featureCols.nonEmpty, "winsorize needs at least one feature")
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1: ($pLo, $pHi)")
    val base = df.select(col(idCol) +: featureCols.map(f =>
      col(f).cast("double").as(f)): _*)
    val cutExprs = featureCols.flatMap(f => Seq(
      cut(f, pLo).as(s"_lo_$f"), cut(f, pHi).as(s"_hi_$f")))
    val cuts = base.agg(cutExprs.head, cutExprs.tail: _*)
    // Spark's least/greatest SKIP nulls (return the extreme of the
    // non-null arguments) — guard explicitly so a null feature value
    // stays null instead of clamping to the low cut point.
    base.crossJoin(broadcast(cuts))
      .select(col(idCol) +: featureCols.map(f =>
        when(col(f).isNull, lit(null)).otherwise(
          round(least(greatest(col(f), col(s"_lo_$f")), col(s"_hi_$f")), 6))
          .as(s"${f}_w")): _*)
  }

  /**
   * Equal-frequency (quantile) binning — feature discretization for
   * curriculum buckets, stratified sampling keys, and monotone-feature
   * models: bin i of `nBins` holds values between the i/n and (i+1)/n
   * exact percentiles. `bin(x) = Σ_{i=1..n-1} [x > cut_i]` — ties at a
   * cut point fall to the LOWER bin, degenerate cut points (repeated
   * values) simply never increment, so heavy ties produce fewer
   * occupied bins rather than arbitrary splits. Same shape as
   * [[winsorize]]: one aggregation row with every feature's interior
   * cut points (broadcast), then a map-side comparison sum — and the
   * same exactness contract (Spark `percentile` ≡ DuckDB
   * `quantile_cont`; comparisons and sums are integer). NULL feature →
   * NULL bin. Output: `(idCol, <f>_bin … per feature)` as longs.
   */
  def quantileBins(df: DataFrame, idCol: String, featureCols: Seq[String],
                   nBins: Int = 10): DataFrame = {
    require(featureCols.nonEmpty, "binning needs at least one feature")
    require(nBins >= 2, s"need at least 2 bins: $nBins")
    val base = df.select(col(idCol) +: featureCols.map(f =>
      col(f).cast("double").as(f)): _*)
    val cutExprs = featureCols.flatMap(f => (1 until nBins).map(i =>
      expr(s"percentile($f, ${i.toDouble / nBins})").as(s"_c${i}_$f")))
    val cuts = base.agg(cutExprs.head, cutExprs.tail: _*)
    base.crossJoin(broadcast(cuts))
      .select(col(idCol) +: featureCols.map { f =>
        val bin = (1 until nBins).map(i =>
          (col(f) > col(s"_c${i}_$f")).cast("long")).reduce(_ + _)
        when(col(f).isNull, lit(null)).otherwise(bin).as(s"${f}_bin")
      }: _*)
  }

  /**
   * Pearson correlation matrix over integer-valued features, computed
   * from EXACT integer moment sums (n, Σx, Σx², Σxy as longs — the
   * commutative-monoid aggregates whose distributed partial aggregation
   * is order-insensitive, unlike a float `corr` accumulator), with the
   * float formula applied ONCE per pair to the finished sums:
   * `corr = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²))` —
   * bit-reproducible across any partitioning, engine-exact at the 6-dp
   * contract. A zero-variance feature yields NULL (no direction on a
   * constant). Long moments bound the corpus: |Σxy| < 2⁶³ needs
   * n·max|x|·max|y| below ~9.2e18 — fine for count-like features at
   * any realistic shard; pre-scale or shard the sums when values are
   * large. Output: one row per unordered pair (fa < fb by position),
   * `(feature_a, feature_b, corr_r)`.
   *
   * Plan shape: ONE aggregation over the corpus — every pair's formula
   * is a struct in a single exploded array over the one moment row, so
   * the corpus scan is planned exactly once (the r12 union-per-pair form
   * relied on exchange reuse to dedupe C(k,2) copies of the aggregate —
   * an optimizer behavior, not a contract; at wide feature sets a missed
   * reuse meant k²/2 corpus scans — ADVICE r12, pinned in
   * PlanScaleInvariantsSpec).
   */
  def corrMatrix(df: DataFrame, featureCols: Seq[String]): DataFrame = {
    require(featureCols.length >= 2, "corrMatrix needs at least 2 features")
    val base = df.select(featureCols.map(f =>
      col(f).cast("long").as(f)): _*)
    val moments =
      Seq(count(lit(1)).as("_n")) ++
      featureCols.map(f => sum(col(f)).as(s"_s_$f")) ++
      featureCols.map(f => sum(col(f) * col(f)).as(s"_q_$f")) ++
      featureCols.combinations(2).map { case Seq(a, b) =>
        sum(col(a) * col(b)).as(s"_p_${a}_$b")
      }.toSeq
    val m = base.agg(moments.head, moments.tail: _*)
    val pairStructs = featureCols.combinations(2).map { case Seq(a, b) =>
      val n = col("_n").cast("double")
      val num = n * col(s"_p_${a}_$b").cast("double") -
        col(s"_s_$a").cast("double") * col(s"_s_$b").cast("double")
      val va = n * col(s"_q_$a").cast("double") -
        col(s"_s_$a").cast("double") * col(s"_s_$a").cast("double")
      val vb = n * col(s"_q_$b").cast("double") -
        col(s"_s_$b").cast("double") * col(s"_s_$b").cast("double")
      struct(lit(a).as("feature_a"), lit(b).as("feature_b"),
        when(va > 0.0 && vb > 0.0,
          round(num / (sqrt(va) * sqrt(vb)), 6)).as("corr_r"))
    }.toSeq
    m.select(explode(array(pairStructs: _*)).as("_pr"))
      .select(col("_pr.feature_a").as("feature_a"),
        col("_pr.feature_b").as("feature_b"),
        col("_pr.corr_r").as("corr_r"))
  }

  private def score(df: DataFrame, idCol: String, featureCols: Seq[String],
                    zThreshold: Double,
                    median: String => org.apache.spark.sql.Column): DataFrame = {
    require(featureCols.nonEmpty, "outlier screen needs at least one feature")
    require(zThreshold > 0.0, s"zThreshold must be positive: $zThreshold")
    val base = df.select(col(idCol) +: featureCols.map(f =>
      col(f).cast("double").as(f)): _*)
    val meds = base.agg(
      median(featureCols.head).as(s"_med_${featureCols.head}"),
      featureCols.tail.map(f => median(f).as(s"_med_$f")): _*)
    val withMed = base.crossJoin(broadcast(meds))
    val mads = withMed.agg(
      median(s"abs(${featureCols.head} - _med_${featureCols.head})")
        .as(s"_mad_${featureCols.head}"),
      featureCols.tail.map(f =>
        median(s"abs($f - _med_$f)").as(s"_mad_$f")): _*)
    val scored = withMed.crossJoin(broadcast(mads))
    val zCols = featureCols.map { f =>
      round(
        when(col(s"_mad_$f") > 0.0,
          (col(f) - col(s"_med_$f")) /
            (col(s"_mad_$f") * lit(NormalConsistency)))
          .otherwise(lit(null)), 6).as(s"${f}_z")
    }
    val flagged = scored.select(col(idCol) +: zCols: _*)
    val outlierFlags = featureCols.map(f =>
      coalesce(abs(col(s"${f}_z")) > zThreshold, lit(false)))
    flagged
      .withColumn("n_outlier_feats",
        outlierFlags.map(_.cast("int")).reduce(_ + _).cast("long"))
      .withColumn("is_outlier", outlierFlags.reduce(_ || _))
  }
}
