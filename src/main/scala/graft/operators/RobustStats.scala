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

  private val NormalConsistency = 1.4826

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
