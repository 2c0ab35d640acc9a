package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic (hash-based) sampling — the split primitive of training
 * pipelines. RNG-based `df.sample` differs per run/engine/partitioning;
 * hashing a stable key instead gives the SAME sample on every run, every
 * engine, and any cluster layout, and lets train/val/test assignment be
 * recomputed from the key alone (no split table to persist).
 *
 * Bucket = first 32 bits of md5(key) mod `buckets` — md5 is engine-portable
 * (exact DuckDB oracle), map-only, codegen'd, and uniform across buckets.
 * Everything here is a pure projection/filter: zero shuffle at any scale.
 */
object Sampling {

  val Buckets = 1000

  /** Stable per-key bucket in [0, buckets): first 8 md5 hex chars as int. */
  def hashBucket(key: Column, buckets: Int = Buckets): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep ~keepPct (0..1) of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          keepPct: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < math.round(keepPct * Buckets))

  /** Reproducible train/val/test assignment from the key alone. */
  def splitColumn(key: Column, trainPct: Double, valPct: Double): Column = {
    val b = hashBucket(key)
    when(b < math.round(trainPct * Buckets), lit("train"))
      .when(b < math.round((trainPct + valPct) * Buckets), lit("val"))
      .otherwise(lit("test"))
  }

  /**
   * Temperature / domain-mixture resampling — the standard corpus-rebalance
   * step (multilingual / multi-domain pretraining): group g with n_g rows is
   * kept with probability p_g = (n_min / n_g)^(1-alpha), so alpha = 1 keeps
   * the natural distribution and alpha = 0 downsamples every group to the
   * size of the smallest. Selection is deterministic per key (same md5
   * buckets as [[deterministicSample]]) — re-running with different alpha
   * only moves group thresholds, never reshuffles which rows a group keeps.
   *
   * Scale: the group-count table is |domains| rows — both the min-count
   * reduction and the threshold table broadcast; the corpus side is a
   * map-only broadcast-join + filter, zero corpus shuffle.
   */
  def temperatureSample(df: DataFrame, keyCol: String, groupCol: String,
                        alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val thresholds = counts
      .crossJoin(broadcast(counts.agg(min(col("_n")).as("_nmin"))))
      .select(col(groupCol),
        floor(pow(col("_nmin").cast("double") / col("_n").cast("double"),
          lit(1.0 - alpha)) * Buckets).cast("long").as("_thr"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(hashBucket(col(keyCol)) < col("_thr"))
      .drop("_thr")
  }

  /** Stratified deterministic sample: per-class keep fractions (classes
    * absent from the map keep `default`). The class column only selects
    * the threshold — bucketing stays keyed on `keyCol`, so changing the
    * fractions never reshuffles rows between buckets. */
  def stratifiedSample(df: DataFrame, keyCol: String, classCol: String,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(math.round(default * Buckets))) {
      case (acc, (cls, pct)) =>
        when(col(classCol) === cls, lit(math.round(pct * Buckets))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }
}
