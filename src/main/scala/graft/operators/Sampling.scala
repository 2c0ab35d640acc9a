package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /**
   * Leakage-safe train/val/test split: assignment by NEAR-DUP GROUP, not
   * by row. A per-row hash split puts two near-identical documents on
   * opposite sides of the train/test wall — the classic eval-leakage bug
   * a dedup pipeline exists to prevent. Here the near-dup pairs (any
   * `(id_a, id_b)` frame — Jaccard, MinHash, SimHash, semantic) resolve
   * to connected components ([[Dedup.resolveClusters]]); every member of
   * a component inherits the split of the component id, and singletons
   * (docs in no pair) split by their own id. By construction NO pair —
   * and no transitive chain of pairs — ever crosses a split boundary
   * (spec-pinned), and the assignment is recomputable from the corpus
   * alone: same engine-portable md5 bucket as [[splitColumn]].
   *
   * Scale: cost is the cluster resolution (tiered: driver union-find
   * below the edge gate, checkpointed pointer-doubling above); the split
   * itself is one left join of the corpus against the (much smaller)
   * non-singleton membership plus a map-side hash — no extra shuffle
   * beyond the join.
   */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       trainPct: Double = 0.8, valPct: Double = 0.1,
                       idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val clusters = Dedup.resolveClusters(pairs, idA, idB)
      .select(col("doc_id").as("_cid_key"), col("cluster_id"))
    docs.select(col(idCol).as("doc_id"))
      .join(clusters, col("doc_id") === col("_cid_key"), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col("doc_id")))
      .select(col("doc_id"), col("group_id"),
        splitColumn(col("group_id"), trainPct, valPct).as("split"))
  }

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

  /**
   * Fixed-size deterministic uniform sample per group: the k rows whose
   * md5(key) sorts first within their group. Rate-based gates
   * ([[deterministicSample]]) keep a *fraction*; this keeps an exact
   * *count* — min(k, |group|) rows — the distributed stand-in for
   * per-group reservoir sampling, with the RNG replaced by a hash order
   * so the same k rows win on any engine, any partitioning, any run.
   * Emits the input columns plus `sample_rank` (1-based position in the
   * group's hash order — a stable sub-sample key: rank ≤ j is the
   * deterministic j-subset of the k-sample).
   *
   * Scale: rank-then-filter with rn ≤ k plans as WindowGroupLimit — each
   * map task pre-trims to k rows per group BEFORE the exchange, so the
   * shuffle carries O(groups × k) per partition, never the corpus (same
   * plan shape as the top-N operators).
   */
  def bottomKSample(df: DataFrame, keyCol: String, groupCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /**
   * Token-budget domain mixing — the pretraining-mixture knob: given a
   * target TOKEN budget and per-domain mixture weights, each domain d is
   * down-sampled at rate min(1, budget·w_d / tokens_d), so the expected
   * kept tokens land on budget·w_d per domain (domains smaller than their
   * allocation pass whole — the standard behavior; redistributing their
   * slack is a policy layered on top). Differs from [[temperatureSample]]
   * in being TOKEN-weighted and budget-absolute, not row-count-relative.
   *
   * Selection reuses the md5 buckets, so raising the budget only widens
   * each domain's threshold — rows already kept stay kept (monotone
   * growth, the property curriculum re-cuts rely on). Scale: the
   * per-domain token table is |domains| rows → broadcast; the corpus
   * side is one partial-aggregated count pass + a map-only filter.
   *
   * Weights are taken at parts-per-billion resolution
   * (`round(w × 10⁹)`) and the keep threshold is computed with exact
   * integral arithmetic — `floor` over a double quotient flips at
   * representation boundaries depending on the engine's evaluation
   * order, an integral division of exact integers never does, so the
   * keep set is bit-identical across engines.
   */
  def budgetMixSample(df: DataFrame, keyCol: String, groupCol: String,
                      tokensCol: String, weights: Map[String, Double],
                      defaultWeight: Double, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive")
    val wPpb = weights.foldLeft(lit(math.round(defaultWeight * 1e9))) {
      case (acc, (g, w)) =>
        when(col(groupCol) === g, lit(math.round(w * 1e9))).otherwise(acc)
    }
    val dec = DecimalType(38, 0)
    val thr = df.groupBy(col(groupCol))
      .agg(sum(col(tokensCol)).as("_gtok"))
      .withColumn("_num",
        lit(budgetTokens).cast(dec) * wPpb.cast(dec) * lit(Buckets.toLong))
      .withColumn("_den", lit(1000000000L).cast(dec) * col("_gtok").cast(dec))
      .select(col(groupCol),
        least(lit(Buckets.toLong), expr("_num div _den")).as("_thr"))
    df.join(broadcast(thr), Seq(groupCol))
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

  /**
   * Fixed-size WEIGHTED sample without replacement per group
   * (Efraimidis & Spirakis 2006, "Weighted random sampling with a
   * reservoir", the exponential-jumps ordering): each row draws
   * r = −ln(u)/w from a uniform u and the k SMALLEST r win — inclusion
   * odds scale with weight (a weight-2w row is twice as likely in as a
   * weight-w row at k = 1), the quality/token-count-biased selection
   * step of a data build.
   *
   * The uniform is derived, not drawn: the first 48 bits of md5(key)
   * give u = (h + 0.5)/2^48 ∈ (0,1) — so like every sampler here the
   * result is identical on any run, engine, or partitioning, and
   * re-cutting with a different k only extends the kept prefix
   * (`sample_rank` ≤ j is the deterministic j-subset). Keys are rounded
   * to 12 dp BEFORE ranking with the row key as tie-break, the
   * round-before-rank recipe that keeps last-ulp `ln` differences
   * between engines from flipping ranks (exact DuckDB oracle).
   *
   * Rows with null or non-positive weight are excluded (the ES scheme
   * requires w > 0; a zero-weight row has inclusion probability 0).
   *
   * Scale: identical shape to [[bottomKSample]] — rank-then-filter plans
   * as WindowGroupLimit, map tasks pre-trim to k per group before the
   * exchange, so the shuffle carries O(groups × k), never the corpus.
   */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h48 = conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val u = (h48.cast("double") + lit(0.5)) / lit(math.pow(2.0, 48))
    val esKey = round(-log(u) / col(weightCol).cast("double"), 12)
    val w = Window.partitionBy(col(groupCol)).orderBy(esKey, col(keyCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
