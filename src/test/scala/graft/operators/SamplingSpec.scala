package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Deterministic-sampling semantics: reproducibility, split completeness,
  * stratified thresholds, and approximate rate. */
class SamplingSpec extends SparkSuite {

  import spark.implicits._

  private lazy val rows = spark.range(10000)
    .select(col("id"), (col("id") % 3).cast("string").as("cls"))

  test("same key set on every evaluation (no RNG)") {
    val a = Sampling.deterministicSample(rows, "id", 0.2)
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(rows, "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // uniformity: 20% ± 2 points on 10k keys
    assert(math.abs(a.size / 10000.0 - 0.2) < 0.02, s"rate ${a.size}")
  }

  test("split column partitions every row into train/val/test at ~80/10/10") {
    val split = rows.select(Sampling.splitColumn(col("id"), 0.8, 0.1).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(split.keySet === Set("train", "val", "test"))
    assert(split.values.sum === 10000L)
    assert(math.abs(split("train") / 10000.0 - 0.8) < 0.02)
    assert(math.abs(split("val") / 10000.0 - 0.1) < 0.01)
  }

  test("sample is split-stable: sampled rows keep their split assignment") {
    // the core reproducibility property: bucketing by the same key means a
    // 20% sample is exactly the first 200 buckets — a subset of train
    val sampled = Sampling.deterministicSample(rows, "id", 0.2)
      .select(col("id"), Sampling.splitColumn(col("id"), 0.8, 0.1).as("s"))
      .as[(Long, String)].collect()
    assert(sampled.forall(_._2 == "train"),
      "keepPct below trainPct must land entirely inside the train split")
  }

  test("stratified sample applies per-class fractions") {
    val kept = Sampling.stratifiedSample(rows, "id", "cls",
        Map("0" -> 0.5), default = 0.1)
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    val per = rows.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("0").toDouble / per("0") - 0.5) < 0.05)
    assert(math.abs(kept("1").toDouble / per("1") - 0.1) < 0.03)
    assert(math.abs(kept("2").toDouble / per("2") - 0.1) < 0.03)
  }

  // skewed domains: 7000 / 2500 / 500 rows
  private lazy val skewed = spark.range(10000)
    .select(col("id"),
      when(col("id") < 7000, "big").when(col("id") < 9500, "mid")
        .otherwise("small").as("dom"))

  test("temperature alpha=1 keeps the natural distribution (everything)") {
    assert(Sampling.temperatureSample(skewed, "id", "dom", 1.0).count() === 10000L)
  }

  test("temperature alpha=0 equalizes group contributions to ~n_min") {
    val kept = Sampling.temperatureSample(skewed, "id", "dom", 0.0)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(kept("small") === 500L) // smallest group keeps all
    // others land near n_min (hash-bucket granularity: ±5% of group size)
    assert(math.abs(kept("big") - 500L) < 7000 * 0.05, s"big=${kept("big")}")
    assert(math.abs(kept("mid") - 500L) < 2500 * 0.05, s"mid=${kept("mid")}")
  }

  test("temperature selection is deterministic and nested across alpha") {
    val a = Sampling.temperatureSample(skewed, "id", "dom", 0.5)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(skewed, "id", "dom", 0.5)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // lower alpha = lower per-group thresholds on the SAME buckets, so the
    // harsher sample is a strict subset of the milder one
    val harsher = Sampling.temperatureSample(skewed, "id", "dom", 0.0)
      .select("id").as[Long].collect().toSet
    assert(harsher.subsetOf(a))
  }

  test("bottom-k sample keeps exactly min(k, group size) rows per group") {
    val kept = Sampling.bottomKSample(skewed, "id", "dom", 100)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(kept === Map("big" -> 100L, "mid" -> 100L, "small" -> 100L))
    val tiny = skewed.filter(col("dom") === "small").limit(30)
    assert(Sampling.bottomKSample(tiny, "id", "dom", 100).count() === 30L)
  }

  test("bottom-k sample is deterministic and nested in k") {
    val k50 = Sampling.bottomKSample(skewed, "id", "dom", 50)
      .select("id").as[Long].collect().toSet
    val k100 = Sampling.bottomKSample(skewed, "id", "dom", 100)
      .select("id").as[Long].collect().toSet
    assert(k50.subsetOf(k100), "smaller k must be a prefix of larger k")
    val again = Sampling.bottomKSample(skewed, "id", "dom", 50)
      .select("id").as[Long].collect().toSet
    assert(again === k50)
    // sub-sample key: rank <= 50 within the k=100 sample IS the k=50 sample
    val viaRank = Sampling.bottomKSample(skewed, "id", "dom", 100)
      .filter(col("sample_rank") <= 50).select("id").as[Long].collect().toSet
    assert(viaRank === k50)
  }

  test("bottom-k plans as WindowGroupLimit (map-side pre-trim)") {
    val plan = Sampling.bottomKSample(skewed, "id", "dom", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("budgetMixSample: monotone in budget, capped domains keep all") {
    val docs = (0 until 400).map { i =>
      (i.toLong, s"d${i % 4}", 10L + i % 7)
    }.toDF("id", "dom", "ntok")
    val small = Sampling.budgetMixSample(docs, "id", "dom", "ntok",
      Map("d0" -> 0.9), defaultWeight = 0.03, budgetTokens = 2000L)
    val large = Sampling.budgetMixSample(docs, "id", "dom", "ntok",
      Map("d0" -> 0.9), defaultWeight = 0.03, budgetTokens = 8000L)
    val smallIds = small.select("id").as[Long].collect().toSet
    val largeIds = large.select("id").as[Long].collect().toSet
    assert(smallIds.subsetOf(largeIds), "raising the budget must only add rows")
    // d0 allocation 1800 tokens vs ~1300 available -> capped, keeps all
    val d0All = docs.filter($"dom" === "d0").count()
    assert(small.filter($"dom" === "d0").count() === d0All)
    // other domains keep roughly budget*w tokens
    val d1tok = small.filter($"dom" === "d1").agg(sum($"ntok")).as[Long].head()
    assert(d1tok < 200L, s"d1 must be down-sampled hard, kept $d1tok tokens")
  }

  test("budgetMixSample: budget beyond the corpus keeps every row, and the " +
      "huge-budget threshold arithmetic does not overflow") {
    val docs = (0 until 100).map(i => (i.toLong, "d0", 50L))
      .toDF("id", "dom", "ntok")
    // 10^15-token budget: the ppb-scaled numerator is ~10^27 — must route
    // through DECIMAL(38) integral division, not long multiplication
    val all = Sampling.budgetMixSample(docs, "id", "dom", "ntok",
      Map.empty, defaultWeight = 1.0, budgetTokens = 1000000000000000L)
    assert(all.count() === 100L, "over-budget domains keep every row")
  }
}
