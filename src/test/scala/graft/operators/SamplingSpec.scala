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

  test("weightedSample: exact size, positive-weight rows only") {
    val docs = Seq(
      (1L, "a", 10.0), (2L, "a", 5.0), (3L, "a", 0.0), // zero excluded
      (4L, "a", -2.0), // negative excluded
      (5L, "b", 1.0)).toDF("id", "grp", "w") // undersized group
    val out = Sampling.weightedSample(docs, "id", "w", "grp", k = 2)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp === Map("a" -> 2L, "b" -> 1L))
    assert(out.filter($"id".isin(3L, 4L)).count() === 0L,
      "non-positive weights have inclusion probability zero")
  }

  test("weightedSample: deterministic under repartitioning, nested in k") {
    val docs = (0 until 500).map(i => (i.toLong, s"g${i % 3}", 1.0 + i % 7))
      .toDF("id", "grp", "w")
    def ids(df: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Int)] =
      Sampling.weightedSample(df, "id", "w", "grp", k)
        .select($"id", $"sample_rank").as[(Long, Int)].collect().toSet
    val a = ids(docs, 10)
    val b = ids(docs.repartition(17, $"w"), 10)
    assert(a === b, "layout must not change the sample")
    val prefix = ids(docs, 4)
    assert(prefix === a.filter(_._2 <= 4),
      "rank <= j must be the deterministic j-subset of the k-sample")
  }

  test("weightedSample: a dominant weight always wins rank 1") {
    val docs = ((0 until 200).map(i => (i.toLong, "g", 1e-9))
      :+ (999L, "g", 1e9.toDouble)).toDF("id", "grp", "w")
    val top = Sampling.weightedSample(docs, "id", "w", "grp", k = 1).head()
    assert(top.getLong(0) === 999L,
      "es key -ln(u)/w of the 1e9-weight row is ~1e18 times smaller")
  }

  test("weightedSample: inclusion rates track weights (2:1 within 20%)") {
    // 3000 rows, half weight 2.0, half weight 1.0, k = 300: ES inclusion
    // probability is ~proportional to weight at k << n, so the weight-2
    // class should contribute ~2x the weight-1 class
    val docs = (0 until 3000).map(i =>
      (i.toLong, "g", if (i % 2 == 0) 2.0 else 1.0)).toDF("id", "grp", "w")
    val kept = Sampling.weightedSample(docs, "id", "w", "grp", k = 300)
      .select($"w").as[Double].collect()
    val heavy = kept.count(_ == 2.0).toDouble
    val light = kept.count(_ == 1.0).toDouble
    val ratio = heavy / light
    assert(ratio > 1.6 && ratio < 2.4,
      s"inclusion ratio $ratio strays from the 2:1 weight ratio")
  }

  test("weightedSample plans as WindowGroupLimit (map-side pre-trim)") {
    val docs = (0 until 100).map(i => (i.toLong, s"g${i % 3}", 1.0 + i))
      .toDF("id", "grp", "w")
    val p = Sampling.weightedSample(docs, "id", "w", "grp", k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank-then-filter must pre-trim map-side:\n$p")
  }

  // ---- leakageSafeSplit: near-dup groups never cross the eval wall ----

  test("leakageSafeSplit: transitive near-dup chains land on ONE side") {
    val docs = spark.range(500).select(col("id").as("doc_id"))
    // chains: (1,2,3) via 1-2, 2-3; (10,11); the rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val split = Sampling.leakageSafeSplit(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.size === 500, "every doc gets exactly one assignment")
    // chain members share group AND split — including the transitive 1-3
    assert(Set(1L, 2L, 3L).map(split(_)).size === 1,
      s"chain must collapse to one (group, split): ${split.filterKeys(Set(1L, 2L, 3L))}")
    assert(split(10L) === split(11L))
    // no pair crosses the wall (the property the operator exists for)
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)).foreach { case (a, b) =>
      assert(split(a)._2 === split(b)._2, s"leak: $a/${split(a)} vs $b/${split(b)}")
    }
    // singletons split by their own id, identically to splitColumn
    val own = docs.filter(!col("doc_id").isin(1L, 2L, 3L, 10L, 11L))
      .select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"), 0.8, 0.1).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    own.foreach { case (id, s) => assert(split(id)._2 === s) }
    // rough fractions hold on 500 keys
    val frac = split.values.groupBy(_._2).view.mapValues(_.size / 500.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toString)
  }

  test("leakageSafeSplit is recomputable: identical assignment on re-run") {
    val docs = spark.range(200).select(col("id").as("doc_id"))
    val pairs = Seq((5L, 6L)).toDF("id_a", "id_b")
    val a = Sampling.leakageSafeSplit(docs, "doc_id", pairs).collect().toSeq
    val b = Sampling.leakageSafeSplit(docs, "doc_id", pairs).collect().toSeq
    assert(a.toSet === b.toSet)
  }
}
