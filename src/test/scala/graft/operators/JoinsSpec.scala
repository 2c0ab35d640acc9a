package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Join operator semantics, including the skew-salting equivalence. */
class JoinsSpec extends SparkSuite {

  import spark.implicits._

  test("skewSaltedJoin ≡ plain inner join on skewed data") {
    // one hot key (90% of rows) + a tail
    val skewed = spark.range(2000)
      .selectExpr("if(id % 10 = 0, id, 1) as k", "id as v")
    val other = Seq((1L, "hot"), (10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("k", "label")
    val plain = skewed.join(other, "k")
      .select("k", "v", "label").as[(Long, Long, String)].collect().toSet
    val salted = Joins.skewSaltedJoin(skewed, other, "k", saltBuckets = 8)
      .select("k", "v", "label").as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.count(_._1 == 1L) > 1000, "the hot key dominates the join")
  }

  test("asofJoin: latest at-or-prior right row per left row") {
    val l = Seq((1L, 10L), (1L, 20L), (1L, 8L), (2L, 5L)).toDF("k", "lu")
    val r = Seq((1L, 8L, 1.5), (1L, 15L, 2.5), (2L, 9L, 9.0)).toDF("k", "ru", "v")
    val res = Joins.asofJoin(l, r, "k", "lu", "ru", Seq("v"))
      .select("k", "lu", "ru", "v")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(res === Set(
      (1L, 10L, Some(8L), Some(1.5)),   // latest prior
      (1L, 20L, Some(15L), Some(2.5)),  // overtaken by newer right row
      (1L, 8L, Some(8L), Some(1.5)),    // equal ts matches (>=)
      (2L, 5L, None, None)))            // no prior right row → left-join nulls
  }

  test("asofJoin: tolerance rejects stale matches") {
    val l = Seq((1L, 100L)).toDF("k", "lu")
    val r = Seq((1L, 10L, 1.0)).toDF("k", "ru", "v")
    val strict = Joins.asofJoin(l, r, "k", "lu", "ru", Seq("v"),
        toleranceUsec = Some(50L))
      .select("ru", "v").as[(Option[Long], Option[Double])].collect().head
    assert(strict === ((None, None)), "match older than tolerance is nulled")
    val loose = Joins.asofJoin(l, r, "k", "lu", "ru", Seq("v"),
        toleranceUsec = Some(95L))
      .select("ru", "v").as[(Option[Long], Option[Double])].collect().head
    assert(loose === ((Some(10L), Some(1.0))))
  }

  test("asofJoinNative: fixed cases match the window form exactly") {
    val l = Seq((1L, 10L), (1L, 20L), (1L, 8L), (2L, 5L)).toDF("k", "lu")
    val r = Seq((1L, 8L, 1.5), (1L, 15L, 2.5), (2L, 9L, 9.0)).toDF("k", "ru", "v")
    val res = Joins.asofJoinNative(l, r, "k", "lu", "ru", Seq("v"))
      .select("k", "lu", "ru", "v")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(res === Set(
      (1L, 10L, Some(8L), Some(1.5)),
      (1L, 20L, Some(15L), Some(2.5)),
      (1L, 8L, Some(8L), Some(1.5)),
      (2L, 5L, None, None)))
    val strict = Joins.asofJoinNative(
        Seq((1L, 100L)).toDF("k", "lu"),
        Seq((1L, 10L, 1.0)).toDF("k", "ru", "v"),
        "k", "lu", "ru", Seq("v"), toleranceUsec = Some(50L))
      .select("ru", "v").as[(Option[Long], Option[Double])].collect().head
    assert(strict === ((None, None)), "match older than tolerance is nulled")
  }

  test("asofJoinNative ≡ asofJoin on randomized many-key data") {
    // deterministic pseudo-random: lots of keys, time ties, left times
    // both before and after every right time, sides from the SAME parent
    // frame (exercises the duplicate-attribute-id hazard of a self-join)
    val base = spark.range(4000).selectExpr(
      "id % 97 as k",
      "(id * 2654435761) % 1000 as t",
      "cast(id % 13 as double) as v")
    val l = base.filter("id % 3 != 0").select($"k", $"t".as("lu"))
    val r = base.filter("id % 3 = 0")
      .groupBy($"k", $"t".as("ru")).agg(max($"v").as("v"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lu", "ru", "v")
        .as[(Long, Long, Option[Long], Option[Double])].collect().sorted.toSeq
    val window = canon(Joins.asofJoin(l, r, "k", "lu", "ru", Seq("v")))
    val native = canon(Joins.asofJoinNative(l, r, "k", "lu", "ru", Seq("v")))
    assert(native === window)
    assert(native.nonEmpty && native.exists(_._3.isDefined) &&
      native.exists(_._3.isEmpty), "mix of matched and unmatched rows")
    // and with a tolerance
    val windowT = canon(Joins.asofJoin(l, r, "k", "lu", "ru", Seq("v"),
      toleranceUsec = Some(40L)))
    val nativeT = canon(Joins.asofJoinNative(l, r, "k", "lu", "ru", Seq("v"),
      toleranceUsec = Some(40L)))
    assert(nativeT === windowT)
    assert(nativeT.count(_._3.isDefined) < native.count(_._3.isDefined),
      "tolerance must null some stale matches")
  }

  test("asofJoinNative survives AQE coalescing and multi-partition shuffles") {
    // zipPartitions requires BOTH children to end up with the same
    // partition count after EnsureRequirements and AQE coalescing — pin
    // that under (a) coalescing on, (b) coalescing off with a prime
    // partition count, (c) asymmetric side sizes.
    val base = spark.range(60000).selectExpr(
      "id % 503 as k", "(id * 2654435761) % 100000 as t",
      "cast(id % 17 as double) as v")
    val l = base.filter("id % 5 != 0").select($"k", $"t".as("lu"))
    val r = base.filter("id % 5 = 0")
      .groupBy($"k", $"t".as("ru")).agg(max($"v").as("v"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lu", "ru", "v")
        .as[(Long, Long, Option[Long], Option[Double])].collect().sorted.toSeq
    val expected = canon(Joins.asofJoin(l, r, "k", "lu", "ru", Seq("v")))
    val confs = Seq(
      ("true", "true"), ("true", "false"), ("false", "true"))
    confs.foreach { case (adaptive, coalesce) =>
      val prevP = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.adaptive.enabled", adaptive)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val native = canon(Joins.asofJoinNative(l, r, "k", "lu", "ru", Seq("v")))
        assert(native === expected,
          s"mismatch under adaptive=$adaptive coalesce=$coalesce")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", prevP)
      }
    }
  }

  test("bloomSemiJoin ≡ exact semi join (sketch must be invisible in the result)") {
    val fact = spark.range(5000).selectExpr("id % 700 as k", "id as v")
    val dim = spark.range(200).selectExpr("id * 3 as dk") // 0,3,...,597
    val exact = fact.join(dim, $"k" === $"dk", "left_semi")
      .as[(Long, Long)].collect().toSet
    // tiny sketch (high fpp) on purpose: false positives MUST be re-checked
    val pruned = Joins.bloomSemiJoin(fact, "k", dim, "dk",
        expectedItems = 200L, numBits = 1L << 10)
      .as[(Long, Long)].collect().toSet
    assert(pruned === exact)
    assert(exact.nonEmpty && exact.size < 5000)
  }

  test("bucketedRangeJoin ≡ exact BETWEEN join incl. negatives and wide intervals") {
    val points = Seq(-25.0, -10.0, -0.01, 0.0, 4.99, 5.0, 5.01, 49.9, 120.0)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val intervals = Seq(
      (1L, -20.0, -5.0),  // negative range
      (2L, 0.0, 5.0),     // boundaries inclusive both ends
      (3L, 4.0, 130.0),   // spans many buckets
      (4L, 60.0, 70.0))   // matches nothing
      .toDF("iid", "lo", "hi")
    val exact = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val bucketed = Joins.bucketedRangeJoin(points, "p", intervals, "lo", "hi",
        bucketWidth = 7.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed === exact)
    assert(exact.contains((3L, 2L)) && exact.contains((5L, 2L)),
      "inclusive boundaries present") // p=0.0 and p=5.0 both inside [0,5]
    assert(exact.exists(_._2 == 3L) && !exact.exists(_._2 == 4L))
  }

  test("intervalJoin: boundary inclusivity on both ends") {
    val l = Seq((1L, 1000L * 1000000L)).toDF("k", "lu")
    val r = Seq(
      (1L, 997L * 1000000L),  // exactly lower bound (1000-3)
      (1L, 1005L * 1000000L), // exactly upper bound (1000+5)
      (1L, 996L * 1000000L),  // below
      (1L, 1006L * 1000000L)  // above
    ).toDF("k", "ru")
    val res = Joins.intervalJoin(l, r, "k", "lu", "ru", 3L, 5L)
      .select(col("ru") / 1000000L).as[Double].collect().map(_.toLong).toSet
    assert(res === Set(997L, 1005L))
  }
}
