package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Fixed-point PageRank: hand-computed integer ranks on tiny graphs, the
 * bit-exactness-under-any-partitioning claim, and conf restoration of the
 * AQE-off iteration loop.
 */
class GraphRankSpec extends SparkSuite {

  import spark.implicits._

  private val S = 1000000000000L

  test("two-node symmetric graph is the stable fixed point scale/2") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = GraphRank.pageRank(e, "src", "dst", iters = 10)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // N=2, init=S/2, deg=1: contrib=S/2, next = (15%·S)/2 + 85%·S/2 = S/2
    assert(r === Map("a" -> S / 2, "b" -> S / 2))
  }

  test("symmetric 3-star after one iteration: hand-computed integer ranks") {
    val spokes = Seq("x", "y", "z")
    val e = spokes.flatMap(s => Seq(("hub", s), (s, "hub"))).toDF("src", "dst")
    val r = GraphRank.pageRank(e, "src", "dst", iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // N=4, init=S/4. hub: base + 85%·(3·S/4); spoke: base + 85%·((S/4) div 3)
    val base = ((100L - 85L) * S / 100L) / 4L
    val hub = base + 85L * (3L * (S / 4L)) / 100L
    val spoke = base + 85L * ((S / 4L) / 3L) / 100L
    assert(r("hub") === hub && spokes.forall(s => r(s) === spoke), r.toString)
    assert(r("hub") > r("x"), "the hub out-ranks its spokes")
  }

  test("ranks are BIT-identical under a different partitioning/width") {
    // ring + chords: enough structure that an FP implementation would
    // see different merge orders at different widths
    val n = 40
    val ring = (0 until n).flatMap { i =>
      Seq((s"n$i", s"n${(i + 1) % n}"), (s"n${(i + 1) % n}", s"n$i"),
        (s"n$i", s"n${(i + 7) % n}"), (s"n${(i + 7) % n}", s"n$i"))
    }.toDF("src", "dst")
    val wide = GraphRank.pageRank(ring, "src", "dst", iters = 10,
        targetEdgesPerPartition = 1L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val narrow = GraphRank.pageRank(ring, "src", "dst", iters = 10)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(wide === narrow,
      "integer arithmetic must make ranks independent of execution layout")
  }

  test("dangling nodes leak mass but keep every node ranked") {
    // a -> b only: b never emits, a receives nothing
    val e = Seq(("a", "b")).toDF("src", "dst")
    val r = GraphRank.pageRank(e, "src", "dst", iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set("a", "b"))
    assert(r("b") > r("a"), "the sink accumulates what the source emits")
    assert(r.values.sum < S, "dangling sink leaks total mass (documented)")
  }

  test("ranks are BIT-identical at every checkpoint cadence (r15 barrier cut)") {
    val n = 30
    val ring = (0 until n).flatMap { i =>
      Seq((s"n$i", s"n${(i + 1) % n}"), (s"n${(i + 1) % n}", s"n$i"),
        (s"n$i", s"n${(i + 11) % n}"))
    }.toDF("src", "dst")
    def run(every: Int): Map[String, Long] =
      GraphRank.pageRank(ring, "src", "dst", iters = 7,
          checkpointEvery = every)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val stepwise = run(1)
    assert(run(2) === stepwise,
      "fused 2-iteration rounds must not move one bit")
    assert(run(5) === stepwise,
      "a 5-deep unmaterialized plan must not move one bit")
  }

  test("the iteration loop restores AQE, shuffle-width, and codegen conf") {
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partPrev = spark.conf.get("spark.sql.shuffle.partitions")
    val wscgPrev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    GraphRank.pageRank(Seq(("a", "b"), ("b", "a")).toDF("src", "dst"),
      "src", "dst", iters = 1)
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") === aqePrev)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === partPrev)
    assert(spark.conf.get("spark.sql.codegen.wholeStage", "true") === wscgPrev)
  }
}
