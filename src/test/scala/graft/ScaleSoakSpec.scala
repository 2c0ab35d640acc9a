package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.PipelineCatalog

/**
 * In-CI soak: a 2× ScaleData copy of sf0.001 runs through the paths that
 * only round-end soaks used to exercise — the DISTRIBUTED cluster
 * resolution tiers (broadcast-label rounds and the sort-merge fallback;
 * on data this small the default thresholds would always pick the driver
 * union-find) and a windowed aggregate whose counts must scale exactly
 * with the copy factor. Small on purpose: seconds, not minutes, so it
 * runs in every `sbt test`.
 */
class ScaleSoakSpec extends SparkSuite {

  import spark.implicits._

  test("2x soak: distributed cluster tiers agree and window counts scale exactly") {
    val src = "/root/testdata/sf0.001"
    val dst = Files.createTempDirectory("soak2x").toString
    graft.apps.ScaleData.main(Array(src, dst, "2"))

    // --- dedup: every cluster-resolution tier on the scaled pair set ---
    val pairs = PipelineCatalog.dedupJaccard(spark, dst)
    val nPairs = pairs.count()
    assert(nPairs > 0, "scaled corpus must produce near-dup pairs")

    def labels(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_id").cast("long"), col("cluster_id").cast("long"))
        .as[(Long, Long)].collect().toSet

    val local = labels(Dedup.resolveClusters(pairs))
    info(s"[soak] distributed broadcast-label tier over $nPairs pairs")
    val bcastTier = labels(Dedup.resolveClusters(pairs, localEdgeThreshold = -1L))
    info(s"[soak] distributed sort-merge tier over $nPairs pairs")
    val smjTier = labels(Dedup.resolveClusters(pairs,
      localEdgeThreshold = -1L, broadcastNodeLimit = -1L))
    assert(bcastTier === local, "broadcast-label tier must match union-find")
    assert(smjTier === local, "sort-merge tier must match union-find")

    // Keys shift per copy but text stays byte-identical (ScaleData's
    // planted worst case), so every doc pairs with its cross-copy twin:
    // each base component's copies merge into ONE component, and every
    // doc that had no near-dup at all becomes a fresh 2-doc (doc, twin)
    // component. Exact invariant: scaled = base + (docs − paired docs).
    val baseLabels = labels(
      Dedup.resolveClusters(PipelineCatalog.dedupJaccard(spark, src)))
    val nDocs = spark.read.parquet(s"$src/documents.parquet").count()
    val expectedClusters =
      baseLabels.map(_._2).size + (nDocs - baseLabels.map(_._1).size)
    assert(local.map(_._2).size.toLong === expectedClusters,
      "cross-copy exact dups must merge copies and pair up base singletons")

    // --- window: tumbling counts double at 2x event density ------------
    val base = SparkEntry.queries("pv_tumbling")(spark, src)
      .select(col("window_end"), col("cnt").as("base_cnt"))
    val scaled = SparkEntry.queries("pv_tumbling")(spark, dst)
      .select(col("window_end"), col("cnt").as("scaled_cnt"))
    val joined = base.join(scaled, Seq("window_end"), "full_outer")
    assert(joined.filter(col("base_cnt").isNull || col("scaled_cnt").isNull)
      .count() === 0, "2x density must produce the SAME window set")
    assert(joined.filter(col("scaled_cnt") =!= col("base_cnt") * 2)
      .count() === 0, "every window's count must be exactly 2x the base")

    // --- BPE: merge learning is scale-invariant under replication -------
    // Replicating the corpus scales every pair count by the copy factor,
    // so the argmax sequence — and therefore the learned merges — must be
    // IDENTICAL, with pair counts exactly doubled. A divergence means the
    // argmax or tie-break depends on data layout, not content.
    import graft.operators.Tokenize
    val baseBpe = Tokenize.learnBpe(
      Tokenize.wordCounts(
        spark.read.parquet(s"$src/documents.parquet"), "doc_id", "text"),
      k = 6).merges
    val scaledBpe = Tokenize.learnBpe(
      Tokenize.wordCounts(
        spark.read.parquet(s"$dst/documents.parquet"), "doc_id", "text"),
      k = 6).merges
    assert(scaledBpe.map(m => (m.rank, m.left, m.right)) ===
      baseBpe.map(m => (m.rank, m.left, m.right)),
      "replication must not change the learned merge sequence")
    assert(scaledBpe.map(_.pairCnt) === baseBpe.map(_.pairCnt * 2),
      "every merge's pair count must be exactly 2x the base")
  }
}
