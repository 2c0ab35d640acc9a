package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Fixture-pinned correctness for the xxhash64-seeded dedup families that
  * have no DuckDB oracle (MinHash+LSH, SimHash): planted near-duplicates
  * must be found, distinct documents must not pair. */
class DedupSpec extends SparkSuite {

  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door and the birds sing in the tall green trees outside the old wooden house every sunny morning"
  private val nearDup = base.replace("lazy dog", "sleepy dog").replace("sunny morning", "rainy morning")
  private val distinct1 =
    "completely different content about distributed query engines processing petabytes of columnar data with vectorized execution and adaptive partitioning across thousands of worker nodes"
  private val distinct2 =
    "unrelated recipe for sourdough bread requiring flour water salt starter patience kneading folding proofing shaping scoring baking steam crust crumb flavor fermentation temperature timing"

  private lazy val docs = Seq(
    (1L, base), (2L, nearDup), (3L, distinct1), (4L, distinct2), (5L, base)
  ).toDF("doc_id", "text")

  test("exactGroups finds the exact duplicate pair") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length === 4) // 5 docs, one exact dup
    val dup = groups.filter(_.getAs[Long]("n_copies") == 2L)
    assert(dup.length === 1 && dup.head.getAs[Long]("keeper_id") === 1L)
  }

  test("exactDedup keeps min-id row per content") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  test("minhashLshPairs finds the planted near-dup and no false pair") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, tau = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dup (1,2) must be found, got $pairs")
    assert(pairs.contains((1L, 5L)), "exact dup is trivially a near-dup")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashLshPairs survives a planted 1000-copy mega-cluster") {
    // Unguarded LSH would put all 1000 copies in every band bucket →
    // bands × N²/2 ≈ 4M candidate rows. With the exact-dedup guard the
    // cluster bands ONCE (its keeper) and duplicates come back as a
    // linear (keeper, dup, 1.0) star.
    val cluster = (100L until 1100L).map(i => (i, base))
    val all = (Seq((1L, distinct1), (2L, distinct2)) ++ cluster)
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(all, "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, tau = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // star, not clique: exactly N-1 pairs for the cluster, all anchored at
    // the keeper (min id = 100), nothing touching the two distinct docs
    assert(pairs.length === 999, s"expected linear star, got ${pairs.length} pairs")
    assert(pairs.forall(_._1 == 100L))
    assert(pairs.map(_._2).toSet === (101L until 1100L).toSet)
  }

  test("portable md5 variants: same planted-dup behavior, same guard") {
    // the engine-portable forms must reproduce the family CONTRACT
    // (planted near-dups found, distinct docs never pair, exact dups
    // return as keeper stars) — exact pair sets legitimately differ
    // from the xxhash64 forms (different hash, different candidates);
    // the DuckDB oracle gates pin their exact output
    val mh = Dedup.minhashLshPairsPortable(docs, "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, tau = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh.contains((1L, 2L)), s"near-dup (1,2) must be found, got $mh")
    assert(mh.contains((1L, 5L)), "exact dup is trivially a near-dup")
    assert(!mh.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!mh.exists(p => p._1 == 4L || p._2 == 4L))

    val sh = Dedup.simhashPairsPortable(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sh.contains((1L, 5L)), "exact dup has hamming 0")
    assert(!sh.exists(p =>
      (p._1 == 3L || p._2 == 3L) && (p._1 == 4L || p._2 == 4L)),
      "the two distinct docs must not pair with each other")

    // mega-bucket guard: 300 copies band once, come back as a star
    val cluster = (100L until 400L).map(i => (i, base))
    val all = (Seq((1L, distinct1)) ++ cluster).toDF("doc_id", "text")
    val star = Dedup.minhashLshPairsPortable(all, "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, tau = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(star.length === 299 && star.forall(_._1 == 100L))
  }

  test("simhashPairs finds hamming-close docs only") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)), "identical docs have hamming 0")
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(3L, 4L)))
  }

  test("simhash banding recall holds at raised radii (brute-force reference)") {
    // The fixed 4×16 layout only guarantees candidates for hamming ≤ 3;
    // a caller-raised radius silently lost every pair whose differing
    // bits touched all four chunks (r10 find — banding now derives
    // maxHamming+1 chunks by pigeonhole). Reference: brute-force hamming
    // over the PUBLIC store's keeper signatures.
    val rnd = new scala.util.Random(97)
    val vocab = Array.tabulate(40)(i => s"sw$i")
    val bases = Array.tabulate(60)(d =>
      (1 to 14).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    // near-dup mates: one or two tokens swapped — assorted hamming radii
    // mutated tokens are guaranteed ≠ the originals, so no exact dups
    // sneak in (reference is over distinct-content keepers only)
    val corpus = bases.zipWithIndex.flatMap { case (t, d) =>
      val toks = t.split(" ")
      def other(w: String): String =
        vocab((vocab.indexOf(w) + 1 + rnd.nextInt(vocab.length - 1)) %
          vocab.length)
      val mut = toks.updated(0, other(toks(0)))
        .updated(5, other(toks(5))).mkString(" ")
      Seq((d * 2L, t), (d * 2L + 1L, mut))
    }.toSeq.toDF("doc_id", "text")
    val h = 7
    val sigs = Dedup.simhashStore(corpus, "doc_id", "text")
      .select(col("id"), col("sig")).as[(Long, Long)].collect()
    val reference = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= h
    } yield (ia, ib, d)).toSet
    assert(reference.exists(_._3 > 3),
      "fixture must contain pairs beyond the old 4-chunk guarantee radius")
    val banded = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = h)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
      .map { case (a, b, d) => (a, b, d) }.toSet
    assert(banded === reference,
      "banded pairs must equal the brute-force signature reference at h=7")
    // portable family: same guarantee over its own (hi, lo) signatures
    val sigsP = Dedup.simhashStorePortable(corpus, "doc_id", "text")
      .select(col("id"), col("sig_hi"), col("sig_lo"))
      .as[(Long, Long, Long)].collect()
    val refP = (for {
      (ia, ha, la) <- sigsP; (ib, hb, lb) <- sigsP if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= h
    } yield (ia, ib, d)).toSet
    val bandedP = Dedup.simhashPairsPortable(corpus, "doc_id", "text",
        maxHamming = h)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(bandedP === refP,
      "portable banded pairs must equal the brute-force reference at h=7")
    // scale-derived layouts (multi-block combination tables: at h=7 a
    // 50M hint derives 9 blocks / 36 two-block tables) are
    // output-invariant — the pigeonhole holds at every block count
    val bandedWide = Dedup.simhashPairs(corpus, "doc_id", "text",
        maxHamming = h, corpusHint = 50000000L)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(bandedWide === reference,
      "wide-key combination tables must equal the brute-force reference")
    val bandedWideP = Dedup.simhashPairsPortable(corpus, "doc_id", "text",
        maxHamming = h, corpusHint = 50000000L)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(bandedWideP === refP,
      "portable wide-key tables must equal the brute-force reference")
  }

  test("simhashBlocks derives the table layout from observed corpus scale") {
    // hint-less / tiny corpora: the historical floor layout
    assert(Dedup.simhashBlocks(3, -1L) === 4)
    assert(Dedup.simhashBlocks(3, 0L) === 4)
    assert(Dedup.simhashBlocks(3, 1000L) === 4)
    // pigeonhole floor holds at every radius
    assert(Dedup.simhashBlocks(7, 100L) === 8)
    assert(Dedup.simhashBlocks(0, 100L) === 4)
    // scale widens the keys: 5M keepers at r=3 outgrow 16-bit tables
    val b5m = Dedup.simhashBlocks(3, 5000000L)
    assert(b5m > 4, s"5M keepers must widen past the floor, got $b5m")
    // monotone in corpus size
    assert(Dedup.simhashBlocks(3, 100000000L) >= b5m)
    // table-count cap: C(b, 3) <= 64 stops r=3 at 8 blocks
    assert(Dedup.simhashBlocks(3, Long.MaxValue) === 8)
    // block-count cap: radius 31's floor is already the 32-block cap
    assert(Dedup.simhashBlocks(31, Long.MaxValue) === 32)
    // combination enumeration: floor layout = single-block tables
    assert(Dedup.simhashCombos(4, 3) === Seq(Seq(0), Seq(1), Seq(2), Seq(3)))
    assert(Dedup.simhashCombos(9, 7).size === 36)
  }

  test("estimatedSigRows: a no-stats source poisons DERIVED estimates too (leaf walk)") {
    import spark.implicits._
    // an in-memory (LocalRelation→LogicalRDD-class) frame: depending on
    // the plan it either carries real LocalRelation stats or the
    // defaultSizeInBytes sentinel; force the sentinel with an RDD-backed
    // frame (no computed stats)
    val rdd = spark.sparkContext.parallelize(
      Seq((1L, "a"), (2L, "b")), 2)
    val noStats = spark.createDataFrame(rdd.map(t =>
      org.apache.spark.sql.Row(t._1, t._2)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    // the leaf itself reports the sentinel → "no estimate"
    assert(Dedup.estimatedSigRows(noStats) === 1L)
    // ADVICE r13: a projection/filter COMPOSED over it reports a
    // sentinel-DERIVED size (width-scaled, no longer exactly equal) —
    // the leaf walk must still treat it as absent, not as a giant corpus
    assert(Dedup.estimatedSigRows(
      noStats.select($"id").filter($"id" > 0L)) === 1L)
    // a real local relation with computed stats keeps its estimate —
    // even composed under a projection (leaf stats are real, so the
    // derived size is trusted)
    val real = (1L to 1000L).map(i => (i, s"text body $i")).toDF("id", "text")
    assert(Dedup.estimatedSigRows(real.select($"id", $"text")) > 1L,
      "real leaf stats must survive the leaf walk")
  }

  test("simhashPairs survives a planted 500-copy mega-cluster") {
    val cluster = (100L until 600L).map(i => (i, base))
    val all = (Seq((1L, distinct1)) ++ cluster).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(all, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.length === 499, s"expected linear star, got ${pairs.length} pairs")
    assert(pairs.forall(_._1 == 100L))
  }

  test("resolveClusters labels connected components with their min id") {
    // components: {1,2,3,7} (path 1-2, 2-3, 3-7), {10,11}, singleton pairs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.resolveClusters(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 1L), (3L, 1L), (7L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("resolveClusters ≡ brute-force components on random graphs (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.propBoolean
    // Brute-force oracle: repeated relaxation over an in-memory edge list.
    def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val label = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (a, b) =>
        label.getOrElseUpdate(a, a); label.getOrElseUpdate(b, b)
      }
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(label(a), label(b))
          if (label(a) != m) { label(a) = m; changed = true }
          if (label(b) != m) { label(b) = m; changed = true }
        }
      }
      // propagate to fixpoint through label chains
      label.keys.toSeq.foreach { k =>
        var v = label(k)
        while (label(v) != v) v = label(v)
        label(k) = v
      }
      label.toMap
    }
    val graphGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 60)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L)
      } yield (a, b))
    } yield edges
    val prop = Prop.forAll(graphGen) { edges =>
      val df = edges.toDF("id_a", "id_b")
      val got = Dedup.resolveClusters(df).as[(Long, Long)].collect().toMap
      val want = bruteComponents(edges)
      (got == want) :| s"got=$got want=$want edges=$edges"
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("resolveClusters local and distributed paths agree on a random graph") {
    val rnd = new scala.util.Random(42)
    // 300 edges over 120 nodes: long chains + merges + self-loops
    val pairs = (1 to 300)
      .map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .toDF("id_a", "id_b")
    val local = Dedup.resolveClusters(pairs) // ≤ threshold → union-find
      .as[(Long, Long)].collect().toSet
    // distributed, broadcast-label tier (nodes ≤ broadcastNodeLimit)
    val dist = Dedup.resolveClusters(pairs, localEdgeThreshold = -1L)
      .as[(Long, Long)].collect().toSet
    // distributed, general sort-merge tier (broadcast disabled)
    val smj = Dedup.resolveClusters(pairs, localEdgeThreshold = -1L,
        broadcastNodeLimit = -1L)
      .as[(Long, Long)].collect().toSet
    assert(local === dist)
    assert(local === smj)
    assert(local.nonEmpty)
    // auto-derived width: targetEdgesPerPartition=8 forces nP = 75 (600
    // symmetric edges / 8) above the session's 32 — labels must be
    // invariant to the derived shuffle width
    val wide = Dedup.resolveClusters(pairs, localEdgeThreshold = -1L,
        broadcastNodeLimit = -1L, targetEdgesPerPartition = 8L)
      .as[(Long, Long)].collect().toSet
    assert(local === wide)
  }

  test("edge shuffle width derives from edge volume, never below session parallelism") {
    // small edge sets keep the session width
    assert(Dedup.edgeShufflePartitions(32, 1000L, 4000000L) === 32)
    assert(Dedup.edgeShufflePartitions(32, 0L, 4000000L) === 32)
    // the round-8 soak shape: 130M symmetric edges at 8 session partitions
    // must widen to ceil(130M/4M) = 33, not spill at 8
    assert(Dedup.edgeShufflePartitions(8, 130000000L, 4000000L) === 33)
    // exact multiples don't over-allocate
    assert(Dedup.edgeShufflePartitions(8, 128000000L, 4000000L) === 32)
    // runaway guard
    assert(Dedup.edgeShufflePartitions(8, Long.MaxValue / 4, 1L) === 65536)
  }

  test("jaccardPairs respects the blocking column") {
    val blocked = Seq(
      (1L, base, "s1"), (2L, nearDup, "s2"), // same content family, different blocks
      (3L, base, "s2")
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.jaccardPairs(blocked, "doc_id", "text", "source", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((2L, 3L))) // only the same-block near pair
  }

  test("editDistancePairs finds typo pairs within a block, pre-filtered by length") {
    val rows = Seq(
      (1L, "alpha", "b1"), (2L, "alphb", "b1"),   // dist 1, same block
      (3L, "alpha", "b2"),                        // exact twin of 1 but other block
      (4L, "alphax", "b1"),                       // dist 1 from "alpha" (insertion)
      (5L, "omega", "b1"),                        // far from everything
      (6L, "alphaxyz", "b1")                      // length band excludes vs "alpha"
    ).toDF("id", "name", "blk")
    val pairs = Dedup.editDistancePairs(rows, "id", "name", "blk", maxDist = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    // (2,4) "alphb"/"alphax" is dist 2 — inside the length band but cut by the
    // distance filter; (6) is cut by the band alone.
    assert(pairs === Set((1L, 2L, 1L), (1L, 4L, 1L)))
    // maxDist = 0 degenerates to exact match within the block
    val exact = Dedup.editDistancePairs(rows, "id", "name", "blk", maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(exact === Set.empty)
  }

  test("editDistancePairs neighborhood path ≡ brute force at radius 1") {
    // the r11 deletion-neighborhood candidates (maxDist ≤ 1) must equal
    // the all-pairs reference on a fixture exercising every edit kind:
    // equality, substitution (first/middle/last), insertion, deletion,
    // empty strings, and cross-block separation
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(11)
    val words = Seq("cat", "bat", "cut", "ca", "cats", "scat", "", "a",
      "dog", "dig", "dog", "ogd") ++
      (0 until 40).map(_ => (1 to 2 + rnd.nextInt(4))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val rows = words.zipWithIndex.map { case (w, i) =>
      (i.toLong, w, s"b${i % 2}") }
    val df = rows.toDF("id", "name", "blk")
    val reference = (for {
      (ia, sa, ba) <- rows; (ib, sb, bb) <- rows
      if ia < ib && ba == bb && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val got = Dedup.editDistancePairs(df, "id", "name", "blk", maxDist = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got === reference,
      "neighborhood candidates must reproduce the brute-force pair set")
    assert(reference.exists(_._3 == 0L) && reference.exists(_._3 == 1L),
      "fixture must exercise both distance-0 and distance-1 pairs")
    // radius 2: two-deletion neighborhoods (sub+sub, sub+ins, del+del,
    // ... — the short random words hit every combination)
    val ref2 = (for {
      (ia, sa, ba) <- rows; (ib, sb, bb) <- rows
      if ia < ib && ba == bb && lev(sa, sb) <= 2
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val got2 = Dedup.editDistancePairs(df, "id", "name", "blk", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got2 === ref2,
      "radius-2 neighborhood candidates must reproduce brute force")
    assert(ref2.exists(_._3 == 2L), "fixture must exercise distance-2 pairs")
    // Degenerate-bucket regime (ADVICE r11): a bucketCap of 1 routes
    // EVERY multi-member variant bucket through the streamed self-join
    // (no in-expression pair array anywhere); cap 2 exercises the mixed
    // split. Both must still reproduce brute force exactly — the two
    // regimes generate the same pairs with the same orientation. The
    // fixture's many short same-alphabet strings share tiny deletion
    // variants ("" at radius ≥ 1), exactly the degenerate shape the cap
    // protects against.
    for (cap <- Seq(1, 2); dist <- Seq(1, 2)) {
      val ref = if (dist == 1) reference else ref2
      val capped = Dedup.editDistancePairsNeighborhood(df, "id", "name",
          "blk", maxDist = dist, bucketCap = cap)
        .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
      assert(capped === ref,
        s"self-join bucket regime (cap=$cap, maxDist=$dist) must equal brute force")
    }
  }

  test("graft_deletion_hashes ≡ xxhash64 over the declarative deletion-variant set") {
    // The r17 native expression must emit exactly the xxhash64(seed 42)
    // values of the distinct ≤ maxDist-deletion variants the retired
    // declarative pipeline (delOnce via substr + array_distinct +
    // xxhash64) produced — deletion counted in CODE POINTS (substr
    // semantics), including multibyte and supplementary-plane chars.
    import graft.functions.TextHash
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def delOnceRef(s: String): Seq[String] = {
      val cps = s.codePoints().toArray
      cps.indices.map { i =>
        val kept = cps.patch(i, Nil, 1)
        new String(kept, 0, kept.length)
      }
    }
    def variantsRef(s: String, maxDist: Int): Seq[String] = maxDist match {
      case 0 => Seq(s)
      case 1 => (s +: delOnceRef(s)).distinct
      case _ =>
        val d1 = delOnceRef(s)
        (s +: (d1 ++ d1.flatMap(delOnceRef))).distinct
    }
    val samples = Seq("", "a", "ab", "aaa", "Customer#000001234",
      "añaüz", "日本語テスト", "a😀b😀", "mixedASCIIand日本")
    for (s <- samples; d <- 0 to 2) {
      val got = TextHash.deletionHashes(UTF8String.fromString(s), d)
        .toLongArray().toSeq
      val want = variantsRef(s, d)
        .map(v => XXH64.hashUTF8String(UTF8String.fromString(v), 42L))
      assert(got.toSet === want.toSet,
        s"variant hash set must match the declarative form for '$s' d=$d")
      assert(got.distinct === got,
        s"emitted hashes must already be distinct for '$s' d=$d")
      assert(got.size === want.distinct.size)
    }
  }

  test("keepBestPerCluster: max score survives, ties to min id, null scores lose, singletons stay") {
    // components from pairs: {1,2,3} and {10,11}; 20 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, Some(5L)), (2L, Some(9L)), (3L, Some(9L)),  // 2 and 3 tie at 9 -> 2
      (10L, None: Option[Long]), (11L, Some(1L)),      // null loses to scored
      (20L, None: Option[Long])                        // singleton survives
    ).toDF("doc_id", "score")
    val kept = Dedup.keepBestPerCluster(docs, "doc_id", pairs, "score")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 11L, 20L))
    // full rows come back, schema unchanged
    assert(Dedup.keepBestPerCluster(docs, "doc_id", pairs, "score")
      .columns.toSeq === Seq("doc_id", "score"))
  }

  test("duplicatedSpans flags shared and self-repeated n-token spans") {
    val span = (1 to 4).map(i => s"w$i").mkString(" ") // 4-token span
    val docs = Seq(
      (1L, s"aa bb $span cc"),            // shares `span` with doc 2
      (2L, s"$span dd ee ff"),
      (3L, s"$span gg $span hh"),         // also repeats it internally
      (4L, "totally unrelated words only here"),
      (5L, "tiny")                        // < n tokens: zero spans
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out(0) === ((1L, 4, 1L))) // one of its 4 windows is the shared span
    assert(out(1) === ((2L, 4, 1L)))
    assert(out(2) === ((3L, 7, 2L))) // both internal occurrences flagged
    assert(out(3) === ((4L, 2, 0L)))
    assert(out(4) === ((5L, 0, 0L)))
  }

  test("span store: incremental screen ≡ batch rollup over the union, restricted to ingest") {
    val span = (1 to 4).map(i => s"s$i").mkString(" ")
    val cross = "u v w x"
    val corpus = Seq(
      (1L, s"aa bb $span cc"),
      (2L, "k l m n o p"),
      (3L, s"$cross qq rr")).toDF("doc_id", "text")
    val ingest = Seq(
      (10L, s"$span dd ee"),                 // dup vs the corpus store
      (11L, s"pp $cross"),                   // dup vs the corpus store
      (12L, "m1 m2 m3 m4 m1 m2 m3 m4"),      // self-repeated spans
      (13L, "fresh tokens only right here"), // clean
      (14L, "z1 z2 z3 z4 yy"),               // intra-batch dup with 15
      (15L, "z1 z2 z3 z4 zz"),
      (16L, "shrt")                          // < n tokens: zero spans
    ).toDF("doc_id", "text")
    val store = Dedup.spanStore(corpus, "doc_id", "text", n = 4)
    val inc = Dedup.duplicatedSpansIncremental(ingest, store, "doc_id", "text", n = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val batch = Dedup.duplicatedSpans(corpus.unionByName(ingest), "doc_id", "text", n = 4)
      .filter(col("id") >= 10L).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(inc.toSeq === batch.toSeq)
    // hand pins: cross-corpus dup, clean doc, intra-batch pair, zero-span doc
    assert(inc(0)._1 === 10L && inc(0)._3 === 1L)
    assert(inc(3) === ((13L, 2, 0L, 0.0)))
    assert(inc(4)._3 === 1L && inc(5)._3 === 1L)
    assert(inc(6) === ((16L, 0, 0L, 0.0)))
  }

  test("spanStore: append ≡ rebuild; delta is exactly the touched rows and upserts to append") {
    val a = Seq((1L, "a b c d e"), (2L, "f g h i")).toDF("doc_id", "text")
    val b = Seq((10L, "a b c d zz"), (11L, "new stuff here now")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val store = Dedup.spanStore(a, "doc_id", "text", n = 3)
    val rebuilt = rows(Dedup.spanStore(a.unionByName(b), "doc_id", "text", n = 3))
    val appendDf = Dedup.spanStoreAppend(store, b, "doc_id", "text", n = 3)
    assert(rows(appendDf) === rebuilt)
    // the delta covers exactly the batch's hashes, with merged counts
    val deltaDf = Dedup.spanStoreDelta(store, b, "doc_id", "text", n = 3)
    val delta = rows(deltaDf)
    val batchHashes = Dedup.spanStore(b, "doc_id", "text", n = 3)
      .select("h").as[Long].collect().toSet
    assert(delta.map(_._1) === batchHashes)
    assert(delta.subsetOf(rebuilt))
    // upsert(store, delta) ≡ append: untouched store rows + delta rows
    val untouched = store.join(deltaDf.select(col("h")), Seq("h"), "left_anti")
    assert(rows(untouched.unionByName(deltaDf)) === rebuilt)
  }

  test("spanStorePerDoc: groupBy-h sum ≡ spanStore; per-doc screen ≡ occ screen; batch ids excluded") {
    val corpus = Seq(
      (1L, "a b c d e a b c d"),
      (2L, "f g h i j k")).toDF("doc_id", "text")
    val ingest = Seq(
      (10L, "a b c d zz"),
      (11L, "totally novel words here now")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val perDoc = Dedup.spanStorePerDoc(corpus, "doc_id", "text", n = 4)
    // the aggregate store is exactly the per-doc store's groupBy sum
    assert(rows(perDoc.groupBy("h").agg(sum("cnt").as("occ")))
      === rows(Dedup.spanStore(corpus, "doc_id", "text", n = 4)))
    def screen(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val viaOcc = screen(Dedup.duplicatedSpansIncremental(ingest,
      Dedup.spanStore(corpus, "doc_id", "text", n = 4), "doc_id", "text", n = 4))
    assert(screen(Dedup.duplicatedSpansIncrementalPerDoc(
      ingest, perDoc, "doc_id", "text", n = 4)) === viaOcc)
    // replay safety: store rows carrying the BATCH's own ids are invisible
    // to the probe — a store that already absorbed the batch screens
    // identically to the pre-batch store
    val replayed = perDoc.unionByName(
      Dedup.spanStorePerDoc(ingest, "doc_id", "text", n = 4))
    assert(screen(Dedup.duplicatedSpansIncrementalPerDoc(
      ingest, replayed, "doc_id", "text", n = 4)) === viaOcc)
  }

  test("span screens ≡ an independent counting model on random corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.propBoolean
    val n = 3
    // tiny alphabet so 3-token spans collide across docs naturally
    val docGen: Gen[String] = for {
      len <- Gen.choose(1, 9)
      toks <- Gen.listOfN(len, Gen.choose(0, 5).map(i => s"t$i"))
    } yield toks.mkString(" ")
    val caseGen: Gen[(List[String], List[String])] = for {
      nc <- Gen.choose(0, 8)
      nb <- Gen.choose(1, 6)
      corpus <- Gen.listOfN(nc, docGen)
      batch <- Gen.listOfN(nb, docGen)
    } yield (corpus, batch)
    // reference model over span STRINGS (hash-free — agreement also
    // certifies graft_ngram_hashes carries no collisions here)
    def spansOf(text: String): Seq[String] =
      text.split(" ").toSeq.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq
    val prop = Prop.forAll(caseGen) { case (corpusTexts, batchTexts) =>
      val corpus = corpusTexts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val occ = (corpusTexts ++ batchTexts).flatMap(spansOf)
        .groupBy(identity).map { case (s, xs) => s -> xs.size }
      val want = batchTexts.zipWithIndex.map { case (t, i) =>
        val sp = spansOf(t)
        val dup = sp.count(s => occ(s) > 1)
        (100L + i, sp.size, dup.toLong,
          if (sp.nonEmpty) dup.toDouble / sp.size else 0.0)
      }.toSeq.sortBy(_._1)
      def run(df: org.apache.spark.sql.DataFrame) = df.orderBy("id")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      val viaOcc = run(Dedup.duplicatedSpansIncremental(batch,
        Dedup.spanStore(corpus, "doc_id", "text", n), "doc_id", "text", n))
      val viaDoc = run(Dedup.duplicatedSpansIncrementalPerDoc(batch,
        Dedup.spanStorePerDoc(corpus, "doc_id", "text", n),
        "doc_id", "text", n))
      ((viaOcc == want) :| s"occ-store: got=$viaOcc want=$want") &&
        ((viaDoc == want) :| s"per-doc: got=$viaDoc want=$want")
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("incrementalDedup keeps batch keepers absent from the corpus") {
    val corpus = Seq(
      (1L, "already in the corpus"),
      (2L, "another standing doc")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "brand new content"),          // genuinely new -> kept
      (11L, "brand new content"),          // in-batch dup of 10 -> dropped
      (12L, "already in the corpus"),      // cross-corpus dup -> dropped
      (13L, "also new and unique")         // kept
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(incoming, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(10L, 13L))
    // idempotence: re-ingesting the kept batch against corpus+kept = empty
    val merged = corpus.unionByName(
      incoming.filter(col("doc_id").isin(10L, 13L)))
    assert(Dedup.incrementalDedup(incoming, merged, "doc_id", "text").count() === 0L)
  }

  test("scrubSpans removes exactly the corpus-duplicated n-gram positions") {
    // doc 1 and 2 share a 4-token span; doc 3 is clean; doc 4 repeats a
    // span internally; doc 5 is entirely one duplicated span
    val docs = Seq(
      (1L, "a b c d x y z"),        // "a b c d" duplicated with doc 2
      (2L, "p q a b c d r"),
      (3L, "unique tokens only here"),
      (4L, "m n o p k m n o p k"),  // "m n o p" repeats internally? n=4 spans
      (5L, "a b c d")               // the whole doc is the shared span
    ).toDF("doc_id", "text")
    val out = Dedup.scrubSpans(docs, "doc_id", "text", n = 4)
      .orderBy("id").as[(Long, Long, String)].collect()
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) === ((3L, "x y z")), s"got ${byId(1L)}")
    assert(byId(2L) === ((3L, "p q r")), s"got ${byId(2L)}")
    assert(byId(3L) === ((4L, "unique tokens only here")))
    // doc 4: "m n o p k" occurs at positions 0..4 and 5..9; every window of
    // 4 within the repetition that occurs twice gets covered
    assert(byId(4L)._1 < 10L, "internal repetition must scrub something")
    assert(byId(5L) === ((0L, "")), "fully-duplicated doc scrubs to empty")
  }

  // ------------------------------------------------------------------
  // Incremental MinHash ingest screen: the contract is EXACT agreement
  // with the batch operator over the union, restricted to pairs touching
  // the ingest — under ingest-order ids (incoming > corpus), the pairs
  // whose id_b is an incoming id.
  // ------------------------------------------------------------------

  private lazy val incCorpus = docs // ids 1-5 (base, nearDup, 2 distinct, base-dup)
  private lazy val incBatch = Seq(
    (10L, base),                                       // exact dup of corpus keeper 1
    (11L, base.replace("brown fox", "red fox")),       // NEW near-dup of base
    (12L, "novel ingest content about streaming watermark semantics and late data routing through keyed state machines with bounded buffers"),
    (13L, "novel ingest content about streaming watermark semantics and late data routing through keyed state machines with bounded buffers"), // exact dup within ingest
    (14L, distinct1.replace("petabytes", "exabytes")), // near-dup of corpus 3
    (15L, base)                                        // second exact dup of keeper 1
  ).toDF("doc_id", "text")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("incremental minhash ≡ batch over the union, both families") {
    val union = incCorpus.unionByName(incBatch)
    // native xxhash64 family, production 8×4 params
    val batchNative = pairSet(Dedup.minhashLshPairs(union, "doc_id", "text",
      k = 3, bands = 8, rowsPerBand = 4, tau = 0.5))
    val incNative = pairSet(Dedup.minhashLshPairsIncremental(incBatch,
      Dedup.minhashStore(incCorpus, "doc_id", "text"),
      incCorpus, "doc_id", "text", k = 3, bands = 8, rowsPerBand = 4,
      tau = 0.5))
    assert(incNative === batchNative.filter(_._2 >= 10L),
      "incremental must emit exactly the union-batch pairs touching the ingest")
    // corpus-only pairs are untouched → the decomposition reassembles the batch run
    val corpusNative = pairSet(Dedup.minhashLshPairs(incCorpus, "doc_id",
      "text", k = 3, bands = 8, rowsPerBand = 4, tau = 0.5))
    assert(corpusNative ++ incNative === batchNative)
    // portable md5 family at the oracle gate's 4×2 params
    val batchMd5 = pairSet(Dedup.minhashLshPairsPortable(union, "doc_id",
      "text", k = 3, bands = 4, rowsPerBand = 2, tau = 0.5))
    val incMd5 = pairSet(Dedup.minhashLshPairsIncrementalPortable(incBatch,
      Dedup.minhashStorePortable(incCorpus, "doc_id", "text",
        k = 3, bands = 4, rowsPerBand = 2),
      incCorpus, "doc_id", "text", k = 3, bands = 4, rowsPerBand = 2,
      tau = 0.5))
    assert(incMd5 === batchMd5.filter(_._2 >= 10L))
    // the cross-increment mega-bucket guard: ingest copies of corpus
    // content star to the CORPUS keeper; ingest-internal dups to theirs
    assert(incNative.contains((1L, 10L, 1.0)) && incNative.contains((1L, 15L, 1.0)))
    assert(incNative.contains((12L, 13L, 1.0)))
    // planted cross near-dups found; distinct2 (id 4) pairs with nothing
    assert(incNative.exists(p => p._1 == 1L && p._2 == 11L))
    assert(incNative.exists(p => p._1 == 3L && p._2 == 14L))
    assert(!incNative.exists(p => p._1 == 4L))
  }

  test("incremental simhash ≡ batch over the union, both families") {
    val union = incCorpus.unionByName(incBatch)
    def hamSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select(col("id_a"), col("id_b"), col("hamming").cast("int"))
        .as[(Long, Long, Int)].collect().toSet
    val batchNative = hamSet(Dedup.simhashPairs(union, "doc_id", "text"))
    val incNative = hamSet(Dedup.simhashPairsIncremental(incBatch,
      Dedup.simhashStore(incCorpus, "doc_id", "text"), "doc_id", "text"))
    assert(incNative === batchNative.filter(_._2 >= 10L),
      "incremental must emit exactly the union-batch pairs touching the ingest")
    // a scale-derived multi-block table layout is output-invariant
    val incNativeWide = hamSet(Dedup.simhashPairsIncremental(incBatch,
      Dedup.simhashStore(incCorpus, "doc_id", "text"), "doc_id", "text",
      maxHamming = 3, corpusHint = 50000000L))
    assert(incNativeWide === incNative,
      "derived wide-key layout must not change incremental output")
    val corpusNative = hamSet(Dedup.simhashPairs(incCorpus, "doc_id", "text"))
    assert(corpusNative ++ incNative === batchNative)
    val batchMd5 = hamSet(Dedup.simhashPairsPortable(union, "doc_id", "text"))
    val incMd5 = hamSet(Dedup.simhashPairsIncrementalPortable(incBatch,
      Dedup.simhashStorePortable(incCorpus, "doc_id", "text"),
      "doc_id", "text"))
    assert(incMd5 === batchMd5.filter(_._2 >= 10L))
    // cross-increment exact dups star to the corpus keeper at hamming 0
    assert(incNative.contains((1L, 10L, 0)) && incNative.contains((1L, 15L, 0)))
    assert(incNative.contains((12L, 13L, 0)))
    // store append ≡ rebuild, both families (identity = (id, fp) rows)
    def idFp(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("fp")).as[(Long, String)].collect().toSet
    assert(idFp(Dedup.simhashStoreAppend(
        Dedup.simhashStore(incCorpus, "doc_id", "text"),
        incBatch, "doc_id", "text"))
      === idFp(Dedup.simhashStore(union, "doc_id", "text")))
    assert(idFp(Dedup.simhashStoreAppend(
        Dedup.simhashStorePortable(incCorpus, "doc_id", "text"),
        incBatch, "doc_id", "text"))
      === idFp(Dedup.simhashStorePortable(union, "doc_id", "text")))
  }

  test("incremental minhash ≡ batch on random corpora (property)") {
    // Random docs over a small vocabulary force rich collision structure:
    // exact dup chains, near-dup mutations, and fresh content, split at a
    // random point into corpus + monotonically re-keyed ingest. The
    // incremental screen must reproduce the batch-union pairs touching
    // the ingest EXACTLY — every seed, both directions of the split.
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val texts = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until 24).foreach { _ =>
        val t = rnd.nextInt(10) match {
          case r if r < 3 && texts.nonEmpty => // exact dup of an earlier doc
            texts(rnd.nextInt(texts.length))
          case r if r < 6 && texts.nonEmpty => // one-word mutation
            val ws = texts(rnd.nextInt(texts.length)).split(" ")
            ws.updated(rnd.nextInt(ws.length),
              words(rnd.nextInt(words.length))).mkString(" ")
          case _ =>
            Seq.fill(6 + rnd.nextInt(8))(words(rnd.nextInt(words.length)))
              .mkString(" ")
        }
        texts += t
      }
      val cut = 12 + rnd.nextInt(8)
      val corpus = texts.take(cut).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
      val ingest = texts.drop(cut).zipWithIndex
        .map { case (t, i) => (1000L + i, t) }.toSeq.toDF("doc_id", "text")
      val batchPairs = pairSet(Dedup.minhashLshPairs(
        corpus.unionByName(ingest), "doc_id", "text",
        k = 2, bands = 4, rowsPerBand = 2, tau = 0.4))
      val incPairs = pairSet(Dedup.minhashLshPairsIncremental(ingest,
        Dedup.minhashStore(corpus, "doc_id", "text", k = 2, bands = 4,
          rowsPerBand = 2),
        corpus, "doc_id", "text", k = 2, bands = 4, rowsPerBand = 2,
        tau = 0.4))
      assert(incPairs === batchPairs.filter(_._2 >= 1000L),
        s"seed $seed: incremental diverged from the batch union")
    }
  }

  test("minhashStoreAppend ≡ store rebuilt from the union") {
    val union = incCorpus.unionByName(incBatch)
    def storeSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("fp"), col("sig").cast("array<string>"))
        .as[(Long, String, Seq[String])].collect().toSet
    val appended = Dedup.minhashStoreAppend(
      Dedup.minhashStore(incCorpus, "doc_id", "text"), incBatch,
      "doc_id", "text")
    assert(storeSet(appended) ===
      storeSet(Dedup.minhashStore(union, "doc_id", "text")))
    val appendedMd5 = Dedup.minhashStoreAppend(
      Dedup.minhashStorePortable(incCorpus, "doc_id", "text"), incBatch,
      "doc_id", "text")
    assert(storeSet(appendedMd5) ===
      storeSet(Dedup.minhashStorePortable(union, "doc_id", "text")))
  }

  test("store family is schema-derived; cross-family screens fail loud") {
    // Append derives the family from the store schema: a portable store
    // appended with default args must stay array<string> (no silent
    // long->string widening into a mixed-family store).
    val md5Store = Dedup.minhashStorePortable(incCorpus, "doc_id", "text")
    val appended = Dedup.minhashStoreAppend(md5Store, incBatch, "doc_id", "text")
    assert(appended.schema("sig").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, false) ||
      appended.schema("sig").dataType.simpleString == "array<string>")
    // A portable store passed to the NATIVE screen (band keys can never
    // match -> zero corpus recall) must throw, not silently miss dups.
    val ex = intercept[IllegalArgumentException] {
      Dedup.minhashLshPairsIncremental(incBatch, md5Store, incCorpus,
        "doc_id", "text")
    }
    assert(ex.getMessage.contains("family"))
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.minhashLshPairsIncrementalPortable(incBatch,
        Dedup.minhashStore(incCorpus, "doc_id", "text"), incCorpus,
        "doc_id", "text")
    }
    assert(ex2.getMessage.contains("family"))
  }

  // ---- containmentPairs: the asymmetric doc-inside-doc relation ----

  // doc 11 is a verbatim 12-token slice of doc 10: containment(11→10)=1
  // while Jaccard(10,11) is small and containment(10→11) is small.
  private lazy val containDocs = Seq(
    (10L, base),
    (11L, base.split(" ").slice(5, 17).mkString(" ")),
    (12L, distinct1)
  ).toDF("doc_id", "text")

  test("containment: a doc sliced from a bigger doc is fully contained, not vice versa") {
    val pairs = Dedup.containmentPairs(containDocs, "doc_id", "text",
        k = 3, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((11L, 10L)) && pairs((11L, 10L)) === 1.0,
      s"slice must be contained in its source: $pairs")
    assert(!pairs.contains((10L, 11L)),
      "the big doc is NOT contained in its slice (asymmetry)")
    assert(!pairs.keySet.exists(p => p._1 == 12L || p._2 == 12L),
      "unrelated doc must not pair")
    // symmetric Jaccard misses the same relation at the same threshold
    val jac = Dedup.jaccardPairs(
      containDocs.withColumn("blk", lit("x")), "doc_id", "text", "blk", 0.9)
    assert(jac.count() === 0L, "Jaccard at 0.9 cannot see the containment")
  }

  test("containment: maxDf cap prunes evidence (lower bound), never raises it") {
    val uncapped = Dedup.containmentPairs(containDocs, "doc_id", "text",
        k = 3, tau = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // cap at df > 1: every shingle shared by the slice and its source is
    // in 2 docs, so ALL evidence for (11→10) drops
    val capped = Dedup.containmentPairs(containDocs, "doc_id", "text",
        k = 3, tau = 0.1, maxDf = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.isEmpty,
      s"df>1 cap must remove all cross-doc shingle evidence: $capped")
    capped.foreach { case (k2, v) => assert(v <= uncapped(k2)) }
  }

  test("containment: docs below minShingles (or shorter than k tokens) are excluded") {
    val tiny = Seq((1L, "a b"), (2L, "a b c d e"), (3L, "a b c d e")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(tiny, "doc_id", "text", k = 3, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1 has zero 3-shingles -> excluded; 2 and 3 are identical
    assert(pairs === Set((2L, 3L), (3L, 2L)))
    val floored = Dedup.containmentPairs(tiny, "doc_id", "text", k = 3,
      tau = 0.5, minShingles = 4)
    assert(floored.count() === 0L, "3-shingle count 3 < floor 4 excludes both")
  }

  test("containment: dedup-then-expand is bit-equal to the naive pair scan on a duplicate-heavy corpus") {
    // 4 copies of every containDocs row (the replica shape that made the
    // member-level df² scan 39x at sf1), plus one mutated copy so the
    // collapse has both identical-set groups and near-identical sets.
    // Brute force over the same xxhash shingle sets is the ground truth
    // for BOTH regimes (uncapped and a binding member-level cap).
    val dup = (0 until 4).flatMap { c =>
      Seq((10L + 100 * c, base),
        (11L + 100 * c, base.split(" ").slice(5, 17).mkString(" ")),
        (12L + 100 * c, distinct1))
    } :+ (999L, base + " mutated")
    val df = dup.toDF("doc_id", "text")
    def brute(tau: Double, maxDf: Long): Map[(Long, Long), Double] = {
      val sets = df.select(col("doc_id"),
          Dedup.shingleHashes(col("text"), 3).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
        .filter(_._2.nonEmpty)
      val dfreq = sets.flatMap(_._2).groupBy(identity).map { case (s, o) => s -> o.length.toLong }
      val keep = (s: Long) => maxDf <= 0L || dfreq(s) <= maxDf
      (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
        ov = sa.intersect(sb).count(keep)
        if ov.toDouble >= tau * sa.size
      } yield (ia, ib) ->
        BigDecimal(ov.toDouble / sa.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    }
    for ((tau, cap) <- Seq((0.5, 0L), (0.3, 6L))) {
      val got = Dedup.containmentPairs(df, "doc_id", "text", k = 3,
          tau = tau, maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got === brute(tau, cap), s"mismatch at tau=$tau cap=$cap")
    }
  }
}
