package graft.operators

import graft.SparkSuite

/** BM25 / TF-IDF: hand-computed scores on a 3-doc corpus, rank
  * determinism, and the top-k contract. */
class RelevanceSpec extends SparkSuite {

  import spark.implicits._

  // corpus: "apple" only in doc 1, "banana" in docs 1+2, "the" everywhere
  private def corpus = Seq(
    (1L, "apple banana the the"),
    (2L, "banana the cherry"),
    (3L, "the cherry cherry")).toDF("doc_id", "text")

  test("bm25: rare term outscores common term within a doc") {
    val out = Relevance.bm25TopTerms(corpus, "doc_id", "text", k = 10)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getDouble(4))).toMap
    // in doc 1: df(apple)=1 < df(banana)=2 < df(the)=3, tf(the)=2
    assert(out((1L, "apple")) > out((1L, "banana")))
    // idf(the) = ln(1 + 0.5/3.5) < idf(banana) = ln(1 + 1.5/2.5); tf can't
    // overcome it at these lengths
    assert(out((1L, "banana")) > out((1L, "the")))
  }

  test("bm25: hand-computed score for (doc 2, cherry)") {
    // N=3, avgdl=(4+3+3)/3; df(cherry)=2, tf=1, dl=3
    val n = 3.0; val avgdl = 10.0 / 3.0
    val idf = math.log(1.0 + (n - 2.0 + 0.5) / (2.0 + 0.5))
    val expected = BigDecimal(
      idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 3.0 / avgdl)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Relevance.bm25TopTerms(corpus, "doc_id", "text", k = 10)
      .filter($"doc_id" === 2L && $"term" === "cherry")
      .head().getDouble(4)
    assert(got === expected)
  }

  test("bm25: k bounds output and ranks are 1..k, term-tiebroken") {
    val out = Relevance.bm25TopTerms(corpus, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rn").collect()
    assert(out.count(_.getLong(0) == 1L) === 2)
    val doc1 = out.filter(_.getLong(0) == 1L).map(r => (r.getInt(5), r.getString(1)))
    assert(doc1.map(_._1).toSeq === Seq(1, 2))
  }

  test("vocabTopTerms: counts, doc frequency, rank, and the k cap") {
    val out = Relevance.vocabTopTerms(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // "the" 4 occurrences / 3 docs; "cherry" 3 / 2; banana+others below
    assert(out === Array(("the", 4L, 3L, 1), ("cherry", 3L, 2L, 2)))
  }

  test("vocabTopTerms plan: global top-k is TakeOrdered, not a full sort") {
    val plan = Relevance.vocabTopTerms(corpus, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("tfIdf: df counts docs not occurrences, and a corpus-wide term scores 0") {
    val out = Relevance.tfIdf(corpus, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out((3L, "cherry"))._1 === 2L) // tf: two occurrences in doc 3
    assert(out((3L, "cherry"))._2 === 2L) // df: two docs, not three occurrences
    assert(out((1L, "the"))._3 === 0.0)   // ln(3/3) = 0
  }

  // bigram-LM corpus: doc 1 repeats (a,b); doc 3 is a single token
  private def lmCorpus = Seq(
    (1L, "a b a b"),
    (2L, "a b"),
    (3L, "x")).toDF("doc_id", "text")

  test("bigramLmPerplexity: hand-computed add-α scores") {
    val out = Relevance.bigramLmPerplexity(lmCorpus, "doc_id", "text",
        alpha = 0.5, minCount = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // model: c(a,b)=3, c(b,a)=1; c1: a=3, b=3, x=1; V=3
    val pAB = (3 + 0.5) / (3 + 0.5 * 3) // P(b|a)
    val pBA = (1 + 0.5) / (3 + 0.5 * 3) // P(a|b)
    val d1 = -(2 * math.log(pAB) + math.log(pBA)) / 3
    val d2 = -math.log(pAB)
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2.get - math.rint(d1 * 1e6) / 1e6) < 1e-9)
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(2L)._2.get - math.rint(d2 * 1e6) / 1e6) < 1e-9)
    // single-token doc: no bigrams, null scores
    assert(out(3L) === ((0L, None)))
  }

  test("bigramLmPerplexity: minCount prunes rare bigrams to the unseen branch") {
    val out = Relevance.bigramLmPerplexity(lmCorpus, "doc_id", "text",
        alpha = 0.5, minCount = 2)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // (b,a) count 1 < 2 → pruned; doc 1's middle bigram scores as unseen
    val pAB = (3 + 0.5) / (3 + 0.5 * 3)
    val pUnseen = 0.5 / (3 + 0.5 * 3)
    val d1 = -(2 * math.log(pAB) + math.log(pUnseen)) / 3
    assert(math.abs(out(1L).get - math.rint(d1 * 1e6) / 1e6) < 1e-9)
  }

  test("bigramLmPerplexity: predictable text scores lower perplexity") {
    val docs = Seq(
      (1L, "a b a b a b a b a b"),  // fully predictable under the model
      (2L, "b b a a b a a a b b")   // same tokens, shuffled
    ).toDF("doc_id", "text")
    val ppl = Relevance.bigramLmPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ppl(1L) < ppl(2L),
      s"repetitive doc must be more predictable: $ppl")
  }

  // ---- bm25Search: the retrieval direction ----

  test("bm25Search: ranks docs by summed matched-term score, doc-id tiebreak") {
    val hits = Relevance.bm25Search(corpus, "doc_id", "text",
        "apple cherry", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(hits.map(_._1).toSet === Set(1L, 2L, 3L),
      "every doc matches at least one query term")
    assert(hits.map(_._3).toSeq === (1 to 3), "ranks are dense 1..n")
    // doc 3 matches cherry twice (tf=2), doc 2 once; doc 1 matches the
    // rarer apple — scores must be strictly ordered by the BM25 sum
    val byDoc = hits.map(h => h._1 -> h._2).toMap
    assert(byDoc(3L) > byDoc(2L), "higher tf on the same term ranks higher")
    // a term absent from the corpus contributes nothing and breaks nothing
    val same = Relevance.bm25Search(corpus, "doc_id", "text",
        "apple cherry zzz-missing", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(same === byDoc)
    // k caps the output
    assert(Relevance.bm25Search(corpus, "doc_id", "text", "the", k = 2)
      .count() === 2L)
  }

  test("bm25SearchIndexed: identical output to the scanned path, term filter pushed to parquet") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Relevance.bm25Index(corpus, "doc_id", "text", dir)
    val scanned = Relevance.bm25Search(corpus, "doc_id", "text",
      "apple cherry", k = 10).collect().map(_.toSeq).toSeq
    val indexed = Relevance.bm25SearchIndexed(spark, dir,
      "apple cherry", k = 10)
    assert(indexed.collect().map(_.toSeq).toSeq === scanned)
    // the query's term set must reach the postings scan as a pushed filter
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term IN (...) must push down to the postings read:\n$plan")
  }

  test("cosinePairs ≡ brute-force TF-IDF cosine; cap is a lower bound; duplicates expand") {
    // corpus with: two exact duplicates (9, 10), a near-dup pair sharing
    // rare terms (1, 2), unrelated docs, and a doc of only corpus-
    // universal terms (zero idf everywhere -> zero norm -> excluded)
    val docs = Seq(
      (1L, "alpha beta gamma delta common"),
      (2L, "alpha beta gamma epsilon common"),
      (3L, "zeta eta theta iota common"),
      (4L, "kappa lambda mu nu common"),
      (9L, "alpha beta dup dup common"),
      (10L, "alpha beta dup dup common"),
      (11L, "common common common common")
    ).toDF("doc_id", "text")
    // brute force: member-level df, tf·ln(n/df), cosine of every pair
    val rows = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = rows.length.toDouble
    val dfm = rows.flatMap { case (_, tk) => tk.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    def vec(tk: Seq[String]): Map[String, Double] =
      tk.groupBy(identity).map { case (t, xs) =>
        t -> xs.length.toDouble * math.log(n / dfm(t).toDouble) }
    def cos(a: Map[String, Double], b: Map[String, Double]): Option[Double] = {
      val na = math.sqrt(a.values.map(x => x * x).sum)
      val nb = math.sqrt(b.values.map(x => x * x).sum)
      if (na == 0 || nb == 0) None
      else Some((a.keySet & b.keySet).toSeq.sorted
        .map(t => (a(t) / na) * (b(t) / nb)).sum)
    }
    val vecs = rows.map { case (id, tk) => id -> vec(tk) }.toMap
    val tau = 0.2
    val ref = (for {
      (ia, va) <- vecs.toSeq; (ib, vb) <- vecs.toSeq
      if ia < ib
      c <- cos(va, vb) if (ia, ib) != (0L, 0L)
      if math.rint(c * 1e6) / 1e6 >= tau
      if (va.keySet & vb.keySet).nonEmpty
    } yield (ia, ib)).toSet
    val got = Relevance.cosinePairs(docs, "doc_id", "text", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSet === ref,
      "uncapped pair set must equal brute-force TF-IDF cosine")
    // values match brute force at 6 dp
    got.foreach { case (a, b, c) =>
      val bf = math.rint(cos(vecs(a), vecs(b)).get * 1e6) / 1e6
      assert(math.abs(c - bf) < 2e-6, s"($a,$b): $c vs $bf")
    }
    // exact duplicates pair at 1.0
    assert(got.collectFirst { case (9L, 10L, c) => c } === Some(1.0))
    // zero-norm doc never pairs
    assert(got.forall(p => p._1 != 11L && p._2 != 11L))
    // cap: every capped cosine <= its uncapped value (lower bound), and
    // the capped pair set is a subset
    val capped = Relevance.cosinePairs(docs, "doc_id", "text", 0.2, maxDf = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = got.map(p => (p._1, p._2) -> p._3).toMap
    assert(capped.keySet.subsetOf(full.keySet))
    capped.foreach { case (k, c) => assert(c <= full(k) + 1e-9, s"$k") }
  }

  test("cosinePairs prefix filter ≡ unfiltered candidates: bit-identical output at every tau/cap") {
    // Seeded word-soup corpus (r13, the Bayardo equality spec): each doc
    // carries rare neighbor-shared terms (candidate edges survive the
    // prefix at every tau) plus three hot terms (df = n/3 — exactly the
    // postings the prefix filter absorbs), every 13th doc an exact dup
    // (intra branch) and every 7th a near-dup of its predecessor.
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate(240) { i =>
      val rare = Seq(s"r$i", s"r${i + 1}", s"r${i + 2}", s"x${rnd.nextInt(40)}")
      (i.toLong, (rare ++ Seq(s"c${i % 3}", s"c${(i + 1) % 3}", "hot")).mkString(" "))
    }
    val rows = base.map { case (id, t) =>
      if (id % 13 == 4 && id > 0) (id, base((id - 1).toInt)._2)
      else if (id % 7 == 2 && id > 0) (id, base((id - 1).toInt)._2 + " extra")
      else (id, t)
    }
    val docs = spark.sparkContext.parallelize(rows.toIndexedSeq, 4)
      .toDF("doc_id", "text")
    def run(tau: Double, cap: Long, prefix: Boolean): Set[(Long, Long, Double)] =
      Relevance.cosinePairsImpl(docs, "doc_id", "text", tau, cap, prefix)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Three cells (VERDICT r14 #6, same rationale as the incremental
    // grid below): widest-candidate low tau, hardest-pruning high tau,
    // and one capped cell for the prefix-under-cap interaction.
    for ((tau, cap) <- Seq((0.3, 0L), (0.6, 0L), (0.9, 10L))) {
      val filtered = run(tau, cap, prefix = true)
      val unfiltered = run(tau, cap, prefix = false)
      assert(filtered === unfiltered,
        s"prefix filter must be exact at tau=$tau cap=$cap: " +
          s"missing=${(unfiltered -- filtered).take(5)} " +
          s"extra=${(filtered -- unfiltered).take(5)}")
      assert(filtered.nonEmpty, s"degenerate spec at tau=$tau cap=$cap")
    }
  }

  test("cosine incremental screen: frozen-idf store, exact re-find, unseen terms, intra-batch") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta"),
      (4L, "alpha beta gamma delta"),   // duplicate -> keeper 0, grp 2
      (8L, "zeta eta theta iota"),
      (12L, "kappa lambda mu nu")
    ).toDF("doc_id", "text")
    val store = Relevance.cosineStore(corpus, "doc_id", "text")
    // store: one keeper per distinct text, member-level df, n0 = 4
    val byTerm = store.collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(5)))
    assert(byTerm.forall(_._4 === 4L), "n0 is the MEMBER count")
    assert(byTerm.filter(_._2 == "alpha").map(_._3).toSeq === Seq(2L),
      "df is member-level (the duplicate counts)")
    assert(!byTerm.exists(_._1 == 4L), "duplicates collapse to their keeper")
    val incoming = Seq(
      (100L, "alpha beta gamma delta"),  // exact copy of keeper 0
      (101L, "alpha beta gamma epsilon"),// near-dup of keeper 0 (unseen term)
      (102L, "foo bar baz qux"),         // all-unseen
      (103L, "foo bar baz qux")          // intra-batch duplicate of 102
    ).toDF("doc_id", "text")
    val got = Relevance.cosinePairsIncremental(incoming, store,
        "doc_id", "text", tau = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact copy re-finds its keeper at 1.0 under the frozen model
    assert(got((0L, 100L)) === 1.0)
    // near-dup pairs with the keeper below 1.0 but above tau
    assert(got.contains((0L, 101L)) && got((0L, 101L)) < 1.0)
    // all-unseen docs match NOTHING in the store...
    assert(!got.keys.exists(k => (k._1 == 102L || k._2 == 102L) && k._1 < 100L))
    // ...but pair with each other intra-batch at 1.0 (df=1 idf weights)
    assert(got((102L, 103L)) === 1.0)
    // the batch's own near-dups pair too (100 vs 101 share 3 frozen terms)
    assert(got.contains((100L, 101L)))
  }

  test("cosineStoreAppend: novel keepers under the frozen model; drift signal counts unseen mass") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta"),
      (4L, "zeta eta theta iota")
    ).toDF("doc_id", "text")
    val store = Relevance.cosineStore(corpus, "doc_id", "text")
    val batch1 = Seq(
      (100L, "alpha beta gamma delta"),   // known content -> NOT appended
      (101L, "foo bar baz qux")           // novel -> appended under frozen model
    ).toDF("doc_id", "text")
    // persisted like the production path (r16): the append DAG (store
    // build + anti-join delta) otherwise recomputes once per reference
    // below and the test ran 2½ minutes on a 2-doc fixture
    val s2Dir = java.nio.file.Files
      .createTempDirectory("graft_append_store").toString
    Relevance.cosineStoreAppend(store, batch1, "doc_id", "text")
      .write.mode("overwrite").parquet(s2Dir)
    val s2 = spark.read.parquet(s2Dir)
    val ids = s2.select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids === Set(0L, 4L, 101L),
      "append adds one keeper per NOVEL content only")
    // frozen-model echo: appended unseen terms ride at df = 1, n0 unchanged
    val appended = s2.filter(org.apache.spark.sql.functions.col("id") === 101L).collect()
    assert(appended.forall(r => r.getLong(3) == 1L && r.getLong(5) == 2L))
    // a later batch duplicating the appended content re-finds it at 1.0
    val batch2 = Seq((200L, "foo bar baz qux")).toDF("doc_id", "text")
    val got = Relevance.cosinePairsIncremental(batch2, s2,
        "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((101L, 200L)) === 1.0,
      "the appended keeper must screen the next ingest")
    // drift: batch1 has 8 token occurrences, 4 unseen at build
    assert(math.abs(Relevance.cosineStoreUnseenFrac(store, batch1,
      "doc_id", "text") - 0.5) < 1e-12)
    assert(Relevance.cosineStoreUnseenFrac(store, corpus,
      "doc_id", "text") === 0.0)
  }

  test("incremental prefix filter ≡ unfiltered screen: bit-identical at every tau/cap, append included") {
    // the r13 batch equality corpus, split store/incoming: rare
    // neighbor-shared terms keep candidate edges alive at every tau,
    // three hot terms (df ≈ n/3) are exactly the postings the persisted
    // bound absorbs; every 13th doc an exact dup, every 7th a near-dup
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(240) { i =>
      val rare = Seq(s"r$i", s"r${i + 1}", s"r${i + 2}", s"x${rnd.nextInt(40)}")
      (i.toLong, (rare ++ Seq(s"c${i % 3}", s"c${(i + 1) % 3}", "hot")).mkString(" "))
    }
    val rows = base.map { case (id, t) =>
      if (id % 13 == 4 && id > 0) (id, base((id - 1).toInt)._2)
      else if (id % 7 == 2 && id > 0) (id, base((id - 1).toInt)._2 + " extra")
      else (id, t)
    }
    val all = spark.sparkContext.parallelize(rows.toIndexedSeq, 4)
      .toDF("doc_id", "text")
    val corpus = all.filter($"doc_id" % 3 === 0)
    val append = all.filter($"doc_id" % 3 === 1)
      .withColumn("doc_id", $"doc_id" + 1000L)
    val incoming = all.filter($"doc_id" % 3 === 2)
      .withColumn("doc_id", $"doc_id" + 2000L)
    // store = build + appended delta, so the APPENDED rows' persisted
    // bounds (computed under the frozen model) are exercised too.
    // PERSISTED to parquet (r16, the operator's own production contract
    // and the gate's shape since r16): the screen references the store
    // 4× per invocation and this test screens 8 times — inline, each
    // reference recomputed the whole build+append DAG and the test ran
    // 9½ MINUTES; persisted it reads bit-identical rows (doubles
    // round-trip parquet exactly) in ~1/8 the wall.
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_incpfx_store").toString
    Relevance.cosineStoreAppend(
      Relevance.cosineStore(corpus, "doc_id", "text"),
      append, "doc_id", "text")
      .write.mode("overwrite").parquet(storeDir)
    val store = spark.read.parquet(storeDir)
    def run(tau: Double, cap: Long, prefix: Boolean): Set[(Long, Long, Double)] =
      Relevance.cosinePairsIncrementalImpl(incoming, store,
          "doc_id", "text", tau, cap, prefix)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Three cells, not the full 3×2 grid (VERDICT r14 #6 — the grid ran
    // ~25 min single-core): the equality argument needs one low-tau
    // uncapped cell (bound engages weakly, candidate set widest), one
    // high-tau uncapped cell (bound prunes hardest — the missed-pair
    // risk), and one CAPPED cell (the prefix-under-cap interaction).
    // The appended-store rows are in every cell's store, so that
    // coverage is unchanged.
    val run06u = run(0.6, 0L, prefix = true)
    for ((tau, cap, filtered) <- Seq(
        (0.3, 0L, run(0.3, 0L, prefix = true)),
        (0.6, 0L, run06u),
        (0.9, 10L, run(0.9, 10L, prefix = true)))) {
      val unfiltered = run(tau, cap, prefix = false)
      assert(filtered === unfiltered,
        s"incremental prefix filter must be exact at tau=$tau cap=$cap: " +
          s"missing=${(unfiltered -- filtered).take(5)} " +
          s"extra=${(filtered -- unfiltered).take(5)}")
      assert(filtered.nonEmpty, s"degenerate spec at tau=$tau cap=$cap")
    }
    // the default policy mirrors the batch lever rule: prefix iff uncapped
    assert(Relevance.cosinePairsIncremental(incoming, store,
        "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet === run06u)
  }

  test("incremental prefix path refuses a store without the persisted bound; capped path runs") {
    val corpus = Seq((0L, "alpha beta gamma"), (1L, "delta eps zeta"))
      .toDF("doc_id", "text")
    val legacy = Relevance.cosineStore(corpus, "doc_id", "text").drop("bnd")
    val batch = Seq((10L, "alpha beta gamma")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Relevance.cosinePairsIncremental(batch, legacy, "doc_id", "text", 0.5)
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    // the capped path never touches the bound — an old store still screens
    assert(Relevance.cosinePairsIncremental(batch, legacy,
      "doc_id", "text", 0.5, maxDf = 10L).count() >= 1L)
  }

  test("cosineStoreDelta refuses a store persisted under a pre-r14 fingerprint derivation") {
    import org.apache.spark.sql.functions.{col, struct}
    val corpus = Seq((0L, "alpha beta"), (1L, "gamma delta"))
      .toDF("doc_id", "text")
    val store = Relevance.cosineStore(corpus, "doc_id", "text")
    // simulate an r13 store: unsalted (h1, h2) fingerprint fields — the
    // novelty anti-join would silently classify everything as novel, so
    // the delta path must refuse loudly instead
    val legacy = store.withColumn("fp",
      struct(col("fp.h1").as("h1"), col("fp.h2s").as("h2")))
    val batch = Seq((10L, "foo bar")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Relevance.cosineStoreDelta(legacy, batch, "doc_id", "text")
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }

  test("bm25SearchIndexed equals the scanned path on a corpus with null/empty text") {
    // ADVICE r11: postings-derived stats excluded token-less docs,
    // shifting n_docs/avgdl vs the scanned path. `_stats` now derives
    // from the doc frame, so the equivalence must hold bit-for-bit on
    // corpora containing null-text and empty-text rows.
    val withNulls = corpus.unionByName(Seq(
      (90L, null.asInstanceOf[String]), (91L, ""), (92L, "   ")
    ).toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("bm25idx_null").toString
    Relevance.bm25Index(withNulls, "doc_id", "text", dir)
    val scanned = Relevance.bm25Search(withNulls, "doc_id", "text",
      "apple cherry", k = 10).collect().map(_.toSeq).toSeq
    val indexed = Relevance.bm25SearchIndexed(spark, dir,
      "apple cherry", k = 10).collect().map(_.toSeq).toSeq
    assert(indexed === scanned,
      "doc-frame _stats must make the indexed path exact on null-text corpora")
  }

  test("bm25IndexAppend: appended index ≡ fresh build ≡ scanned search; legacy layout refuses") {
    // the index is a SUFFICIENT STATISTIC: per-doc postings + exactly
    // mergeable integer stats, so append ≡ rebuild bit-for-bit — the
    // appended half includes a null-text doc (stats parity must survive
    // token-less rows on the APPEND side too)
    val half1 = corpus.filter($"doc_id" % 2 === 0)
    val half2 = corpus.filter($"doc_id" % 2 === 1).unionByName(Seq(
      (90L, null.asInstanceOf[String]), (91L, "")).toDF("doc_id", "text"))
    val full = half1.unionByName(half2)
    val dirApp = java.nio.file.Files.createTempDirectory("bm25_app").toString
    Relevance.bm25Index(half1, "doc_id", "text", dirApp)
    assert(Relevance.bm25IndexAppend(spark, dirApp, half2,
      "doc_id", "text", "half2"))
    val dirFull = java.nio.file.Files.createTempDirectory("bm25_full").toString
    Relevance.bm25Index(full, "doc_id", "text", dirFull)
    // merged stats bit-equal to the rebuild's (exact integer sums)
    val sApp = Relevance.bm25IndexStats(spark, dirApp)
      .collect().map(_.toSeq).toSeq
    val sFull = Relevance.bm25IndexStats(spark, dirFull)
      .collect().map(_.toSeq).toSeq
    assert(sApp === sFull, "merged stats must equal the rebuild's exactly")
    val scanned = Relevance.bm25Search(full, "doc_id", "text",
      "apple cherry", k = 10).collect().map(_.toSeq).toSeq
    assert(Relevance.bm25SearchIndexed(spark, dirApp, "apple cherry", k = 10)
      .collect().map(_.toSeq).toSeq === scanned,
      "the appended index must answer exactly like the full corpus")
    assert(Relevance.bm25SearchIndexed(spark, dirFull, "apple cherry", k = 10)
      .collect().map(_.toSeq).toSeq === scanned)
    // a pre-r14 layout (flat postings + _stats, no manifest) must refuse
    // loudly, not shadow the old corpus
    val legacy = java.nio.file.Files.createTempDirectory("bm25_leg").toString
    Relevance.bm25IndexStats(spark, dirApp)
      .select("n_docs", "avgdl").write.parquet(s"$legacy/_stats")
    intercept[IllegalArgumentException] {
      Relevance.bm25IndexAppend(spark, legacy, half2,
        "doc_id", "text", "half2")
    }
    intercept[IllegalArgumentException] {
      Relevance.bm25SearchIndexed(spark, legacy, "apple cherry")
    }
    ()
  }

  test("bm25IndexAppend commit protocol: replays no-op, orphan directories are invisible") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_atomic").toString
    val half1 = corpus.filter($"doc_id" % 2 === 0)
    val half2 = corpus.filter($"doc_id" % 2 === 1)
    Relevance.bm25Index(half1, "doc_id", "text", dir)
    assert(Relevance.bm25IndexAppend(spark, dir, half2,
      "doc_id", "text", "b7"))
    val answer = Relevance.bm25SearchIndexed(spark, dir, "apple cherry")
      .collect().map(_.toSeq).toSeq
    // ADVICE r13: re-running an append after a failure used to duplicate
    // postings silently — a replayed batch id must be a detected no-op
    assert(!Relevance.bm25IndexAppend(spark, dir, half2,
      "doc_id", "text", "b7"), "replayed batch id must no-op")
    assert(Relevance.bm25SearchIndexed(spark, dir, "apple cherry")
      .collect().map(_.toSeq).toSeq === answer,
      "a replay must not change the answer")
    // crash window: postings written but the manifest commit never
    // happened — the orphan directory must be invisible to readers
    corpus.select($"doc_id", org.apache.spark.sql.functions.lit(1L).as("dl"),
        org.apache.spark.sql.functions.lit("apple").as("term"),
        org.apache.spark.sql.functions.lit(99L).as("tf"))
      .write.parquet(s"$dir/batches/orphan")
    assert(Relevance.bm25SearchIndexed(spark, dir, "apple cherry")
      .collect().map(_.toSeq).toSeq === answer,
      "an uncommitted batch directory must never be read")
    // ...and the batch id stays appendable: the replay of the crashed
    // append overwrites the orphan and commits
    assert(Relevance.bm25IndexAppend(spark, dir,
      Seq((95L, "quince")).toDF("doc_id", "text"), "doc_id", "text",
      "orphan"))
    assert(Relevance.bm25IndexDirs(spark, dir).length === 3)
  }

  test("bm25Compact: one directory, bit-identical answers, identities preserved") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_cmp").toString
    val thirds = (0 to 2).map(i => corpus.filter($"doc_id" % 3 === i))
    Relevance.bm25Index(thirds(0), "doc_id", "text", dir)
    assert(Relevance.bm25IndexAppend(spark, dir, thirds(1),
      "doc_id", "text", "t1"))
    assert(Relevance.bm25IndexAppend(spark, dir, thirds(2),
      "doc_id", "text", "t2"))
    val before = Relevance.bm25SearchIndexed(spark, dir, "apple cherry the")
      .collect().map(_.toSeq).toSeq
    val statsBefore = Relevance.bm25IndexStats(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(Relevance.bm25IndexDirs(spark, dir).length === 3)
    assert(Relevance.bm25Compact(spark, dir))
    assert(Relevance.bm25IndexDirs(spark, dir).length === 1,
      "compaction must fold the batch directories into one")
    assert(Relevance.bm25SearchIndexed(spark, dir, "apple cherry the")
      .collect().map(_.toSeq).toSeq === before,
      "compaction must not move one bit of the answer")
    assert(Relevance.bm25IndexStats(spark, dir)
      .collect().map(_.toSeq).toSeq === statsBefore,
      "per-batch stats survive compaction")
    // batch identities survive: a replay of a compacted batch still no-ops
    assert(!Relevance.bm25IndexAppend(spark, dir, thirds(1),
      "doc_id", "text", "t1"), "replay detection must survive compaction")
    // an already-compacted index no-ops
    assert(!Relevance.bm25Compact(spark, dir))
    // vacuum is DEFERRED (r15): the replaced directories survive the
    // compact that replaced them...
    assert(new java.io.File(s"$dir/batches/base").exists(),
      "a reader pinned to the pre-compact manifest must keep its dirs")
    // ...and the explicit reclaim call removes them
    Relevance.bm25Vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/batches/base").exists(),
      "bm25Vacuum must reclaim the trash-recorded directories")
  }

  test("bm25Compact deferred vacuum: a reader pinned to the old manifest survives the compact") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_pin").toString
    val thirds = (0 to 2).map(i => corpus.filter($"doc_id" % 3 === i))
    Relevance.bm25Index(thirds(0), "doc_id", "text", dir)
    assert(Relevance.bm25IndexAppend(spark, dir, thirds(1),
      "doc_id", "text", "t1"))
    assert(Relevance.bm25IndexAppend(spark, dir, thirds(2),
      "doc_id", "text", "t2"))
    // a concurrent reader that already LISTED the old manifest holds the
    // old directory paths — exactly the race the r14 immediate delete
    // lost; pin that list, then compact
    val pinnedDirs = Relevance.bm25IndexDirs(spark, dir)
    val pinned = spark.read.parquet(pinnedDirs.map(d => s"$dir/$d"): _*)
    assert(Relevance.bm25Compact(spark, dir))
    // the pinned frame still reads every row: the replaced dirs are in
    // the trash ledger, not deleted
    assert(pinned.count() > 0L,
      "pre-compact postings must stay readable through a compact")
    // the NEXT compact cycle reclaims the previous cycle's trash: append
    // one more batch so a second compaction has work to do
    assert(Relevance.bm25IndexAppend(spark, dir,
      Seq((900L, "quince quokka")).toDF("doc_id", "text"),
      "doc_id", "text", "t3"))
    assert(Relevance.bm25Compact(spark, dir))
    assert(!new java.io.File(s"$dir/${pinnedDirs.head}").exists(),
      "the second compact must reclaim the first cycle's trash")
    // answers unchanged throughout (same corpus, whichever layout)
    assert(Relevance.bm25SearchIndexed(spark, dir, "quince")
      .collect().nonEmpty)
  }

  test("bm25Vacuum re-enqueues still-referenced trash; bm25Index reset clears stale ledgers (r16)") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_requeue").toString
    val halves = (0 to 1).map(i => corpus.filter($"doc_id" % 2 === i))
    Relevance.bm25Index(halves(0), "doc_id", "text", dir)
    assert(Relevance.bm25IndexAppend(spark, dir, halves(1),
      "doc_id", "text", "h2"))
    assert(Relevance.bm25Compact(spark, dir))
    val live = Relevance.bm25IndexDirs(spark, dir).head
    val answer = Relevance.bm25SearchIndexed(spark, dir, "apple cherry the")
      .collect().map(_.toSeq).toSeq
    // adversarial state — the defensive-skip branch (VERDICT r15 #6): a
    // committed ledger entry that names a directory the CURRENT manifest
    // still references. r15 deleted the entry after skipping the dir,
    // leaking it as permanently unreclaimable debris.
    Seq(live).toDF("dir").repartition(1)
      .write.parquet(s"$dir/_trash/v99")
    Relevance.bm25Vacuum(spark, dir)
    assert(new java.io.File(s"$dir/$live").exists(),
      "a still-referenced directory must never be reclaimed")
    assert(new java.io.File(s"$dir/_trash/v99").exists(),
      "the skipped entry must be re-enqueued, not deleted")
    assert(Relevance.bm25SearchIndexed(spark, dir, "apple cherry the")
      .collect().map(_.toSeq).toSeq === answer)
    // once a later compact de-references the dir, a LATER vacuum reclaims
    // it through the re-enqueued entry — reclaimed late, never leaked
    assert(Relevance.bm25IndexAppend(spark, dir,
      Seq((901L, "zebra zephyr")).toDF("doc_id", "text"),
      "doc_id", "text", "z"))
    assert(Relevance.bm25Compact(spark, dir))
    Relevance.bm25Vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/$live").exists(),
      "the re-enqueued dir must be reclaimed once de-referenced")
    assert(!new java.io.File(s"$dir/_trash/v99").exists())
    // rebuild on the reused path: stale ledgers must not survive (ADVICE
    // r15 — a surviving ledger would let the NEW index's first compact
    // reclaim directories one cycle early, voiding the reader grace)
    Seq("batches/base").toDF("dir").repartition(1)
      .write.parquet(s"$dir/_trash/v98")
    Relevance.bm25Index(halves(0), "doc_id", "text", dir)
    assert(!new java.io.File(s"$dir/_trash").exists(),
      "bm25Index reset must clear stale trash ledgers")
  }

  test("hybridSearch: RRF fusion equals the reference fold of the two ranked lists") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha alpha delta"),
      (2L, "beta epsilon"),
      (3L, "zeta eta theta"),
      (4L, "alpha beta beta")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.95f, 0.05f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.2f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Relevance.hybridSearch(docs, emb, "alpha beta", queryVecId = 0L,
        kLex = 3, kSem = 3, k = 4)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        r.getDouble(3), r.getInt(4)))
    // reference fold over the two already-certified public sides
    val lex = Relevance.bm25Search(docs, "doc_id", "text", "alpha beta", k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val sem = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("id") === 0L, k = 3)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    def rrf(id: Long): Double = BigDecimal(
        lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          + sem.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (lex.keySet ++ sem.keySet).toSeq
      .map(id => (id, rrf(id))).sortBy { case (id, s) => (-s, id) }.take(4)
    assert(out.map(r => (r._1, r._4)).toSeq === expected)
    // ranks are 1..k and the per-side rank columns surface verbatim
    assert(out.map(_._5).toSeq === (1 to out.length))
    out.foreach { r =>
      assert(r._2 === lex.get(r._1), s"rn_lex for doc ${r._1}")
      assert(r._3 === sem.get(r._1), s"rn_sem for doc ${r._1}")
    }
    // a doc on one list only scores exactly its single reciprocal term
    val oneSided = out.filter(r => r._2.isEmpty || r._3.isEmpty)
    assert(oneSided.nonEmpty, "fixture must exercise the absent-list branch")
  }

  test("hybridSearchIndexed ≡ hybridSearch over a persisted index") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha alpha delta"),
      (2L, "beta epsilon"),
      (3L, "zeta eta theta"),
      (4L, "alpha beta beta")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.95f, 0.05f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.2f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_hybrid_idx").toString
    Relevance.bm25Index(docs, "doc_id", "text", idx)
    val scanned = Relevance.hybridSearch(docs, emb, "alpha beta",
      queryVecId = 0L, kLex = 3, kSem = 3, k = 4)
      .collect().map(_.toSeq).toSeq
    assert(Relevance.hybridSearchIndexed(spark, idx, emb, "alpha beta",
        queryVecId = 0L, kLex = 3, kSem = 3, k = 4)
      .collect().map(_.toSeq).toSeq === scanned)
  }

  test("hybridSearchAnn ≡ hybridSearch at full probe width; gate-width recall; no full embeddings scan") {
    import org.apache.spark.sql.functions.{array, col, sin}
    // 24 ids shared by text and 8-dim embeddings: the bm25 side ranks
    // alpha-heavy docs, the vector side spreads deterministically
    val docs = Seq.tabulate(24) { i =>
      (i.toLong,
        if (i % 3 == 0) s"alpha beta shard$i" // lex hits
        else if (i % 3 == 1) s"alpha filler$i"
        else s"noise words only$i")
    }.toDF("doc_id", "text")
    val emb = spark.range(24).select(col("id").as("vec_id"),
      array((0 until 8).map(d =>
        sin((col("id") + 1) * (d + 1)).cast("float")): _*).as("embedding"))
    val bmDir = java.nio.file.Files
      .createTempDirectory("graft_hyann_bm").toString
    Relevance.bm25Index(docs, "doc_id", "text", bmDir)
    val (model, idx) = Similarity.buildPqIndex(emb, "vec_id", "embedding",
      nCentroids = 4, m = 4, kSub = 8, trainIters = 0, pqIters = 0)
    // full probe width + a shortlist wider than the corpus: the ANN
    // semantic side degenerates to the exact list, so the WHOLE fused
    // output must equal the certified exact hybrid
    val exact = Relevance.hybridSearch(docs, emb, "alpha beta",
        queryVecId = 0L, kLex = 5, kSem = 5, k = 6)
      .collect().map(_.toSeq).toSeq
    assert(Relevance.hybridSearchAnn(spark, bmDir, model, idx, emb,
        "alpha beta", queryVecId = 0L, kLex = 5, kSem = 5, k = 6,
        nProbe = 4, rerankFactor = 5)
      .collect().map(_.toSeq).toSeq === exact,
      "full-probe ANN hybrid must equal the exact hybrid bit for bit")
    // gate-width probes (nProbe 1 of 4): the ANN sem list must still
    // recover most of the exact top-5 (deterministic fixture — the
    // overlap is a fixed number, pinned ≥ 3/5)
    val exactSem = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("id") === 0L, k = 5)
      .collect().map(_.getLong(1)).toSet
    val annSem = Similarity.searchPqIndexPointQuery(model, idx, emb,
        "vec_id", "embedding", 0L, k = 5, nProbe = 1, rerankFactor = 2)
      .collect().map(_.getLong(1)).toSet
    assert((exactSem intersect annSem).size >= 3,
      s"gate-width recall collapsed: exact=$exactSem ann=$annSem")
    // plan pin (VERDICT r14 #1): with the vectors PERSISTED, every scan
    // of the embeddings table inside the ANN hybrid must carry a pushed
    // point filter on vec_id — no full embeddings scan anywhere
    val embDir = java.nio.file.Files
      .createTempDirectory("graft_hyann_emb").toString
    emb.write.mode("overwrite").parquet(embDir)
    val embP = spark.read.parquet(embDir)
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Relevance.hybridSearchAnn(spark, bmDir, model, idx, embP,
        "alpha beta", queryVecId = 0L, kLex = 5, kSem = 5, k = 6,
        nProbe = 2, rerankFactor = 2).count()
      org.apache.spark.GraftListenerBridge
        .waitListenerBus(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    val embScans = plans.synchronized {
      plans.flatMap(_.linesIterator)
        .filter(l => l.contains("FileScan") && l.contains("graft_hyann_emb"))
    }
    assert(embScans.nonEmpty, "the plan pin must bind to at least one scan")
    val unfiltered = embScans.filterNot(l =>
      l.contains("EqualTo(vec_id") || l.contains("In(vec_id"))
    assert(unfiltered.isEmpty,
      s"every embeddings read must be a pushed point filter:\n" +
        unfiltered.mkString("\n"))
  }

  test("bm25SearchIndexedBatch ≡ per-query fold of bm25SearchIndexed; one term-pruned read (r16)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("bm25_batch").toString
    Relevance.bm25Index(corpus, "doc_id", "text", dir)
    val batch = Seq((1L, "apple cherry"), (2L, "banana the"),
      (3L, "cherry cherry")) // duplicate term: must dedupe like the single form
    val got = Relevance.bm25SearchIndexedBatch(spark, dir,
        batch.toDF("query_id", "query"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSet).toMap
    batch.foreach { case (qid, qtext) =>
      val want = Relevance.bm25SearchIndexed(spark, dir, qtext, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
      assert(got(qid) === want,
        s"batch retrieval must equal the single form for query '$qtext'")
    }
    // the whole batch is ONE term-pruned index read: the union term set
    // reaches the postings scan as a pushed IN filter
    val plan = Relevance.bm25SearchIndexedBatch(spark, dir,
        batch.toDF("query_id", "query"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"batch read lost the term pushdown:\n$plan")
    // a query whose every term is absent from the corpus yields no rows
    // for that id, others unaffected
    val sparse = Relevance.bm25SearchIndexedBatch(spark, dir,
        Seq((7L, "zz qq"), (8L, "apple")).toDF("query_id", "query"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(sparse === Set(8L))
    // fold-over-query-set degradation: an EMPTY batch is an empty
    // result (searchPqIndexPoints parity — a curation loop's empty
    // partition must not crash); a non-empty all-blank batch keeps the
    // single form's per-query non-empty contract and fails loudly
    val empty = Relevance.bm25SearchIndexedBatch(spark, dir,
      Seq.empty[(Long, String)].toDF("query_id", "query"), k = 10)
    assert(empty.columns.toSeq ===
      Seq("query_id", "doc_id", "score", "rn"))
    assert(empty.count() === 0L)
    intercept[IllegalArgumentException] {
      Relevance.bm25SearchIndexedBatch(spark, dir,
        Seq((9L, " ")).toDF("query_id", "query"), k = 10)
    }
  }

  test("capPerGroup: per-group quota by original score, tie-break, k-truncation (r16)") {
    // scores: a-group fills ranks 1-3 ungated; with cap 2 the third
    // a-doc (id 3, score 7.0) is displaced by b/c docs
    val ranked = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0), (4L, 6.0),
      (5L, 5.0), (6L, 4.0)).toDF("doc_id", "score")
    val meta = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"),
      (5L, "b"), (6L, "c")).toDF("doc_id", "source")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getInt(3), r.getInt(4))).sortBy(_._5).toSeq
    val got = rows(Relevance.capPerGroup(ranked, "doc_id", "score",
      meta, "doc_id", "source", maxPerGroup = 2, k = 10))
    assert(got === Seq((1L, "a", 9.0, 1, 1), (2L, "a", 8.0, 2, 2),
      (4L, "b", 6.0, 1, 3), (5L, "b", 5.0, 2, 4), (6L, "c", 4.0, 1, 5)),
      "doc 3 must be displaced by the a-group quota, order otherwise kept")
    // k truncates after capping, never reorders
    assert(rows(Relevance.capPerGroup(ranked, "doc_id", "score",
      meta, "doc_id", "source", maxPerGroup = 2, k = 3)) === got.take(3))
    // a cap wider than any group degenerates to the plain global top-k
    assert(rows(Relevance.capPerGroup(ranked, "doc_id", "score",
      meta, "doc_id", "source", maxPerGroup = 10, k = 4))
      .map(t => (t._1, t._5)) ===
      Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)))
    // empty candidate set degrades to an empty frame
    assert(Relevance.capPerGroup(ranked.limit(0), "doc_id",
      "score", meta, "doc_id", "source", 2, 5).count() === 0L)
  }

  test("hybridSearchAnnPoints ≡ per-query fold of hybridSearchAnn; shared vectors allowed (r16)") {
    import org.apache.spark.sql.functions.{array, col, sin}
    val docs = Seq.tabulate(24) { i =>
      (i.toLong,
        if (i % 3 == 0) s"alpha beta shard$i"
        else if (i % 3 == 1) s"alpha filler$i"
        else s"noise words only$i")
    }.toDF("doc_id", "text")
    val emb = spark.range(24).select(col("id").as("vec_id"),
      array((0 until 8).map(d =>
        sin((col("id") + 1) * (d + 1)).cast("float")): _*).as("embedding"))
    val bmDir = java.nio.file.Files
      .createTempDirectory("graft_hyannb_bm").toString
    Relevance.bm25Index(docs, "doc_id", "text", bmDir)
    val (model, idx) = Similarity.buildPqIndex(emb, "vec_id", "embedding",
      nCentroids = 4, m = 4, kSub = 8, trainIters = 0, pqIters = 0)
    // three hybrid queries; q2 and q3 SHARE a query vector (the
    // dedup-then-rejoin seam in the batch semantic side)
    val batch = Seq((1L, "alpha beta", 0L), (2L, "noise words", 5L),
      (3L, "alpha filler7", 5L))
    val got = Relevance.hybridSearchAnnPoints(spark, bmDir, model, idx,
        emb, batch.toDF("query_id", "query", "qvec"),
        kLex = 5, kSem = 5, k = 6, nProbe = 4, rerankFactor = 5)
      .collect().map(r => (r.getLong(0), r.toSeq.drop(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    batch.foreach { case (qid, qtext, vid) =>
      val want = Relevance.hybridSearchAnn(spark, bmDir, model, idx, emb,
          qtext, queryVecId = vid, kLex = 5, kSem = 5, k = 6,
          nProbe = 4, rerankFactor = 5)
        .collect().map(_.toSeq).toSet
      assert(got(qid) === want,
        s"batch hybrid must equal the single form for query $qid ('$qtext', vec $vid)")
    }
    // empty-batch degradation rides the lexical side's: zero rows, no crash
    val empty = Relevance.hybridSearchAnnPoints(spark, bmDir, model, idx,
      emb, Seq.empty[(Long, String, Long)].toDF("query_id", "query", "qvec"),
      kLex = 5, kSem = 5, k = 6, nProbe = 4, rerankFactor = 5)
    assert(empty.count() === 0L)
  }

  test("hybridSearch: k truncates after fusion, not per side") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "alpha x"), (1L, "alpha y"), (2L, "alpha z"),
      (3L, "w alpha"), (4L, "alpha v")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.8f, 0.2f)), (3L, Array(0.7f, 0.3f)),
      (4L, Array(0.6f, 0.4f))).toDF("vec_id", "embedding")
    val out = Relevance.hybridSearch(docs, emb, "alpha", queryVecId = 0L,
      kLex = 5, kSem = 5, k = 2).collect()
    assert(out.length === 2)
    assert(out.map(_.getInt(4)).toSeq === Seq(1, 2))
  }
}
