package graft.operators

import graft.SparkSuite

/** The three BPE learning paths — driver-local indexed, distributed
  * sequential (batchLimit=1), distributed batched — must produce
  * byte-identical models: same ranked merges, same pair counts, same
  * final vocab segmentations. The batched path's safety rule (mutually
  * symbol-disjoint prefix + strict count gap to the first excluded pair)
  * is exercised against adversarial tie fixtures where a naive
  * "batch all disjoint pairs" scheme diverges from sequential.
  */
class TokenizeScaleSpec extends SparkSuite {

  import spark.implicits._
  import org.apache.spark.sql.DataFrame

  private def learnAll(words: DataFrame, k: Int) = Seq(
    "local" -> Tokenize.learnBpe(words, k),
    "seq" -> Tokenize.learnBpe(words, k, localVocabThreshold = 0L, batchLimit = 1),
    "batched" -> Tokenize.learnBpe(words, k, localVocabThreshold = 0L, batchLimit = 64))

  private def assertIdentical(words: DataFrame, k: Int): Unit = {
    val models = learnAll(words, k)
    val ref = models.head._2
    val refMerges = ref.merges
    val refSeg = ref.vocab.orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).toSeq
    for ((name, m) <- models.tail) {
      assert(m.merges === refMerges, s"merge sequence diverged on path $name")
      val seg = m.vocab.orderBy("word").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).toSeq
      assert(seg === refSeg, s"vocab segmentation diverged on path $name")
    }
  }

  test("all paths identical: Sennrich worked example (argmax ties)") {
    assertIdentical(Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt"), k = 5)
  }

  test("all paths identical: merge-created pair outranks a tied survivor") {
    // After merging (a,b) -> ab, word "aab" yields the NEW pair (a,ab)
    // at count 99 — tied with (c,d):99 and string-smaller, so sequential
    // picks (a,ab) second. A batcher that paired (a,b) with (c,d) in one
    // pass would emit (c,d) second instead. safeBatch must not.
    assertIdentical(Seq(
      ("aab", 99L), ("ab", 1L), ("cd", 99L))
      .toDF("word", "cnt"), k = 3)
  }

  test("all paths identical: equal-count disjoint pairs at the excluded bound") {
    // (a,b), (c,d), (d,x) all at count 100: the disjoint prefix is
    // {(a,b), (c,d)} and the first excluded pair ties at 100. No kept
    // merge can create a pair at that count ((a,b) fully consumes its
    // word), so the tie check admits (c,d) — and the sequence must still
    // be byte-identical to sequential.
    assertIdentical(Seq(
      ("ab", 100L), ("cd", 100L), ("dx", 100L))
      .toDF("word", "cnt"), k = 3)
  }

  test("all paths identical: tied member rejected when a created pair out-sorts it") {
    // pairs: (a,m):200, (b,y):100, (m,z):100. The batch scan keeps
    // (a,m) and reaches tied (b,y); merging (a,m) creates (am,z) from
    // "amz" at count 100 — TIED with (b,y) and UTF-8-smaller ("am" <
    // "b"), so sequential picks (am,z) second. The tie check must
    // reject (b,y); a batcher admitting every tied disjoint pair
    // diverges here.
    assertIdentical(Seq(
      ("amz", 100L), ("am", 100L), ("by", 100L))
      .toDF("word", "cnt"), k = 4)
  }

  test("all paths identical: tied member admitted when created pairs lose the tie-break") {
    // Same shape, but the kept merge is (w,m) so the created pair is
    // (wm,z) — "b" < "wm", the tied (b,y) wins its tie and is safely
    // batched with (w,m) in one pass.
    assertIdentical(Seq(
      ("wmz", 100L), ("wm", 100L), ("by", 100L))
      .toDF("word", "cnt"), k = 4)
  }

  test("all paths identical: early exhaustion on a fully merged vocab") {
    for ((name, m) <- learnAll(Seq(("aa", 3L)).toDF("word", "cnt"), k = 10)) {
      assert(m.merges.map(x => (x.left, x.right)) === Seq(("a", "a")),
        s"path $name")
      assert(m.vocab.select("toks").head().getSeq[String](0) === Seq("aa"),
        s"path $name")
    }
  }

  test("all paths identical: self-pair merges spawn pairs bounded only by their own count") {
    // (a,a) at 4000 over "aaaaa" creates (aa,a)/(aa,aa) at 1000 — far
    // ABOVE the excluded bound (500) yet invisible to the pre-merge pair
    // ranking. A batcher that pairs (a,a) with (b,c) diverges: sequential
    // picks the created (aa,a) second. Self-pairs must close their batch.
    assertIdentical(Seq(
      ("aaaaa", 1000L), ("bc", 600L), ("xy", 500L))
      .toDF("word", "cnt"), k = 4)
  }

  test("all paths identical: seeded random corpus, k=30") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    val words = (1 to 200).map { _ =>
      val len = 1 + rnd.nextInt(8)
      val w = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (w, 1L + rnd.nextInt(50))
    }.distinct.toDF("word", "cnt")
    assertIdentical(words, k = 30)
  }

  test("all paths identical: real documents corpus, k=24") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = Tokenize.wordCounts(docs, "doc_id", "text")
    val models = learnAll(words, 24)
    val ref = models.head._2.merges
    assert(ref.length === 24)
    for ((name, m) <- models.tail)
      assert(m.merges === ref, s"merge sequence diverged on path $name")
  }
}
