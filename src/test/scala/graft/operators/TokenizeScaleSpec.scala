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

  test("all paths identical: equal-count disjoint pairs force the strict-gap truncation") {
    // (a,b), (c,d), (d,x) all at count 100: the disjoint prefix is
    // {(a,b), (c,d)} but the first excluded pair ties at 100, so the
    // batch truncates to (a,b) alone; sequential order must hold.
    assertIdentical(Seq(
      ("ab", 100L), ("cd", 100L), ("dx", 100L))
      .toDF("word", "cnt"), k = 3)
  }

  test("all paths identical: early exhaustion on a fully merged vocab") {
    for ((name, m) <- learnAll(Seq(("aa", 3L)).toDF("word", "cnt"), k = 10)) {
      assert(m.merges.map(x => (x.left, x.right)) === Seq(("a", "a")),
        s"path $name")
      assert(m.vocab.select("toks").head().getSeq[String](0) === Seq("aa"),
        s"path $name")
    }
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
