package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BPE subword learning/segmentation: hand-computed merges on the classic
  * low/lower/newest/widest corpus (two argmax ties exercise the
  * tie-break), greedy-scan semantics, OOV fallback, early exhaustion,
  * and determinism. */
class TokenizeSpec extends SparkSuite {

  import spark.implicits._

  // Sennrich et al.'s worked example, as a corpus whose word frequencies
  // are low:7 (5+2 via lower prefix... spelled out), lower:2, newest:6,
  // widest:3. Hand-derived merge sequence with weighted pair counts:
  //   1 (e,s)  cnt 9  — ties (s,t) 9, left-asc break
  //   2 (es,t) cnt 9
  //   3 (l,o)  cnt 7  — ties (o,w) 7, left-asc break
  //   4 (lo,w) cnt 7
  //   5 (e,w)  cnt 6  — ties (n,e) (w,est) 6, left-asc break
  private def words = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    .toDF("word", "cnt")

  test("learnBpe: hand-computed merge sequence with tie-breaks") {
    val model = Tokenize.learnBpe(words, k = 5)
    val got = model.merges.map(m => (m.rank, m.left, m.right, m.pairCnt))
    assert(got === Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
      (4, "lo", "w", 7L), (5, "e", "w", 6L)))
    assert(model.merges.map(_.merged) ===
      Seq("es", "est", "lo", "low", "ew"))
  }

  test("learnBpe: final vocab segmentation") {
    val model = Tokenize.learnBpe(words, k = 5)
    val seg = model.vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("low") === Seq("low"))
    assert(seg("lower") === Seq("low", "e", "r"))
    assert(seg("newest") === Seq("n", "ew", "est"))
    assert(seg("widest") === Seq("w", "i", "d", "est"))
  }

  test("mergeOne: greedy leftmost non-overlapping scan") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "b"), Seq("b", "a", "b"))
      .toDF("toks")
    val out = df.select(
      Tokenize.mergeOne(col("toks"), lit("a"), lit("a")).as("aa"),
      Tokenize.mergeOne(col("toks"), lit("a"), lit("b")).as("ab"))
      .collect()
    // (a,a) on [a,a,a] -> [aa, a]: the merged token does not re-merge
    assert(out(0).getSeq[String](0) === Seq("aa", "a"))
    // (a,b) on [a,b,b] -> [ab, b]
    assert(out(1).getSeq[String](1) === Seq("ab", "b"))
    // (a,b) on [b,a,b] -> [b, ab]
    assert(out(2).getSeq[String](1) === Seq("b", "ab"))
  }

  test("applyBpe: in-vocab segmentation, counts, and document order") {
    val model = Tokenize.learnBpe(words, k = 5)
    val docs = Seq((1L, "low lower newest widest"), (2L, "newest newest"))
      .toDF("doc_id", "text")
    val out = Tokenize.applyBpe(docs, model, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 4L) // n_words
    assert(out(0).getLong(2) === 11L) // 1 + 3 + 3 + 4 subwords
    assert(out(0).getString(3) === "low low e r n ew est w i d est")
    assert(out(1).getString(3) === "n ew est n ew est")
  }

  test("applyBpe: out-of-vocabulary word takes the merge-fold fallback") {
    val model = Tokenize.learnBpe(words, k = 5)
    val docs = Seq((1L, "lowest")).toDF("doc_id", "text")
    val out = Tokenize.applyBpe(docs, model, "doc_id", "text").head()
    // l,o,w,e,s,t -> es -> est -> lo -> low => [low, est]
    assert(out.getString(3) === "low est")
    assert(out.getLong(2) === 2L)
  }

  test("learnBpe: stops early when the vocab is fully merged") {
    val model = Tokenize.learnBpe(Seq(("aa", 3L)).toDF("word", "cnt"), k = 10)
    assert(model.merges.map(m => (m.left, m.right)) === Seq(("a", "a")))
    assert(model.vocab.select("toks").head().getSeq[String](0) === Seq("aa"))
  }

  test("subwordVocab: weighted counts and rank") {
    val model = Tokenize.learnBpe(words, k = 5)
    val top = Tokenize.subwordVocab(model, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // est: 6+3=9; low: 5+2=7; ew: 6
    assert(top === Array(("est", 9L, 1), ("low", 7L, 2), ("ew", 6L, 3)))
  }

  test("learnBpe: deterministic across runs") {
    val a = Tokenize.learnBpe(words, k = 5).merges
    val b = Tokenize.learnBpe(words, k = 5).merges
    assert(a === b)
  }

  test("saveBpeModel/loadBpeModel: bit-exact round trip, reloaded model segments identically") {
    val model = Tokenize.learnBpe(words, k = 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    Tokenize.saveBpeModel(model, dir)
    val loaded = Tokenize.loadBpeModel(dir, spark)
    assert(loaded.merges === model.merges)
    val seg = (m: Tokenize.BpeModel) =>
      m.vocab.orderBy("word").collect()
        .map(r => (r.getString(0), r.getSeq[String](2))).toSeq
    assert(seg(loaded) === seg(model))
    val docs = Seq((1L, "lowest newest")).toDF("doc_id", "text")
    val a = Tokenize.applyBpe(docs, model, "doc_id", "text").head()
    val b = Tokenize.applyBpe(docs, loaded, "doc_id", "text").head()
    assert(a.getString(3) === b.getString(3))
  }

  test("wordCounts: whitespace tokens, empty words dropped") {
    val docs = Seq((1L, "a b  a"), (2L, "b")).toDF("doc_id", "text")
    val wc = Tokenize.wordCounts(docs, "doc_id", "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc === Map("a" -> 2L, "b" -> 2L))
  }
}
