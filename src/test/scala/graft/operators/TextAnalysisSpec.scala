package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** n-gram construction + Gopher-style repetition metrics on crafted docs
  * where the expected fractions are computable by hand. */
class TextAnalysisSpec extends SparkSuite {

  import spark.implicits._

  private def repRow(text: String) =
    TextAnalysis.withRepetitionFeatures(
        Seq((1L, text)).toDF("doc_id", "text"), "text")
      .select("n_2grams", "dup_2gram_frac", "dup_3gram_frac", "top_2gram_frac")
      .head()

  test("ngrams: space-joined windows, 1-based, guard below n") {
    val df = Seq("a b c d", "a", "").toDF("text")
      .select(TextAnalysis.ngrams(split(col("text"), " "), 2).as("g"))
    val gs = df.as[Seq[String]].collect()
    assert(gs(0) === Seq("a b", "b c", "c d"))
    assert(gs(1) === Seq.empty) // 1 token < n — and no descending sequence()
    assert(gs(2) === Seq.empty) // split("") yields [""], still < 2 tokens
  }

  test("no repetition: all fractions zero") {
    val r = repRow("one two three four")
    assert(r.getInt(0) === 3)
    assert(r.getDouble(1) === 0.0)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 1.0 / 3.0) // every bigram ties at count 1
  }

  test("fully repeated text: high duplicate fractions") {
    // "x y x y x y": bigrams = [x y, y x, x y, y x, x y] → 5 total, 2 distinct
    val r = repRow("x y x y x y")
    assert(r.getInt(0) === 5)
    assert(r.getDouble(1) === 3.0 / 5.0)
    // trigrams = [x y x, y x y, x y x, y x y] → 4 total, 2 distinct
    assert(r.getDouble(2) === 2.0 / 4.0)
    assert(r.getDouble(3) === 3.0 / 5.0) // "x y" appears 3 of 5
  }

  test("single-token and sub-n docs emit zeros, not nulls") {
    val r = repRow("solo")
    assert(r.getInt(0) === 0)
    assert((1 to 3).forall(i => r.getDouble(i) === 0.0))
  }

  test("PII scrub: planted emails and urls are counted and masked") {
    val out = TextAnalysis.withPiiScrub(
        Seq(
          (1L, "contact bob.smith+x@example.co.uk or visit https://a.example.com/p?q=1 now"),
          (2L, "two mails a@b.io c@d.org and http://plain.example"),
          (3L, "nothing sensitive here")).toDF("doc_id", "text"), "text")
      .orderBy("doc_id")
      .select("n_emails", "n_urls", "text_masked").collect()
    assert(out(0).getInt(0) === 1 && out(0).getInt(1) === 1)
    assert(out(0).getString(2) === "contact <EMAIL> or visit <URL> now")
    assert(out(1).getInt(0) === 2 && out(1).getInt(1) === 1)
    assert(out(1).getString(2) === "two mails <EMAIL> <EMAIL> and <URL>")
    assert(out(2).getInt(0) === 0 && out(2).getInt(1) === 0)
    assert(out(2).getString(2) === "nothing sensitive here")
  }

  test("native ngram hashes are bit-identical to the declarative form") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq(
      "a b c d e", "a a a a", "x", "", "one two three",
      "a b c a b c a b c").toDF("text")
    val both = docs.select(
      call_function("graft_ngram_hashes", col("text"), lit(3), lit(false)).as("native"),
      transform(TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3),
        g => xxhash64(g)).as("decl"),
      call_function("graft_ngram_hashes", col("text"), lit(3), lit(true)).as("native_d"),
      array_distinct(transform(TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3),
        g => xxhash64(g))).as("decl_d")).collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      assert(r.getSeq[Long](2) === r.getSeq[Long](3))
    }
  }

  test("contamination check: planted benchmark 3-gram overlap") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x alpha beta gamma y"),   // contains 1 of its 3 grams
      (2L, "alpha beta gamma delta"), // fully leaked: 2/2
      (3L, "totally clean document here"),
      (4L, "too short")).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationCheck(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((1L, 3L, 1L, 1.0 / 3.0)))
    assert(out(1) === ((2L, 2L, 2L, 1.0)))
    assert(out(2) === ((3L, 2L, 0L, 0.0)))
    assert(out(3) === ((4L, 0L, 0L, 0.0))) // < 3 tokens: zero grams, kept
  }

  test("rule filter: planted pass/fail per rule") {
    val out = TextAnalysis.withRuleFilter(
        Seq(
          (1L, "this is a perfectly ordinary sentence with enough plain words to pass"),
          (2L, "too short"),                                  // < 10 tokens
          (3L, ("a " * 10).trim + (" " + "x" * 60) * 5)) // mean len (10+300)/15 = 20.7
        .toDF("doc_id", "text"), "text")
      .orderBy("doc_id")
      .select("ok_n_tokens", "ok_mean_token_len", "ok_punct", "ok_alpha", "keep")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out(0) === ((1, 1, 1, 1, 1)))
    assert(out(1)._1 === 0)
    assert(out(1)._5 === 0)
    assert(out(2)._2 === 0, "mean token length blown by the giant token")
    assert(out(2)._5 === 0)
  }

  test("chunkDocuments: coverage, overlap, and short-doc single chunk") {
    val toks = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, toks), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .orderBy("id", "chunk_id")
      .as[(Long, Int, String, Int)].collect()
    val doc1 = chunks.filter(_._1 == 1L)
    // stride 3: starts 0,3,6 -> [w1..w4],[w4..w7],[w7..w10]
    assert(doc1.map(_._3).toSeq === Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(doc1.map(_._4).toSeq === Seq(4, 4, 4))
    // consecutive chunks share exactly `overlap` tokens
    doc1.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3.split(" ").takeRight(1).toSeq === b._3.split(" ").take(1).toSeq)
      case _ =>
    }
    // dropping the first `overlap` tokens of every chunk after the first
    // reconstructs the doc exactly (full coverage, no duplication)
    val rebuilt = (doc1.head._3.split(" ") ++
      doc1.tail.flatMap(_._3.split(" ").drop(1))).mkString(" ")
    assert(rebuilt === toks)
    // short docs yield exactly one chunk with all their tokens
    assert(chunks.filter(_._1 == 2L).toSeq === Seq((2L, 0, "a b", 2)))
    assert(chunks.filter(_._1 == 3L).toSeq === Seq((3L, 0, "solo", 1)))
  }
}
