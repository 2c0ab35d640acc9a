package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.SparkSuite

/** Empty-input and degenerate-shape behavior: a pipeline stage that
  * crashes on an empty upstream result (a filter that matched nothing, an
  * empty ingest batch) takes the whole corpus build down with it. */
class EdgeCasesSpec extends SparkSuite {

  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val someDocs =
    Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta")).toDF("doc_id", "text")

  test("dedup family: empty input → empty output, no crash") {
    assert(Dedup.exactGroups(emptyDocs, "doc_id", "text").count() === 0L)
    assert(Dedup.exactDedup(emptyDocs, "doc_id", "text").count() === 0L)
    assert(Dedup.duplicatedSpans(emptyDocs, "doc_id", "text").count() === 0L)
    assert(Dedup.incrementalDedup(emptyDocs, someDocs, "doc_id", "text").count() === 0L)
    // empty corpus: every in-batch keeper passes through
    assert(Dedup.incrementalDedup(someDocs, emptyDocs, "doc_id", "text").count() === 2L)
  }

  test("resolveClusters on an empty pair set is empty") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.resolveClusters(noPairs).count() === 0L)
  }

  test("sampling / ranking / packing: empty input → empty output") {
    assert(Sampling.bottomKSample(emptyDocs, "doc_id", "text", 5).count() === 0L)
    assert(Sampling.temperatureSample(emptyDocs, "doc_id", "text", 0.5).count() === 0L)
    assert(Ranking.globalRank(emptyDocs, lit(0L), Seq(col("doc_id"))).count() === 0L)
    val emptyN = Seq.empty[(Long, Long)].toDF("doc_id", "n")
    assert(Packing.packSequences(emptyN, "doc_id", "n", 16L).count() === 0L)
    assert(TextAnalysis.chunkDocuments(emptyDocs, "doc_id", "text", 8, 2).count() === 0L)
  }

  test("importanceWeights with an empty target still scores (smoothed floor)") {
    val w = Importance.importanceWeights(someDocs, emptyDocs, "doc_id", "text",
        buckets = 64)
      .as[(Long, Long, Double)].collect()
    assert(w.length === 2)
    // every bucket weight is ln(1/(0+64)) - ln((rc+1)/(rtot+64)) — finite
    assert(w.forall(r => !r._3.isNaN && !r._3.isInfinite))
  }

  test("FreqSketch over empty input is an empty map") {
    assert(FreqSketch.sketchTerms(emptyDocs, "text", 8).count() === 0L)
  }

  test("similarity literal-quantizer paths: empty corpus → empty top-k") {
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.ivfTopK(emptyVecs, "vec_id", "embedding",
      col("id") === 0L, k = 3).count() === 0L)
    assert(Similarity.ivfPqTopK(emptyVecs, "vec_id", "embedding",
      col("id") === 0L, k = 3, m = 2, kSub = 4).count() === 0L)
    assert(Similarity.lshTopK(emptyVecs, "vec_id", "embedding",
      col("id") === 0L, k = 3).count() === 0L)
    assert(Similarity.quantizeInt8(emptyVecs, "vec_id", "embedding").count() === 0L)
  }

  test("quantileBucket on empty input degrades to a single bucket") {
    val b = Ranking.quantileBucket(emptyDocs, col("doc_id"), 8)
    assert(Ranking.globalRank(emptyDocs, b, Seq(col("doc_id"))).count() === 0L)
  }

  test("chunkDocuments property: chunks cover the doc exactly, bounded size") {
    val genDoc: Gen[(Int, Int, Int)] = for {
      n <- Gen.choose(1, 60)
      c <- Gen.choose(2, 12)
      o <- Gen.choose(0, c - 1)
    } yield (n, c, o)
    val prop = Prop.forAll(genDoc) { case (n, c, o) =>
      val toks = (1 to n).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextAnalysis.chunkDocuments(df, "doc_id", "text", c, o)
        .orderBy("chunk_id")
        .select("chunk_text", "n_chunk_tokens")
        .as[(String, Int)].collect()
      // every chunk fits the window and matches its declared size
      val sized = chunks.forall { case (t, k) =>
        t.split(" ").length == k && k >= 1 && k <= c
      }
      // first chunk + non-overlap tails of the rest reconstruct the doc
      val rebuilt = chunks.head._1.split(" ") ++
        chunks.tail.flatMap(_._1.split(" ").drop(o))
      sized && rebuilt.toSeq == toks
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(result.passed, result.status.toString)
  }
}
