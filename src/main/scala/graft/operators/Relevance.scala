package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus relevance scoring — TF-IDF and BM25 term weights with a top-k
 * characteristic-term extraction per document. A training-data pipeline
 * uses these for corpus statistics, keyword-based filtering, and
 * lightweight retrieval labels; the operator is the classic
 * "explode → two aggregations → join the term dictionary back" shape.
 *
 * Scale design (100 TB lens):
 *  - One explode over tokens; term frequencies partial-aggregate map-side
 *    before the (doc, term) exchange — the only corpus-sized shuffle.
 *  - Document lengths reuse the tf aggregate (sum over the already-reduced
 *    (doc, term) rows), not a second pass over raw tokens.
 *  - The term dictionary (document frequencies) is orders of magnitude
 *    smaller than the corpus; its join back is a plain equi-join Catalyst /
 *    AQE can broadcast when it fits. Corpus-level scalars (N, avgdl) ride
 *    in as a broadcast single-row cross join.
 *  - Ranking is per-doc (`Window.partitionBy(doc)`), so the final sort is
 *    a partition-local top-k, never a global sort.
 *
 * Determinism: scores are rounded to 6 decimals BEFORE ranking and the
 * rank tie-breaks on the term string, so the emitted top-k is reproducible
 * across engines and runs (a bit-exactness requirement for the oracle gate
 * and an operational one for reproducible data builds).
 */
object Relevance {

  /**
   * BM25 top-k terms per document. Emits
   * (doc_id, term, tf, df, bm25_r, rn) for the k highest-scoring terms of
   * each document, rank ordered by (score desc, term asc).
   *
   * idf = ln(1 + (N − df + 0.5)/(df + 0.5))  (Robertson–Sparck Jones)
   * score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   */
  def bm25TopTerms(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val scored = tf
      .join(dl, "doc_id")
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5))))
      .withColumn("bm25_r", round(
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0))
          / (col("tf").cast("double")
            + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("bm25_r").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("bm25_r"), col("rn"))
  }

  /**
   * Corpus vocabulary top-k: global term frequencies and document
   * frequencies, ranked by total count — the vocabulary-building /
   * corpus-statistics pass of a data build.
   *
   * Scale: explode → one partial-agged exchange on term; the global top-k
   * goes through `orderBy.limit` which Spark executes as TakeOrdered
   * (per-partition heaps + driver merge of k rows) — no global sort
   * materialization. The rank column is minted AFTER the limit, over k
   * rows. Deterministic: ties break on the term string.
   */
  def vocabTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 50): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val byTerm = terms.groupBy("term").agg(
      count(lit(1)).as("cnt"), count_distinct(col("doc_id")).as("df"))
    val w = Window.orderBy(col("cnt").desc, col("term").asc)
    byTerm.orderBy(col("cnt").desc, col("term").asc).limit(k)
      .withColumn("rn", row_number().over(w))
  }

  /** Plain TF-IDF weights per (doc, term) — tf · ln(N/df), unranked; the
    * building block when the caller wants the full weighted matrix (e.g.
    * as sparse features) rather than top-k terms. */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tf_idf_r", round(
        col("tf").cast("double")
          * log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tf_idf_r"))
  }
}
