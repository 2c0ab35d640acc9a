package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Misra–Gries heavy-hitters sketch as a typed, MERGEABLE `Aggregator` —
 * the bounded-state path for corpus vocabulary statistics when the exact
 * term table itself no longer fits ([[Relevance.vocabTopTerms]] is the
 * exact twin: it shuffles one row per distinct term; this shuffles one
 * ≤k-entry map per map task).
 *
 * Guarantees (classic MG + the mergeable-summaries merge of Agarwal et
 * al. 2013): with k counters over n term occurrences,
 *   - every term with true count > n/(k+1) is present in the sketch;
 *   - each reported estimate is a LOWER bound, undercounting its term's
 *     true count by at most n/(k+1);
 * both hold across arbitrary merge trees, so Catalyst's partial
 * aggregation (map-side MG buffers, merged at the exchange) keeps the
 * bound at any parallelism. Estimates — unlike the bounds — depend on the
 * merge order, so gate queries over the sketch are rows-only; the
 * guarantee itself is test-pinned against exact counts.
 *
 * Scale shape: per-row cost is O(1) amortized (the decrement-all step
 * pays back the insertions that filled the buffer); shuffle state is one
 * ≤k-entry string→long map per (partition × group).
 */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1L)
      case None if buf.size < k => buf.updated(term, 1L)
      case None => // full: decrement every counter, drop zeros
        buf.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everyone; at most k
      // entries can exceed it, so the trimmed map fits the budget
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object FreqSketch {

  /** Column form over a string column. */
  def sketch(term: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(term)

  /** Sketched heavy terms of a whitespace-tokenized text corpus: one row
    * per surviving counter, (term, est) with est ≤ true count ≤
    * est + n/(k+1). */
  def sketchTerms(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("term"))
      .agg(sketch(col("term"), k).as("_sk"))
      .select(explode(col("_sk")).as(Seq("term", "est")))
      .orderBy(col("est").desc, col("term"))
}
