package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Global total-order ranking — "sort the corpus" as a scalable primitive
 * (curriculum ordering, score-ordered corpus cuts, percentile exports,
 * deterministic global ids).
 *
 * A naive `row_number().over(Window.orderBy(...))` funnels every row
 * through ONE partition — the single worst plan shape at 100 TB. This is
 * the ranking twin of [[Packing]]'s two-level prefix scan:
 *
 *   1. the caller supplies an integer bucket column that is monotone
 *      NON-DECREASING along the requested sort order (e.g.
 *      `floor((1 - score) * 16)` for `score DESC` over scores in [0,1]) —
 *      every row of bucket i ranks before every row of bucket i+1;
 *   2. intra-bucket rank: `row_number` partitioned by bucket — parallel
 *      across buckets, one corpus exchange keyed on the bucket;
 *   3. bucket offsets: row counts per bucket → exclusive prefix sum over
 *      the bucket table (|buckets| rows — a model parameter, not data) →
 *      broadcast back; global rank = offset + intra rank.
 *
 * The monotonicity contract is the caller's (mirrors
 * [[Dedup.jaccardPairs]]' required blocking column): a bucket function
 * that interleaves sort keys across buckets silently mis-ranks. For
 * unknown score distributions derive buckets from quantiles
 * (`approx_percentile` boundaries) instead of fixed arithmetic.
 *
 * Skew note: bucket population imbalance only skews the *window* stage's
 * partition sizes; at 100 TB pick enough buckets (e.g. 4096 quantile cuts)
 * that the largest bucket fits one task comfortably.
 */
object Ranking {

  /**
   * Derive a monotone bucket column from data quantiles — for score
   * distributions where no fixed arithmetic bucketing is known. The
   * `nBuckets−1` approx-percentile boundaries are collected once
   * (bounded: a model parameter, not data; same driver budget as the
   * IVF centroid literals) and inlined; bucket = #boundaries ≤ score,
   * flipped when `ascending = false` so it stays non-decreasing along
   * a DESC sort. Approximation only skews bucket *sizes*, never the
   * rank (globalRank is exact for any monotone bucket).
   */
  def quantileBucket(df: DataFrame, score: Column, nBuckets: Int,
                     ascending: Boolean = true): Column = {
    require(nBuckets > 1, s"nBuckets must be > 1, got $nBuckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bounds = Option(
      df.select(percentile_approx(score, typedlit(probs), lit(10000)).as("q"))
        .head().getSeq[Double](0))
      .getOrElse(Seq.empty) // empty input: single bucket (rank is empty too)
    if (bounds.isEmpty) lit(0L)
    else {
      val asc = size(filter(typedlit(bounds), b => b <= score))
      if (ascending) asc else lit(bounds.length) - asc
    }
  }

  /**
   * Append `rankCol` = 1-based global rank of the row under `order`
   * (lexicographic over the given sort columns). `bucket` must be an
   * integral column monotone non-decreasing along that order.
   */
  def globalRank(df: DataFrame, bucket: Column, order: Seq[Column],
                 rankCol: String = "global_rank"): DataFrame = {
    require(order.nonEmpty, "globalRank needs at least one sort column")
    val tagged = df.withColumn("_gr_bkt", bucket.cast("long"))
    val wIntra = Window.partitionBy(col("_gr_bkt")).orderBy(order: _*)
    val wOff = Window.orderBy(col("_gr_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // |buckets| rows: the only global window runs over the bucket table.
    val offsets = tagged.groupBy(col("_gr_bkt"))
      .agg(count(lit(1)).as("_gr_n"))
      .withColumn("_gr_off", coalesce(sum(col("_gr_n")).over(wOff), lit(0L)))
      .select(col("_gr_bkt"), col("_gr_off"))
    tagged
      .withColumn("_gr_intra", row_number().over(wIntra))
      .join(broadcast(offsets), "_gr_bkt")
      .withColumn(rankCol, col("_gr_off") + col("_gr_intra"))
      .drop("_gr_bkt", "_gr_intra", "_gr_off")
  }
}
