package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-pass table profiling — the data-quality primitive run over every
 * new corpus drop before it enters a training pipeline: per column, the
 * null count, exact distinct cardinality, and min/max rendered to
 * strings.
 *
 * Scale shape: ONE aggregate over the table produces every statistic
 * (null counts, min/max are plain partial aggregates; the k distinct
 * counts plan through Catalyst's Expand-based multi-distinct rewrite —
 * one shuffle of k× the row count in key-width columns, not k scans of
 * the table). The per-column long format comes from `stack` over the
 * single result row: a driver-sized pivot, zero extra jobs.
 *
 * min/max are cast to string so mixed-type profiles fit one schema;
 * callers needing typed extrema profile per column. For cardinalities
 * where exactness isn't required at 100 TB, swap `countDistinct` for
 * `approx_count_distinct` — the profile stays one pass and loses the
 * Expand fan-out.
 */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackExpr =
      s"stack(${cols.length}, " + cols.map { c =>
        s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
      }.mkString(", ") +
        ") as (column, n_nulls, n_distinct, min_value, max_value)"
    row.select(col("n_rows"), expr(stackExpr))
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
