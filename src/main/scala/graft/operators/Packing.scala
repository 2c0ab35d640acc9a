package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing — the concat-then-chunk step of an LM training-data
 * build: documents are laid end-to-end in a deterministic global order
 * (doc id) and cut into fixed-capacity token sequences; a document that
 * straddles a boundary is split across consecutive sequences. Emits one
 * row per (document × sequence it occupies):
 *
 *   (doc_id, seq_id, offset_in_seq, n_in_seq)
 *
 * with Σ n_in_seq over a doc = its token count, and every sequence except
 * the last exactly `capacity` tokens full. All integer arithmetic —
 * bit-exact reproducible, oracle-checkable.
 *
 * Scale design — the global exclusive prefix sum is the crux. A naive
 * `Window.orderBy(doc_id)` running sum funnels the corpus through ONE
 * partition. Instead the classic two-level distributed scan:
 *
 *   1. intra-bucket running sum, partitioned by bucket = doc_id div W
 *      (parallel across buckets, one exchange);
 *   2. per-bucket totals → exclusive running sum over the BUCKET table
 *      (corpus/W rows — W=1e3 keeps it trivial at test scale; at 100 TB
 *      pick W so corpus/W fits one partition comfortably, e.g. 1e6, or
 *      recurse the same two-level scan);
 *   3. broadcast-join the bucket offsets back: global start = bucket
 *      offset + intra-bucket prefix.
 *
 * The chunk fan-out is then a map-side `sequence()` explode — a doc emits
 * ceil(n/capacity)+1 rows at most, so output size is corpus-proportional.
 */
object Packing {

  /**
   * Pack documents into fixed-capacity sequences. `nTokens` must be a
   * non-negative integral column (e.g. `size(split(text, ' '))`);
   * zero-token docs are dropped (they occupy no sequence).
   */
  /** Steps 1–3 of the two-level scan: (doc_id, n, _s = exclusive global
    * token prefix, _total = corpus token count). Shared by the packer and
    * the shard assigner. */
  private def withGlobalStart(docs: DataFrame, idCol: String,
                              nTokensCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        col(nTokensCol).cast("long").as("n"))
      .withColumn("_bkt", expr(s"doc_id div ${bucketWidth}L"))
    // 1. exclusive prefix within bucket
    val wIntra = Window.partitionBy("_bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = base.withColumn("_pre", coalesce(sum("n").over(wIntra), lit(0L)))
    // 2. exclusive prefix + grand total over bucket totals (corpus/W rows)
    val wBkt = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bucketOffsets = base.groupBy("_bkt").agg(sum("n").as("_tot"))
      .withColumn("_off", coalesce(sum("_tot").over(wBkt), lit(0L)))
      .withColumn("_total", sum("_tot").over(wAll))
      .select("_bkt", "_off", "_total")
    // 3. global start via broadcast of the small bucket table
    intra.join(broadcast(bucketOffsets), "_bkt")
      .select(col("doc_id"), col("n"),
        (col("_off") + col("_pre")).as("_s"), col("_total"))
  }

  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
                    capacity: Long, bucketWidth: Long = 1000L): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    withGlobalStart(docs, idCol, nTokensCol, bucketWidth)
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"), col("_s"),
        explode(sequence(expr(s"_s div ${capacity}L"),
          expr(s"(_s + n - 1) div ${capacity}L"))).as("seq_id"))
      .withColumn("_from", greatest(col("_s"), col("seq_id") * capacity))
      .withColumn("_to", least(col("_s") + col("n"), (col("seq_id") + 1) * capacity))
      .select(col("doc_id"), col("seq_id"),
        (col("_from") - col("seq_id") * capacity).as("offset_in_seq"),
        (col("_to") - col("_from")).as("n_in_seq"))
  }

  /**
   * Balanced shard assignment — the fan-out step that writes a packed
   * corpus as `nShards` training files of near-equal token mass. Documents
   * keep their deterministic id order (reproducible curriculum) and shard
   * boundaries fall at token-count quantiles:
   *
   *   shard_id = (global_token_start * nShards) div total_tokens
   *
   * All-integer arithmetic over the same two-level distributed prefix scan
   * as [[packSequences]] — no single-partition window, no float rounding,
   * bit-exact across engines. Each shard's token mass deviates from
   * total/nShards by at most one document. Zero-token documents stay (they
   * get the shard of their position). Downstream:
   * `.repartition(col("shard_id"))` then write — one file per shard.
   */
  def shardAssign(docs: DataFrame, idCol: String, nTokensCol: String,
                  nShards: Int, bucketWidth: Long = 1000L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    withGlobalStart(docs, idCol, nTokensCol, bucketWidth)
      .select(col("doc_id"),
        expr(s"(_s * $nShards) div _total").as("shard_id"),
        col("n").as("n_tokens"))
  }

  /**
   * Physically lay the sharded corpus out on disk — the last step of a
   * training-data build. Joins the [[shardAssign]] result back to the
   * documents, clusters rows by shard, and writes one directory per shard
   * (`shard_id=N/`) with the documents in deterministic `idCol` order
   * inside each file.
   *
   * Scale design: `repartition(shard_id)` puts every row of a shard in
   * exactly one task (a shard never straddles files), so each
   * `shard_id=N/` directory holds one file per shard — training loaders
   * stream a shard as ONE sequential read, no small-file storm.
   * `sortWithinPartitions(shard_id, id)` makes file contents byte-stable
   * across runs (same plan → same order → same parquet). At 100 TB raise
   * `nShards` so each shard fits a task comfortably (the token-balanced
   * assignment already equalizes shard BYTES, which is what makes this
   * safe) and set `maxRecordsPerFile` as a belt-and-braces cap.
   */
  def writeShards(docs: DataFrame, idCol: String, nTokensCol: String,
                  nShards: Int, outDir: String,
                  bucketWidth: Long = 1000L): Unit = {
    val assign = shardAssign(docs, idCol, nTokensCol, nShards, bucketWidth)
      .select(col("doc_id").as("_aid"), col("shard_id"))
    docs.join(assign, col(idCol) === col("_aid")).drop("_aid")
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col(idCol))
      .write.partitionBy("shard_id").mode("overwrite").parquet(outDir)
  }
}
