package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{OrderEvent, ReceiptEvent}

/**
 * Stream-stream joins (SURVEY.md §2.4 J1/J2) — the built-in Structured
 * Streaming mapping: watermarks on both sides + a time-range conjunct give
 * Spark exactly the state-retention bound the reference implemented with
 * per-key timers (OrderReceiptProcessJoinFunc:71-77). State for a side is
 * dropped as soon as the watermark passes its join horizon — no custom
 * state machine needed for the inner-join case.
 */
object StreamJoins {

  /**
   * J1 — event-time interval inner join on txId:
   * `receipt.ts ∈ [pay.ts − lowerSec, pay.ts + upperSec]`
   * (OrderReceiptAppWithJoin.java:58-61: between(-3 s, +5 s)).
   */
  def intervalJoinStream(pays: Dataset[OrderEvent], receipts: Dataset[ReceiptEvent],
                         lowerSec: Long, upperSec: Long,
                         watermarkDelay: String = "2 seconds"): DataFrame = {
    val l = pays.filter(col("txId") =!= "")
      .select(col("txId"), col("orderId"),
        timestamp_seconds(col("eventTime")).as("payTime"))
      .withWatermark("payTime", watermarkDelay)
    val r = receipts
      .select(col("txId").as("rTxId"), col("payChannel"),
        timestamp_seconds(col("timestamp")).as("receiptTime"))
      .withWatermark("receiptTime", watermarkDelay)
    l.join(r,
      col("txId") === col("rTxId") &&
        col("receiptTime") >= col("payTime") - expr(s"INTERVAL $lowerSec SECONDS") &&
        col("receiptTime") <= col("payTime") + expr(s"INTERVAL $upperSec SECONDS"),
      "inner")
      .select(col("txId"), col("orderId"), col("payChannel"),
        col("payTime").cast("long").as("pay_sec"),
        col("receiptTime").cast("long").as("receipt_sec"))
  }

  /**
   * J1/J2 hybrid — LEFT OUTER stream-stream interval join: matched pairs
   * emit like the inner form; an unmatched pay emits with null receipt
   * columns once BOTH watermarks pass its join horizon (Spark proves no
   * future receipt can match before emitting the null row — the same
   * guarantee the reference built with a per-key "wait then side-output"
   * timer, here from the declarative watermark bound alone). State
   * retention is identical to the inner join: each side is dropped as
   * soon as the watermark clears its horizon.
   */
  def intervalJoinOuterStream(pays: Dataset[OrderEvent], receipts: Dataset[ReceiptEvent],
                              lowerSec: Long, upperSec: Long,
                              watermarkDelay: String = "2 seconds"): DataFrame = {
    val l = pays.filter(col("txId") =!= "")
      .select(col("txId"), col("orderId"),
        timestamp_seconds(col("eventTime")).as("payTime"))
      .withWatermark("payTime", watermarkDelay)
    val r = receipts
      .select(col("txId").as("rTxId"), col("payChannel"),
        timestamp_seconds(col("timestamp")).as("receiptTime"))
      .withWatermark("receiptTime", watermarkDelay)
    l.join(r,
      col("txId") === col("rTxId") &&
        col("receiptTime") >= col("payTime") - expr(s"INTERVAL $lowerSec SECONDS") &&
        col("receiptTime") <= col("payTime") + expr(s"INTERVAL $upperSec SECONDS"),
      "left_outer")
      .select(col("txId"), col("orderId"), col("payChannel"),
        col("payTime").cast("long").as("pay_sec"),
        col("receiptTime").cast("long").as("receipt_sec"))
  }

  /**
   * Stream-static dimension enrichment: a streaming fact joined to a
   * bounded dim table. The static side is marked `broadcast()`, so every
   * micro-batch plans a BroadcastHashJoin — the stream never shuffles and
   * carries no join state (Spark re-plans the static side per batch; at
   * 100 TB/day the dim broadcast is the standard star-schema pattern —
   * the reference's side-input/async-dim-lookup shape without the
   * external KV store). Left join keeps facts with no dim row.
   */
  def enrichStream(facts: DataFrame, dim: DataFrame, key: String,
                   joinType: String = "left"): DataFrame =
    facts.join(broadcast(dim), Seq(key), joinType)

  /**
   * Streaming exact dedup (training-pipeline stream form of
   * `Dedup.exactDedup`): first occurrence of each content fingerprint
   * passes, replays drop. State = one row per distinct fingerprint,
   * bounded by the watermark horizon (a fingerprint older than the
   * horizon is evictable; an exactly-once sink dedups redelivery).
   * Key on the md5 of `contentCol` — state never stores the body.
   */
  def dedupStream(stream: DataFrame, tsCol: String, contentCol: String,
                  watermarkDelay: String): DataFrame =
    stream
      .withColumn("_fp", md5(col(contentCol).cast("binary")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")
}
