package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/**
 * Multi-stream join operators (SURVEY.md §2.4).
 *
 * The reference implements these as per-key state machines
 * (ProcessJoinFunction / CoProcessFunction); batch-side we express the same
 * semantics declaratively so Catalyst can pick a shuffled-hash / sort-merge
 * join on the equi key and evaluate the time-range predicate as a post-join
 * filter. At 100 TB the equi key (txId / user) carries the shuffle; the range
 * condition never forces a nested-loop because an equality conjunct exists.
 */
object Joins {

  /**
   * Event-time interval join (J1 — OrderReceiptAppWithJoin.java:58-61:
   * receipt.ts ∈ [pay.ts − lowerSec, pay.ts + upperSec] matched on txId).
   *
   * `leftUsec`/`rightUsec` are epoch-microsecond bigint columns — integer
   * event time survives engine round-trips losslessly (SURVEY.md §7.4).
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftUsec: String, rightUsec: String,
                   lowerSec: Long, upperSec: Long): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightUsec") >= col(s"l.$leftUsec") - lit(lowerSec * 1000000L) &&
        col(s"r.$rightUsec") <= col(s"l.$leftUsec") + lit(upperSec * 1000000L),
      "inner")
  }

  /**
   * Skew-salted equi-join: the join-side analog of `Windows.saltedCount`
   * for the case AQE's runtime skew split can't reach (e.g. a first-stage
   * shuffle where one key holds a double-digit share of the fact side).
   * The skewed (large) side gets a random salt in [0, saltBuckets); the
   * other side is replicated once per salt value; the join key becomes
   * (key, salt), spreading each hot key over `saltBuckets` reducers.
   * Result is exactly the plain inner equi-join (test-pinned); cost is a
   * `saltBuckets`× replication of the SMALLER side, so pick the sides
   * accordingly. Prefer plain joins + AQE unless a key is provably hot.
   */
  def skewSaltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                     saltBuckets: Int): DataFrame = {
    val salted = skewed.withColumn("_salt",
      (rand(seed = 7) * saltBuckets).cast(IntegerType))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key)).drop("_salt")
  }

  /**
   * Full-outer reconcile with timeout branches (J2 —
   * OrderReceiptAppWithConnect.java:72-162: match pay↔receipt, emit
   * unmatched sides when the other never arrives in the interval).
   *
   * One full-outer join; the three reference outputs (matched /
   * payButNoReceipt / receiptButNoPay) become a single `status` column the
   * caller can split with filters — the Spark-native replacement for Flink
   * side outputs (SURVEY.md §2.1 K2).
   */
  def reconcile(left: DataFrame, right: DataFrame, key: String,
                leftUsec: String, rightUsec: String,
                lowerSec: Long, upperSec: Long,
                leftName: String = "left_only", rightName: String = "right_only"): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightUsec") >= col(s"l.$leftUsec") - lit(lowerSec * 1000000L) &&
        col(s"r.$rightUsec") <= col(s"l.$leftUsec") + lit(upperSec * 1000000L),
      "full_outer")
      .withColumn("status",
        when(col(s"l.$leftUsec").isNull, lit(rightName))
          .when(col(s"r.$rightUsec").isNull, lit(leftName))
          .otherwise(lit("matched")))
  }
}
