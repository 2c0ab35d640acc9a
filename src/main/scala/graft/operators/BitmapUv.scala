package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * A7 parity, batch side: the reference's Redis-bitmap UV
 * (`setbit`/`getbit`, UvCountWithBloomFilterApp.java:100-126) as a typed
 * Spark `Aggregator` — the custom-aggregate slot SURVEY.md §2 marked
 * optional. Fixed `2^bitsLog2`-bit buffer per group regardless of
 * cardinality; one mixed multiplicative hash per value (the SAME hash as
 * the streaming twin `StreamWindows.perEventUv`, so batch and stream
 * undercount identically on collisions, like the reference's bloom).
 *
 * Scale shape: the buffer is algebraic (bytewise OR merges), so Catalyst
 * runs it as partial aggregation — map-side buffers combine before the
 * exchange and the shuffle carries one `2^bitsLog2/8`-byte buffer per
 * (partition × group), never the values. Choose bitsLog2 per expected
 * per-group cardinality (the reference hardcoded 2^29; 2^20 ≈ 131 KB
 * buffers keep sub-percent collision error to ~10k distinct per group).
 *
 * This is deliberately NOT the default UV path — `countDistinct` (exact)
 * and `approx_count_distinct` (HLL++, smaller state) cover the standard
 * cases; the bitmap exists for reference-parity and for pipelines that
 * want deterministic, mergeable, fixed-size dedup state.
 */
class BitmapUv(bitsLog2: Int) extends Aggregator[Long, Array[Byte], Long]
    with Serializable {
  // >= 3: a sub-byte bitmap allocates zero bytes; <= 31: sizeBytes
  // (1 << 28 max) stays a positive Int and (h & mask).toInt non-negative
  require(bitsLog2 >= 3 && bitsLog2 <= 31,
    s"bitsLog2 must be in [3, 31], got $bitsLog2")
  private val sizeBytes = 1 << (bitsLog2 - 3)
  private val mask = (1L << bitsLog2) - 1L

  override def zero: Array[Byte] = new Array[Byte](sizeBytes)

  override def reduce(buf: Array[Byte], value: Long): Array[Byte] = {
    val h = (java.lang.Long.rotateLeft(value * 0x9E3779B97F4A7C15L, 31) & mask).toInt
    buf(h >>> 3) = (buf(h >>> 3) | (1 << (h & 7)).toByte).toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Long = {
    var bits = 0L
    var i = 0
    while (i < buf.length) { bits += java.lang.Integer.bitCount(buf(i) & 0xFF); i += 1 }
    bits
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BitmapUv {
  /** Column form: `df.groupBy(...).agg(BitmapUv.uv(col("user_id")))`. */
  def uv(value: Column, bitsLog2: Int = 20): Column =
    udaf(new BitmapUv(bitsLog2), Encoders.scalaLong).apply(value)
}
