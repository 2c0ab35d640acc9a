package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with a typed metadata struct; decode / feature-extract /
 * resize / frame-sample run as partition-local batch functions.
 *
 * The actual codec step is STUBBED (no image/audio libraries in this
 * environment): `FakeCodec.decode` below is a deterministic placeholder that
 * derives a feature vector from the payload bytes. Everything around it —
 * the schema contract, the typed `Dataset` hop, the per-partition batching,
 * the binary-safe shuffle-free pipeline — is real and is the part that
 * matters at 100 TB:
 *  - decode is map-only (`mapPartitions`), so a 1000-executor cluster
 *    decodes ~100 TB with zero shuffle; only extracted features (KBs per
 *    item, not the payload) flow into downstream joins/aggregations;
 *  - payload bytes are never used as a grouping key — metadata and digests
 *    are extracted first and carry all downstream keying.
 */
object Multimodal {

  /** One multimodal item: payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      width: Int,    // pixels (image/video) or 0
      height: Int,
      sample_rate: Int, // Hz (audio) or 0
      n_frames: Int)    // video frames / audio samples, 1 for still images

  /** Decoded features: fixed-size embedding + summary stats per item. */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      digest: Long,
      features: Array[Float])

  /**
   * STUB codec — deterministic fake in place of a real image/audio decoder
   * (the real implementation would wrap e.g. javax.imageio / ffmpeg here and
   * keep the exact same signature: bytes in, fixed-width features out).
   */
  object FakeCodec {
    val featureDim = 16
    def decode(payload: Array[Byte]): Array[Float] = {
      // deterministic byte-derived "embedding": per-bucket byte sums, L1
      // normalized. Stands in for decode→resize→pool.
      val acc = new Array[Long](featureDim)
      var i = 0
      while (i < payload.length) {
        acc(i % featureDim) += (payload(i) & 0xFF)
        i += 1
      }
      val total = math.max(1L, acc.sum)
      acc.map(v => v.toFloat / total.toFloat)
    }
    def digest64(payload: Array[Byte]): Long = {
      var h = 1125899906842597L // FNV-ish rolling digest
      var i = 0
      while (i < payload.length) { h = h * 31 + (payload(i) & 0xFF); i += 1 }
      h
    }
  }

  /** Wrap a text/binary column into the MediaItem contract (used by tests
    * and the demo query: documents.text bytes stand in for payloads). */
  def itemsFromBinary(df: DataFrame, idCol: String, binCol: String,
                      modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(binCol).cast("binary").as("payload"),
      lit(0).as("width"), lit(0).as("height"),
      lit(0).as("sample_rate"), lit(1).as("n_frames"))

  /** Partition-local decode + feature extraction: the Spark-side shape of a
    * Pandas-UDF/mapInPandas batch decode, as a typed mapPartitions. */
  def extractFeatures(spark: SparkSession, items: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    items.as[MediaItem].mapPartitions { it =>
      it.map { m =>
        MediaFeatures(
          media_id = m.media_id,
          modality = m.modality,
          n_bytes = m.payload.length.toLong,
          digest = FakeCodec.digest64(m.payload),
          features = FakeCodec.decode(m.payload))
      }
    }
  }

  /** One sampled frame: parent item + frame index + the frame's payload
    * slice (stub: fixed-size byte windows stand in for decoded frames). */
  final case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /**
   * Frame sampling: every `everyN`-th frame of each item, payload sliced
   * into fixed `frameSize`-byte windows (STUB for a real demuxer, which
   * would keep this exact signature: item in, frames out). Map-only —
   * a generator-shaped `flatMap` per partition; downstream sees frames,
   * never the whole payload, so per-frame processing parallelizes past
   * item granularity.
   */
  def sampleFrames(spark: SparkSession, items: DataFrame,
                   everyN: Int, frameSize: Int = 256): Dataset[MediaFrame] = {
    import spark.implicits._
    items.as[MediaItem].flatMap { m =>
      val nFrames = math.max(1, m.payload.length / frameSize)
      (0 until nFrames by everyN).map { idx =>
        val from = idx * frameSize
        val until = math.min(from + frameSize, m.payload.length)
        MediaFrame(m.media_id, idx, java.util.Arrays.copyOfRange(m.payload, from, until))
      }
    }
  }

  /**
   * Resize/re-encode pass (STUB codec, real plumbing): fixed-size output
   * per item derived deterministically from the payload — the shape of a
   * decode→resize→encode stage. Runs as a typed map, so the pipeline is a
   * single map-only stage with no shuffle and no driver involvement.
   */
  def resizePayloads(spark: SparkSession, items: DataFrame,
                     targetBytes: Int = 64): DataFrame = {
    import spark.implicits._
    items.as[MediaItem].map { m =>
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < m.payload.length) {
        out(i % targetBytes) = (out(i % targetBytes) ^ m.payload(i)).toByte
        i += 1
      }
      (m.media_id, m.modality, out)
    }.toDF("media_id", "modality", "resized")
  }

  /** Expression-only metadata pass (no decode): byte length + md5 — the
    * always-on cheap path that stays in WholeStageCodegen and is
    * DuckDB-checkable. */
  def payloadStats(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      length(col(binCol).cast("binary")).as("n_bytes"),
      md5(col(binCol).cast("binary")).as("digest_md5"))
}
