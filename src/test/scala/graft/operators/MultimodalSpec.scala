package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Multimodal plumbing: schema contract, deterministic stub codec,
  * frame sampling, resize — all map-only (asserted on the plan). */
class MultimodalSpec extends SparkSuite {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val items =
    Multimodal.itemsFromBinary(Tables.documents(spark, sfDir), "doc_id", "text", "image")

  test("extractFeatures: deterministic, fixed-width, L1-normalized") {
    val f1 = Multimodal.extractFeatures(spark, items).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, items).collect().sortBy(_.media_id)
    assert(f1.map(_.digest).toSeq === f2.map(_.digest).toSeq)
    assert(f1.forall(_.features.length === Multimodal.FakeCodec.featureDim))
    assert(f1.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
  }

  test("sampleFrames: every-Nth fixed-size slices, map-only plan") {
    val frames = Multimodal.sampleFrames(spark, items, everyN = 2, frameSize = 64)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "frame sampling must not shuffle")
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.frame_idx % 2 == 0))
    assert(rows.forall(_.frame_bytes.length <= 64))
    // items with payload >= 128 bytes yield more than one sampled frame
    assert(rows.groupBy(_.media_id).exists(_._2.length > 1))
  }

  test("resizePayloads: fixed target size per item") {
    val resized = Multimodal.resizePayloads(spark, items, targetBytes = 32)
    val rows = resized.select(col("media_id"), length(col("resized")).as("n"))
      .as[(Long, Int)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 === 32))
  }
}
