package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.TextAnalysis

/** Streaming pipeline ops ≡ their batch twins on the same documents. */
class StreamPipelineSpec extends SparkSuite {

  import spark.implicits._

  private val benchDocs = Seq(
    (100L, "alpha beta gamma delta"),
    (101L, "eval suite question text"))
  private val corpusDocs = Seq(
    (1L, "x alpha beta gamma y plus ordinary words to pass the filter"),
    (2L, "eval suite question text plus ordinary padding words here too"),
    (3L, "a perfectly clean document with enough ordinary words to pass"),
    (4L, "too short"))

  test("decontaminateStream ≡ batch contaminationCheck") {
    val bench = benchDocs.toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val batch = TextAnalysis.contaminationCheck(corpus, bench, "doc_id", "text", 3)
      .select("doc_id", "n_grams", "n_contaminated", "contamination_frac")
      .as[(Long, Long, Long, Double)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamPipeline.decontaminateStream(
      in.toDF().toDF("doc_id", "text"), "text", bench, "text", 3)
    val q = out.writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try {
      in.addData(corpusDocs)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("decon")
      .select("doc_id", "n_grams", "n_contaminated", "contamination_frac")
      .as[(Long, Long, Long, Double)].collect().toSet

    assert(batch.nonEmpty && batch.exists(_._3 > 0),
      "fixture must contain a contaminated doc")
    assert(streamed === batch)
  }

  test("ruleFilterStream keeps exactly the batch filter's keepers") {
    val corpus = corpusDocs.toDF("doc_id", "text")
    val batchKeepers = TextAnalysis.withRuleFilter(corpus, "text")
      .filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamPipeline.ruleFilterStream(in.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("rf")
      .outputMode("append").start()
    try {
      in.addData(corpusDocs)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("rf").select("doc_id").as[Long].collect().toSet

    assert(batchKeepers.nonEmpty && batchKeepers.size < corpusDocs.size,
      "fixture must exercise both keep and drop")
    assert(streamed === batchKeepers)
  }
}
