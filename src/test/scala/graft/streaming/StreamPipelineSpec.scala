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

  test("importanceGateStream scores ≡ batch importanceWeights") {
    import graft.operators.Importance
    val target = benchDocs.toDF("doc_id", "text")
    val raw = corpusDocs.toDF("doc_id", "text")
    val batch = Importance.importanceWeights(raw, target, "doc_id", "text", buckets = 256)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamPipeline.importanceGateStream(
      in.toDF().toDF("doc_id", "text"), "text", raw, target, "text", buckets = 256)
    val q = out.writeStream.format("memory").queryName("imp")
      .outputMode("append").start()
    try {
      in.addData(corpusDocs)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("imp")
      .select("doc_id", "n_feats", "log_ratio")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (id, (nf, lr)) =>
      assert(nf === batch(id)._1, s"n_feats mismatch for $id")
      assert(math.abs(lr - batch(id)._2) < 1e-9,
        s"log_ratio mismatch for $id: stream $lr vs batch ${batch(id)._2}")
    }
  }

  test("chunkDocuments is stream-safe: stream chunks ≡ batch chunks") {
    import graft.operators.TextAnalysis
    val corpus = corpusDocs.toDF("doc_id", "text")
    val batch = TextAnalysis.chunkDocuments(corpus, "doc_id", "text", 4, 1)
      .as[(Long, Int, String, Int)].collect().toSet
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = TextAnalysis.chunkDocuments(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", 4, 1)
    val q = out.writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    try {
      in.addData(corpusDocs)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("chunks")
      .as[(Long, Int, String, Int)].collect().toSet
    assert(batch.exists(_._2 > 0), "fixture must produce a multi-chunk doc")
    assert(streamed === batch)
  }

  test("importanceGateStream threshold drops below-minimum docs in-stream") {
    val target = benchDocs.toDF("doc_id", "text")
    val raw = corpusDocs.toDF("doc_id", "text")
    val all = StreamPipeline.importanceGateStream(
      raw, "text", raw, target, "text", buckets = 256)
      .select("doc_id", "log_ratio")
      .as[(Long, Double)].collect().toMap // batch DataFrame drive of the same op
    val cut = all.values.toSeq.sorted.apply(all.size / 2)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamPipeline.importanceGateStream(
      in.toDF().toDF("doc_id", "text"), "text", raw, target, "text",
      buckets = 256, minLogRatio = Some(cut))
    val q = out.writeStream.format("memory").queryName("impcut")
      .outputMode("append").start()
    try {
      in.addData(corpusDocs)
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("impcut").select("doc_id").as[Long].collect().toSet
    assert(kept === all.filter(_._2 >= cut).keySet)
  }
}
