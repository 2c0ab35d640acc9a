package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.sources.{CsvSources, VersionedTable}

/**
 * The corpus maintenance loop, composed end-to-end from the shipped
 * primitives: JSONL drop arrives → corrupt lines branch off → in-batch +
 * against-corpus dedup → MERGE upsert into the versioned standing table
 * → profile gate on the result. Each step is its own tested operator;
 * this spec pins that they compose (schemas line up, nothing loses rows,
 * re-ingesting the same drop is a no-op).
 */
class CorpusMaintenanceSpec extends SparkSuite {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("ingest → dedup → upsert → profile, and re-ingest is a no-op") {
    val table = Files.createTempDirectory("corpus_table").toString

    // standing corpus: two docs
    VersionedTable.upsert(spark, table,
      Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text"),
      Seq("doc_id"))

    // a new drop: one corrupt line, one dup-of-corpus, one in-batch dup pair
    val drop = Files.createTempDirectory("drop")
    Files.write(drop.resolve("d.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 10, "text": "epsilon zeta"}""",
      """{"doc_id": 11, "text": "epsilon zeta"}""",   // in-batch dup of 10
      """{"doc_id": 12, "text": "alpha beta"}""",     // already in corpus
      """{"doc_id": 13, "text": "eta theta"}""",
      """corrupt {{{"""))
    val (good, bad) = CsvSources.readJsonlWithCorruptBranch(
      spark, drop.toString, schema)
    assert(good.count() === 4 && bad.count() === 1)

    val corpus = VersionedTable.read(spark, table).get
    val fresh = Dedup.incrementalDedup(good, corpus, "doc_id", "text")
    assert(fresh.select("doc_id").as[Long].collect().sorted === Array(10L, 13L),
      "in-batch dup keeps min id; corpus dup is dropped")

    val v = VersionedTable.upsert(spark, table, fresh, Seq("doc_id"))
    assert(v === 2L)
    val state = VersionedTable.read(spark, table).get
    assert(state.count() === 4L)

    // profile gate over the merged state
    val prof = Profiling.profile(state, Seq("doc_id", "text"))
      .filter(col("column") === "doc_id").head()
    assert(prof.getAs[Long]("n_rows") === 4L)
    assert(prof.getAs[Long]("n_distinct") === 4L)
    assert(prof.getAs[Long]("n_nulls") === 0L)

    // re-ingesting the same drop adds nothing (idempotent maintenance)
    val again = Dedup.incrementalDedup(good,
      VersionedTable.read(spark, table).get, "doc_id", "text")
    assert(again.count() === 0L)
  }
}
