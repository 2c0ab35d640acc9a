package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Malformed-input tolerance: the reference's positional parsers throw on
  * any bad line (SURVEY.md §1.2); the library routes bad rows to a branch
  * instead — no row lost, no job killed. */
class CorruptBranchSpec extends SparkSuite {

  import spark.implicits._

  test("readWithCorruptBranch splits typed rows from malformed raw lines") {
    val dir = Files.createTempDirectory("corrupt_csv")
    val f = dir.resolve("login.csv")
    Files.write(f, java.util.Arrays.asList(
      "1,86.226.15.75,success,1558430815",
      "not,a,valid,row",          // ip ok but userId/ts unparseable
      "2,83.149.11.115,fail,1558430826",
      "3,83.149.11.115,fail",     // missing column
      "garbage line"))
    val (good, bad) = CsvSources.readWithCorruptBranch(
      spark, f.toString, CsvSources.loginSchema)
    assert(good.count() === 2)
    assert(good.select("userId").as[Long].collect().sorted === Array(1L, 2L))
    val raws = bad.as[String].collect()
    assert(raws.length === 3)
    assert(raws.contains("garbage line"))
    assert(raws.contains("not,a,valid,row"))
    // every input row is in exactly one branch
    assert(good.count() + bad.count() === 5)
  }

  test("readJsonlWithCorruptBranch splits typed rows from malformed lines") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("corrupt_jsonl")
    val f = dir.resolve("docs.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour"}""",      // missing field -> null, still good
      """{"doc_id": "x", "text": "bad id type"}""", // type mismatch -> corrupt
      """not json at all""",
      """{"doc_id": 3, "text": "ok", "lang": "de"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType)))
    val (good, bad) = CsvSources.readJsonlWithCorruptBranch(
      spark, f.toString, schema)
    assert(good.count() === 3)
    assert(good.select("doc_id").as[Long].collect().sorted === Array(1L, 2L, 3L))
    assert(good.filter("doc_id = 2").select("lang").first().isNullAt(0),
      "absent JSON field must read as null, not corruption")
    val raws = bad.as[String].collect()
    assert(raws.length === 2)
    assert(raws.contains("not json at all"))
    assert(good.count() + bad.count() === 5)
  }

  test("jsonlStream delivers typed rows with the corrupt column inline") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("stream_jsonl")
    Files.write(dir.resolve("a.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "streamed"}""",
      """broken line""",
      """{"doc_id": 2, "text": "also streamed"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = graft.streaming.StreamSources.jsonlStream(
      spark, dir.toString, schema)
    val q = graft.streaming.StreamSources.memorySink(
      stream, "jsonl_stream_test")
    q.awaitTermination()
    val rows = spark.table("jsonl_stream_test")
    assert(rows.count() === 3)
    assert(rows.filter(col("_corrupt").isNull).count() === 2)
    assert(rows.filter(col("_corrupt").isNotNull)
      .select("_corrupt").as[String].collect() === Array("broken line"))
  }
}
