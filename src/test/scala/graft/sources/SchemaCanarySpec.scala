package graft.sources

import graft.SparkSuite

/** Testdata schema canary. The driver regenerates `/root/testdata`
  * between rounds and its physical schemas have DRIFTED before —
  * round 8 opened with `events.ts` silently switched from INT64
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS), which surfaced as thirty
  * cryptic DATATYPE_MISMATCH gate failures. This spec pins the
  * NORMALIZED schema every query is written against (after the
  * `Tables.*` source-boundary coercions), one table at a time, so the
  * next drift fails here with a message naming the table and column
  * instead of detonating across the gate registry. A failure means:
  * extend the source-boundary normalization in `Tables` (as
  * `Tables.events` does for `ts`), not the queries.
  */
class SchemaCanarySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def normalized(name: String): Seq[(String, String)] =
    Tables.load(spark, dir, name) match {
      case _ if name == "events" =>
        Tables.events(spark, dir).schema.fields.toSeq
          .map(f => f.name -> f.dataType.simpleString)
      case df =>
        df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
    }

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // ts: whatever the parquet physical type, Tables.events normalizes
    // to epoch-nanos BIGINT — the contract all event-time queries and
    // the DuckDB oracle CTE (epoch_ns) are written against
    "events" -> Seq("event_id" -> "bigint", "ts" -> "bigint",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  Tables.names.foreach { t =>
    test(s"$t: normalized schema matches the contract the queries assume") {
      assert(normalized(t) === expected(t),
        s"testdata schema for '$t' drifted — normalize it at the source " +
          "boundary in Tables (see Tables.events), then update this canary")
    }
  }

  // --- end-to-end: the events normalization against SELF-GENERATED
  // fixtures of every physical encoding the generator has shipped (or
  // could plausibly ship), independent of what /root/testdata currently
  // holds. 2021-03-01T00:00:01Z = 1614556801 s.
  private val tsSec = 1614556801L

  private def writeEventsFixture(encoding: String): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files
      .createTempDirectory(s"canary_$encoding").toString
    val base = Seq((1L, tsSec, 7L, "view", 1.5, "{}"))
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
    val withTs = encoding match {
      case "int64_nanos" => // the nanosAsLong read shape: plain bigint nanos
        base.withColumn("ts", col("sec") * expr("1000000000"))
      case "string_drift" =>
        base.withColumn("ts", col("sec").cast("string"))
      case tsType => // timestamp column; physical type from the writer conf
        spark.conf.set("spark.sql.parquet.outputTimestampType", tsType)
        base.withColumn("ts", timestamp_seconds(col("sec")))
    }
    try withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$out/events.parquet")
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    out
  }

  Seq("int64_nanos", "TIMESTAMP_MICROS", "INT96").foreach { enc =>
    test(s"events.ts $enc encoding normalizes to the epoch-nanos contract") {
      val dir = writeEventsFixture(enc)
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType.simpleString === "bigint")
      assert(df.select("ts").head().getLong(0) === tsSec * 1000000000L,
        s"wrong nanos value through the $enc normalization")
    }
  }

  test("events.ts with an un-normalizable encoding fails loudly at the boundary") {
    val dir = writeEventsFixture("string_drift")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("events.ts drifted"))
    assert(e.getMessage.contains("string"))
  }
}
