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
}
