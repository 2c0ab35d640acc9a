package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.model.MarketUserBehavior

/**
 * Streaming sources and sinks — SURVEY.md §2.1 parity:
 *  S1 file replay, S2 socket, S3 deterministic generator, S4 kafka;
 *  K1 console, K4 retract/update sink. Flink side outputs (K2) are modeled
 *  as multiple filtered DataFrames over one lineage; the Redis bitmap sink
 *  (K3) is replaced by Spark-managed state (see Windows.approxDistinct).
 */
object StreamSources {

  /** S1 — file-replay stream: the batch CSV path read as a stream
    * (reference `env.readTextFile` replayed row-at-a-time,
    * HotItemApp.java:36). `maxFilesPerTrigger=1` keeps replay ordered. */
  def csvStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").csv(dir)

  /** JSONL file-arrival stream — the streaming twin of
    * [[graft.sources.CsvSources.readJsonlWithCorruptBranch]]: explicit
    * schema (no inference), PERMISSIVE parse with the corrupt column kept
    * inline so a downstream filter splits good/bad rows from ONE scan
    * (two readStream branches of the same dir would double-read it). */
  def jsonlStream(spark: SparkSession, dir: String,
                  schema: StructType): DataFrame =
    spark.readStream
      .schema(schema.add(StructField("_corrupt", StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("maxFilesPerTrigger", "1")
      .json(dir)

  /** S2 — socket text source (HotUrlApp.java:38,
    * OrderTimeoutAppWithState.java:27). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /**
   * S3 — deterministic generator source (MarketBehaviorSource.java:10-42:
   * random channel/behavior every 100 ms, processing-time stamped).
   * Spark-native: the `rate` source (one monotonically increasing `value`
   * per row, backpressure-aware, partitioned) mapped through seeded
   * xxhash64 picks — same value domains, reproducible for tests, and the
   * source parallelizes across executors unlike the reference's
   * single-thread loop.
   */
  def marketBehaviorSource(spark: SparkSession, rowsPerSecond: Int = 10,
                           seed: Long = 42L): Dataset[MarketUserBehavior] = {
    import spark.implicits._
    val behaviors = array(Seq("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL").map(lit): _*)
    val channels = array(Seq("app store", "wechat", "weibo", "tieba").map(lit): _*)
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(
        pmod(xxhash64(col("value"), lit(seed)), lit(1000000L)).as("userId"),
        element_at(behaviors, (pmod(xxhash64(col("value"), lit(seed + 1)), lit(4)) + 1).cast("int")).as("behavior"),
        element_at(channels, (pmod(xxhash64(col("value"), lit(seed + 2)), lit(4)) + 1).cast("int")).as("channel"),
        (col("timestamp").cast("double") * 1000).cast("long").as("timestamp"))
      .as[MarketUserBehavior]
  }

  /** Batch twin of [[marketBehaviorSource]] for tests/oracles: `n` rows with
    * explicit event times starting at `startMs`, same seeded value picks. */
  def marketBehaviorBatch(spark: SparkSession, n: Long, startMs: Long,
                          stepMs: Long = 100L, seed: Long = 42L): Dataset[MarketUserBehavior] = {
    import spark.implicits._
    val behaviors = array(Seq("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL").map(lit): _*)
    val channels = array(Seq("app store", "wechat", "weibo", "tieba").map(lit): _*)
    spark.range(n).select(
        pmod(xxhash64(col("id"), lit(seed)), lit(1000000L)).as("userId"),
        element_at(behaviors, (pmod(xxhash64(col("id"), lit(seed + 1)), lit(4)) + 1).cast("int")).as("behavior"),
        element_at(channels, (pmod(xxhash64(col("id"), lit(seed + 2)), lit(4)) + 1).cast("int")).as("channel"),
        (lit(startMs) + col("id") * stepMs).as("timestamp"))
      .as[MarketUserBehavior]
  }

  /** S4 — kafka source parity (declared in the reference's pom but never
    * instantiated, pom.xml:36-45). Standard options; requires the kafka
    * connector jars on the cluster classpath (`spark-sql-kafka` absent
    * from /opt/spark/jars — re-checked r16; smoke this against an
    * embedded broker the round the environment gains the jars). */
  def kafkaSource(spark: SparkSession, servers: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "topic", "partition", "offset", "timestamp")

  /** S4 sink side — kafka writer parity (value column required; key
    * optional). Like [[kafkaSource]], compile-level parity: the reference
    * declares but never instantiates its kafka dependency. */
  def kafkaSink(df: DataFrame, servers: String, topic: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)

  /** K1 — console sink (`stream.print(label)`). Append mode. */
  def consoleSink[T](ds: Dataset[T], label: String = ""): DataStreamWriter[T] =
    ds.writeStream.format("console").queryName(if (label.isEmpty) "console" else label)

  /** K4 — retract-stream sink (`toRetractStream`,
    * HotItemsWithSQLApp.java:65): Spark's update output mode emits the
    * changed rows per micro-batch — the (add/retract) pair collapses into
    * an upsert row. */
  def retractSink[T](ds: Dataset[T], label: String = "retract"): DataStreamWriter[T] =
    ds.writeStream.format("console").outputMode("update").queryName(label)

  /** Test/debug sink: in-memory table, returns the started query. */
  def memorySink[T](ds: Dataset[T], name: String,
                    outputMode: String = "append"): StreamingQuery =
    ds.writeStream.format("memory").queryName(name).outputMode(outputMode)
      .trigger(Trigger.AvailableNow()).start()
}
