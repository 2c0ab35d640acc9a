package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Table loaders for the driver's synthetic TPC-H-ish parquet tables
 * (TESTDATA.md) and schema-explicit CSV readers for the reference's own
 * fixture files (FIXTURES.md; parsers cited per schema in model/Models.scala).
 *
 * Scale notes: parquet scans are the only leaf in every batch plan — column
 * pruning and predicate pushdown reach the scan for free as long as nothing
 * opaque (UDF on a partition column, RDD hop) sits between the filter and the
 * read. At 100 TB the same code works: tune
 * `spark.sql.files.maxPartitionBytes` for split sizing; no collect anywhere.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.ts` normalized to INT64 epoch-nanos regardless of the
    * parquet physical type. The generator has shipped it both as INT64
    * TIMESTAMP(NANOS) (read as BIGINT under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ); downstream event-time arithmetic
    * (`Catalog.events`' integer usec/sec derivation and its DuckDB twin,
    * which uses `epoch_ns(ts)` — valid for both TIMESTAMP and
    * TIMESTAMP_NS) is written against the nanos contract, so the
    * coercion happens once here at the source boundary. The NTZ→instant
    * cast is identity under the session's pinned UTC timezone. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampType | TimestampNTZType => raw.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts drifted to unsupported type ${other.simpleString}: " +
          "expected INT64 epoch-nanos (bigint under " +
          "spark.sql.legacy.parquet.nanosAsLong) or a timestamp encoding " +
          "(MICROS/INT96). Extend the normalization HERE deliberately — " +
          "don't let queries see the drifted type (SchemaCanarySpec pins " +
          "this contract)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view for the `spark.sql` surface
    * (reference's HotItemsWithSQLApp-style entry point, SURVEY.md §2.5). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/**
 * Bucketed-table plumbing for the 100 TB path: a fact table written
 * `bucketBy(join key)` joins other tables bucketed on the same key with NO
 * exchange on either side — the shuffle is paid once at write time and
 * amortized over every subsequent join/aggregation on that key. This is the
 * Spark-native equivalent of the reference's implicit "keyBy once, keep the
 * partitioning" topology (a Flink keyed stream stays partitioned;
 * a Spark table must be bucketed to persist the partitioning).
 */
object BucketedTables {

  /** Write `df` as a bucketed+sorted managed table (bucketing requires the
    * table catalog; `path` keeps the data at an explicit location). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, keyCol: String, moreKeys: String*): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol, moreKeys: _*)
      .sortBy(keyCol, moreKeys: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned parquet write — the other pay-once layout:
    * downstream filters on the partition columns become directory pruning
    * (zero I/O for untouched partitions) at any scale. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Spread a 16-bit value's bits to even positions (Morton interleave
    * half): pure shift/mask arithmetic — whole-stage codegen'd. */
  private def spreadBits16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /**
   * Z-order (Morton-curve) clustered write — multi-dimensional data
   * layout for the 100 TB scan path: rows are range-partitioned and
   * sorted by the bit-interleave of the two columns' normalized 16-bit
   * positions, so every output file covers a small RECTANGLE of the
   * (a, b) value space instead of a thin stripe of one column. Parquet
   * row-group min/max stats then prune scans filtered on EITHER column
   * (or both) — the layout answer to "partition by which column?" being
   * the wrong question when queries filter on two.
   *
   * Cost model: one (min, max) aggregate per column (broadcast — no
   * quantile sketch needed for the curve, only for balance, which the
   * range partitioner on the z-value provides), one range exchange, one
   * in-partition sort — the same pay-once shape as [[writeBucketed]].
   * Value skew degrades rectangle balance, not correctness; for heavy
   * skew pre-rank the columns before calling.
   */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val bounds = df.agg(
      min(col(colA)).cast("double").as("_minA"), max(col(colA)).cast("double").as("_maxA"),
      min(col(colB)).cast("double").as("_minB"), max(col(colB)).cast("double").as("_maxB"))
    def norm16(c: Column, lo: Column, hi: Column): Column =
      when(hi > lo, floor((c.cast("double") - lo) / (hi - lo) * 65535.0))
        .otherwise(lit(0.0)).cast("long")
    val z = df.join(broadcast(bounds))
      .withColumn("_z",
        spreadBits16(norm16(col(colA), col("_minA"), col("_maxA")))
          .bitwiseOR(shiftleft(
            spreadBits16(norm16(col(colB), col("_minB"), col("_maxB"))), 1)))
      .drop("_minA", "_maxA", "_minB", "_maxB")
    z.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Small-file compaction — the maintenance op every long-lived table
   * needs: streaming sinks, incremental appends, and fine-grained
   * partitioned writes accumulate kilobyte files whose per-file open /
   * footer-read / task-schedule overhead comes to dominate the scan.
   * Sizes the rewrite from the ACTUAL on-disk bytes (filesystem content
   * summary, not a row-count guess) to `ceil(bytes / targetBytes)`
   * output files. `sortCol` optionally restores clustering while the
   * data is being rewritten anyway — compaction is the cheapest moment
   * to re-sort, and the range partition makes every output file a
   * disjoint key range (parquet min/max pruning works again). The
   * rewrite is exactly one exchange either way. Returns the output file
   * count.
   */
  def compact(spark: SparkSession, srcPath: String, dstPath: String,
              targetBytes: Long = 128L << 20,
              sortCol: Option[String] = None): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(srcPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // in-place compaction would read and overwrite the same files —
    // compare fully-qualified paths so differing spellings still match
    require(fs.makeQualified(hPath) !=
        fs.makeQualified(new org.apache.hadoop.fs.Path(dstPath)),
      "compact to a NEW directory, then swap — in-place compaction " +
        "overwrites the files it is reading")
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(srcPath)
    val out = sortCol match {
      case Some(c) =>
        df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(nFiles)
    }
    out.write.mode("overwrite").parquet(dstPath)
    nFiles
  }
}

/**
 * CSV readers with hand-declared schemas — the Spark-native equivalent of the
 * reference's positional `String.split` parsers (S1/P1 in SURVEY.md §2; e.g.
 * HotItemApp.java:37-44). Explicit schema + no header + permissive-off keeps
 * the scan vectorized and lets Catalyst prune columns at the reader.
 */
object CsvSources {

  val userBehaviorSchema: StructType = StructType(Seq(
    StructField("userId", LongType, nullable = false),
    StructField("itemId", LongType, nullable = false),
    StructField("categoryId", IntegerType, nullable = false),
    StructField("behavior", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  val adClickSchema: StructType = StructType(Seq(
    StructField("userId", LongType, nullable = false),
    StructField("adId", LongType, nullable = false),
    StructField("province", StringType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  val loginSchema: StructType = StructType(Seq(
    StructField("userId", LongType, nullable = false),
    StructField("ip", StringType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  val orderSchema: StructType = StructType(Seq(
    StructField("orderId", LongType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("txId", StringType, nullable = true), // "" on create rows
    StructField("eventTime", LongType, nullable = false)))

  val receiptSchema: StructType = StructType(Seq(
    StructField("txId", StringType, nullable = false),
    StructField("payChannel", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  private def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "false").csv(path)

  /** Epoch-seconds column → event-time timestamp column `ts` (reference
    * multiplies by 1000 in its extractors, HotItemApp.java:48). */
  def withEventTime(df: DataFrame, secondsCol: String): DataFrame =
    df.withColumn("ts", timestamp_seconds(col(secondsCol)))

  def userBehavior(spark: SparkSession, path: String): DataFrame =
    withEventTime(read(spark, path, userBehaviorSchema), "timestamp")

  def adClicks(spark: SparkSession, path: String): DataFrame =
    withEventTime(read(spark, path, adClickSchema), "timestamp")

  def logins(spark: SparkSession, path: String): DataFrame =
    withEventTime(read(spark, path, loginSchema), "timestamp")

  def orders(spark: SparkSession, path: String): DataFrame =
    withEventTime(read(spark, path, orderSchema), "eventTime")
      .na.fill("", Seq("txId"))

  def receipts(spark: SparkSession, path: String): DataFrame =
    withEventTime(read(spark, path, receiptSchema), "timestamp")

  /**
   * Tolerant CSV read with a malformed-row branch — the reference's
   * positional parsers THROW on any malformed line (SURVEY.md §1.2: "a
   * malformed row throws", e.g. HotItemApp.java:37-44's bare
   * Long.parseLong); at 100 TB a single bad row must not kill the job.
   * PERMISSIVE mode + `columnNameOfCorruptRecord` keeps every input row:
   * `good` carries the typed rows, `bad` the raw text of rows that failed
   * to parse (the batch shape of the reference's side-output pattern K2 —
   * route, don't crash). `spark.read.csv` can't put the corrupt column
   * non-last, so the schema is extended, then split.
   */
  def readWithCorruptBranch(spark: SparkSession, path: String,
                            schema: StructType): (DataFrame, DataFrame) = {
    val extended = schema.add(StructField("_corrupt", StringType, nullable = true))
    val all = spark.read.schema(extended)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
      .cache() // one scan feeds both branches
    val good = all.filter(col("_corrupt").isNull).drop("_corrupt")
    val bad = all.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("raw"))
    (good, bad)
  }

  /**
   * Schema-explicit JSONL read (one JSON object per line) — the ingestion
   * format most large text-corpus pipelines exchange. Schema is always
   * explicit: at 100 TB, `inferSchema` means an extra full scan and a
   * schema that drifts with the sampled files. Same malformed-row
   * discipline as [[readWithCorruptBranch]]: PERMISSIVE mode keeps every
   * input line, `good` carries typed rows, `bad` the raw text of lines
   * that failed to parse (missing required fields parse as nulls — JSON
   * is self-describing, absence is not corruption).
   */
  def readJsonlWithCorruptBranch(spark: SparkSession, path: String,
                                 schema: StructType): (DataFrame, DataFrame) = {
    val extended = schema.add(StructField("_corrupt", StringType, nullable = true))
    val all = spark.read.schema(extended)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .cache() // one scan feeds both branches
    val good = all.filter(col("_corrupt").isNull).drop("_corrupt")
    val bad = all.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("raw"))
    (good, bad)
  }

  /** Apache access log: space-delimited text, date field parsed with the
    * reference's format (HotUrlApp.java:40-44 → dd/MM/yyyy:HH:mm:ss). */
  def apacheLog(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    raw.select(split(col("value"), "\\s+").as("f"))
      .select(
        col("f").getItem(0).as("ip"),
        col("f").getItem(1).as("userId"),
        to_timestamp(col("f").getItem(3), "dd/MM/yyyy:HH:mm:ss").as("ts"),
        col("f").getItem(5).as("method"),
        col("f").getItem(6).as("url"))
  }
}
