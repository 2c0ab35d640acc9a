package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * pipeline extensions) is bound here: `queries` maps a name to a DataFrame
  * builder over a testdata sf directory; `oracleSql` carries the DuckDB
  * twin the driver hash-compares against. Names present in `queries` but
  * absent from `oracleSql` get the weaker rows-only check (approximate /
  * non-SQL-expressible operators only).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    // The flagship needs the int64-nanos parquet `ts` column readable even
    // when the driver's session didn't set the legacy nanos config.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Catalog.hotItems(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Catalog.oracles
}
