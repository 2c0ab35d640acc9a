package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Versioned parquet table with MERGE-style upsert — the maintenance
 * primitive for a standing corpus table on plain parquet (no table
 * format required): each write lands in a new `v{n}` directory and
 * readers only accept versions whose directory contains `_SUCCESS`
 * (Spark writes it on successful job commit), so a crash mid-write can
 * never shadow the last intact version — the same commit-marker
 * discipline as the streaming top-N state store.
 *
 * The upsert itself is anti-join + union, not a full-outer merge: target
 * rows whose key appears in the update batch are dropped (one shuffle of
 * the key columns), then the updates are unioned in. At 100 TB the
 * exchange carries the standing table once per upsert — batch updates
 * into drops accordingly, or partition the table and upsert only touched
 * partitions. Old versions stay readable until [[vacuum]] — free time
 * travel for audits and rollback.
 *
 * Single-writer: version numbers are assigned by listing, so concurrent
 * upserts to one table can race to the same v{n}. Serialize writers per
 * table (the normal shape for a maintenance job); readers are always
 * safe — they only ever see committed versions.
 */
object VersionedTable {

  private val VersionRe = "^v(\\d+)$".r

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions (dirs named v{n} containing _SUCCESS), ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val base = new Path(path)
    if (!f.exists(base)) return Nil
    f.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionRe(n) if f.exists(new Path(s.getPath, "_SUCCESS")) =>
          Some(n.toLong)
        case _ => None
      })
      .sorted
  }

  /** Read the newest committed version; None for an empty/absent table. */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    versions(spark, path).lastOption.map { v =>
      spark.read.parquet(s"$path/v$v")
    }

  /**
   * MERGE-style upsert: rows of `updates` replace target rows sharing
   * their key; all other target rows carry over. Writes the merged state
   * as the next version and returns its number. First call seeds v1.
   */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keys: Seq[String]): Long = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val next = versions(spark, path).lastOption.getOrElse(0L) + 1
    val merged = read(spark, path) match {
      case Some(current) =>
        current.join(updates.select(keys.map(col): _*).distinct(),
          keys, "left_anti").unionByName(updates)
      case None => updates
    }
    merged.write.mode("overwrite").parquet(s"$path/v$next")
    next
  }

  /** Drop all but the newest `keep` committed versions (and any
    * uncommitted debris older than the newest committed one). */
  def vacuum(spark: SparkSession, path: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least one version")
    val vs = versions(spark, path)
    val f = fs(spark, path)
    vs.dropRight(keep).foreach { v =>
      f.delete(new Path(s"$path/v$v"), true)
    }
  }
}
