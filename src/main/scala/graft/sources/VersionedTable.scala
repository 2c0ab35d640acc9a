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
 * Writer mutual exclusion is ENFORCED on HDFS-like filesystems: before
 * writing v{n} a writer must create the marker file `_lock_v{n}` with
 * `FileSystem.create(overwrite = false)`, which is an atomic
 * create-if-absent on HDFS (and filesystems with HDFS create semantics).
 * A concurrent upsert that lost the race to the same version number
 * fails loudly with [[ConcurrentWriteException]] instead of silently
 * racing to one directory; the caller retries, re-listing picks up the
 * winner's version. CAVEAT — on object stores (S3A) and on Hadoop's
 * `LocalFileSystem`, create-no-overwrite is a non-atomic check-then-
 * create, so two writers can in principle both acquire the lock; there,
 * treat the lock as best-effort and serialize writers externally (a
 * scheduler lock, or S3 conditional-PUT via `fs.s3a.create.conditional`
 * where available). Readers are always safe on every filesystem — they
 * only ever see committed (`_SUCCESS`-bearing) versions, and the
 * post-lock re-list below turns the worst lost-lock outcome into a
 * loud failure rather than a silent lost write.
 *
 * Update batches must be key-unique (MERGE semantics are undefined for
 * a batch carrying two rows of one key) — enforced with a count vs
 * distinct-count check, one tiny aggregate on the update side. Rows
 * with a null in any key column never match the anti-join (SQL null
 * semantics) and therefore always APPEND; pre-filter them if that is
 * not intended.
 */
object VersionedTable {

  /** A concurrent upsert lost the version-number CAS — retry to rebase
    * on the winner's version. */
  final class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  private val VersionRe = "^v(\\d+)$".r
  private val LockRe = "^_lock_v(\\d+)$".r

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

  /** Time travel: read a specific committed version. Throws
    * `NoSuchElementException` for a version that was never committed or
    * was vacuumed away — reading a half-written or reclaimed directory
    * silently would defeat the commit-marker contract. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    if (!versions(spark, path).contains(version))
      throw new NoSuchElementException(
        s"version $version of $path is not committed (or was vacuumed); " +
          s"available: ${versions(spark, path).mkString(", ")}")
    spark.read.parquet(s"$path/v$version")
  }

  /**
   * Snapshot diff between two committed versions: one row per key whose
   * state changed, with `change` ∈ added / removed / changed and the
   * before/after non-key columns as structs (null on the absent side).
   * The audit primitive between corpus builds — "what did this ingest
   * round actually do" without replaying the upserts.
   *
   * Scale: one full-outer join on the key columns — both sides are
   * single-version reads (no history scan), the join is the planner's
   * choice (broadcast when a side fits), and unchanged rows are filtered
   * before anything leaves the join. Column sets must match (the table
   * is schema-stable by construction; upsert unions by position).
   */
  def diff(spark: SparkSession, path: String, fromVersion: Long,
           toVersion: Long, keyCols: Seq[String]): DataFrame = {
    val before = readVersion(spark, path, fromVersion)
    val after = readVersion(spark, path, toVersion)
    val nonKey = before.columns.toSeq.filterNot(keyCols.contains)
    val b = before.select(
      keyCols.map(col) :+ struct(nonKey.map(col): _*).as("before"): _*)
    val a = after.select(
      keyCols.map(col) :+ struct(nonKey.map(col): _*).as("after"): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn("change",
        when(col("before").isNull, lit("added"))
          .when(col("after").isNull, lit("removed"))
          .when(col("before") =!= col("after"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change") :+ col("before")
        :+ col("after"): _*)
  }

  /**
   * MERGE-style upsert: rows of `updates` replace target rows sharing
   * their key; all other target rows carry over. Writes the merged state
   * as the next version and returns its number. First call seeds v1.
   * Throws [[ConcurrentWriteException]] if another writer claimed the
   * same version number first (caller should retry), and
   * `IllegalArgumentException` if the update batch repeats a key.
   */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keys: Seq[String]): Long = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val keyCols = keys.map(col)
    val (nUpd, nKeys) = {
      val r = updates.agg(count(lit(1)),
        count_distinct(keyCols.head, keyCols.tail: _*)).head()
      (r.getLong(0), r.getLong(1))
    }
    // count_distinct skips null-key rows; those are APPEND rows by the
    // documented null contract, not duplicates — exclude them from the
    // uniqueness check rather than failing on them.
    val nNullKey = nUpd - updates.na.drop(keys).count()
    require(nUpd - nNullKey == nKeys,
      s"upsert batch repeats a key: ${nUpd - nNullKey} non-null-key rows, " +
        s"$nKeys distinct keys — pre-dedupe the batch (MERGE is undefined " +
        "for a batch carrying two rows of one key)")
    upsertAt(spark, path, updates, keys,
      versions(spark, path).lastOption.getOrElse(0L) + 1)
  }

  /** [[upsert]] with the version number precomputed — the seam between
    * "compute `next` from a listing" and "CAS the lock + write", kept
    * package-private so the stale-writer race (compute, stall while
    * others commit and vacuum, then acquire) is testable without a
    * timing-dependent two-thread interleave. */
  private[sources] def upsertAt(spark: SparkSession, path: String,
                                updates: DataFrame, keys: Seq[String],
                                next: Long): Long = {
    val keyCols = keys.map(col)
    val f = fs(spark, path)
    f.mkdirs(new Path(path))
    val lock = new Path(path, s"_lock_v$next")
    // Atomic create-if-absent IS the version-number CAS: exactly one
    // writer per version number wins; losers fail loudly here.
    try f.create(lock, false).close()
    catch { case _: java.io.IOException =>
      throw new ConcurrentWriteException(
        s"another writer holds v$next of $path — retry to rebase on its " +
          "committed result")
    }
    // Re-list AFTER acquiring the lock: a writer that computed `next`,
    // stalled while others committed vNext..vNext+k and vacuum() deleted
    // vNext, could otherwise create _lock_vNext, find no vNext/_SUCCESS
    // and write BELOW the newest version — readers (max version) would
    // never see the merge. Any committed version >= next means our base
    // is stale, so fail loudly instead of losing the write.
    if (versions(spark, path).lastOption.exists(_ >= next)) {
      f.delete(lock, false)
      throw new ConcurrentWriteException(
        s"v$next of $path is stale — a version >= $next was committed " +
          "concurrently; retry to rebase on it")
    }
    try {
      val merged = read(spark, path) match {
        case Some(current) =>
          current.join(updates.select(keyCols: _*).na.drop().distinct(),
            keys, "left_anti").unionByName(updates)
        case None => updates
      }
      merged.write.mode("overwrite").parquet(s"$path/v$next")
      next
    } finally f.delete(lock, false)
  }

  /** Drop all but the newest `keep` committed versions, plus crashed-write
    * debris: uncommitted (no `_SUCCESS`) v-dirs and orphaned `_lock_v*`
    * files strictly below the newest committed version — an in-flight
    * writer is always AT or above it, so nothing live is touched. */
  def vacuum(spark: SparkSession, path: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least one version")
    val vs = versions(spark, path)
    val f = fs(spark, path)
    vs.dropRight(keep).foreach { v =>
      f.delete(new Path(s"$path/v$v"), true)
    }
    vs.lastOption.foreach { newest =>
      val committed = vs.toSet
      f.listStatus(new Path(path)).toSeq.foreach { s =>
        s.getPath.getName match {
          case VersionRe(n) if n.toLong < newest && !committed(n.toLong) =>
            f.delete(s.getPath, true)
          case LockRe(n) if n.toLong < newest =>
            f.delete(s.getPath, false)
          case _ => ()
        }
      }
    }
  }
}
