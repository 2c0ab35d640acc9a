package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Versioned upsert table: MERGE semantics, commit-marker gating, time
  * travel, vacuum. */
class VersionedTableSpec extends SparkSuite {

  import spark.implicits._

  test("upsert replaces by key, carries others, and versions are readable") {
    val path = Files.createTempDirectory("vt").toString
    assert(VersionedTable.read(spark, path).isEmpty)

    val v1 = VersionedTable.upsert(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "x"), Seq("id"))
    assert(v1 === 1L)
    val v2 = VersionedTable.upsert(spark, path,
      Seq((2L, "B"), (4L, "d")).toDF("id", "x"), Seq("id"))
    assert(v2 === 2L)

    val now = VersionedTable.read(spark, path).get
      .as[(Long, String)].collect().toSet
    assert(now === Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    // time travel: v1 still intact
    assert(spark.read.parquet(s"$path/v1").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("readVersion time-travels to committed versions only") {
    val path = Files.createTempDirectory("vt_tt").toString
    VersionedTable.upsert(spark, path,
      Seq((1L, "a")).toDF("id", "x"), Seq("id"))
    VersionedTable.upsert(spark, path,
      Seq((1L, "A")).toDF("id", "x"), Seq("id"))
    assert(VersionedTable.readVersion(spark, path, 1L)
      .as[(Long, String)].head() === ((1L, "a")))
    assert(VersionedTable.readVersion(spark, path, 2L)
      .as[(Long, String)].head() === ((1L, "A")))
    intercept[NoSuchElementException] {
      VersionedTable.readVersion(spark, path, 3L)
    }
  }

  test("diff reports added/removed/changed and filters unchanged rows") {
    val path = Files.createTempDirectory("vt_diff").toString
    VersionedTable.upsert(spark, path,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("id", "x", "n"), Seq("id"))
    // replace 2, add 4; 1 and 3 carry over unchanged
    VersionedTable.upsert(spark, path,
      Seq((2L, "B", 21L), (4L, "d", 40L)).toDF("id", "x", "n"), Seq("id"))

    val d = VersionedTable.diff(spark, path, 1L, 2L, Seq("id"))
    val changes = d.select($"id", $"change").as[(Long, String)].collect().toMap
    assert(changes === Map(2L -> "changed", 4L -> "added"))
    val row2 = d.filter($"id" === 2L).head()
    assert(row2.getStruct(2).getString(0) === "b" &&
      row2.getStruct(3).getString(0) === "B")

    // reverse diff flips added to removed
    val rev = VersionedTable.diff(spark, path, 2L, 1L, Seq("id"))
      .select($"id", $"change").as[(Long, String)].collect().toMap
    assert(rev === Map(2L -> "changed", 4L -> "removed"))
  }

  test("uncommitted version directories are invisible to readers") {
    val path = Files.createTempDirectory("vt_commit").toString
    VersionedTable.upsert(spark, path,
      Seq((1L, "a")).toDF("id", "x"), Seq("id"))
    // simulate a crash mid-write of v99: data present, no _SUCCESS
    val bad = new java.io.File(s"$path/v99"); bad.mkdirs()
    Seq((9L, "junk")).toDF("id", "x").write.mode("overwrite")
      .parquet(s"$path/v99_tmp")
    new java.io.File(s"$path/v99_tmp").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => Files.move(f.toPath, new java.io.File(bad, f.getName).toPath))
    assert(VersionedTable.versions(spark, path) === Seq(1L),
      "v99 without _SUCCESS must not be a committed version")
    assert(VersionedTable.read(spark, path).get
      .as[(Long, String)].collect().toSet === Set((1L, "a")))
    // version numbers come from COMMITTED versions only: the next upsert
    // writes v2, ignoring the uncommitted v99 debris entirely
    val next = VersionedTable.upsert(spark, path,
      Seq((2L, "b")).toDF("id", "x"), Seq("id"))
    assert(next === 2L, "uncommitted debris must not advance the version counter")
  }

  test("concurrent writer to the same version fails loudly (lock CAS)") {
    val path = Files.createTempDirectory("vt_cas").toString
    VersionedTable.upsert(spark, path,
      Seq((1L, "a")).toDF("id", "x"), Seq("id"))
    // another writer already holds the v2 lock
    new java.io.File(s"$path/_lock_v2").createNewFile()
    val e = intercept[VersionedTable.ConcurrentWriteException] {
      VersionedTable.upsert(spark, path,
        Seq((2L, "b")).toDF("id", "x"), Seq("id"))
    }
    assert(e.getMessage.contains("v2"))
    // winner finishes and releases: the retry succeeds and sees both states
    new java.io.File(s"$path/_lock_v2").delete()
    assert(VersionedTable.upsert(spark, path,
      Seq((2L, "b")).toDF("id", "x"), Seq("id")) === 2L)
    // and a lock left by a writer that committed + vacuumed its lock late:
    // the _SUCCESS re-check still refuses to double-write
  }

  test("upsert rejects a batch that repeats a key; null keys append") {
    val path = Files.createTempDirectory("vt_dup").toString
    intercept[IllegalArgumentException] {
      VersionedTable.upsert(spark, path,
        Seq((1L, "a"), (1L, "b")).toDF("id", "x"), Seq("id"))
    }
    VersionedTable.upsert(spark, path,
      Seq((1L, "a")).toDF("id", "x"), Seq("id"))
    // null keys never match the anti-join: they append, never replace
    VersionedTable.upsert(spark, path,
      Seq((Option.empty[Long], "n1"), (Option(1L), "A"))
        .toDF("id", "x"), Seq("id"))
    val now = VersionedTable.read(spark, path).get
      .as[(Option[Long], String)].collect().toSet
    assert(now === Set((Option(1L), "A"), (Option.empty[Long], "n1")))
  }

  test("vacuum clears crashed-write debris below the newest committed") {
    val path = Files.createTempDirectory("vt_debris").toString
    (1 to 3).foreach { i =>
      VersionedTable.upsert(spark, path,
        Seq((i.toLong, s"x$i")).toDF("id", "x"), Seq("id"))
    }
    // crashed write below the newest committed: uncommitted v0 dir (no
    // _SUCCESS) + an orphaned lock file
    Seq((9L, "junk")).toDF("id", "x").write.mode("overwrite")
      .parquet(s"$path/v0")
    new java.io.File(s"$path/v0/_SUCCESS").delete()
    new java.io.File(s"$path/_lock_v1").createNewFile()
    VersionedTable.vacuum(spark, path, keep = 3)
    assert(!new java.io.File(s"$path/v0").exists(),
      "uncommitted debris below newest committed must be vacuumed")
    assert(!new java.io.File(s"$path/_lock_v1").exists(),
      "orphaned lock below newest committed must be vacuumed")
    assert(VersionedTable.versions(spark, path) === Seq(1L, 2L, 3L))
    assert(VersionedTable.read(spark, path).get.count() === 3L)
  }

  test("stale writer whose version was committed and vacuumed away fails loudly") {
    val path = Files.createTempDirectory("vt_stale").toString
    // history: v1..v5 committed by other writers, vacuum kept v4, v5
    (1 to 5).foreach { i =>
      VersionedTable.upsert(spark, path,
        Seq((i.toLong, s"x$i")).toDF("id", "x"), Seq("id"))
    }
    VersionedTable.vacuum(spark, path, keep = 2)
    assert(VersionedTable.versions(spark, path) === Seq(4L, 5L))
    // a writer that computed next=3 before stalling: the v3 directory is
    // gone, so its lock CAS SUCCEEDS — only the post-lock re-list stands
    // between it and writing v3 below the readers' max (a lost write)
    val e = intercept[VersionedTable.ConcurrentWriteException] {
      VersionedTable.upsertAt(spark, path,
        Seq((9L, "stale")).toDF("id", "x"), Seq("id"), next = 3L)
    }
    assert(e.getMessage.contains("stale"))
    assert(!new java.io.File(s"$path/_lock_v3").exists(),
      "the refused writer must release its lock")
    assert(!new java.io.File(s"$path/v3").exists(),
      "the refused writer must not have written anything")
    assert(VersionedTable.versions(spark, path) === Seq(4L, 5L),
      "committed history must be untouched")
    assert(!VersionedTable.read(spark, path).get
      .as[(Long, String)].collect().map(_._1).contains(9L))
    // the standard retry path: recompute next from the live listing
    assert(VersionedTable.upsert(spark, path,
      Seq((9L, "rebased")).toDF("id", "x"), Seq("id")) === 6L)
  }

  test("readVersion and diff refuse a vacuumed version with a clear error") {
    val path = Files.createTempDirectory("vt_vacread").toString
    (1 to 4).foreach { i =>
      VersionedTable.upsert(spark, path,
        Seq((i.toLong, s"x$i")).toDF("id", "x"), Seq("id"))
    }
    VersionedTable.vacuum(spark, path, keep = 2)
    val e = intercept[NoSuchElementException] {
      VersionedTable.readVersion(spark, path, 1L)
    }
    assert(e.getMessage.contains("vacuumed") && e.getMessage.contains("3, 4"),
      "the error must say the version is gone and list what IS available")
    intercept[NoSuchElementException] {
      VersionedTable.diff(spark, path, 1L, 4L, Seq("id"))
    }
    // surviving pair still diffs fine
    assert(VersionedTable.diff(spark, path, 3L, 4L, Seq("id")).count() === 1L)
  }

  test("vacuum keeps the newest versions only") {
    val path = Files.createTempDirectory("vt_vac").toString
    (1 to 4).foreach { i =>
      VersionedTable.upsert(spark, path,
        Seq((i.toLong, s"x$i")).toDF("id", "x"), Seq("id"))
    }
    assert(VersionedTable.versions(spark, path) === Seq(1L, 2L, 3L, 4L))
    VersionedTable.vacuum(spark, path, keep = 2)
    assert(VersionedTable.versions(spark, path) === Seq(3L, 4L))
    assert(VersionedTable.read(spark, path).get.count() === 4L)
  }
}
