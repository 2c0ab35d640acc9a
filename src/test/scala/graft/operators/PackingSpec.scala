package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Sequence packing invariants: token conservation, capacity fill,
  * boundary splits, and bucket-width independence (the distributed
  * prefix sum must not depend on how buckets cut the id space). */
class PackingSpec extends SparkSuite {

  import spark.implicits._

  private def docs(ns: Seq[Long]) =
    ns.zipWithIndex.map { case (n, i) => (i.toLong + 1L, n) }
      .toDF("doc_id", "n_toks")

  test("exact capacity fill: every sequence but the last is full") {
    // 10 docs × 30 tokens into capacity 100 → seqs 0,1,2 with 100/100/100
    val out = Packing.packSequences(docs(Seq.fill(10)(30L)), "doc_id", "n_toks", 100L)
    val perSeq = out.groupBy("seq_id").agg(sum("n_in_seq").as("tot"))
      .orderBy("seq_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(perSeq === Array((0L, 100L), (1L, 100L), (2L, 100L)))
    // doc 4 (tokens 90..119) straddles seqs 0/1: 10 then 20 tokens
    val d4 = out.filter($"doc_id" === 4L).orderBy("seq_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(d4 === Array((0L, 90L, 10L), (1L, 0L, 20L)))
  }

  test("token conservation + in-sequence offsets never overlap") {
    val sizes = Seq(7L, 130L, 1L, 0L, 64L, 64L, 513L, 5L)
    val out = Packing.packSequences(docs(sizes), "doc_id", "n_toks", 64L).cache()
    val perDoc = out.groupBy("doc_id").agg(sum("n_in_seq").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    sizes.zipWithIndex.foreach { case (n, i) =>
      assert(perDoc.getOrElse(i.toLong + 1L, 0L) === n) // 0-token doc absent
    }
    // within a sequence, sorted pieces tile [0, fill) with no gap/overlap
    out.collect().groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val pieces = rows.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
      pieces.foldLeft(0L) { case (cursor, (off, n)) =>
        assert(off === cursor); off + n
      }
    }
    out.unpersist()
  }

  test("bucket width does not change the result") {
    val sizes = (1 to 200).map(i => (i * 37 % 90).toLong)
    val a = Packing.packSequences(docs(sizes), "doc_id", "n_toks", 128L, bucketWidth = 1000L)
    val b = Packing.packSequences(docs(sizes), "doc_id", "n_toks", 128L, bucketWidth = 7L)
    assert(a.collect().toSet === b.collect().toSet)
  }

  test("ids with gaps pack in id order") {
    val out = Packing.packSequences(
      Seq((5L, 10L), (500L, 10L), (40L, 10L)).toDF("doc_id", "n_toks"),
      "doc_id", "n_toks", 100L)
      .orderBy("offset_in_seq").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out === Array((5L, 0L), (40L, 10L), (500L, 20L)))
  }

  test("shard assignment: contiguous, complete, balanced by token mass") {
    val sizes = (1 to 300).map(i => (i * 53 % 97).toLong)
    val out = Packing.shardAssign(docs(sizes), "doc_id", "n_toks", nShards = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 300) // zero-token docs stay assigned
    assert(out.forall { case (_, s, _) => s >= 0 && s < 8 })
    // monotone in doc order: shard boundaries never interleave
    assert(out.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    // balance: every shard's token mass within total/8 + max doc size
    val total = sizes.sum
    val perShard = out.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    assert(perShard.values.forall(_ <= total / 8 + sizes.max + 1),
      s"unbalanced: $perShard")
  }

  test("shard assignment is bucket-width independent") {
    val sizes = (1 to 200).map(i => (i * 37 % 90).toLong)
    val a = Packing.shardAssign(docs(sizes), "doc_id", "n_toks", 16, bucketWidth = 1000L)
    val b = Packing.shardAssign(docs(sizes), "doc_id", "n_toks", 16, bucketWidth = 7L)
    assert(a.collect().toSet === b.collect().toSet)
  }

  test("writeShards: one file per shard, lossless, id-ordered within files") {
    val sizes = (1 to 120).map(i => (i * 53 % 80 + 1).toLong)
    val in = docs(sizes)
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Packing.writeShards(in, "doc_id", "n_toks", 4, out)
      val dirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard_id=")).sortBy(_.getName)
      assert(dirs.length === 4, s"expected 4 shard dirs, got ${dirs.map(_.getName).toSeq}")
      // one data file per shard: a shard never straddles tasks
      dirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length === 1, s"${d.getName}: ${files.length} files")
        // in-file order is doc_id ascending (byte-stable layout)
        val ids = spark.read.parquet(files.head.getPath)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids === ids.sorted, s"${d.getName} not id-ordered")
      }
      // lossless round-trip
      val back = spark.read.parquet(out)
      assert(back.count() === 120)
      assert(back.select("doc_id").as[Long].collect().toSet ===
        in.select("doc_id").as[Long].collect().toSet)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(out))
    }
  }
}
