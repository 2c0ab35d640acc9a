package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ScaleData dev tool: per-key-space offsets preserve referential
  * integrity exactly — every copy joins only itself, so a scaled join
  * produces factor× the base join's rows, never cross-copy rows. */
class ScaleDataSpec extends SparkSuite {

  test("2x scale doubles tables and preserves join cardinalities") {
    val src = "/root/testdata/sf0.001"
    val dst = Files.createTempDirectory("scale2x").toString
    graft.apps.ScaleData.main(Array(src, dst, "2"))

    def cnt(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    Seq("lineitem", "orders", "customer", "documents").foreach { t =>
      assert(cnt(dst, t) === 2 * cnt(src, t), s"$t must double")
    }
    // fixed dims copy through unscaled
    assert(cnt(dst, "nation") === cnt(src, "nation"))

    def joinRows(dir: String): Long =
      spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
    assert(joinRows(dst) === 2 * joinRows(src),
      "per-copy key offsets must keep every lineitem joined to exactly " +
        "its own copy's order — factor x base join rows, no cross-copy hits")
  }

  test("--tables/--mutate-text/--perturb-vecs: targeted, deterministic, copy-0 untouched") {
    val src = "/root/testdata/sf0.001"
    val dst1 = Files.createTempDirectory("scaleflags1").toString
    val dst2 = Files.createTempDirectory("scaleflags2").toString
    val args = Array(src, dst1, "2", "--tables=documents,embeddings",
      "--mutate-text=0.1", "--perturb-vecs=0.05")
    graft.apps.ScaleData.main(args)
    graft.apps.ScaleData.main(args.updated(1, dst2))

    // only the listed tables are written
    val written = new java.io.File(dst1).listFiles().map(_.getName).toSet
    assert(written === Set("documents.parquet", "embeddings.parquet"))

    // hash-seeded mutations: two runs produce identical bytes row-for-row
    def canon(dir: String, t: String) =
      spark.read.parquet(s"$dir/$t.parquet")
        .orderBy(if (t == "documents") "doc_id" else "vec_id")
        .collect().toSeq
    assert(canon(dst1, "documents") === canon(dst2, "documents"))
    assert(canon(dst1, "embeddings") === canon(dst2, "embeddings"))

    // copy 0 is byte-identical to the source; mutated copies are novel
    // but token-count-preserving, with n_chars recomputed
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = srcDocs.count()
    val out = spark.read.parquet(s"$dst1/documents.parquet")
    val joined = out.alias("o")
      .join(srcDocs.alias("s"), col("o.doc_id") === col("s.doc_id"))
    assert(joined.filter(col("o.text") =!= col("s.text")).count() === 0,
      "copy 0 must be the untouched original")
    val copy1 = out.filter(col("doc_id") >= nDocs).alias("c")
      .join(srcDocs.select((col("doc_id") + nDocs).as("doc_id"),
        col("text").as("orig")), Seq("doc_id"))
    assert(copy1.filter(col("text") === col("orig")).count() < nDocs,
      "10% token mutation must change most documents")
    assert(copy1.filter(
      size(split(col("text"), " ")) =!= size(split(col("orig"), " ")))
      .count() === 0, "mutation must preserve token count")
    assert(out.filter(length(col("text")) =!= col("n_chars")).count() === 0,
      "n_chars must be recomputed after mutation")

    // perturbed vectors: same dimension, different values, bounded delta
    val srcEmb = spark.read.parquet(s"$src/embeddings.parquet")
    val nVecs = srcEmb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val stride = math.max(nVecs, nDocs) // docid key space spans both
    val pert = spark.read.parquet(s"$dst1/embeddings.parquet")
      .filter(col("vec_id") >= stride).alias("p")
      .join(srcEmb.select((col("vec_id") + stride).as("vec_id"),
        col("embedding").as("orig")), Seq("vec_id"))
      .select(zip_with(col("embedding"), col("orig"),
        (a, b) => abs(a - b)).as("delta"))
    assert(pert.count() > 0, "stride must locate the perturbed copy")
    assert(pert.filter(array_max(col("delta")) > 0.0500001f).count() === 0,
      "per-element noise must stay within EPS")
    assert(pert.filter(array_max(col("delta")) === 0f).count() === 0,
      "every perturbed vector must actually differ")
  }

  test("two-stage scaling ≡ one-stage in distribution (the soak contract)") {
    // Every 1000x soak since round 9 builds its corpus in two stages
    // (10x then x10 of the partial dir) because one stage at the full
    // factor doesn't fit the build window. The soak comparisons are only
    // valid if staging doesn't change the corpus DISTRIBUTION — same doc
    // count, same near-dup rate, same vocabulary growth — so this spec
    // owns that invariant at small factors: x2 then x3 vs x6, both with
    // the soak's own --mutate-text flag. (Byte equality is impossible:
    // copy indices differ between stagings and mutations are hash-seeded
    // per copy; the contract is distributional.)
    val src = "/root/testdata/sf0.001"
    val twoA = Files.createTempDirectory("stage2").toString
    val twoB = Files.createTempDirectory("stage2x3").toString
    val one = Files.createTempDirectory("stage6").toString
    val m = "--mutate-text=0.1"
    graft.apps.ScaleData.main(Array(src, twoA, "2", "--tables=documents", m))
    graft.apps.ScaleData.main(Array(twoA, twoB, "3", "--tables=documents", m))
    graft.apps.ScaleData.main(Array(src, one, "6", "--tables=documents", m))

    def stats(dir: String): (Long, Long, Long) = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      (d.count(),
        d.select(col("text")).distinct().count(),
        d.select(explode(split(col("text"), " ")).as("t"))
          .distinct().count())
    }
    val (n2, distinct2, vocab2) = stats(twoB)
    val (n1, distinct1, vocab1) = stats(one)
    info(s"[two-stage] docs=$n2 distinctTexts=$distinct2 vocab=$vocab2; " +
      s"[one-stage] docs=$n1 distinctTexts=$distinct1 vocab=$vocab1")
    assert(n2 === n1, "doc count must match exactly")
    def close(a: Long, b: Long, tol: Double, what: String): Unit =
      assert(math.abs(a - b).toDouble / math.max(a, b) <= tol,
        s"$what diverged beyond ${tol * 100}%: two-stage $a vs one-stage $b" +
          " — a generator drift would silently invalidate every staged-soak" +
          " comparison")
    // dup RATE: distinct-text count tracks how many mutated copies
    // collide back into exact dups; vocabulary growth tracks the mutated
    // token tail the near-dup screens and BM25 soaks are sized by
    close(distinct2, distinct1, 0.05, "distinct-text count (dup rate)")
    close(vocab2, vocab1, 0.10, "distinct-token count (vocab growth)")
  }
}
