package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

import scala.collection.mutable

/**
 * Byte-pair-encoding (BPE) subword tokenization — vocabulary learning
 * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
 * Subword Units") and corpus segmentation. This closes the tokenizer
 * loop for a training-data build: the engine already counts tokens and
 * packs sequences; this operator LEARNS the subword vocabulary those
 * counts assume, from the corpus itself, and segments the corpus with it.
 *
 * Scale design (100 TB lens):
 *  - Learning never touches the corpus. Its state is the word-frequency
 *    table (vocabulary-bounded — Heaps' law puts |vocab| orders of
 *    magnitude below corpus size), built with ONE corpus-sized exchange
 *    that partial-aggregates map-side. Each merge round is then one
 *    partial+final aggregation over the vocab table plus a ONE-ROW
 *    TakeOrdered collect (the argmax pair). The collected model is k
 *    rows — bounded driver state, same contract as the IVF centroid and
 *    DSIR weight-table collects.
 *  - The vocab table is `localCheckpoint`ed every round so round i+1
 *    re-reads materialized partitions instead of replaying i nested
 *    fold expressions (the plan-growth lesson from the cluster-resolution
 *    soak, PLANS.md round 6).
 *  - Segmentation amortizes the k merge folds over DISTINCT WORDS, not
 *    corpus tokens: the learner's final vocab already carries each
 *    word's segmentation, so `applyBpe` is posexplode → equi-join on the
 *    (small) segmented vocab → one per-doc reassembly aggregation. The
 *    only corpus-sized exchange carries (doc_id, pos, subwords) — the
 *    planner broadcasts the vocab side when it fits (it does by
 *    construction). Out-of-vocabulary words fall back to the literal
 *    k-fold merge chain, map-only.
 *
 * Merge application is the standard greedy leftmost-non-overlapping
 * pass, expressed as a single `aggregate` fold per rule: push each
 * token; when the accumulator's last element equals the rule's left
 * side and the incoming token its right side, replace the last element
 * with the concatenation. One pass per rule, rules in rank order —
 * byte-identical to the reference algorithm's per-rule scan and exactly
 * reproducible in any engine with list folds (the oracle replays it in
 * DuckDB via `list_reduce`).
 *
 * Determinism: the argmax pair tie-breaks on (count desc, left asc,
 * right asc) over binary string order; the testdata corpus is pure
 * ASCII, so Spark UTF8_BINARY and DuckDB binary collation agree.
 *
 * Reference scope: the reference's apps stop at whitespace token
 * counting (e.g. `WordCount.java`); subword vocabulary learning is part
 * of the beyond-reference training-data surface alongside dedup / DSIR /
 * packing.
 */
object Tokenize {

  /** One merge rule (rank-ordered). `merged = left + right`. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairCnt: Long)

  /** Learned model: the ranked merge table plus the segmented training
    * vocabulary (word → subword list) that `applyBpe` joins against. */
  final case class BpeModel(merges: Seq[Merge], vocab: DataFrame)

  /** Word-frequency table over a corpus: (word, cnt), whitespace
    * tokenization matching `TextAnalysis.tokens` (and the DuckDB oracle's
    * `string_split(text, ' ')`). Empty words are dropped — a word must
    * have at least one character to segment. */
  def wordCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy leftmost-non-overlapping application of ONE merge rule to a
    * token list: fold that pushes each token and collapses [.., l] + r
    * into [.., l+r]. After a collapse the merged token becomes the new
    * tail, so overlapping occurrences (e.g. rule (a,a) on [a,a,a]) merge
    * left-to-right without re-merging — the textbook BPE scan. */
  def mergeOne(toks: Column, l: Column, r: Column): Column =
    aggregate(toks, array().cast("array<string>"),
      (acc, t) => when(size(acc) > 0 && element_at(acc, -1) === l && t === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
        .otherwise(concat(acc, array(t))))

  /** Character-level seed segmentation of a word (no end-of-word marker;
    * merges are word-internal, the whitespace tokenization already marks
    * boundaries). */
  def chars(word: Column): Column =
    filter(split(word, ""), c => c =!= "")

  /**
   * Learn `k` BPE merges over a (word, cnt) table. Each round counts
   * adjacent-pair frequencies weighted by word count, collects the
   * single argmax row, and rewrites the vocab's segmentations with that
   * rule. Stops early when no pair remains (fully merged vocab).
   *
   * Returns the merge table and the final segmented vocab
   * (word, cnt, toks) — the reusable tokenizer model.
   */
  def learnBpe(words: DataFrame, k: Int): BpeModel = {
    var cur = words.select(col("word"), col("cnt"),
        chars(col("word")).as("toks"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val pairTop = cur
        .filter(size(col("toks")) >= 2)
        .select(col("cnt"),
          explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (pairTop.isEmpty) exhausted = true
      else {
        val row = pairTop.head
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(rank, l, r, l + r, c)
        cur = cur.withColumn("toks", mergeOne(col("toks"), lit(l), lit(r)))
          .localCheckpoint()
        rank += 1
      }
    }
    BpeModel(merges.result(), cur)
  }

  /** The learned merge table as a DataFrame — the gate/export surface of
    * the model (rank, left, right, merged, pair_cnt). */
  def mergesDf(model: BpeModel): DataFrame = {
    val s = model.vocab.sparkSession
    import s.implicits._
    model.merges.toDF("rank", "left", "right", "merged", "pair_cnt")
      .select(col("rank"), col("left"), col("right"), col("merged"),
        col("pair_cnt"))
  }

  /** Segment an arbitrary word column with the model's merge rules — the
    * out-of-vocabulary path: the k rules fold over the character seed in
    * rank order, map-only. */
  def segmentExpr(model: BpeModel, word: Column): Column =
    model.merges.foldLeft(chars(word)) { (toks, m) =>
      mergeOne(toks, lit(m.left), lit(m.right))
    }

  /**
   * Segment a corpus with a learned model. Emits
   * (doc_id, n_words, n_subwords, subword_text) where subword_text is
   * the space-joined subword sequence in document order.
   *
   * In-vocab words take the equi-join against the segmented vocab
   * (broadcast-sized by construction); unseen words fall back to the
   * literal merge chain. The per-doc reassembly sorts on word position
   * inside the aggregation, so the single corpus exchange is also the
   * only ordering step.
   */
  def applyBpe(docs: DataFrame, model: BpeModel,
               idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val seg = model.vocab.select(col("word"), col("toks"))
    words.join(seg, Seq("word"), "left")
      .withColumn("toks",
        coalesce(col("toks"), segmentExpr(model, col("word"))))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(col("toks"))).as("n_subwords"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          e => e.getField("toks"))), " ").as("subword_text"))
  }

  /** Persist a learned model as two plain parquet tables — the merges
    * (rank, left, right, merged, pair_cnt; k rows) and the segmented
    * vocab (word, cnt, toks) — readable by any engine, closing the
    * train-once loop ACROSS sessions exactly like the IVF-PQ model
    * store ([[Similarity.savePqModel]]). */
  def saveBpeModel(model: BpeModel, path: String): Unit = {
    mergesDf(model).repartition(1)
      .write.mode("overwrite").parquet(s"$path/merges")
    model.vocab.select(col("word"), col("cnt"), col("toks"))
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Inverse of [[saveBpeModel]]. Merge rules reassemble rank-ascending
    * (row order on disk is immaterial), so the loaded model applies the
    * rules in the learned order and reproduces the original
    * segmentations bit for bit. */
  def loadBpeModel(path: String,
                   spark: org.apache.spark.sql.SparkSession): BpeModel = {
    val merges = spark.read.parquet(s"$path/merges")
      .select(col("rank").cast("int"), col("left"), col("right"),
        col("merged"), col("pair_cnt").cast("long"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_.rank).toSeq
    BpeModel(merges, spark.read.parquet(s"$path/vocab"))
  }

  /** Subword vocabulary of the segmented corpus: top-k subwords by total
    * occurrence count (weighted by word frequency). The tokenizer's
    * emitted vocab table. Like `Relevance.vocabTopTerms`, the global
    * top-k executes as TakeOrdered and the rank is minted AFTER the
    * limit, over k rows — no global sort materialization. */
  def subwordVocab(model: BpeModel, k: Int = 100): DataFrame =
    model.vocab
      .select(explode(col("toks")).as("subword"), col("cnt"))
      .groupBy("subword").agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("subword").asc).limit(k)
      .withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("subword").asc)))
}
