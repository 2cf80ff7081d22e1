package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** T8: BPE tokenizer-merge learning over the corpus — the vocabulary
  * half of training-data tokenization (Sennrich et al. 2016,
  * arXiv:1508.07909 — public method). Production pipelines train the
  * tokenizer ON the corpus before tokenizing it; t1b's BPE-ish regex
  * *counts* under a fixed tokenizer, this operator *learns* one.
  *
  * Scale shape — the reason corpus-scale BPE training is feasible at
  * all, and the shape every production trainer uses: the corpus is
  * touched ONCE, collapsing to a (word, freq) VOCABULARY table (one
  * partial-aggregated shuffle; vocabulary grows sublinearly in corpus
  * size). Every merge round then runs on the vocab table only — a
  * pair explode bounded by total characters of *distinct* words, a
  * one-row argmax, and a map-side merge application. The driver holds
  * exactly one (pair, count) row per round (the I3 bounded-scalar
  * discipline); lineage is truncated per round with an eager
  * localCheckpoint (the d7 iteration discipline).
  *
  * Portability — the whole iterative learner is hash-checked against
  * DuckDB, which requires the merge APPLICATION to be bit-identical:
  * symbol sequences are kept as `[sym][sym]...` framed strings, so
  * applying merge (a,b) is `replace(syms, '[a][b]', '[ab]')` — and
  * both engines' `replace` scans left to right replacing
  * non-overlapping occurrences, which IS greedy BPE application
  * ("[a][a][a]" under (a,a) → "[aa][a]" on both). Frames can never
  * straddle symbols (every symbol is bracket-delimited), and bracket
  * characters are excluded from the vocabulary up front on both
  * sides. Pair counts are integer sums; the argmax tie-break
  * (count DESC, lhs ASC, rhs ASC) is total. The oracle unrolls the
  * same rounds as generated CTE stages (see SparkEntry.t8Sql).
  */
object Bpe {

  /** Merge rounds learned by the t8 gate query — enough for multi-step
    * structure (merges that consume earlier merges) while each round
    * stays a one-row argmax. Interpolated into the oracle unroll. */
  val BpeRounds = 8

  /** The corpus vocabulary: lowercased whitespace tokens weighted by
    * occurrence count, each word as a framed symbol string. Bracket
    * chars are excluded (they would break symbol framing) — mirrored
    * in the oracle's WHERE. */
  private[graft] def vocabOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.tokens(lower(col("text")))).as("word"))
      .filter(!col("word").contains("[") && !col("word").contains("]"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("word"), "(.)", "[$1]").as("syms"), col("freq"))

  /** Weighted adjacent-pair counts over the framed vocab. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = regexp_extract_all(col("syms"), lit("\\[([^\\]]*)\\]"), lit(1))
    val n = size(syms)
    vocab
      .select(col("freq"), col("syms"))
      .filter(n >= 2)
      .select(col("freq"), explode(zip_with(
        slice(syms, lit(1), n - 1), slice(syms, lit(2), n - 1),
        (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("pr"))
      .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** Learn `rounds` merges from a documents frame: each round takes the
    * most frequent adjacent symbol pair (ties → lexicographically
    * smallest) and applies it greedily to every vocab word. Returns
    * (merge_rank, lhs, rhs, merged, pair_count) — the merge table a
    * tokenizer ships. Stops early if the vocabulary runs out of pairs
    * (single-symbol words only). */
  def learnMerges(spark: SparkSession, docs: DataFrame,
      rounds: Int = BpeRounds): DataFrame = {
    import spark.implicits._
    var vocab = vocabOf(docs).localCheckpoint(true)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val best = pairCounts(vocab)
        .orderBy(desc("pair_count"), col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) dry = true
      else {
        val (l, rr, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        acc += ((r, l, rr, l + rr, cnt))
        val applied = vocab.withColumn("syms",
          call_function("replace", col("syms"), lit(s"[$l][$rr]"), lit(s"[$l$rr]")))
          .localCheckpoint(true)
        vocab.unpersist(false)
        vocab = applied
        r += 1
      }
    }
    vocab.unpersist(false)
    acc.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** T8 gate form: the first [[BpeRounds]] merges over `documents`. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    learnMerges(spark, documents(spark, dir))

  /** T8b: the learned tokenizer APPLIED corpus-wide — close the loop
    * from training the artifact to running it: learn the merge table
    * (bounded, ≤[[BpeRounds]] rows — this is what a tokenizer ships),
    * then tokenize every document with it and report per-doc BPE token
    * counts and the chars-per-token compression the merges bought.
    *
    * Scale shape: the merge table folds into the plan as N nested
    * `replace` LITERALS — the application phase is pure codegen'd
    * string work riding the corpus scan (no lambda, no join, no
    * broadcast even), followed by one partial-aggregated per-doc
    * rollup. This is the m1/x7 seam discipline with the artifact
    * learned in-engine rather than stubbed: a production run swaps a
    * bigger merge table through the same fold. Symbol count per word
    * is its frame-bracket count — `length(s) - length(replace(s,'[',
    * ''))` — exact integers on both engines. */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame =
    bpeTokenizeOf(spark, documents(spark, dir))

  private[graft] def bpeTokenizeOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    val merges = learnMerges(spark, docs).collect()
    val tok = docs
      .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("word"))
      .filter(!col("word").contains("[") && !col("word").contains("]"))
    val framed = regexp_replace(col("word"), "(.)", "[$1]")
    val applied = merges.sortBy(_.getInt(0)).foldLeft(framed) { (c, m) =>
      call_function("replace", c,
        lit(s"[${m.getString(1)}][${m.getString(2)}]"), lit(s"[${m.getString(3)}]"))
    }
    val nSyms = length(col("s")) - length(call_function("replace", col("s"), lit("["), lit("")))
    tok
      .select(col("doc_id"), col("word"), applied.as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum(nSyms).cast("long").as("n_bpe_tokens"))
      .withColumn("compression_ppm",
        floor(col("n_bpe_tokens") * lit(1000000.0) / col("n_chars")).cast("bigint"))
      .orderBy(col("doc_id"))
  }
}
