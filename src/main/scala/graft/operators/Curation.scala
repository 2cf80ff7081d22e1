package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The training-data curation pipeline — the end-to-end composition a
  * large-scale corpus build runs before a single training token is
  * emitted, assembled from the engine's own tiers:
  *
  *   quality gate (t2's token accounting) →
  *   exact dedup, min-id survivor (d1) →
  *   near-dup removal over survivors (d2's capped inverted index) →
  *   deterministic hash split into train/eval.
  *
  * Every stage is a deterministic function of the corpus, so the WHOLE
  * pipeline is oracle-checkable — the c1 gate hash-matches a DuckDB
  * formulation of all four stages chained, which is the strongest check
  * this engine can make of a multi-stage composition (each stage's
  * errors would compound, so a final-rollup match pins them all).
  *
  * Scale shape: one shuffle for the digest group (d1), the df-capped
  * posting-list self-join bounded by gram frequency (d2 — the cap is
  * computed over the SURVIVOR corpus, so boilerplate that became hot
  * after dedup still gets pruned), and a map-only split. The near-dup
  * stage consumes exact-dedup survivors, not the raw corpus: at 100 TB
  * exact dups are the bulk of the waste (crawl mirrors), and removing
  * them first shrinks the expensive stage's input for free.
  *
  * Split determinism matters operationally: eval membership is a pure
  * function of doc_id (md5 prefix mod 10), so re-running the pipeline
  * after an incremental corpus append never migrates an old document
  * across the split boundary — the property that keeps eval sets
  * uncontaminated across refreshes.
  */
object Curation {

  val MinTokens = 20
  val EvalBuckets = 10 // 1-in-10 docs → eval

  /** split column: 'eval' if the doc's md5 bucket is 0, else 'train' —
    * engine-portable (DuckDB: ('0x' || substr(md5(..),1,4))::INT). */
  private def splitCol(docId: org.apache.spark.sql.Column) =
    when(conv(substring(md5(docId.cast("string")), 1, 4), 16, 10)
      .cast("int") % EvalBuckets === 0, lit("eval")).otherwise(lit("train"))

  /** c1: the curated-corpus rollup — (lang, split) → docs + tokens.
    * Small, totally ordered, hash-comparable. */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val quality = graft.Tables.documents(spark, dir)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      .filter(col("n_tokens") >= MinTokens)

    // exact dedup: one shuffle on the digest, min-id survivor (d1's
    // rule) — window instead of groupBy+self-join so lang/n_tokens ride
    // along without a second join. The survivor frame feeds TWO
    // branches (pair generation and the kept anti join), so it is
    // persisted under the CacheOps discipline — unpersisted it would
    // re-run the scan+window per branch.
    val exact = CacheOps.shared(quality
      .withColumn("rk", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .drop("rk"))

    // near-dup: d2's capped inverted-index pairs over the survivor set;
    // the GREATER id of every qualifying pair is dropped (deterministic
    // regardless of chain order — b falls whether or not a also falls).
    // The tier is pluggable: at 100 TB swap in the MinHash/LSH pairs
    // (Dedup.minhashLshPairs — constant-size signatures decouple join
    // width from document length); d2 is used here because its exact
    // Jaccard formulation chains into the single-statement oracle.
    val nearDupIds = Dedup.ngramJaccardPairsOf(
        exact.select(col("doc_id"), col("text")))
      .select(col("b_id").as("doc_id")).distinct()
    val kept = exact.join(nearDupIds, Seq("doc_id"), "left_anti")

    val rollup = kept
      .withColumn("split", splitCol(col("doc_id")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"), col("split"))
    CacheOps.materializeAndRelease(rollup, exact)
  }

  val PackBudget = 2048 // tokens per packed sequence
  val PackShards = 8

  /** c2: sequence packing — assign quality-surviving documents to
    * fixed-token-budget bins (the pre-training packing step: documents
    * are concatenated into budget-length sequences; the bin id is which
    * sequence a document STARTS in, contiguous-fill semantics).
    *
    * The assignment is a windowed running token total: bin =
    * floor((cumsum − own) / budget) over a deterministic (lang, shard)
    * order. Partitioning the window by (lang, shard=doc_id mod 8)
    * instead of lang alone is the scale decision: a cumulative sum is
    * inherently sequential WITHIN a partition, and language cardinality
    * is tiny, so lang-only windows would serialize the corpus through
    * a handful of tasks; sharding makes the window parallel while bins
    * stay deterministic (bins are arbitrary groupings — only their
    * fill matters to training). Output is the per-lang packing summary
    * (bin counts and fill extrema), totally ordered. */
  def sequencePacking(spark: SparkSession, dir: String,
      budget: Int = PackBudget, shards: Int = PackShards): DataFrame = {
    val q = graft.Tables.documents(spark, dir)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      .filter(col("n_tokens") >= MinTokens)
      .withColumn("shard", pmod(col("doc_id"), lit(shards)))
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = q
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget.toDouble)))
    val perBin = binned.groupBy(col("lang"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("bin_docs"), sum(col("n_tokens")).as("bin_tokens"))
    perBin.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("bin_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("total_tokens"),
        max(col("bin_tokens")).as("max_bin_tokens"))
      .orderBy(col("lang"))
  }
}
