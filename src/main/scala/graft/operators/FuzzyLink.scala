package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.StringSim

/** J7/X2: fuzzy similarity join for entity linking.
  *
  * Reference shape (ingest_fec_links.py:95-148): block FEC candidates by
  * state (:116), score `token_sort_ratio(normalize(db_name),
  * normalize(fec_name))` (:130), keep the argmax per db entity if
  * score > 85 (:130-136).
  *
  * Fixture realization: link suppliers (FEC side) to customers (DB side),
  * blocked on nationkey (state analog), scoring the supplier name
  * rewritten into the customer namespace. Ties broken on c_custkey so the
  * argmax is deterministic (SURVEY §7.4-4).
  *
  * Scale notes: blocking is mandatory — the equi-join on the block key is
  * what keeps this off the O(N×M) cliff (the optimizer will not invent
  * it, SURVEY §4). Pairs per block = |cust/nation| × |supp/nation|; with
  * a skewed block key, salt the block or let AQE skew-split the join.
  * The scorer is pure codegen'd expressions (no UDF), so it fuses into
  * the join's whole-stage pipeline.
  *
  * A fixed-cardinality block key grows quadratically per block at scale,
  * so the O(len²) scorer is guarded by a provably lossless LENGTH
  * prefilter (O(1) per pair, evaluated before levenshtein):
  * score > 85 ⟺ floor(100·(1−d/L)) ≥ 86 ⟺ d ≤ 0.14·L  (L = max len,
  * d = edit distance), and d ≥ |len_a − len_b| always, so every
  * surviving pair has |Δlen| ≤ 0.14·L ≤ floor(0.15·L). Pruned pairs all
  * score ≤ 85: they can neither pass the final threshold filter nor —
  * because the output is argmax-THEN-threshold — promote a different
  * winner (if the true argmax scores > 85 it survives the prune and
  * stays argmax; if it scores ≤ 85, every pair does, and the supplier
  * emits nothing either way). The oracle mirrors the same bound.
  */
object FuzzyLink {

  val Threshold = 85

  private def shufflePartitions(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** |Δlen| bound implied by `score > Threshold` (see scaladoc proof):
    * pairs whose token-sorted lengths differ by more than 15% of the
    * longer side cannot score above 85. */
  private[operators] def lengthBound(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    abs(length(a) - length(b)) <= floor(lit(0.15) * greatest(length(a), length(b)))

  /** Character-frequency bound, digits subset. Every edit operation
    * changes the character multiset by at most 2 units (a substitution
    * removes one char and adds another), so
    * Σ_ch |cnt_a(ch) − cnt_b(ch)| ≤ 2·lev(a,b) — and restricting the sum
    * to ANY character subset only lowers the left side, so the bound
    * stays valid summed over digits alone. score > 85 ⟹ lev ≤
    * floor(0.15·maxlen) (lengthBound proof), hence a digit-count
    * difference above 2·floor(0.15·maxlen) is a provable reject.
    *
    * Why digits: the length bound is blind to fixed-width entity names
    * ("...#000000123" vs "...#000000456" — identical lengths, distance
    * 3), which is exactly where per-block pair counts explode; digit
    * counts separate those in ~30 arithmetic ops per pair instead of an
    * O(len²) levenshtein. Counts are precomputed once per INPUT row
    * (`digitCounts`), so the per-pair work is 10 abs-diffs. */
  private[operators] def digitCounts(c: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    ('0' to '9').map(d => length(c) - length(translate(c, d.toString, "")))

  private[operators] def digitBound(aCnt: Seq[org.apache.spark.sql.Column],
      bCnt: Seq[org.apache.spark.sql.Column],
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aCnt.zip(bCnt).map { case (x, y) => abs(x - y) }.reduce(_ + _) <=
      lit(2) * floor(lit(0.15) * greatest(length(a), length(b)))

  /** Normalize + token-sort ONCE per input row (N+M evaluations), so the
    * only per-pair work inside the blocked join is the levenshtein score.
    * Folding the whole scorer into the join predicate re-evaluates the
    * split/sort per pair — measured 8× slower at sf0.1. Shared by the
    * single-key (j7) and length-banded (j7b) variants. */
  private def preparedSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val cCnt = digitCounts(col("norm_c"))
    val c = customer(spark, dir)
      // the fixture table is a single parquet split and the dim side
      // broadcasts, so WITHOUT an explicit repartition the entire
      // blocked join + scorer runs in ONE task (measured: the whole
      // 600k-pair stage single-threaded). Hash-distribute the streamed
      // side so the pair work spreads; the EXPLICIT partition count
      // matters — a bare repartition(col) is a REPARTITION_BY_COL
      // shuffle that AQE coalesces back to one partition (the shuffle
      // is ~2 MB; AQE sizes by bytes, blind to the 600k-pair × O(len²)
      // compute hiding downstream of the join).
      .repartition(shufflePartitions(spark), col("c_custkey"))
      // coalesce makes norm_c (and every count derived from it)
      // NON-NULLABLE. Without it, InferFiltersFromConstraints adds an
      // isnotnull(cd_i) for each of the 10 count columns referenced in
      // the join residual and pushes them to the SCAN — where each
      // substitutes the whole tokenSort expression, evaluating the
      // interpreted lambda ~20× per input row (measured: that scan
      // filter, single-task below the exchange, WAS the query's cost).
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        coalesce(StringSim.tokenSort(StringSim.normalizeName(col("c_name"))), lit("")).as("norm_c"))
      .select(col("*") +: cCnt.zipWithIndex.map { case (e, i) => e.as(s"cd$i") }: _*)
    val sCnt = digitCounts(col("norm_s"))
    val s = supplier(spark, dir)
      .withColumn("cand_name", regexp_replace(col("s_name"), "Supplier", "Customer"))
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        coalesce(StringSim.tokenSort(StringSim.normalizeName(col("cand_name"))), lit("")).as("norm_s"))
      .select(col("*") +: sCnt.zipWithIndex.map { case (e, i) => e.as(s"sd$i") }: _*)
    (c, s)
  }

  /** Prefilters + scorer + argmax window — identical for both blocking
    * variants; `scored` is the output of a blocking join over the
    * prepared sides. */
  private def scoreAndPick(scored: DataFrame): DataFrame = {
    val picked = scored
      .filter(lengthBound(col("norm_c"), col("norm_s")))
      .filter(digitBound(
        (0 until 10).map(i => col(s"cd$i")), (0 until 10).map(i => col(s"sd$i")),
        col("norm_c"), col("norm_s")))
      .withColumn("score", StringSim.ratioOfSorted(col("norm_c"), col("norm_s")))
      // threshold BELOW the window — provably output-equivalent (same
      // argmax-then-filter argument as the prefilters: a supplier whose
      // argmax clears 85 keeps it; one whose argmax doesn't emits
      // nothing either way), and it shrinks the window's shuffle from
      // every scored pair to only above-threshold pairs.
      .filter(col("score") > Threshold)
    val w = Window.partitionBy(col("s_suppkey"))
      .orderBy(desc("score"), col("c_custkey"))
    picked
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("s_suppkey"), col("s_name"), col("c_custkey"), col("c_name"), col("score"))
      .orderBy(col("s_suppkey"))
  }

  def linkSuppliersToCustomers(spark: SparkSession, dir: String): DataFrame = {
    val (c, s) = preparedSides(spark, dir)
    val scored = broadcast(s)
      .join(c, s("s_nationkey") === c("c_nationkey")) // blocking join
    // lossless prunes BEFORE the O(len²) scorer (proofs in the object
    // scaladoc), then exact scorer + argmax — shared with j7b. The
    // thresholded-levenshtein scorer variant (ratioOfSortedCapped)
    // measured 2× slower here — the banded early-abandon doesn't pay
    // off on short, similar-length names.
    scoreAndPick(scored)
  }

  /** J7b: two-key blocking — (nationkey, LENGTH BAND) — the relief
    * valve j7's own scaladoc names for the fixed-cardinality block key.
    *
    * The length prefilter's theorem (score > 85 ⟹ |Δlen| ≤
    * floor(0.15·maxlen)) makes a length band a PROVABLY LOSSLESS second
    * blocking key: with band width B ≥ that bound, any qualifying
    * pair's bands differ by at most 1, so replicating the (broadcast)
    * supplier side to its 3 adjacent bands guarantees every qualifying
    * pair still meets — and the result is IDENTICAL to the single-key
    * join, which is exactly what the driver gate proves (j7b's oracle
    * IS j7's formulation; hash equality = the blocking loses nothing,
    * the same proof shape as j6b's salted ≡ plain).
    *
    * Why it matters at 100×: nationkey-only blocks grow as (N/25)(M/25)
    * — quadratic. The band key multiplies block count by |length
    * range|/B, dividing pairs-per-block by the same factor at the cost
    * of 3× replication of the SMALL side. B is derived from the
    * observed max name length (one scalar aggregate — bounded metadata,
    * like the partitioned MERGE's affected-partition list), so the
    * lossless guarantee tracks the data rather than trusting a
    * constant. */
  def linkSuppliersToCustomersBanded(spark: SparkSession, dir: String): DataFrame = {
    val (c, s) = preparedSides(spark, dir)
    val maxLen = {
      val r = c.agg(max(length(col("norm_c"))).cast("long")).collect()(0)
      val rs = s.agg(max(length(col("norm_s"))).cast("long")).collect()(0)
      math.max(if (r.isNullAt(0)) 0L else r.getLong(0),
        if (rs.isNullAt(0)) 0L else rs.getLong(0))
    }
    val bandWidth = math.max(4L, (0.15 * maxLen).toLong + 1)
    val cB = c.withColumn("c_band", floor(length(col("norm_c")) / lit(bandWidth)))
    val sB = s
      .withColumn("s_band0", floor(length(col("norm_s")) / lit(bandWidth)))
      .withColumn("s_band", explode(array(
        col("s_band0") - 1, col("s_band0"), col("s_band0") + 1)))
    val scored = broadcast(sB)
      .join(cB, sB("s_nationkey") === cB("c_nationkey") &&
        sB("s_band") === cB("c_band"))
    scoreAndPick(scored)
  }
}
