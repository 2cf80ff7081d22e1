package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deduplication operators for a training-data pipeline over `documents`.
  *
  * Four tiers, cheapest first — the standard corpus-dedup ladder:
  *  1. exact: hash-groupBy on a content digest (one shuffle on the hash)
  *  2. n-gram Jaccard: inverted-index join on shared shingles — candidate
  *     pairs only, never all-pairs
  *  3. MinHash/LSH: constant-size signatures + band-bucket join — the
  *     100 TB path where even the shingle inverted index is too big
  *  4. SimHash: 60-bit signature, hamming-distance banding
  *
  * Everything is pure column expressions (higher-order array functions,
  * md5-derived hashing) so signatures compute in the scan stage.
  * Hash parity with the DuckDB oracle: md5 hex → first 15 nibbles →
  * 60-bit non-negative bigint on both engines.
  */
object Dedup {

  /** 60-bit integer from the first 15 hex chars of md5 — deterministic,
    * engine-portable (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Materialize the (small) pair result eagerly, then release the
    * persisted posting-list inputs. The pair operators persist their
    * posting lists because three plan branches share them; without this
    * the cached frames outlive the call and a long-lived session (REPL,
    * repeated pipeline runs) accumulates cache until memory pressure.
    * localCheckpoint keeps the materialized blocks owned by the
    * ContextCleaner, so they free when the returned frame is GC'd. */
  private def materializeAndRelease(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist(false))
    out
  }

  /** Distinct word 3-gram shingles per document (single Catalyst
    * expression — see TextShingles for why not higher-order functions). */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.TextShingles(text, n)

  /** D1: exact dedup via content digest — groupBy(md5) keeping the
    * minimum id (deterministic survivor, unlike dropDuplicates). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("digest", md5(col("text")))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .groupBy(col("n_copies"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(col("n_copies"))
  }

  /** D2: n-gram Jaccard near-dup pairs via inverted-index self-join.
    *
    * doc→shingle posting list, self-join on shingle (candidate pairs
    * share ≥1 shingle), count common, Jaccard = common/(|A|+|B|-common),
    * keep pairs ≥ 0.8. Jaccard divides two ints derived identically on
    * both engines → bit-identical doubles.
    *
    * Scale: candidate pairs are bounded by shingle doc-frequency; at
    * 100 TB add a doc-frequency cap on hot shingles (drop grams appearing
    * in >X% of docs) before the join — same pruning the MinHash tier
    * gets structurally.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    // Join on a 60-bit gram hash, not the gram string: same candidate
    // pairs and counts (collision odds ~n²/2⁶¹), half the shuffle bytes.
    // The posting list feeds three plan branches (counts + both join
    // sides) — persist it so the shingle construction runs once, not 3×.
    val docs = documents(spark, dir)
      .select(col("doc_id"), explode(shingles(col("text"))).as("gram"))
      .select(col("doc_id"), md5Long(col("gram")).as("gram_h"))
      .repartition(col("doc_id"))
      .persist()
    val counts = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))

    val a = docs.select(col("doc_id").as("a_id"), col("gram_h"))
    val b = docs.select(col("doc_id").as("b_id"), col("gram_h"))
    val common = a.join(b, Seq("gram_h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_common"))

    val result = common
      .join(counts.select(col("doc_id").as("a_id"), col("n_grams").as("a_n")), Seq("a_id"))
      .join(counts.select(col("doc_id").as("b_id"), col("n_grams").as("b_n")), Seq("b_id"))
      .withColumn("jaccard",
        col("n_common") / (col("a_n") + col("b_n") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("n_common"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
    materializeAndRelease(result, docs)
  }

  val MinHashK = 16 // hash functions
  val LshBands = 4  // bands of rows = K/bands

  /** Parametric minhash family h_i(g) = (A_i·base(g) + B_i) mod P over a
    * 28-bit md5-derived base hash. One md5 per gram instead of K — the
    * multiply-mod is free next to a digest. 28-bit base keeps A_i·base
    * < 2^59 (no ANSI overflow); P = 2^31-1. Constants are deterministic
    * functions of the seed index and are interpolated into the oracle
    * SQL so both engines share them. */
  val MinHashP = 2147483647L
  def seedA(i: Int): Long = 1L + (i.toLong * 2654435761L % (MinHashP - 1))
  def seedB(i: Int): Long = i.toLong * 40503L % MinHashP

  /** 28-bit base hash: first 7 md5 hex nibbles. Base-hash collisions
    * (~n²/2^29) only perturb the minhash estimate; candidate pairs are
    * re-verified with exact Jaccard regardless. */
  def md5Base28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("bigint")

  /** D3: MinHash + LSH near-dup candidates, verified with exact Jaccard.
    *
    * Pipeline (all codegen-friendly scalar expressions):
    *  1. explode docs → distinct shingles (the posting list)
    *  2. cross the postings with the K seeds, hash seed:gram with the
    *     scalar md5 path, groupBy (doc, seed) min → minhash rows
    *  3. roll seeds up into band buckets (md5 of the band's 4 min-hashes
    *     in seed order — identical bytes to hashing the signature slice)
    *  4. self-join band buckets → candidate pairs
    *  5. verify candidates with exact Jaccard via the posting list
    *
    * The equivalent nested higher-order-function formulation
    * (minhashSignature) is 20× slower: Spark HOF lambdas are interpreted,
    * not codegen'd — measured 123 s vs ~6 s at sf0.1. Keep hashing in
    * exploded scalar form on hot paths.
    *
    * At 100 TB: the explode is map-side; the only wide exchanges are the
    * (doc,seed) min-combine (partial agg shrinks it to K rows per doc
    * before shuffle) and the band self-join on constant-size keys.
    */
  def minhashLshPairs(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val rows = MinHashK / LshBands
    // persist: the posting list feeds the seed cross-join, the counts,
    // and both verification join sides. Repartition first — the source
    // parquet is a single split, and without the explicit exchange the
    // whole K×|grams| hash computation runs on one task (measured 11 s
    // single-task vs 2 s spread across the cluster).
    val grams = documents(spark, dir)
      .select(col("doc_id"), explode(shingles(col("text"))).as("gram"))
      .repartition(col("doc_id"))
      .persist()
    val counts = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))

    val spark2 = grams.sparkSession
    import spark2.implicits._
    val seedDf = (0 until MinHashK)
      .map(i => (i, i / rows, seedA(i), seedB(i)))
      .toDF("seed", "band", "a", "b")
    val minhashes = grams
      .withColumn("gh", md5Base28(col("gram")))
      .crossJoin(broadcast(seedDf))
      .select(col("doc_id"), col("seed"), col("band"),
        ((col("a") * col("gh") + col("b")) % MinHashP).as("h"))
      .groupBy(col("doc_id"), col("seed"), col("band"))
      .agg(min(col("h")).as("mh"))

    val buckets = minhashes
      .groupBy(col("doc_id"), col("band"))
      .agg(array_sort(collect_list(struct(col("seed"), col("mh")))).as("sm"))
      .select(col("doc_id"), col("band"),
        md5(concat_ws(",", transform(col("sm"), s => s.getField("mh")))).as("bucket"))

    val candidates = buckets.select(col("doc_id").as("a_id"), col("band"), col("bucket"))
      .join(buckets.select(col("doc_id").as("b_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()

    materializeAndRelease(verifyCandidates(candidates, grams, threshold), grams)
  }

  /** Exact-Jaccard verification of candidate pairs through a shingle
    * posting list — the shared second phase of every
    * candidate-generation tier (MinHash bands, winnowing fingerprints).
    * Joins on hashed grams (narrower shuffle, same counts). */
  private def verifyCandidates(candidates: DataFrame, grams: DataFrame,
      threshold: Double): DataFrame = {
    val counts = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val hashed = grams.select(col("doc_id"), md5Long(col("gram")).as("gram_h"))
    val common = candidates
      .join(hashed.select(col("doc_id").as("a_id"), col("gram_h")), Seq("a_id"))
      .join(hashed.select(col("doc_id").as("b_id"), col("gram_h")), Seq("b_id", "gram_h"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_common"))

    common
      .join(counts.select(col("doc_id").as("a_id"), col("n_grams").as("a_n")), Seq("a_id"))
      .join(counts.select(col("doc_id").as("b_id"), col("n_grams").as("b_n")), Seq("b_id"))
      .withColumn("jaccard",
        col("n_common") / (col("a_n") + col("b_n") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** D4b: SimHash-bucketed near-dup pairs — bucket on the signature's
    * top 20 bits (documents within small hamming distance usually agree
    * on a prefix band; multiple rotated bands raise recall at scale),
    * then verify candidates with bit_count(xor) ≤ maxHamming. Fully
    * SQL-expressible, so unlike the other candidate tiers this one is
    * oracle-checked end to end. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 8): DataFrame = {
    // persist: without materialization the interpreted simhash
    // expression re-evaluates inside both join branches (measured 140 s
    // vs ~2 s at sf0.1). Note this synthetic corpus's shared vocabulary
    // clusters signatures, so the prefix bucket degrades toward
    // all-pairs here; on a real heterogeneous corpus the 2^20 buckets
    // partition the join. The hamming filter is cheap either way.
    val sigs = documents(spark, dir)
      .withColumn("simhash", simhash(col("text")))
      .select(col("doc_id"), col("simhash"),
        shiftright(col("simhash"), SimHashBits - 20).as("bucket"))
      .repartition(col("doc_id"))
      .persist()
    val a = sigs.select(col("doc_id").as("a_id"), col("simhash").as("a_sig"), col("bucket"))
    val b = sigs.select(col("doc_id").as("b_id"), col("simhash").as("b_sig"), col("bucket"))
    val result = a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
    materializeAndRelease(result, sigs)
  }

  /** D6: winnowing near-dup pairs via the Rabin-Karp rolling-hash
    * fingerprint (see functions.RollingFingerprint) — sub-token
    * granularity, robust to word-boundary edits, guaranteed to flag any
    * shared substring ≥ w+k-1 chars. Same inverted-index join shape as
    * D2, but the posting list is the compact winnowed set instead of
    * every shingle. Not SQL-expressible → rows-only driver check;
    * DedupSpec asserts agreement with the exact-Jaccard pairs. */
  val FingerprintDfCap = 50

  def rollingFingerprintPairs(spark: SparkSession, dir: String,
      minShared: Int = 5, threshold: Double = 0.8): DataFrame = {
    val raw = documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.RollingFingerprint(col("text"))).as("fp"))
      .repartition(col("doc_id"))
      .persist()
    // doc-frequency cap: fingerprints shared corpus-wide (boilerplate /
    // common-vocab substrings) only fan out the candidate join without
    // identifying near-dup PAIRS; dropping them is standard winnowing
    // practice. Final output is unchanged — candidates are verified
    // with exact Jaccard — as long as true dups still share >= minShared
    // rare fingerprints (they do: near-identical docs share their long,
    // pair-specific substrings).
    val hot = raw.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > FingerprintDfCap).select(col("fp"))
    val fps = raw.join(broadcast(hot), Seq("fp"), "left_anti")
    val a = fps.select(col("doc_id").as("a_id"), col("fp"))
    val b = fps.select(col("doc_id").as("b_id"), col("fp"))
    val candidates = a.join(b, Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("a_id"), col("b_id"))
    // fingerprint matches are candidates; exact Jaccard confirms (same
    // two-phase shape as the MinHash tier)
    val grams = documents(spark, dir)
      .select(col("doc_id"), explode(shingles(col("text"))).as("gram"))
      .repartition(col("doc_id"))
      .persist() // feeds counts + both verification join sides
    materializeAndRelease(verifyCandidates(candidates, grams, threshold), raw, grams)
  }


  val SimHashBits = 60

  /** 60-bit SimHash over word tokens: bit j is set when the majority of
    * token hashes have bit j set. Single-expression implementation —
    * see functions.SimHash64 for why not nested higher-order functions
    * (interpreted, ~30× slower on real evaluation). */
  def simhash(text: Column): Column =
    graft.functions.SimHash64(text, SimHashBits)

  /** D4: per-document SimHash signatures, rolled up by source with the
    * distinct-signature count (the dedup-relevant statistic). Pair
    * generation at scale buckets on signature prefixes + verifies
    * hamming distance ≤ k via bit_count(xor) — exercised in the test
    * suite; the full pair join is O(n²) at small SF and adds no
    * operator coverage. */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("simhash", simhash(col("text")))
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))
  }
}
