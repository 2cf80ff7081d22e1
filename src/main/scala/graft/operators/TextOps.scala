package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for a training-data pipeline over `documents`.
  *
  * All pure column expressions (codegen'd): tokenization, quality
  * scoring, language ID, fingerprinting. These run as a single
  * map-stage over the corpus — no shuffle until the final per-group
  * aggregate — so they stream at scan speed on a 100 TB corpus.
  */
object TextOps {

  /** Whitespace tokens of trimmed text (empty text → empty array). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= lit(""))

  /** Token count: whitespace tokenization (the reference counts words
    * nowhere, but embedding truncation hydrate_vectors.py:80-106 is the
    * length-budget analog). Per-language rollup. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("lang"))
  }

  /** BPE-ish pre-tokenization pattern (GPT-2 style, simplified to the
    * intersection of Java and RE2 regex — no lookahead): a token is an
    * optionally space-prefixed letter run, digit run, or punctuation
    * run. Whitespace is an EXPLICIT char class, not \s: Java's \s
    * includes U+000B where RE2's does not, which would skew the DuckDB
    * oracle counts on vertical-tab input. Counting these approximates
    * LLM token budgets far better than whitespace splitting on
    * punctuation-dense text. */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \\t\\n\\r\\f]+"

  /** T1b: token counting under the BPE-ish regex vs whitespace — the
    * two token-budget estimators a training pipeline runs side by side. */
  def bpeTokenCounts(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("n_ws_tokens", size(tokens(col("text"))))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0))))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ws_tokens")).as("ws_tokens"),
        sum(col("n_bpe_tokens")).as("bpe_tokens"))
      .orderBy(col("lang"))
  }

  private[graft] val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Quality scoring: length, punctuation density, stopword ratio —
    * the standard cheap filters applied before LLM training ingestion.
    * Score is a deterministic decimal so the oracle hash-matches. */
  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(lit): _*)))
    val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    // Ratios as floor'd parts-per-million ints: floor over identical
    // double math is engine-portable, unlike decimal-division or
    // round-half rounding whose tie behavior differs across engines.
    documents(spark, dir)
      .withColumn("n_tokens", nTok)
      .withColumn("n_stopwords", nStop)
      .withColumn("n_punct", nPunct)
      .withColumn("stopword_ppm",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(floor(col("n_stopwords") * lit(1000000.0) / col("n_tokens"))))
      .withColumn("quality_ppm",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(floor(
            (least(col("n_tokens"), lit(100)) / lit(100.0) * 0.5
              + col("n_stopwords") / col("n_tokens").cast("double") * 0.5) * lit(1000000.0))))
      .select(col("doc_id"), col("n_tokens"), col("n_stopwords"), col("n_punct"),
        col("stopword_ppm"), col("quality_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose — broadcast as literals into codegen. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "por"),
    "de" -> Seq("der", "die", "und", "das", "ein"))

  /** Language ID: argmax of per-language marker-token hits, 'und' when
    * nothing matches. Emitted as a predicted×actual confusion matrix so
    * the heuristic's behavior is itself inspectable.
    *
    * Marker hits count via regexp_count with word boundaries (codegen)
    * rather than tokenize-then-filter lambdas (interpreted — measured
    * ~5× slower at sf0.1). \b semantics equal token equality here
    * because markers are \w-only words. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val lowered = lower(col("text"))
    val hitCols: Seq[(String, Column)] = LangMarkers.map { case (lang, markers) =>
      lang -> regexp_count(lowered, lit("\\b(" + markers.mkString("|") + ")\\b"))
    }
    val best = hitCols.foldLeft((lit("und"), lit(0))) { case ((bl, bh), (lang, hits)) =>
      // strictly-greater keeps the first language on ties → deterministic
      (when(hits > bh, lit(lang)).otherwise(bl), greatest(hits, bh))
    }
    documents(spark, dir)
      .withColumn("predicted", best._1)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text
    * — the cheap exact-dup key (rolling-hash shingle fingerprints live in
    * Dedup). Rolled up per source to show corpus-level uniqueness. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("fingerprint", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fingerprint")).as("n_unique"))
      .orderBy(col("source"))
  }

  /** PII patterns shared with the t5 oracle SQL — kept to the regex
    * subset Java and RE2 (DuckDB) agree on (char classes, bounded
    * repetition, \b, alternation; no lookaround, no backrefs). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b555-[0-9]{4}\\b"

  /** T5: PII scrubbing — count and mask email/phone occurrences, the
    * redaction pass a training corpus runs before tokenization.
    *
    * The fixtures carry no natural PII (documents is synthetic word
    * salad), so the operator derives a deterministic contact-card
    * string per customer row — same fixture-synthesis precedent as the
    * s4-s6 landed-file sources — and scrubs THAT. What the oracle then
    * proves is the part that matters for the engine: regexp_count /
    * global regexp_replace parity across engines on the shared
    * patterns, occurrence-count variance included (c_custkey mod 3
    * phone repetitions, so 0/1/2-match rows all occur). The scrubbed
    * text is emitted as a 60-bit hash: a masked-output mismatch of even
    * one character fails the row.
    *
    * Scale shape: map-only (PlanSpec-asserted) — regex work rides the
    * scan, the one shape that streams at 100 TB. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val profile = concat(
      lit("Customer "), col("c_name"),
      lit(" reachable at user"), col("c_custkey").cast("string"),
      lit("@example."),
      when(pmod(col("c_nationkey"), lit(2)) === 0, lit("com")).otherwise(lit("org")),
      expr("repeat(concat(' call 555-', lpad(cast(c_custkey % 10000 as string), 4, '0')), cast(c_custkey % 3 as int))"),
      lit(" segment "), col("c_mktsegment"))
    val scrubbed = regexp_replace(
      regexp_replace(profile, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")
    customer(spark, dir)
      .select(col("c_custkey"),
        regexp_count(profile, lit(EmailPattern)).as("n_emails"),
        regexp_count(profile, lit(PhonePattern)).as("n_phones"),
        Dedup.md5Long(scrubbed).as("scrub_h"))
      .orderBy(col("c_custkey"))
  }

  /** The PUBLISHED repetition thresholds — the operator's defaults
    * (Gopher's repetition removal, Rae et al. arXiv:2112.11446 §A1.1:
    * a document whose duplicate word-2-gram fraction, or whose single
    * most frequent 2-gram's share, exceeds ~0.2 is removed). */
  val GopherDupGramPpm = 200000L
  val GopherTopGramPpm = 200000L

  /** t6 GATE thresholds (ppm) — the fixture operating point, passed
    * explicitly at the gate call site ([[repetitionStats]]). The
    * fixture's tiny synthetic vocabulary puts baseline repetition far
    * below the published 0.2 fractions, so the gate runs at the
    * fixture's ~P90 — both branches of the flag occur and are
    * oracle-checked; a production corpus just omits the arguments and
    * gets the Gopher defaults. */
  val DupGramPpmMax = 65000L
  val TopGramPpmMax = 65000L

  /** t6: intra-document repetition stats — the Gopher-style repetition
    * filter over word 2-grams: what fraction of a doc's 2-grams are
    * repeats of an earlier one (`dup_gram_ppm`), and what fraction the
    * single most frequent 2-gram occupies (`top_gram_ppm`). Boilerplate,
    * scraped template farms, and decode loops all light up one of the
    * two before any model-based filter needs to run.
    *
    * Plan shape for 100 TB: 2-grams are built IN the scan stage (adjacent
    * zip of the token array — no self-join), then one shuffle to count
    * (doc_id, gram) with map-side partial aggregation, then a per-doc
    * rollup in which the top gram is a max(struct) — never a window. Doc
    * cardinality bounds both exchanges; nothing is corpus-quadratic.
    * Docs with <2 tokens keep a row (null-gram sentinel both engines)
    * with zero stats — every input doc is accounted for, the etl1b rule.
    *
    * Determinism: top-gram ties break to the lexicographically LARGEST
    * gram (struct ordering on (count, gram)); the oracle mirrors with
    * ORDER BY c DESC, gram DESC. */
  def repetitionStatsOf(docs: DataFrame,
      dupGramPpmMax: Long = GopherDupGramPpm,
      topGramPpmMax: Long = GopherTopGramPpm): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val grams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    // <2 tokens → no grams: keep the doc via a null-gram sentinel so the
    // rollup emits its zero row (explode alone would drop it)
    val gramsOrSentinel =
      when(size(grams) === 0, array(lit(null).cast("string"))).otherwise(grams)
    val dupPpm = when(col("n_grams") === 0, lit(0L))
      .otherwise(floor((col("n_grams") - col("n_distinct")) * lit(1000000.0) / col("n_grams")))
    val topPpm = when(col("n_grams") === 0, lit(0L))
      .otherwise(floor(col("top.c") * lit(1000000.0) / col("n_grams")))
    docs
      .select(col("doc_id"), explode(gramsOrSentinel).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(when(col("gram").isNull, lit(0L)).otherwise(col("c"))).as("n_grams"),
        count(col("gram")).as("n_distinct"),
        max(when(col("gram").isNotNull,
          struct(col("c").as("c"), col("gram").as("gram")))).as("top"))
      .select(col("doc_id"), col("n_grams"),
        dupPpm.as("dup_gram_ppm"),
        coalesce(col("top.gram"), lit("")).as("top_gram"),
        topPpm.as("top_gram_ppm"),
        (dupPpm > dupGramPpmMax || topPpm > topGramPpmMax).as("flagged"))
      .orderBy(col("doc_id"))
  }

  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    repetitionStatsOf(documents(spark, dir), DupGramPpmMax, TopGramPpmMax)

  /** T7: perplexity-style quality filtering — the CCNet recipe
    * (Wenzek et al. 2020, arXiv:1911.00359 — public method): score
    * every document against a language model and bucket each
    * language's distribution into head/middle/tail; training corpora
    * keep the head and middle, inspect or drop the tail. The LM here
    * is the corpus' own bigram statistics (the self-supervised
    * degenerate case — production swaps in Wikipedia-trained counts
    * through the same join), and the per-bigram log-probability is
    * QUANTIZED to its integer floor:
    * `log2(cnt) ↓ = length(bin(cnt)) - 1`, so a document's surprisal
    * `Σ (log2(N)↓ - log2(cnt)↓) / n_bigrams` is exact integer
    * arithmetic plus one floor'd double division (the t2 ppm
    * convention) — bit-identical across engines, where true
    * floating-point `ln` is only ulp-close and would flake the hash
    * gate. Rare-bigram documents (word salad, OCR noise, wrong-lang
    * text) score high; formulaic text scores low — the ordering the
    * filter needs, at integer precision.
    *
    * Plan shape for 100 TB: bigrams are built in the scan stage (t6's
    * adjacent zip), counted with one partial-aggregated shuffle on the
    * 60-bit gram hash, and joined back hash-to-hash (fanout exactly 1
    * per occurrence — no posting lists); the corpus total broadcasts
    * as a one-row frame. The per-language NTILE window makes the
    * head/middle/tail cut exactly reproducible at fixture scale; a
    * production corpus computes the two cutpoints per language from a
    * sample (CCNet's own practice) and applies them map-side instead
    * of sorting a language's every document. Docs with <2 tokens keep
    * a zero-stats row (the t6 accounting rule) and land in the head
    * bucket deterministically. */
  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    bigramSurprisalOf(documents(spark, dir))

  /** Frame-based form of [[bigramSurprisal]] — the spec suite plants
    * known-frequency corpora through it (the repetitionStatsOf pattern). */
  private[graft] def bigramSurprisalOf(input: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import CacheOps.materializeAndRelease
    val (all, cached) = surprisalScoresOf(input)
    val byLang = Window.partitionBy(col("lang"))
      .orderBy(col("surprisal_milli"), col("doc_id"))
    val result = all
      .withColumn("ppl_bucket", ntile(3).over(byLang))
      .orderBy(col("doc_id"))
    materializeAndRelease(result, cached: _*)
  }

  /** The t7 per-doc score frame (doc_id, lang, n_bigrams,
    * surprisal_milli) BEFORE any bucketing — shared by the exact-NTILE
    * (t7) and sampled-cutpoint (t7b) assignment tiers. Returns the
    * frame plus the persisted inputs the caller must release. */
  private def surprisalScoresOf(input: DataFrame): (DataFrame, Seq[DataFrame]) = {
    import CacheOps.shared
    val toks = tokens(col("text"))
    val n = size(toks)
    val grams2 = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val docs = shared(input
      .repartition(col("doc_id")) // BEFORE hashing — see Dedup.ngramJaccardPairs
      .select(col("doc_id"), col("lang"), grams2.as("grams")))
    val g = shared(docs
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), Dedup.md5Long(col("gram")).as("gram_h")))
    val counts = g.groupBy(col("gram_h")).agg(count(lit(1)).as("cnt"))
    // Σ cnt over the |distinct grams| counts frame ≡ count(*) over the
    // corpus-sized g (round 17, guide §2.3): the total was g's THIRD
    // full-cache pass; summing the aggregate it already pays for drops
    // one corpus-sized scan per t7/t7b call
    val tot = counts.agg(sum(col("cnt")).as("n_total"))
    val per = g.join(counts, Seq("gram_h"))
      .crossJoin(broadcast(tot))
      .withColumn("q", length(bin(col("n_total"))) - length(bin(col("cnt"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        floor(sum(col("q")) * lit(1000.0) / count(lit(1))).cast("bigint")
          .as("surprisal_milli"))
    val all = docs.select(col("doc_id"), col("lang"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_milli"), lit(0L)).as("surprisal_milli"))
    (all, Seq(docs, g))
  }

  /** t7b sample rate: keep a doc in the cutpoint sample when its
    * 16-bit md5 bucket falls under 16384/65536 = 1/4 (the c4 exact
    * power-of-two hash-membership rule, "t7b:"-salted so the sample is
    * independent of every other hash-derived decision). */
  val SampleCutBuckets = 16384

  /** t7b: CCNet's production bucketing — head/middle/tail CUTPOINTS
    * derived from a deterministic hash sample, then applied MAP-SIDE
    * to every doc. This is the swap t7's scaladoc names: the exact
    * per-lang NTILE is a whole-language sort, the one part of t7 that
    * doesn't scale past a shuffle; cutpoints from a sample cost a
    * window over the SAMPLE only, and assignment becomes a broadcast
    * of |langs|×2 cut rows into the score scan.
    *
    * Exactness: the sample is hash-membership (not rand()), the
    * cutpoints are rank-statistics of the sample (value at positions
    * ceil(n/3), ceil(2n/3) under (score, doc_id) order — no
    * interpolation, no doubles), and assignment is two integer
    * comparisons — all mirrored verbatim in the oracle, so t7b is
    * hash-checked end to end. A lang with zero sampled docs falls to
    * the middle bucket (any lang with ≥1 sample has both cuts). */
  def bigramSurprisalSampled(spark: SparkSession, dir: String): DataFrame =
    bigramSurprisalSampledOf(documents(spark, dir))

  private[graft] def bigramSurprisalSampledOf(input: DataFrame,
      persist: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import CacheOps.{materializeAndRelease, shared}
    val (allRaw, cached) = surprisalScoresOf(input)
    val all = if (persist) shared(allRaw) else allRaw
    val sample = all.filter(
      conv(substring(md5(concat(lit("t7b:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("int") < SampleCutBuckets)
    val bySample = Window.partitionBy(col("lang"))
      .orderBy(col("surprisal_milli"), col("doc_id"))
    val ranked = sample
      .withColumn("rn", row_number().over(bySample))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy(col("lang"))))
    // ceil(n/3) = (n+2) div 3 — integer on both engines, no doubles
    val cuts = ranked
      .filter(col("rn") === expr("(ns + 2) div 3") ||
        col("rn") === expr("(ns * 2 + 2) div 3"))
      .groupBy(col("lang"))
      .agg(min(col("surprisal_milli")).as("c1"),
        max(col("surprisal_milli")).as("c2"))
    val result = all
      .join(broadcast(cuts), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("surprisal_milli"),
        when(col("c1").isNull, lit(2))
          .when(col("surprisal_milli") <= col("c1"), lit(1))
          .when(col("surprisal_milli") <= col("c2"), lit(2))
          .otherwise(lit(3)).as("ppl_bucket"))
      .orderBy(col("doc_id"))
    if (persist) materializeAndRelease(result, (cached :+ all): _*)
    else { cached.foreach(_.unpersist(true)); result }
  }

  /** t9 chunk geometry: window of 32 tokens, stride 24 (8-token
    * overlap) — the RAG-ingestion shape (chunk ≈ retrieval unit,
    * overlap so no sentence straddles a boundary unseen). */
  val ChunkWindow = 32
  val ChunkStride = 24

  /** t9: RAG chunking — split every document into overlapping
    * token-window chunks with exact offsets. Chunk count is
    * 1 + ceil((n − W)/S) (pure integer arithmetic, engine-exact);
    * chunk i covers tokens [1 + i·S, …] for min(W, remaining) tokens;
    * the final chunk is allowed short so every token is covered.
    * The chunk TEXT itself is pinned cross-engine via md5 of the
    * space-rejoined token slice — proving the actual chunk contents,
    * not just the geometry. Zero-token docs produce zero chunks.
    *
    * Plan shape: project → explode — MAP-ONLY, no exchange anywhere
    * (asserted in PlanSpec). At 100 TB this is the property that
    * matters: chunking is a scan-stage transform that pipelines into
    * whatever consumes it (embedding, indexing) with no barrier. */
  def chunkWindows(spark: SparkSession, dir: String): DataFrame =
    chunkWindowsOf(documents(spark, dir))

  private[graft] def chunkWindowsOf(input: DataFrame): DataFrame = {
    val W = ChunkWindow
    val S = ChunkStride
    val toks = tokens(col("text"))
    val withN = input
      .select(col("doc_id"), col("lang"), toks.as("w"))
      .withColumn("n", size(col("w")).cast("bigint"))
      .filter(col("n") >= 1)
      .withColumn("n_chunks",
        when(col("n") <= W, lit(1L))
          .otherwise(lit(1L) + floor((col("n") - W + (S - 1)) / lit(S))))
    withN
      .select(col("doc_id"), col("lang"), col("w"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("start_tok", lit(1L) + col("chunk_id") * S)
      .withColumn("chunk_len",
        least(lit(W.toLong), col("n") - col("start_tok") + 1))
      .select(col("doc_id"), col("chunk_id"), col("lang"),
        col("start_tok"), col("chunk_len"),
        md5(array_join(
          slice(col("w"), col("start_tok").cast("int"), col("chunk_len").cast("int")),
          " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Count-min sketch geometry for [[heavyHitters]]: 3 hash rows of
    * 1024 buckets. At the 1/[[HhSupportDiv]] support threshold the
    * sketch's overcount (≤ N/1024 per row w.h.p., and the MIN over 3
    * rows in practice far less) stays well under the N/256 bar, so the
    * candidate set stays close to the true heavy-hitter set. */
  val HhSeeds: Seq[Int] = Seq(17, 41, 97)
  val HhWidth = 1024
  val HhSupportDiv = 256

  /** T10: vocabulary heavy hitters — every token whose corpus frequency
    * is ≥ 1/256 of all token occurrences, EXACTLY, without ever
    * shuffling the full vocabulary. The classic two-pass sketch
    * discipline:
    *
    * pass 1 builds a count-min sketch: each occurrence maps to 3
    * (hash-row, bucket) cells; the groupBy's PARTIAL aggregate collapses
    * a task's occurrences to ≤ 3×1024 cells before the single exchange,
    * so the shuffle carries O(sketch) rows per task regardless of corpus
    * size. pass 2 re-scans, looks each token's 3 cells up in the
    * BROADCAST sketch (3 map-side joins, no shuffle), and keeps
    * occurrences whose MIN cell count clears the threshold — CMS never
    * undercounts, so the surviving candidates are a SUPERSET of the true
    * heavy hitters. Only those occurrences reach the exact groupBy; the
    * final HAVING trims sketch overcounts. The emitted counts are
    * therefore EXACT (the oracle is a plain GROUP BY/HAVING, no sketch),
    * while the vocabulary-sized shuffle a naive exact plan pays — the
    * scale killer on a 100 TB corpus where |vocab| grows into the
    * billions of rare strings — never happens: rare tokens die at the
    * broadcast filter, on the map side.
    *
    * Contrast with a5b (HLL): there the SKETCH VALUE is the answer
    * (tolerance oracle); here the sketch only prunes and the answer is
    * exact (hash oracle). */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHittersOf(documents(spark, dir))

  private[graft] def heavyHittersOf(docs: DataFrame): DataFrame = {
    import CacheOps.materializeAndRelease
    val (cand, thresh, cached) = heavyHitterCandidates(docs)
    // materialize only AFTER the exact groupBy: the result is bounded
    // by the heavy-hitter vocabulary (≤ HhSupportDiv rows), while the
    // candidate-OCCURRENCE frame can be a large constant fraction of
    // the corpus on stopword-dominated text — checkpointing it would
    // spool corpus-scale data to executor storage (round-9 ADVICE)
    val exact = cand
      .groupBy(col("token"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thresh)
      .select(col("token"), col("cnt"))
    materializeAndRelease(exact, cached: _*)
      .orderBy(desc("cnt"), col("token"))
  }

  /** The candidate-occurrence frame (pass 2's output, pre-exact-count),
    * the threshold column expression over its `n` column, and the
    * persisted frames the CALLER must release once its bounded result
    * is materialized — split out so the spec can assert the prune is
    * both EFFECTIVE (candidates ≪ vocabulary) and SAFE (superset of
    * the truth). The occurrence frame itself is returned LAZY:
    * candidates can be a large fraction of all occurrences (stopword-
    * heavy corpora), so it must never be checkpointed — only the
    * post-groupBy exact counts are bounded. */
  private[graft] def heavyHitterCandidates(docs: DataFrame,
      persist: Boolean = true): (DataFrame, Column, Seq[DataFrame]) = {
    import CacheOps.shared
    val tok = docs.select(explode(tokens(col("text"))).as("token"))
    def bkt(seed: Int): Column = pmod(xxhash64(lit(seed), col("token")), lit(HhWidth))
    // pass 1: one aggregation over (hash-row, bucket) — ≤ 3*1024 rows
    // out. Persisted: it feeds three probe joins plus the total, and
    // unpersisted each consumer would re-run the corpus aggregation
    // (the self-join pathology measured on the minhash bucket join).
    // persist=false keeps the whole plan lazy for PlanSpec introspection.
    val sketch0 = tok
      .select(posexplode(array(HhSeeds.map(bkt): _*)).as(Seq("si", "bucket")))
      .groupBy(col("si"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val sketch = if (persist) shared(sketch0) else sketch0
    // N = Σ cells of any single hash row — already in the sketch; a
    // separate tok.count() would be a third corpus scan (round-9 review)
    val tot = sketch.filter(col("si") === 0).agg(sum(col("c")).as("n"))
    val thresh = greatest(lit(1L), floor(col("n") / lit(HhSupportDiv.toDouble)).cast("long"))
    // pass 2: 3 broadcast lookups pin each occurrence's cells as columns
    val looked = HhSeeds.zipWithIndex.foldLeft(
      tok.crossJoin(broadcast(tot))) { case (acc, (seed, i)) =>
      acc.join(
        broadcast(sketch.filter(col("si") === i)
          .select(col("bucket").as(s"b$i"), col("c").as(s"c$i"))),
        bkt(seed) === col(s"b$i"))
    }
    val est = least(HhSeeds.indices.map(i => col(s"c$i")): _*)
    val cand0 = looked.filter(est >= thresh).select(col("token"), col("n"))
    (cand0, thresh, if (persist) Seq(sketch) else Nil)
  }

  /** T11: BM25 lexical ranking — the keyword half of the reference's
    * hybrid search (app_old.py:64-162 pairs Pinecone semantic hits
    * with LIKE-filtered analytics; a corpus engine needs the ranked
    * lexical tier, not just the boolean filter p7 provides). Okapi
    * BM25 at k1=1.2, b=0.75 with the folklore constants folded to
    * integers (k1=6/5, b=3/4), and the idf LOG REPLACED by its exact
    * Robertson ratio (N - df + 0.5)/(df + 0.5) = (2N-2df+1)/(2df+1) —
    * a rational in corpus integers. `ln` is only ulp-close across
    * engines (the t7 lesson), so the whole per-term weight becomes ONE
    * integer quotient:
    *
    *   score_milli(d) = Σ_t (44000·tf·T·(2N-2df+1))
    *                        div ((2df+1)·(20·tf·T + 6·T + 18·dl·N))
    *
    * where T = Σ dl (so avgdl = T/N never materializes as a float),
    * 44·tf·T / (20·tf·T + 6·T + 18·dl·N) is the exact BM25 saturation
    * term over the common denominator 20T, and `div` is integral
    * division — bit-identical in Spark and DuckDB. The two products
    * are formed in DECIMAL(38,0) (Spark longs wrap silently past
    * ~10^18; 38 digits covers a 100 TB corpus' tf·T·N terms), while
    * `div` still emits BIGINT scores.
    *
    * Plan shape for 100 TB: per-term tf columns come from `filter`+
    * `size` over the token array — NO explode, NO posting-list
    * shuffle; corpus stats (N, T, per-term df) collapse to ONE row via
    * partial aggregation and broadcast back; the ranked page is
    * TakeOrderedAndProject. Two corpus passes total (stats, score),
    * sharing one persisted projection. */
  def bm25Rank(spark: SparkSession, dir: String): DataFrame =
    bm25Of(documents(spark, dir), Bm25Terms, 10)

  /** Query-string → BM25 terms, tokenized exactly as [[tokens]]
    * splits DOCUMENT text (Java \s+, which includes U+000B) — a query
    * term can only ever match if it is producible as a doc token, so
    * the query side must use the doc side's splitter, not StubEmbed's
    * narrower class (round-9 review). */
  private[graft] def bm25TermsOf(query: String): Seq[String] =
    query.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toSeq.filter(_.nonEmpty).distinct

  /** The gate query's terms (the stub-retrieval DefaultQuery). */
  private[graft] val Bm25Terms: Seq[String] =
    bm25TermsOf(Similarity.DefaultQuery)

  private[graft] def bm25Of(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    import CacheOps.materializeAndRelease
    val (scored, cached) = bm25ScoredOf(docs, terms, persist = true)
    val page = scored
      .filter(col("score_milli") > 0) // retrieval ranks MATCHING docs only
      .orderBy(desc("score_milli"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("score_milli"))
      .orderBy(col("doc_id"))
    materializeAndRelease(page, cached: _*)
  }

  /** The full scored frame (doc_id, lang, score_milli) before the
    * top-k cut — shared by t11 and the v13 hybrid fusion, and probed
    * directly by the spec's driver-side mirror. Returns the frame plus
    * the persisted inputs the caller must release (the surprisal
    * convention): the base projection is consumed twice (stats pass +
    * score pass). persist=false keeps the plan lazy for PlanSpec. */
  private[graft] def bm25ScoredOf(docs: DataFrame, terms: Seq[String],
      persist: Boolean = false, extra: Seq[String] = Nil): (DataFrame, Seq[DataFrame]) = {
    import CacheOps.shared
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = tokens(col("text"))
    def tfc(i: Int) = col(s"tf$i").cast("long")
    val base0 = docs.select(
      col("doc_id") +: col("lang") +: (extra.map(col) :+
        size(toks).cast("long").as("dl")) ++:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => lower(x) === lit(t))).as(s"tf$i")
        }: _*)
    val base = if (persist) shared(base0) else base0
    val aggs: Seq[Column] =
      coalesce(sum(col("dl")), lit(0L)).as("tot") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = base.agg(count(lit(1)).as("n"), aggs: _*)
    val withParts = terms.indices.foldLeft(base.crossJoin(broadcast(stats))) {
      case (acc, i) =>
        val (num, den) =
          bm25NumDen(tfc(i), col("dl"), col(s"df$i"), col("n"), col("tot"))
        acc.withColumn(s"num$i", num).withColumn(s"den$i", den)
    }
    val scored = withParts
      .withColumn("score_milli",
        terms.indices.map(i => expr(s"num$i div den$i")).reduce(_ + _))
      .select(col("doc_id") +: col("lang") +: extra.map(col) :+
        col("score_milli"): _*)
    (scored, if (persist) Seq(base) else Seq.empty)
  }

  /** T11d: faceted search — the full search-RESPONSE shape (top-k
    * hits PLUS per-facet match counts, the sidebar every search UI
    * shows) computed from ONE matching-set frame: the t11 scored
    * frame filters to matches once (persisted), then the hit page and
    * the lang/source facet rollups all read it — no second corpus
    * pass per facet. Output is a tagged union (kind ∈ hit /
    * facet_lang / facet_source) with the variant-specific fields
    * rendered as strings and absent fields as '' so the frame stays
    * single-schema and null-free (cross-engine rendering of nullable
    * ints diverges). At scale the facet rollups are partial-agged
    * counts over the matching set — bounded by matches, not corpus. */
  def bm25Faceted(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25FacetedOf(documents(spark, dir), Bm25Terms, k)

  private[graft] def bm25FacetedOf(docs: DataFrame, terms: Seq[String],
      k: Int): DataFrame = {
    import CacheOps.{materializeAndRelease, shared}
    val (scored, cached) = bm25ScoredOf(docs, terms, persist = true,
      extra = Seq("source"))
    val matching = shared(scored.filter(col("score_milli") > 0))
    val hits = matching
      .orderBy(desc("score_milli"), col("doc_id")).limit(k)
      .select(lit("hit").as("kind"), lit("").as("key"),
        col("doc_id").cast("string").as("doc_id"), lit("").as("n"),
        col("score_milli").cast("string").as("score_milli"))
    def facet(kind: String, c: String) = matching
      .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .select(lit(kind).as("kind"), col(c).as("key"),
        lit("").as("doc_id"), col("cnt").cast("string").as("n"),
        lit("").as("score_milli"))
    val result = hits
      .unionByName(facet("facet_lang", "lang"))
      .unionByName(facet("facet_source", "source"))
      .orderBy(col("kind"), col("key"), col("doc_id"))
    materializeAndRelease(result, cached :+ matching: _*)
  }

  /** The one BM25 weight, as (numerator, denominator) column pair —
    * shared by the wide scan form (t11, per-term columns) and the
    * landed-index row form (t11b, one posting row per (doc, term)) so
    * the two paths cannot drift. Products are formed in DECIMAL(38,0):
    * tf·T·N-shaped terms wrap BIGINT silently past ~10^18 tokens·docs
    * (Spark long overflow is unchecked), and the scale probes multiply
    * exactly those factors; `div` on decimals still yields BIGINT.
    * greatest(…,1) on the denominator pins the all-empty-corpus 0/0
    * to a 0 contribution on both engines. */
  private def bm25NumDen(tf: Column, dl: Column, df: Column,
      n: Column, tot: Column): (Column, Column) = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val num = dec(lit(44000L)) * dec(tf) * dec(tot) *
      dec(lit(2L) * n - lit(2L) * df + lit(1L))
    val den = greatest(
      dec(lit(2L) * df + lit(1L)) *
        (dec(lit(20L)) * dec(tf) * dec(tot) + dec(lit(6L)) * dec(tot) +
          dec(lit(18L)) * dec(dl) * dec(n)),
      dec(lit(1L)))
    (num, den)
  }

  /** T11b: BM25 over a LANDED inverted index — the repeated-query
    * serving form (the v9 landed-IVF discipline applied to lexical
    * search). [[materializeBm25Index]] lands two artifacts once per
    * corpus: `postings/` (doc_id, tok, tf, dl, lang) PARTITIONED BY a
    * constant 64-way token-hash bucket — doc length and lang are
    * DENORMALIZED into the posting row (the classic search-engine
    * layout) so a probe needs no corpus-sized doc-table join — and
    * `stats/`, an append-only table of partial (n, tot) rows plus a
    * `docids/` membership sidecar. A query reads ONLY its terms'
    * bucket directories (partition pruning on the bucket column,
    * plan-asserted) with the term equality pushed to the parquet scan
    * — per-query IO tracks the query terms' posting sizes, never the
    * corpus. Per-term df comes from the pruned posting rows
    * themselves (COUNT DISTINCT doc_id — the same value t11 derives
    * corpus-wide), the weight arithmetic is [[bm25NumDen]] verbatim,
    * and per-doc scores SUM as integers (order-free). Answers to
    * t11's oracle VERBATIM: hash equality proves the landed path
    * serves exactly what the two-pass scan serves. */
  def bm25IndexedTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25IndexedPage(spark, dir, Bm25Terms, k)

  /** The landed-index page for arbitrary terms — also v13b's lexical
    * tier (the hybrid fusion over the landed index). */
  private[operators] def bm25IndexedPage(spark: SparkSession, dir: String,
      terms: Seq[String], k: Int): DataFrame =
    bm25OverIndex(spark, bm25LandedPath(spark, dir), terms, k)

  /** The ONE session landing of the corpus' BM25 index (fingerprint-
    * memoized) — shared by every indexed serving query (t11b, v13b,
    * t13b). */
  private[operators] def bm25LandedPath(spark: SparkSession, dir: String): String =
    Similarity.landOnce(spark, dir, "graft_bm25_idx", bm25Landed,
      source = "documents.parquet")(materializeBm25Index(spark, dir, _))

  private[graft] val Bm25Buckets = 64

  /** Land the inverted index (postings + stats + docids). Clears any
    * staging leftovers a crashed append may have abandoned. */
  def materializeBm25Index(spark: SparkSession, dir: String, path: String): Unit =
    materializeBm25IndexOf(documents(spark, dir), path)

  private[graft] def materializeBm25IndexOf(docs: DataFrame, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(root))
      fs.listStatus(root).filter { s =>
        val n = s.getPath.getName
        n.startsWith("__append_staging") || n.contains("__delete_staging") ||
          n.contains("__compact_staging") || n.contains("__retired_") ||
          n == Bm25AppendLogDir || // stale redo records must not replay into a rebuilt index
          n == "tombs" || // a prior index's liveness sidecar would kill fresh rows
          // stale applied-batch marks would make a RE-LANDED CDC stream
          // (fresh checkpoint at the same path, batch ids restarting at
          // 0) skip its first batches as already-applied
          n == Bm25CdcMarkDir
      }.foreach(s => fs.delete(s.getPath, true))
    writeBm25Batch(docs, path)
  }

  /** T11c support: APPEND a document batch into a landed BM25 index —
    * the day-2 maintenance that keeps lexical search serving while the
    * corpus grows (the v9d discipline for the inverted index).
    * Stage-then-publish: the batch's postings/stats/docids are fully
    * written under a per-writer staging dir FIRST (the slow part — a
    * crash there leaves the live index untouched), then published as
    * a bounded sequence of file renames into the live directories:
    * landed files are never opened or rewritten (byte-identity
    * spec-asserted), `stats/` gains one partial (n, tot) row the probe
    * SUMs, and `docids/` gains the batch's membership rows. Documents
    * already indexed are dropped from the batch (anti-join against the
    * compact docids sidecar) so a retried batch cannot double-count —
    * append is idempotent per document.
    *
    * Publish is CRASH-SAFE through a redo log (the OptimisticLogCommit
    * recovery discipline, CommitProtocol.scala, applied to the index's
    * file-level appends): after staging completes and BEFORE the first
    * rename, the batch claims a record in `_appendlog/` naming its
    * staging dir; the record is dropped only after the staging dir is.
    * [[bm25IndexRecover]] — run here on open, before the ledger read —
    * replays a claimed batch whose staging dir survives (rename-
    * finishing, idempotent: published files are no longer staged) and
    * drops an UNclaimed staging dir (the crash was mid-staging, content
    * incomplete, nothing published). So a crash at ANY point leaves the
    * next open serving either the whole batch or none of it, and the
    * streaming retry's anti-join is never blind to half-published docs.
    * Appends to one index are single-writer by contract (foreachBatch
    * serializes micro-batches; recovery-on-open would treat a second
    * CONCURRENT appender's in-flight publish as a crash). Because
    * per-term df is recomputed from the probed postings at query time,
    * the maintained index answers EXACTLY what a full rebuild answers. */
  def bm25IndexAppend(spark: SparkSession, path: String, delta: DataFrame): Unit = {
    // recover-on-open: replay or drop any half-published batch BEFORE
    // reading the ledger — the anti-join must see every published doc
    bm25IndexRecover(spark, path)
    // idempotence guard: drop currently-live docs (retried batches).
    // Plain anti join — the ledger is corpus-cardinality, never broadcast
    val fresh = delta.join(bm25Members(spark, path), Seq("doc_id"), "left_anti").persist()
    try {
      // a fully-duplicate (retried) batch is a TRUE no-op — no junk
      // (0,0) stats partial, no empty artifacts, no publish
      if (!fresh.isEmpty) {
        // generation tag: one past the ledger's max — monotonic per
        // index, so a re-added doc's new rows outrank its tombstoned
        // ones. The ledger is read anyway (the anti-join above); this
        // is one extra doc-cardinality scalar agg, never postings-sized
        val gen = 1L + spark.read.schema(bm25DocidsSchema).parquet(s"$path/docids")
          .agg(coalesce(max(col("gen")), lit(-1L))).collect()(0).getLong(0)
        stageAndPublish(spark, path)(writeBm25Batch(fresh, _, gen))
      }
    } finally { fresh.unpersist(true); () }
  }

  /** The shared crash-safe publish seam for index MAINTENANCE writes
    * (append batches AND tombstone deletes): stage the artifacts fully
    * under a per-writer `__append_staging_*` dir (a crash there
    * publishes nothing), CLAIM a `_appendlog/` redo record, then
    * publish by bounded file renames. A crash anywhere in the rename
    * sequence is replayed by [[bm25IndexRecover]] at the next open —
    * the record + surviving staging dir are together the redo copy
    * (some files may already be live; re-staging would duplicate
    * them), so every maintenance verb is all-or-nothing to readers at
    * the next open. */
  private def stageAndPublish(spark: SparkSession, path: String)(
      stage: String => Unit): Unit = {
    val stagingName =
      s"__append_staging_${java.util.UUID.randomUUID().toString.take(8)}"
    val staging = s"$path/$stagingName"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // failure while STAGING published nothing — clean up and rethrow
    try stage(staging)
    catch { case e: Throwable =>
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      throw e
    }
    val logDir = new org.apache.hadoop.fs.Path(path, Bm25AppendLogDir)
    fs.mkdirs(logDir)
    val rec = new org.apache.hadoop.fs.Path(logDir, s"$stagingName.json")
    val out = fs.create(rec, false)
    try out.write(staging.getBytes("UTF-8")) finally out.close()
    publishStaged(fs, staging, path)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    fs.delete(rec, false)
    ()
  }

  private[graft] val Bm25AppendLogDir = "_appendlog"

  /** Applied-batch marks for the CDC ingest stream (IndexStream
    * .bm25CdcIngest): `_cdcmark/<checkpoint-key>.<batchId>` marker
    * files, created AFTER a micro-batch's delete+append verbs land.
    * Underscore-prefixed so every parquet read of the index ignores
    * the dir. Cleared on rebuild (above) with the other sidecars. */
  private[graft] val Bm25CdcMarkDir = "_cdcmark"

  /** Redo-log replay for [[bm25IndexAppend]] — closes the mid-publish
    * crash window (round-10 verdict #1). For every `_appendlog/`
    * record: if its staging dir survives, the publish is FINISHED
    * (file-level rename replay — idempotent because already-published
    * files are no longer staged, and file names are UUID-unique) and
    * the staging dir + record dropped; if the staging dir is gone, the
    * publish completed and only cleanup crashed — the record drops.
    * Any `__append_staging_*` dir with NO record crashed mid-staging:
    * its content is incomplete and nothing of it was published, so it
    * drops. Idempotent; called on open by bm25IndexAppend and at
    * stream start by IndexStream.bm25IndexIngest. Single-recoverer by
    * the index's single-writer contract. Returns the actions taken
    * (empty = clean). */
  def bm25IndexRecover(spark: SparkSession, path: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val actions = Seq.newBuilder[String]
    val claimed = scala.collection.mutable.Set.empty[String]
    val logDir = new Path(root, Bm25AppendLogDir)
    if (fs.exists(logDir))
      fs.listStatus(logDir).filter(_.isFile).foreach { s =>
        val stagingName = s.getPath.getName.stripSuffix(".json")
        claimed += stagingName
        val staging = new Path(root, stagingName)
        if (fs.exists(staging)) {
          publishStaged(fs, staging.toString, path)
          fs.delete(staging, true)
          actions += s"replayed=$stagingName"
        } else actions += s"cleared=$stagingName"
        fs.delete(s.getPath, false)
        ()
      }
    fs.listStatus(root).filter { s =>
      s.isDirectory && s.getPath.getName.startsWith("__append_staging") &&
        !claimed.contains(s.getPath.getName)
    }.foreach { s =>
      fs.delete(s.getPath, true)
      actions += s"dropped=${s.getPath.getName}"
    }
    actions.result()
  }

  // Test seam: invoked with each artifact family name ("postings",
  // "stats", "docids") immediately BEFORE that family's staged files
  // move during publish; a spec throws from it to simulate a crash
  // mid-publish (the PartitionedSpec kill-between-CAS-and-rename
  // discipline applied to the index). Identity in production.
  private[graft] var publishFaultHook: String => Unit = _ => ()

  /** Move every staged data file into its live directory (postings
    * bucket dirs created as needed; part-file names are UUID-unique so
    * renames cannot collide). docids moves LAST: its rows are the
    * idempotence guard, so a crash earlier in publish re-runs the
    * batch rather than silently skipping it. */
  private def publishStaged(fs: org.apache.hadoop.fs.FileSystem,
      staging: String, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    def moveFiles(sub: String): Unit = {
      val src = new Path(staging, sub)
      if (fs.exists(src)) {
        val files = fs.listStatus(src).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        val dst = new Path(path, sub)
        if (files.nonEmpty) fs.mkdirs(dst)
        files.foreach { f =>
          // Hadoop rename signals failure by RETURNING FALSE — an
          // unchecked false here would silently drop posting files
          // while docids still publishes (permanent under-scoring)
          if (!fs.rename(f.getPath, new Path(dst, f.getPath.getName)))
            throw new java.io.IOException(
              s"failed to publish staged file ${f.getPath} into $dst")
        }
      }
    }
    val postingsDir = new Path(staging, "postings")
    val bucketDirs =
      if (fs.exists(postingsDir))
        fs.listStatus(postingsDir).filter(_.isDirectory).map(_.getPath.getName).toSeq
      else Seq.empty
    publishFaultHook("postings")
    bucketDirs.foreach(b => moveFiles(s"postings/$b"))
    publishFaultHook("tombs")
    moveFiles("tombs") // staged only by the delete verb; absent for appends
    publishFaultHook("stats")
    moveFiles("stats")
    publishFaultHook("docids")
    moveFiles("docids")
  }

  /** Write one batch's index artifacts under `path` (a fresh dir: the
    * materializer's live root or an appender's staging root). ONE
    * tokenization pass — the base projection is persisted and feeds
    * stats, docids, and postings. `gen` is the batch's GENERATION tag
    * (0 for a fresh build, max-ledger-gen + 1 for an append): it rides
    * every posting row AND the docids add rows so a later tombstone can
    * name exactly this generation's rows dead — the liveness model that
    * lets delete→re-add serve only the re-added text without any
    * posting rewrite. The add rows also carry `dl` (the doc's token
    * count) so the DELETE leg's stats discount reads the doc-sized
    * ledger instead of scanning corpus-sized postings. */
  private def writeBm25Batch(docs: DataFrame, path: String, gen: Long = 0L): Unit = {
    import CacheOps.shared
    val base = shared(docs.select(col("doc_id"), col("lang"),
      tokens(lower(col("text"))).as("w")))
    try {
      base.agg(count(lit(1)).as("n"),
          coalesce(sum(size(col("w")).cast("long")), lit(0L)).as("tot"))
        .write.mode("overwrite").parquet(s"$path/stats")
      base.select(col("doc_id"), lit(0).as("tomb"), lit(gen).as("gen"),
          size(col("w")).cast("long").as("dl"))
        .write.mode("overwrite").parquet(s"$path/docids")
      base.select(col("doc_id"), col("lang"),
          size(col("w")).cast("long").as("dl"), explode(col("w")).as("tok"))
        .groupBy(col("doc_id"), col("lang"), col("dl"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("gen", lit(gen))
        .withColumn("bucket", pmod(xxhash64(col("tok")), lit(Bm25Buckets.toLong)))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    } finally { base.unpersist(true); () }
  }

  /** t11c's held-out delta — shared with the spec (the v9d split rule). */
  private[graft] def bm25Holdout: Column = col("doc_id") % 5 === 4

  /** t11e's doomed set — every 9th doc. (NOT disjoint from the t11c
    * holdout — doc_id ≡ 34 mod 45 satisfies both; the two gates land
    * SEPARATE index copies, so they never interact.) */
  private[graft] def bm25Doomed: Column = col("doc_id") % 9 === 7

  /** T11e: DELETE documents from the landed lexical index — takedown
    * parity with the ANN tier (v9e), via TOMBSTONE LIVENESS (the
    * Lucene model — round-11 verdict task #1). The delete APPENDS
    * three small change-sized artifacts and rewrites NOTHING:
    *  1. tombs — one (doc_id, gen) row per victim, naming the doomed
    *     doc's live add GENERATION. Probes anti-join this sidecar, so
    *     dead posting rows stop serving immediately while staying on
    *     disk; a later re-add's rows carry a HIGHER gen and are never
    *     matched — delete→re-add serves only the new generation
    *     (spec-asserted) without touching the old rows.
    *  2. stats — one NEGATIVE partial row (−n, −Σdl); the probe's SUM
    *     nets it out. Σdl comes from the LEDGER's add rows (which
    *     carry dl), so accounting is doc-cardinality — the delete
    *     never opens postings at all.
    *  3. docids — one TOMBSTONE row per victim; the ledger
    *     ([[bm25Members]]) then reads the doc as gone, so a later
    *     re-add is possible (right-to-be-forgotten must not block
    *     re-consent — spec-asserted by a delete→re-append round trip).
    *
    * Physical reclaim rides [[bm25IndexCompact]]: compaction purges
    * the tombstoned (doc_id, gen) posting rows bucket-locally and
    * clears the sidecar — the background-maintenance cadence, off the
    * delete path. So a CDC release's delete leg is |changes|-shaped at
    * ANY dispersion of the doomed docs' tokens across buckets — the
    * round-11 probe showed the old rewrite-on-delete going
    * index-bytes-shaped (6.4 s → 64 s at 30×) once a release's changes
    * spanned all 64 buckets; tombstones make that boundary vanish.
    *
    * Crash-safety is INHERITED from the append seam: all three
    * artifacts stage under one `__append_staging_*` dir and publish
    * through the same `_appendlog/` redo record ([[stageAndPublish]]),
    * so a crash anywhere leaves the next open serving the whole delete
    * or none of it — strictly stronger than the old three-job
    * sequence, whose mid-sequence crash needed a re-landing. A retried
    * delete after publish is a no-op (membership excludes the
    * victims). Because df recomputes from probed LIVE postings, the
    * tombstoned index answers EXACTLY what a rebuild over the filtered
    * corpus answers. */
  def bm25IndexDelete(spark: SparkSession, path: String,
      doomed: DataFrame): Seq[String] = {
    // recover-on-open, shared with append: a half-published prior
    // maintenance write must finish before the ledger is read
    bm25IndexRecover(spark, path)
    // victims = the doomed docs' LIVE add rows. Generation (names
    // exactly which posting rows die) and dl (the stats discount) both
    // ride the doc-cardinality ledger. No broadcast hints: a takedown
    // backlog can be corpus-proportional (round-9 ADVICE); AQE
    // broadcasts when the set is actually small
    val victims = bm25LiveAdds(spark, path)
      .join(doomed, Seq("doc_id"), "left_semi").persist()
    try {
      val acct = victims
        .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("tot"))
        .collect()(0)
      val (nDel, totDel) = (acct.getLong(0), acct.getLong(1))
      if (nDel > 0) stageAndPublish(spark, path) { staging =>
        victims.select(col("doc_id"), col("gen"))
          .write.mode("overwrite").parquet(s"$staging/tombs")
        import spark.implicits._
        Seq((-nDel, -totDel)).toDF("n", "tot")
          .write.mode("overwrite").parquet(s"$staging/stats")
        victims.select(col("doc_id"), lit(1).as("tomb"), col("gen"),
            lit(0L).as("dl"))
          .write.mode("overwrite").parquet(s"$staging/docids")
      }
      Seq(s"deleted=$nDel")
    } finally { victims.unpersist(true); () }
  }

  // landing memo for the delete-maintained index (t11e)
  private val bm25DelLanded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** T11e gate form: land the FULL index, delete the doomed set,
    * probe. The oracle is t11's page SQL over `documents` MINUS the
    * doomed predicate — hash equality proves the surgical delete
    * serves exactly what a rebuild over the filtered corpus serves. */
  def bm25DeletedTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25OverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_bm25_del", bm25DelLanded,
        source = "documents.parquet") { p =>
        materializeBm25Index(spark, dir, p)
        bm25IndexDelete(spark, p,
          documents(spark, dir).filter(bm25Doomed).select(col("doc_id")))
        ()
      },
      Bm25Terms, k)

  // landing memo for the CDC-maintained index (t11g)
  private val bm25CdcLanded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** T11g: CDC-to-serving-index for the lexical tier (round-10 verdict
    * task #2, the v9f twin). A corpus release's changelog
    * ([[SnapshotDiff.changelog]] against [[SnapshotDiff.nextRelease]] —
    * the exact s19/s19b machinery) applies to the LANDED BM25 index
    * through the maintenance verbs instead of a rebuild: deleted +
    * updated doc_ids go through [[bm25IndexDelete]]
    * (tombstone liveness: three change-sized appends — the (doc_id,
    * gen) tombs sidecar, the negative stats partial, the ledger row —
    * no postings bytes touched), then
    * inserted + updated docs come back through [[bm25IndexAppend]]
    * (the tombstoned updated docs re-add — the delete→re-append round
    * trip the ledger supports by design). The oracle derives the v2
    * corpus directly and runs t11's page SQL over it — hash equality
    * proves changelog-apply ≡ rebuild for lexical serving.
    *
    * Cost (ScaleProbe bm25_cdc_cycle; PLANS.md rounds 11-12): BOTH
    * legs are now change-sized. Round 11 probed the old
    * rewrite-on-delete leg going index-bytes-shaped at 30× (6.4 s →
    * 64 s once the fixed change set's tokens spanned all 64 buckets);
    * round 12 replaced it with tombstone liveness ([[bm25IndexDelete]]
    * appends a (doc_id, gen) sidecar + ledger rows, probes anti-join
    * it, physical reclaim rides [[bm25IndexCompact]]), so a release's
    * apply cost tracks the CHANGE volume at any token dispersion —
    * the round-12 probe table shows the cycle flat to 100×. The ANN
    * twin ([[Similarity.ivfCdcTopK]]) never had the boundary: a
    * vector lives in exactly one cell, so its delete leg is
    * change-local by layout. */
  def bm25CdcTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25OverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_bm25_cdc", bm25CdcLanded,
        source = "documents.parquet") { p =>
        val v1 = documents(spark, dir)
        materializeBm25Index(spark, dir, p)
        // change-sized and consumed twice (delete keys + append rows)
        val log = SnapshotDiff.changelog(v1, SnapshotDiff.nextRelease(v1),
          Seq("doc_id"), Seq("text", "lang", "source")).localCheckpoint(true)
        bm25IndexDelete(spark, p,
          log.filter(col("op").isin("deleted", "updated")).select(col("doc_id")))
        bm25IndexAppend(spark, p,
          log.filter(col("op") =!= "deleted")
            .select(col("doc_id"), col("text"), col("lang")))
        ()
      },
      Bm25Terms, k)

  // landing memos — fingerprint discipline via Similarity.landOnce (a
  // regenerated fixture under the same dir re-lands)
  private val bm25Landed = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val bm25IncrLanded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** T11c gate form: land the index from the corpus MINUS a held-out
    * delta (every 5th doc), append the delta through
    * [[bm25IndexAppend]], probe. Stats sum over the two partial rows
    * and df recomputes from the merged postings, so the maintained
    * index holds row-for-row what a full build holds — answers t11's
    * oracle VERBATIM, hash equality proving append-maintenance
    * lossless. */
  def bm25IncrementalTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25OverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_bm25_incr", bm25IncrLanded,
        source = "documents.parquet") { p =>
        val docs = documents(spark, dir)
        materializeBm25IndexOf(docs.filter(!bm25Holdout), p)
        bm25IndexAppend(spark, p, docs.filter(bm25Holdout))
      },
      Bm25Terms, k)

  /** The bucket a term's postings land in — the driver-side twin of
    * the materializer's `pmod(xxhash64(tok), B)` column (XxHash64 with
    * Spark's default seed 42), so the probe can name its partition
    * directories statically. */
  private[graft] def bm25BucketOf(term: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(term),
        org.apache.spark.sql.types.StringType)),
      42L // the sql functions.xxhash64 default seed — must match the materializer
    ).eval(null).asInstanceOf[Long]
    ((h % Bm25Buckets) + Bm25Buckets) % Bm25Buckets
  }

  // explicit read schemas: an EMPTY corpus lands zero data files, and
  // schema inference over an empty dir throws — the schema is this
  // module's contract anyway
  private val bm25PostingsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, lang STRING, dl BIGINT, tok STRING, tf BIGINT, gen BIGINT, bucket BIGINT")
  private val bm25DocidsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, tomb INT, gen BIGINT, dl BIGINT")
  private val bm25TombsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, gen BIGINT")

  /** Current index membership from the append-only docids LEDGER:
    * adds are (doc_id, 0) rows, takedowns append (doc_id, 1)
    * tombstones — a doc is live iff adds > tombstones (operations
    * alternate, so the difference is 0 or 1). Append-only membership
    * is what removes the delete-then-rename window a mutable docids
    * table would carry (a crash between delete and rename would lose
    * the whole guard). */
  private def bm25Members(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(bm25DocidsSchema).parquet(s"$path/docids")
      .groupBy(col("doc_id"))
      .agg(sum(lit(1) - col("tomb") * 2).as("live"))
      .filter(col("live") > 0).select(col("doc_id"))

  /** Per LIVE doc, the latest add generation and its token count —
    * one ledger pass (max over a (gen, dl) struct ignores the
    * tombstone rows' nulls; gen is monotonic, so max = latest add).
    * The delete verb's whole read side: victims' generations name the
    * dying posting rows, their dl sums to the stats discount. */
  private def bm25LiveAdds(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(bm25DocidsSchema).parquet(s"$path/docids")
      .groupBy(col("doc_id"))
      .agg(sum(lit(1) - col("tomb") * 2).as("live"),
        max(when(col("tomb") === 0, struct(col("gen"), col("dl")))).as("g"))
      .filter(col("live") > 0)
      .select(col("doc_id"), col("g.gen").as("gen"), col("g.dl").as("dl"))

  /** The solo page: a batch of one through the SAME scoring pipeline
    * (bm25ScoredOverIndex — so the t11b family and t11h cannot
    * drift), finished with the distributed TakeOrderedAndProject
    * top-k a single query wants (no single-partition window). */
  private[graft] def bm25OverIndex(spark: SparkSession, path: String,
      terms: Seq[String], k: Int): DataFrame =
    bm25ScoredOverIndex(spark, path, Seq((0, terms)))
      .orderBy(desc("score_milli"), col("doc_id")).limit(k)
      .select(col("doc_id"), col("lang"), col("score_milli"))
      .orderBy(col("doc_id"))

  /** T11f: COMPACT the landed lexical index — the maintenance verb
    * that keeps the day-2 lifecycle serviceable. Every append (t11c)
    * adds a file per touched posting bucket plus a stats partial and
    * ledger rows; every delete (t11e) adds a negative partial and
    * tombstones. Unbounded, that history is a real serving cost: probe
    * IO grows with FILE COUNT (one task minimum per file, footer reads,
    * tiny row groups) even when live data doesn't, and the membership
    * anti-join pays the full ledger. Compaction folds the history out
    * in four independently equivalence-preserving rewrites:
    *
    *  0. RECLAIM — the deferred physical half of the tombstone delete:
    *     the tombs sidecar's dead (doc_id, gen) pairs purge from
    *     postings bucket-locally ([[Partitioned.deleteByKeys]] — only
    *     buckets holding a dead row rewrite), then the sidecar drops so
    *     probes stop paying the liveness anti-join. This is where the
    *     index-bytes-shaped work the delete verb REFUSES to do lands —
    *     amortized over a compaction cycle's whole churn, off the CDC
    *     release path.
    *  1. postings — [[Partitioned.compact]] (the s16b primitive, shared
    *     verbatim): each fragmented bucket directory rewrites to ONE
    *     file through the CommitProtocol seam; already-compact buckets
    *     are never opened.
    *  2. stats — the append-only partials (positive batch rows,
    *     negative delete rows) collapse to ONE row holding their SUM —
    *     exactly the value every probe computes, so the rewrite cannot
    *     change an answer by construction.
    *  3. docids — the ledger collapses to its LIVE set: each live
    *     doc's latest add row survives VERBATIM (gen and dl intact —
    *     membership, delete accounting, and generation monotonicity
    *     are all preserved), tombstone history is gone.
    *
    * A crash BETWEEN these steps leaves a fully CONSISTENT index —
    * each step alone preserves every answer (reclaim's windows
    * converge: purged-but-uncleared tombs anti-join nothing; a
    * mid-purge crash leaves unpurged buckets still covered by the
    * sidecar) — so compaction is always safe to re-run, and a
    * re-run over an already-compact index is a LISTING-only no-op:
    * every artifact's guard is pure file metadata (postings dirs with
    * >1 data file; stats with >1 data file; docids with more files
    * than its bytes-derived target of ~64 MB/file — the fold writes at
    * most that many, so the skip holds at every ledger size, and a
    * corpus-sized membership never funnels through one task). The
    * guards are pure perf — a deferred fold only defers work, since
    * probes always read the ledger as-is. The WITHIN-step windows are the
    * usual plain-parquet seams, stated honestly: steps 2-3 swap by
    * retire-then-publish (a reader can fail loudly on a briefly-absent
    * directory, never see half-new data, and a crash leaves the data
    * recoverable in the staged/retired dir — which the next re-landing
    * sweeps); step 1 publishes through the CommitProtocol rename seam,
    * whose crash window can leave a bucket directory absent with its
    * only copy in the staging dir — pages then SILENTLY miss that
    * bucket's terms until repair (restore the staged copy or re-land).
    * A table-format commit closes exactly these windows by making the
    * swap a log entry. At 100 TB this is the same background-
    * maintenance story as s16b's small-file compaction — run it off
    * the serving path on whatever cadence append/delete churn
    * warrants; cost is the churned buckets' posting bytes plus the
    * history actually folded, never an unconditional corpus rewrite.
    *
    * Returns the compacted posting-bucket values. */
  def bm25IndexCompact(spark: SparkSession, path: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // 0. PHYSICAL RECLAIM of tombstoned postings — the deferred half of
    //    the delete verb's liveness model. The sidecar's (doc_id, gen)
    //    pairs purge bucket-locally through the partition-scoped delete
    //    (only buckets holding a dead row rewrite), then the sidecar
    //    drops so probes stop paying the anti-join. Crash windows all
    //    converge: purge-then-crash leaves tombs rows naming now-absent
    //    postings (the anti-join is a no-op on them; the re-run's purge
    //    finds nothing and the clear completes), and a mid-purge crash
    //    leaves the unpurged buckets still covered by the sidecar
    val tombsDir = new org.apache.hadoop.fs.Path(s"$path/tombs")
    if (fs.exists(tombsDir)) {
      if (Partitioned.dataFiles(fs, tombsDir).nonEmpty)
        Partitioned.deleteByKeys(spark, s"$path/postings",
          Seq("doc_id", "gen"), "bucket",
          spark.read.schema(bm25TombsSchema).parquet(s"$path/tombs"),
          schema = Some(bm25PostingsSchema))
      fs.delete(tombsDir, true)
      ()
    }
    val buckets = Partitioned.compact(spark, s"$path/postings", "bucket")
    def dataFiles(dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      // stats/docids can legitimately be absent (empty-corpus build) —
      // the exists guard lives HERE, not in the shared predicate,
      // where compact's per-partition listing would pay it
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Seq.empty else Partitioned.dataFiles(fs, p)
    }
    // stats: >1 data file ⇔ un-folded partials exist (build/compact
    // write exactly one file; every append/delete adds one)
    if (dataFiles(s"$path/stats").length > 1) {
      val stats = spark.read.parquet(s"$path/stats")
        .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
          coalesce(sum(col("tot")), lit(0L)).as("tot"))
      swapArtifact(spark, s"$path/stats", stats.coalesce(1))
    }
    // docids: fold iff the file count exceeds the bytes-derived
    // target (~64 MB/file — the membership of a 100 TB corpus must
    // not squeeze through one task). The target derives from the
    // ledger's bytes BEFORE the fold, so a fold that shrinks the
    // ledger a lot (heavy tombstone history) can leave more files
    // than the now-smaller bytes warrant — iterate once more so the
    // call CONVERGES and a re-run is a pure listing no-op at every
    // ledger size (bytes only shrink, so two passes always suffice).
    // The guard is pure perf: a deferred fold only defers work,
    // because membership is always computed from the ledger as-is at
    // probe time (an unfolded tombstone still excludes its doc)
    var pass = 0
    var converged = false
    while (!converged && pass < 2) {
      val ledger = dataFiles(s"$path/docids")
      val nOut = math.max(1L, math.min(64L, ledger.map(_.getLen).sum / (64L << 20))).toInt
      if (ledger.length > nOut) {
        // the fold keeps each live doc's latest add row VERBATIM (gen
        // and dl included): membership, a later delete's accounting,
        // and generation monotonicity all survive the history fold
        swapArtifact(spark, s"$path/docids",
          bm25LiveAdds(spark, path)
            .select(col("doc_id"), lit(0).as("tomb"), col("gen"), col("dl"))
            .coalesce(nOut))
        pass += 1
      } else converged = true
    }
    buckets
  }

  /** The tombstone share above which [[bm25IndexMaintain]] fires the
    * compaction cycle. Below it, probes pay a change-sized anti-join
    * (t11e measured the tombstoned-index page at +0.3 s — small, flat
    * in index size); above it, the sidecar's anti-join build and the
    * docids history stop being "change-sized" relative to the live
    * set, and the cycle's one index-bytes-shaped reclaim amortizes
    * over the releases that accumulated the churn. */
  private[graft] val TombReclaimShare = 0.2

  /** The CADENCE POLICY for tombstone reclaim (round-12 verdict task
    * #7): the churn trigger that lets the maintenance cycle fire
    * ITSELF instead of leaving the when-to-compact decision in prose.
    * Reads two row counts from parquet FOOTERS only (driver-side
    * metadata, no data scan, file-count-bounded): T = tombs sidecar
    * rows, and the docids ledger's row count L. Live docs =
    * adds − tombstoned = L − 2T (every takedown appends one ledger
    * marker and one sidecar row), so the trigger is
    * T > [[TombReclaimShare]] × live. Fires [[bm25IndexCompact]] —
    * reclaim + postings/stats/docids folds — when crossed; otherwise
    * a footer-listing no-op, cheap enough to call after EVERY CDC
    * release. Returns whether the cycle fired. The denominator uses
    * the ledger's own accounting rather than a data read, so the
    * decision costs exactly what the verdict's "read from footers"
    * asks: file listings plus footer opens. */
  def bm25IndexMaintain(spark: SparkSession, path: String,
      maxTombShare: Double = TombReclaimShare): Boolean = {
    val t = footerRows(spark, s"$path/tombs")
    if (t == 0L) return false // nothing to reclaim — never fire
    val ledger = footerRows(spark, s"$path/docids")
    val live = math.max(1L, ledger - 2L * t)
    val fire = t.toDouble > maxTombShare * live
    if (fire) { bm25IndexCompact(spark, path); () }
    fire
  }

  /** Total row count of a parquet dir from file FOOTERS alone —
    * driver-side, file-count-bounded, zero data bytes read. Footer
    * opens run CONCURRENTLY (the MaintProbe ladder measured serial
    * opens ramping the deferred no-op 0.5 → 1.9 s as the ledger
    * fragmented toward its reclaim point — ~500 files × ~4 ms; the
    * artifacts' file counts reset at each fired cycle, so the bound
    * is one inter-compaction window's churn). */
  private def footerRows(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0L
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val counts = Future.traverse(Partitioned.dataFiles(fs, p).toList) { st =>
      Future {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }
    }
    Await.result(counts, scala.concurrent.duration.Duration(5, "min")).sum
  }

  /** Retire-then-publish swap of one index artifact:
    * stage the replacement fully (reading the LIVE directory — the
    * write materializes the plan before any rename), rename the live
    * dir aside, rename the staged dir in, drop the retired copy. A
    * failed publish restores the retired dir so the index stays
    * servable — and a failed RESTORE fails loud, naming the retired
    * dir that still holds the data (Hadoop rename signals failure by
    * returning false; swallowing it would strand the index with no
    * live artifact and no explanation). A failed staging write leaks
    * nothing. `partitionCols` (round-15 ADVICE: the stream bucket
    * tables' legacy-layout migration) stages the replacement
    * `partitionBy` those columns — one file per partition, the
    * stageAndPublish fragmentation rule. */
  private[graft] def swapArtifact(spark: SparkSession, dir: String,
      replacement: DataFrame, partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staging = s"${dir}__compact_staging_$tag"
    try {
      if (partitionCols.isEmpty)
        replacement.write.mode("overwrite").parquet(staging)
      else
        replacement.repartition(partitionCols.map(col): _*)
          .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(staging)
    } catch { case e: Throwable =>
      fs.delete(new Path(staging), true)
      throw e
    }
    swapFaultHook("staged", dir)
    val live = new Path(dir)
    val retired = new Path(s"${dir}__retired_$tag")
    // track whether a retired copy actually exists: when the live dir
    // was absent there is nothing to restore, and a recovery message
    // pointing at a nonexistent retired dir would misdirect the
    // operator (round-9 ADVICE)
    val didRetire = fs.exists(live) && {
      if (!fs.rename(live, retired))
        throw new java.io.IOException(s"failed to retire $dir for compaction")
      true
    }
    swapFaultHook("retired", dir)
    if (!fs.rename(new Path(staging), live)) {
      val restored = didRetire && fs.rename(retired, live) // stay servable
      fs.delete(new Path(staging), true)
      throw new java.io.IOException(
        if (restored) s"failed to publish compacted $dir (live restored)"
        else if (didRetire)
          s"failed to publish compacted $dir AND failed to restore the " +
            s"retired copy — data intact at $retired, live dir missing"
        else s"failed to publish compacted $dir — no live artifact existed " +
          s"before the swap, nothing to restore")
    }
    swapFaultHook("published", dir)
    if (didRetire) fs.delete(retired, true)
    ()
  }

  // Test seam for the swap's three reader-visible windows: fired with
  // ("staged", dir) after the replacement is fully staged (live dir
  // still the OLD data), ("retired", dir) with the live dir ABSENT
  // (the documented fail-loud window — single writer, readers retry),
  // and ("published", dir) with the NEW live in place (retired copy
  // not yet dropped). A spec runs a concurrent reader from each window
  // to pin the contract: old data, new data, or a loud path-not-found
  // — never a half-swapped mix. Identity in production.
  private[graft] var swapFaultHook: (String, String) => Unit = (_, _) => ()

  // landing memo for the full-lifecycle compacted index (t11f)
  private val bm25CptLanded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The t11h serving batch: three concurrent queries, with "join"
    * shared between q0 and q1 so the shared-term path (df computed
    * once, postings row fanned to both queries) is exercised. */
  private[graft] val Bm25Queries: Seq[(Int, String)] = Seq(
    0 -> Similarity.DefaultQuery,
    1 -> "join hash merge",
    2 -> "stream window agg")

  /** T11h: BATCHED multi-query BM25 over the landed index — the
    * lexical twin of v8's batch vector top-k, and the shape a serving
    * tier actually runs: N concurrent queries amortize ONE pruned
    * probe. The bucket prune is the UNION of every query's terms'
    * buckets; per-term df is computed once per TERM (not per query —
    * a term shared by two queries scores both from the same df row);
    * a broadcast (query_id, tok) table fans each posting row to the
    * queries using its term; per-(query, doc) integer sums then rank
    * per query through a WindowGroupLimit two-phase top-k (partial
    * top-k before the exchange — the v8 discipline). Per-batch IO is
    * the DISTINCT terms' posting bytes: queries sharing vocabulary
    * cost nothing extra, which is exactly why serving tiers batch.
    * Oracle: the UNION ALL of each query's solo page (tagged CTE
    * chains over the same corpus SQL) — hash equality proves batching
    * is invisible per query. */
  def bm25BatchTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25BatchOverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_bm25_idx", bm25Landed,
        source = "documents.parquet")(materializeBm25Index(spark, dir, _)),
      Bm25Queries.map { case (qid, q) => (qid, bm25TermsOf(q)) }, k)

  /** T11i: keyset-paginated BATCH serving — t11h composed with w5b's
    * keyset discipline (round-11 verdict task #8; the reference's real
    * dashboard pattern is exactly this: N concurrent queries, each
    * fetching its NEXT page with the cursor its previous response
    * carried, app.py:155-170 + main.py:84-87). Page 1 is the t11h
    * batch; each query's CURSOR is its page-1 last row in ranking
    * order (min score_milli, then max doc_id — the pair a client
    * echoes back). Page 2 runs the ONE pruned probe again and applies
    * the keyset predicate per query — score < s_k OR (score = s_k AND
    * doc_id > d_k) — BEFORE the per-query top-k, so the window ranks
    * only past-cursor rows instead of materializing 2k rows and
    * slicing (the w5b argument, per query: at page N the offset form
    * re-sorts N·k rows per query, the keyset form always ranks ≤ the
    * remaining candidates). The ranking order is total (score desc,
    * doc_id asc), so keyset page 2 ≡ offset page 2 — which is what
    * the oracle asserts, per query, over the corpus SQL. The cursor
    * frame is ≤|queries| rows — legitimately broadcast. */
  def bm25BatchPage2(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val path = Similarity.landOnce(spark, dir, "graft_bm25_idx", bm25Landed,
      source = "documents.parquet")(materializeBm25Index(spark, dir, _))
    val queries = Bm25Queries.map { case (qid, q) => (qid, bm25TermsOf(q)) }
    // the page-1 interaction: the t11h batch, verbatim
    val cursors = bm25BatchOverIndex(spark, path, queries, k)
      .groupBy(col("query_id"))
      .agg(min(struct(col("score_milli"), (-col("doc_id")).as("nd"))).as("c"))
      .select(col("query_id"), col("c.score_milli").as("s_k"), (-col("c.nd")).as("d_k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(desc("score_milli"), col("doc_id"))
    bm25ScoredOverIndex(spark, path, queries)
      .join(broadcast(cursors), Seq("query_id"))
      .filter(col("score_milli") < col("s_k") ||
        (col("score_milli") === col("s_k") && col("doc_id") > col("d_k")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("lang"), col("score_milli"))
      .orderBy(col("query_id"), col("doc_id"))
  }

  /** The shared probe pipeline — ONE copy of the serving scorer for
    * the solo (t11b family) and batched (t11h) paths, so the two
    * cannot drift: pruned postings read (bucket union as partition
    * filters, term equality pushed), summed stats partials, per-TERM
    * df (shared across every query using the term), posting rows
    * fanned to their queries by a broadcast term table, per-(query,
    * doc) integer sums. Returns the positive-score frame (query_id,
    * doc_id, lang, score_milli); callers pick their own top-k finish. */
  private def bm25ScoredOverIndex(spark: SparkSession, path: String,
      queries: Seq[(Int, Seq[String])]): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25 needs at least one term per query")
    val allTerms = queries.flatMap(_._2).distinct
    val buckets = allTerms.map(bm25BucketOf).distinct
    val pruned = spark.read.schema(bm25PostingsSchema).parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(allTerms: _*))
    // liveness: dead (doc_id, gen) rows stay on disk until compaction
    // reclaims them — serving anti-joins the tombs sidecar (bounded by
    // takedown churn since the last compaction, Lucene's live-docs
    // model). The gen equality is what keeps a delete→re-add doc's NEW
    // rows serving while its old generation stays dead. Absent sidecar
    // (no deletes, or just compacted) skips the join entirely — the
    // hot t11b/t11h path pays one metadata existence check
    val tombsDir = new org.apache.hadoop.fs.Path(s"$path/tombs")
    val hasTombs = tombsDir
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tombsDir)
    val postings = if (!hasTombs) pruned
      else pruned.join(spark.read.schema(bm25TombsSchema).parquet(s"$path/tombs"),
        Seq("doc_id", "gen"), "left_anti")
    val stats = spark.read.parquet(s"$path/stats")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("tot")), lit(0L)).as("tot"))
    // df once per TERM — shared across every query using it
    val dfs = postings.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    import spark.implicits._
    // per-query DISTINCT terms: the fan-out join scores a posting row
    // once per (query, term) pair, so a duplicated term in a query
    // would silently double its contribution (the old isin() filter
    // was duplicate-safe; the join must be made so explicitly)
    val qterms = queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "tok")
    val (num, den) = bm25NumDen(col("tf"), col("dl"), col("df"), col("n"), col("tot"))
    postings
      .join(broadcast(dfs), Seq("tok"))
      .join(broadcast(qterms), Seq("tok")) // fan each posting row to its queries
      .crossJoin(broadcast(stats))
      .withColumn("bm_num", num).withColumn("bm_den", den)
      .withColumn("s", expr("bm_num div bm_den"))
      .groupBy(col("query_id"), col("doc_id"), col("lang"))
      .agg(sum(col("s")).as("score_milli")) // integer sum — order-free
      .filter(col("score_milli") > 0)
  }

  private[graft] def bm25BatchOverIndex(spark: SparkSession, path: String,
      queries: Seq[(Int, Seq[String])], k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(desc("score_milli"), col("doc_id"))
    bm25ScoredOverIndex(spark, path, queries)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("lang"), col("score_milli"))
      .orderBy(col("query_id"), col("doc_id"))
  }

  // landing memo for the stream-maintained index (st4)
  private val bm25StreamLanded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** St4 gate form: the corpus minus the t11c holdout lands as the
    * base index, the holdout arrives as TWO parquet files on a
    * streaming file source, and [[graft.streaming.IndexStream]]
    * drains them — one file per micro-batch — through the t11c append
    * seam. The probe then answers t11's oracle VERBATIM: hash
    * equality proves the stream-maintained index serves exactly what
    * a batch rebuild over the full corpus serves, regardless of how
    * the input was micro-batched. */
  def bm25StreamedTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25OverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_bm25_stream", bm25StreamLanded,
        source = "documents.parquet") { p =>
        val fs = new org.apache.hadoop.fs.Path(p)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // a re-landing (regenerated fixture) must forget the previous
        // stream's progress or the drained files would be skipped
        fs.delete(new org.apache.hadoop.fs.Path(s"${p}_checkpoint"), true)
        val docs = documents(spark, dir)
        materializeBm25IndexOf(docs.filter(!bm25Holdout), p)
        val incoming = s"${p}_incoming"
        val hold = docs.filter(bm25Holdout)
        // two single-file writes → two micro-batches at
        // maxFilesPerTrigger=1 (deterministic batching; the final
        // index is batching-invariant anyway)
        hold.filter(col("doc_id") % 2 === 0)
          .coalesce(1).write.mode("overwrite").parquet(incoming)
        hold.filter(col("doc_id") % 2 =!= 0)
          .coalesce(1).write.mode("append").parquet(incoming)
        val q = graft.streaming.IndexStream.bm25IndexIngest(
          spark, incoming, p, s"${p}_checkpoint")
        // stop in finally: a foreachBatch failure must not leak a
        // zombie query that a retrying landing would then race
        // (checkpoint delete + incoming overwrite under a live stream)
        try q.processAllAvailable() finally q.stop()
      },
      Bm25Terms, k)

  // landing memo for the CDC-stream-maintained index (st7)
  private val bm25CdcStreamLanded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** ST7 gate form: land the v1 index, write the s19 changelog (v1 →
    * derived v2) as TWO files on a streaming source, drain through
    * [[graft.streaming.IndexStream.bm25CdcIngest]] — one micro-batch
    * per file, each applying its slice of deletes/updates/inserts
    * through the tombstone maintenance verbs — then probe. Answers
    * t11g's oracle VERBATIM (the t11 page over the v2 corpus derived
    * directly): hash equality proves STREAMED changelog apply ≡
    * rebuild, regardless of how the release was micro-batched. */
  def bm25CdcStreamedTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25OverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_bm25_cdcst", bm25CdcStreamLanded,
        source = "documents.parquet") { p =>
        val fs = new org.apache.hadoop.fs.Path(p)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // a re-landing (regenerated fixture) must forget the previous
        // stream's progress or the drained files would be skipped
        fs.delete(new org.apache.hadoop.fs.Path(s"${p}_checkpoint"), true)
        val v1 = documents(spark, dir)
        materializeBm25Index(spark, dir, p)
        val log = SnapshotDiff.changelog(v1, SnapshotDiff.nextRelease(v1),
          Seq("doc_id"), Seq("text", "lang", "source")).localCheckpoint(true)
        val incoming = s"${p}_incoming"
        // two files → two micro-batches at maxFilesPerTrigger=1; the
        // changelog has one row per doc_id, so any split applies
        // cleanly (batching-invariance is what the oracle then proves)
        log.filter(col("doc_id") % 2 === 0)
          .coalesce(1).write.mode("overwrite").parquet(incoming)
        log.filter(col("doc_id") % 2 =!= 0)
          .coalesce(1).write.mode("append").parquet(incoming)
        val q = graft.streaming.IndexStream.bm25CdcIngest(
          spark, incoming, p, s"${p}_checkpoint")
        try q.processAllAvailable() finally q.stop()
      },
      Bm25Terms, k)

  /** T11f gate form: run the FULL index lifecycle — build minus the
    * t11c holdout, append the holdout, delete the t11e doomed set —
    * then COMPACT, then probe. The oracle is t11e's (the page over the
    * corpus minus the doomed predicate): hash equality proves the
    * compacted index serves exactly what the uncompacted lifecycle
    * serves, which t11c/t11e already prove equal to a rebuild. */
  def bm25CompactedTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25OverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_bm25_cpt", bm25CptLanded,
        source = "documents.parquet") { p =>
        val docs = documents(spark, dir)
        materializeBm25IndexOf(docs.filter(!bm25Holdout), p)
        bm25IndexAppend(spark, p, docs.filter(bm25Holdout))
        bm25IndexDelete(spark, p,
          docs.filter(bm25Doomed).select(col("doc_id")))
        bm25IndexCompact(spark, p)
        ()
      },
      Bm25Terms, k)

  // ====================================================================
  // t12: phrase (positional) search
  // ====================================================================

  /** The gate phrase — a token bigram that occurs organically in the
    * corpus vocabulary. */
  private[graft] val PhraseQuery = "table scan"

  /** Phrase → ordered term list. NOT [[bm25TermsOf]]: a phrase keeps
    * duplicates and order ("data data" is two positions, not one
    * term). */
  private[graft] def phraseTermsOf(q: String): Seq[String] =
    q.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toSeq.filter(_.nonEmpty)

  /** T12: exact phrase search over the corpus — rank docs by how often
    * the token sequence occurs CONTIGUOUSLY (BM25's bag-of-words tf
    * cannot tell "table scan" from "scan … table"; phrase match is the
    * serving feature quoted queries need). The scan form is one pure
    * column expression: per doc, count the window offsets where every
    * phrase term matches at its position — map-only, no explode, no
    * shuffle before the final top-k (TakeOrderedAndProject). */
  def phraseSearch(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    phraseSearchOf(documents(spark, dir), phraseTermsOf(PhraseQuery), k)

  private[graft] def phraseSearchOf(docs: DataFrame, phrase: Seq[String],
      k: Int): DataFrame = {
    require(phrase.nonEmpty, "phrase search needs at least one term")
    val m = phrase.size
    // w[i + j] is Spark SQL's 0-based array subscript; terms are
    // engine constants but still quote-escaped on principle
    val conds = phrase.zipWithIndex.map { case (t, j) =>
      s"w[i + $j] = '${t.replace("'", "''")}'"
    }.mkString(" AND ")
    // Cheap NECESSARY condition first: a doc whose token stream
    // contains the phrase contains every term as a substring of the
    // lowered text (tokens are substrings), so the codegen'd contains
    // conjunction is a sound superset — only candidate docs pay the
    // tokenize + per-offset lambda (the suite's #1 cost before this:
    // 3.3 s -> the prefilter admits ~P(t1)·…·P(tm) of the corpus)
    val pre = phrase.distinct
      .map(t => lower(col("text")).contains(t)).reduce(_ && _)
    docs
      .filter(pre)
      .select(col("doc_id"), col("lang"), tokens(lower(col("text"))).as("w"))
      .withColumn("n_occ", expr(
        s"CASE WHEN size(w) < $m THEN 0L ELSE " +
          s"CAST(size(filter(sequence(0, size(w) - $m), i -> $conds)) AS BIGINT) END"))
      // the >0 cut runs AFTER the limit: a Filter below the top-k gets
      // pushed through the projections and Catalyst inlines the alias,
      // re-evaluating the full tokenize per LAMBDA ELEMENT inside the
      // filter predicate — O(len²) per doc, measured 10× the whole
      // query. Post-limit it sees ≤k materialized rows; zero-occurrence
      // rows can only enter a thinner-than-k page and are dropped here,
      // so the answer is unchanged.
      .orderBy(desc("n_occ"), col("doc_id")).limit(k)
      .filter(col("n_occ") > 0)
      .select(col("doc_id"), col("lang"), col("n_occ"))
      .orderBy(col("doc_id"))
  }

  private val posIdxLanded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val posPostingsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, lang STRING, pos INT, tok STRING, bucket BIGINT")

  /** Land the POSITIONAL index: one posting row per token OCCURRENCE
    * (doc_id, lang, pos, tok), partitioned by the same 64-way
    * token-hash bucket as the BM25 index so probes prune to their
    * terms' directories. ~dl rows per doc instead of t11b's ~distinct
    * terms — the classic positional-index size trade. */
  private[graft] def materializePhraseIndexOf(docs: DataFrame, path: String): Unit =
    docs.select(col("doc_id"), col("lang"),
        posexplode(tokens(lower(col("text")))).as(Seq("pos", "tok")))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(Bm25Buckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")

  /** T12b: the phrase page over the LANDED positional index — the
    * serving form. Each phrase position reads ONLY its term's bucket
    * directory (partition pruning via [[bm25BucketOf]], term equality
    * pushed to the scan), normalizes occurrences to their phrase
    * ANCHOR (pos − offset), and the m-way join on (doc_id, anchor) IS
    * the positional intersection — a row survives exactly where the
    * full sequence is contiguous. Per-query IO tracks the phrase
    * terms' posting sizes, never the corpus. Answers t12's oracle
    * VERBATIM: hash equality proves the landed path serves exactly
    * what the scan form serves. */
  def phraseIndexedSearch(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    phraseOverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_pos_idx", posIdxLanded,
        source = "documents.parquet")(
        materializePhraseIndexOf(documents(spark, dir), _)),
      phraseTermsOf(PhraseQuery), k)

  private[graft] def phraseOverIndex(spark: SparkSession, path: String,
      phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty, "phrase search needs at least one term")
    val buckets = phrase.map(bm25BucketOf).distinct
    val postings = spark.read.schema(posPostingsSchema).parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(phrase.distinct: _*))
    val anchored = phrase.zipWithIndex.map { case (t, j) =>
      val f = postings.filter(col("tok") === t)
        .select(col("doc_id"), (col("pos") - lit(j)).as("anchor"),
          col("lang"))
      if (j == 0) f else f.select(col("doc_id"), col("anchor"))
    }
    anchored.reduce((a, b) => a.join(b, Seq("doc_id", "anchor")))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(desc("n_occ"), col("doc_id")).limit(k)
      .select(col("doc_id"), col("lang"), col("n_occ"))
      .orderBy(col("doc_id"))
  }

  // ====================================================================
  // t13: pseudo-relevance-feedback query expansion
  // ====================================================================

  private[graft] val PrfExpansionTerms = 3

  /** T13: PRF query expansion (RM3-lite) — run the base query, mine
    * the top page for its most frequent non-query non-stopword terms,
    * re-rank with the expanded term set. The classic recall lever a
    * lexical serving tier adds once BM25 works: vocabulary the USER
    * didn't type but the relevant docs share ("feedback" without a
    * trained model).
    *
    * All three phases are declarative — no driver collect: the
    * expansion terms are a 3-row FRAME that broadcast-joins into the
    * rescore, so the plan works unchanged when the expansion set is
    * data-dependent at 100 TB. Phase A is t11's scoring arithmetic;
    * phase B explodes ONLY the page docs (k rows); phase C is
    * [[bm25DynamicOf]]'s row-form scorer, whose per-term tf/df come
    * from posting-shaped rows instead of per-term columns (the t11b
    * arithmetic over a scan — static-terms hash-parity with bm25Of is
    * spec-asserted). ONE tokenized base frame serves all three phases
    * (the round-10 perf audit: phase A and phase C each re-tokenizing
    * the corpus made t13 a suite-tail query). */
  def prfExpandedSearch(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    prfExpandedFromBase(tokenizedBaseLanded(spark, dir), Bm25Terms, k,
      PrfExpansionTerms)

  // One-time-per-session memo for the TOKENIZED-corpus frame
  // (doc_id, lang, w, dl) — the d7 rawPairsMemo discipline applied to
  // tokenization: a production pipeline lands the tokenized corpus
  // once and every lexical consumer reads the landing. Keyed by
  // session+dir, valued by the source fingerprint; the frame is
  // checkpoint-materialized before the memo holds it.
  private val tokBaseMemo = new SessionMemo[DataFrame]()

  private[operators] def tokenizedBaseLanded(spark: SparkSession, dir: String): DataFrame = {
    val fp = MergeOps.sourceFingerprint(spark, s"$dir/documents.parquet")
    tokBaseMemo.getOrCompute(spark, dir, fp) {
      documents(spark, dir)
        .select(col("doc_id"), col("lang"), tokens(lower(col("text"))).as("w"))
        .withColumn("dl", size(col("w")).cast("long"))
        .localCheckpoint(true)
    }
  }

  private[graft] def prfExpandedOf(docs: DataFrame, q0: Seq[String], k: Int,
      nExp: Int): DataFrame = {
    import CacheOps.{materializeAndRelease, shared}
    val base = shared(docs.select(col("doc_id"), col("lang"),
        tokens(lower(col("text"))).as("w"))
      .withColumn("dl", size(col("w")).cast("long")))
    materializeAndRelease(prfExpandedFromBase(base, q0, k, nExp), base)
  }

  /** The three PRF phases over a caller-owned tokenized base
    * (doc_id, lang, w, dl) — the dir-level entry passes the SESSION
    * LANDING (tokenizedBaseLanded); prfExpandedOf wraps an ad-hoc
    * frame for the specs. */
  private def prfExpandedFromBase(base: DataFrame, q0: Seq[String], k: Int,
      nExp: Int): DataFrame = {
    import CacheOps.{materializeAndRelease, shared}
    val spark = base.sparkSession
    import spark.implicits._
    // phase A: the t11 wide scoring over the shared base — map-side
    // tf columns (no explode/shuffle; the dynamic scorer here was
    // measured SLOWER: two shuffle-shaped searches instead of one).
    // The wide frame is persisted so the per-term HOF filters run
    // once, not once per consumer (stats pass + score pass).
    val wide = shared(base.select(col("doc_id") +: col("dl") +:
      q0.zipWithIndex.map { case (t, i) =>
        size(filter(col("w"), x => x === lit(t))).cast("long").as(s"tf$i")
      }: _*))
    val aggs: Seq[Column] =
      coalesce(sum(col("dl")), lit(0L)).as("tot") +:
        q0.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = wide.agg(count(lit(1)).as("n"), aggs: _*)
    val withParts = q0.indices.foldLeft(wide.crossJoin(broadcast(stats))) {
      case (acc, i) =>
        val (num, den) =
          bm25NumDen(col(s"tf$i"), col("dl"), col(s"df$i"), col("n"), col("tot"))
        acc.withColumn(s"num$i", num).withColumn(s"den$i", den)
    }
    val page0 = withParts
      .withColumn("score_milli",
        q0.indices.map(i => expr(s"num$i div den$i")).reduce(_ + _))
      // >0 cut after the limit (the t12 lesson: a pre-limit Filter
      // inlines the whole scoring arithmetic into its predicate)
      .orderBy(desc("score_milli"), col("doc_id")).limit(k)
      .filter(col("score_milli") > 0)
      .select(col("doc_id"))
    // phase B: expansion vocabulary from the page docs' tokens
    val excluded = (q0 ++ Stopwords).distinct
    val terms = base.join(page0, Seq("doc_id"), "left_semi")
      .select(explode(col("w")).as("tok"))
      .filter(!col("tok").isin(excluded: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("tok")).limit(nExp)
      .select(col("tok"))
      .union(q0.toDF("tok")).distinct()
    // phase C: the row-form rescore, reading the same base
    val result = bm25DynamicFromBase(base, terms, k)
    materializeAndRelease(result, wide)
  }

  /** T13b: PRF expansion over the LANDED index — the serving form.
    * Phase A is the t11b probe (bucket-pruned postings read — hash-
    * equal to the scan page, so the mined vocabulary is identical);
    * phase B tokenizes ONLY the k page docs from the source table (a
    * doc-keyed point lookup at scale — k·len work, never corpus-
    * shaped); phase C rescans nothing: the index's posting rows ARE
    * the per-(doc, term) tf frame the row-form scorer needs, so the
    * rescore is the posting scan joined to the broadcast term frame —
    * no tokenize, no explode. The posting read is un-pruned (the
    * expansion terms are DATA, so their buckets aren't known at plan
    * time) — index-sized IO, the price of replan-free dynamic
    * vocabularies; a driver-known vocabulary would prune (t11b's
    * path). Answers t13's oracle VERBATIM. */
  def prfExpandedIndexed(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val path = bm25LandedPath(spark, dir)
    val q0 = Bm25Terms
    val page0 = bm25OverIndex(spark, path, q0, k).select(col("doc_id"))
    val docs = documents(spark, dir)
    val terms = prfExpansionOf(docs, page0, q0, PrfExpansionTerms)
      .union(q0.toDF("tok")).distinct()
    val postings = spark.read.schema(bm25PostingsSchema).parquet(s"$path/postings")
    val stats = spark.read.parquet(s"$path/stats")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("tot")), lit(0L)).as("tot"))
    // matched is TINY (the expansion terms' posting rows) but derives
    // from the full un-pruned postings scan — land it once so dfs and
    // the page don't each pay that scan
    val matched = CacheOps.shared(postings.join(broadcast(terms), Seq("tok")))
    val dfs = matched.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val (num, den) = bm25NumDen(col("tf"), col("dl"), col("df"), col("n"), col("tot"))
    val page = matched
      .join(broadcast(dfs), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("bm_num", num).withColumn("bm_den", den)
      .withColumn("s", expr("bm_num div bm_den"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("s")).as("score_milli"))
      .filter(col("score_milli") > 0)
      .orderBy(desc("score_milli"), col("doc_id")).limit(k)
      .select(col("doc_id"), col("lang"), col("score_milli"))
      .orderBy(col("doc_id"))
    CacheOps.materializeAndRelease(page, matched)
  }

  /** Phase B alone: the nExp most frequent non-query non-stopword
    * terms among the page docs' tokens (ties to the lexicographically
    * first term). */
  private[graft] def prfExpansionOf(docs: DataFrame, page: DataFrame,
      q0: Seq[String], nExp: Int): DataFrame = {
    val excluded = (q0 ++ Stopwords).distinct
    docs.join(page, Seq("doc_id"), "left_semi")
      .select(explode(tokens(lower(col("text")))).as("tok"))
      .filter(!col("tok").isin(excluded: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("tok")).limit(nExp)
      .select(col("tok"))
  }

  /** Row-form BM25 over a DYNAMIC term frame: explode the corpus'
    * tokens, keep only term-frame matches (broadcast hash join prunes
    * map-side — unmatched occurrences never shuffle), group to
    * (doc, term) tf rows, derive per-term df and corpus (n, tot), and
    * apply [[bm25NumDen]] verbatim. The wide scan form (bm25ScoredOf)
    * needs its terms at PLAN time; this form takes them as data. */
  private[graft] def bm25DynamicOf(docs: DataFrame, terms: DataFrame,
      k: Int): DataFrame = {
    import CacheOps.{materializeAndRelease, shared}
    val base = shared(docs.select(col("doc_id"), col("lang"),
      tokens(lower(col("text"))).as("w"))
      .withColumn("dl", size(col("w")).cast("long")))
    materializeAndRelease(bm25DynamicFromBase(base, terms, k), base)
  }

  /** The row-form scorer over a caller-owned tokenized base
    * (doc_id, lang, w, dl) — t13 shares ONE base across its three
    * phases; bm25DynamicOf wraps this with its own base for
    * standalone callers. Returns a lazy frame; the caller releases
    * the base. */
  private def bm25DynamicFromBase(base: DataFrame, terms: DataFrame,
      k: Int): DataFrame = {
    val stats = base.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("tot"))
    val tf = base
      .select(col("doc_id"), col("lang"), col("dl"), explode(col("w")).as("tok"))
      .join(broadcast(terms.select(col("tok")).distinct()), Seq("tok"))
      .groupBy(col("doc_id"), col("lang"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val (num, den) = bm25NumDen(col("tf"), col("dl"), col("df"), col("n"), col("tot"))
    val page = tf
      .join(broadcast(dfs), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("bm_num", num).withColumn("bm_den", den)
      .withColumn("s", expr("bm_num div bm_den"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("s")).as("score_milli"))
      .filter(col("score_milli") > 0)
      .orderBy(desc("score_milli"), col("doc_id")).limit(k)
      .select(col("doc_id"), col("lang"), col("score_milli"))
      .orderBy(col("doc_id"))
    page
  }

  // ====================================================================
  // t14: snippet extraction
  // ====================================================================

  private[graft] val SnippetWidth = 8

  /** T14: best-window snippets for the t11 page — the display layer a
    * search response needs next to its doc ids: the WIDTH-token window
    * holding the most DISTINCT query terms (ties to the earliest
    * offset). Cost is O(page · doc length), never corpus-shaped — the
    * window scoring explodes offsets for the k page docs only. */
  def snippetPage(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    snippetPageOf(documents(spark, dir), Bm25Terms, k, SnippetWidth)

  private[graft] def snippetPageOf(docs: DataFrame, q0: Seq[String], k: Int,
      width: Int): DataFrame = {
    import CacheOps.materializeAndRelease
    val (scored, cached) = bm25ScoredOf(docs, q0, persist = true)
    val page0 = scored.filter(col("score_milli") > 0)
      .orderBy(desc("score_milli"), col("doc_id")).limit(k)
      .select(col("doc_id"))
    val offs = docs.join(page0, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), tokens(lower(col("text"))).as("w"))
      .select(col("doc_id"), col("w"), explode(expr(
        s"CASE WHEN size(w) <= $width THEN array(0) " +
          s"ELSE sequence(0, size(w) - $width) END")).as("i"))
    val qArr = array(q0.map(lit): _*)
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(desc("n_hits"), col("i"))
    val result = offs
      .withColumn("n_hits", size(filter(qArr,
        t => array_contains(slice(col("w"), col("i") + lit(1), lit(width)), t))))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("i").as("start_pos"), col("n_hits"),
        array_join(slice(col("w"), col("i") + lit(1), lit(width)), " ").as("snippet"))
      .orderBy(col("doc_id"))
    materializeAndRelease(result, cached: _*)
  }

  // ====================================================================
  // t15: PMI collocation mining
  // ====================================================================

  private[graft] val PmiMinCount = 5L
  private[graft] val PmiTopK = 20

  /** T15: collocation mining — the corpus' top bigrams by pointwise
    * mutual information, the vocabulary-analysis pass that surfaces
    * multi-word units ("new york"-style compounds) a whitespace
    * tokenizer splits: PMI = log P(xy)/(P(x)P(y)) ranks pairs that
    * co-occur far above chance, which raw bigram counts (dominated by
    * stopword pairs) cannot. t7 uses the bigram LM to score DOCS;
    * t15 mines the LM itself.
    *
    * Determinism: the log is monotone, so the RANKING only needs the
    * ratio — score = (c(xy)·N·10⁶) div (c(x)·c(y)), all-BIGINT with
    * one integral division (bit-identical across engines; fits 2⁶³
    * while c(xy)·N·10⁶ < 9.2·10¹⁸, i.e. corpora to ~10⁸ tokens at
    * gate counts — past that, drop the 10⁶ scale or divide first).
    * A min-count floor keeps hapax pairs (whose PMI is maximal by
    * construction) out of the page — the standard Church & Hanks
    * caveat.
    *
    * Scale shape: one token explode feeds two partial-agged counts
    * (unigrams, bigrams); the min-count HAVING prunes the bigram frame
    * BEFORE its two vocabulary joins, the scalar total broadcasts, and
    * the page is TakeOrderedAndProject. No whole-corpus sort, no
    * window. */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame =
    pmiCollocationsOf(documents(spark, dir), PmiMinCount, PmiTopK)

  private[graft] def pmiCollocationsOf(docs: DataFrame, minCount: Long,
      k: Int): DataFrame = {
    import CacheOps.{materializeAndRelease, shared}
    val toks = tokens(col("text"))
    val base = shared(docs.select(col("doc_id"), toks.as("w")))
    val tok = shared(base.select(explode(col("w")).as("tok")))
    val uni = shared(tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt")))
    val tot = tok.agg(count(lit(1)).as("n_tok"))
    val big = base
      .select(explode(zip_with(
        slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
        slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    val page = big
      .join(uni.select(col("tok").as("x"), col("cnt").as("n_x")), Seq("x"))
      .join(uni.select(col("tok").as("y"), col("cnt").as("n_y")), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_ratio_ppm",
        expr("(n_xy * n_tok * 1000000) div (n_x * n_y)"))
      .orderBy(desc("pmi_ratio_ppm"), col("x"), col("y")).limit(k)
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        col("pmi_ratio_ppm"))
      .orderBy(col("x"), col("y"))
    materializeAndRelease(page, base, tok, uni)
  }

  // ====================================================================
  // t16: prefix autocomplete over the corpus vocabulary
  // ====================================================================

  private[graft] val AutocompletePrefix = "s"
  private[graft] val AutocompleteK = 5
  private[operators] val vocabIdxLanded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val vocabSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "term STRING, df BIGINT, p1 STRING")

  /** T16: query autocomplete — the top completions of a prefix from
    * the corpus' OWN vocabulary, ranked by document frequency (the
    * signal a search box wants: "how many docs would this completion
    * hit"), ties to the lexicographically smaller term. df counts
    * DOCUMENTS, not occurrences — per-doc dedup happens map-side
    * (array_distinct before the explode), so no corpus-wide DISTINCT
    * shuffle, and the prefix filter prunes before the count exchange:
    * only matching terms shuffle at all. */
  def autocomplete(spark: SparkSession, dir: String): DataFrame =
    autocompleteOf(documents(spark, dir), AutocompletePrefix, AutocompleteK)

  private[graft] def autocompleteOf(docs: DataFrame, prefix: String,
      k: Int): DataFrame =
    docs.select(explode(array_distinct(tokens(lower(col("text"))))).as("term"))
      .filter(col("term").startsWith(prefix))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("term")).limit(k)
      .select(col("term"), col("df"))
      .orderBy(col("term"))

  /** The landed vocabulary artifact: (term, df) PARTITIONED BY the
    * term's first character — the prefix analog of t11b's token-hash
    * buckets (a hash bucket can't serve a RANGE-shaped predicate;
    * the leading character can). A probe reads one partition dir. */
  private[graft] def materializeVocabIndexOf(docs: DataFrame, path: String): Unit =
    docs.select(col("doc_id"),
        explode(array_distinct(tokens(lower(col("text"))))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("p1", substring(col("term"), 1, 1))
      .repartition(col("p1"))
      .write.mode("overwrite").partitionBy("p1").parquet(s"$path/vocab")

  /** T16b: autocomplete over the LANDED vocabulary — the serving
    * form. The first-character partition filter prunes the read to
    * one directory (plan-asserted), the prefix predicate pushes to
    * that scan, and the page is TakeOrderedAndProject over the few
    * surviving vocab rows. Probe IO tracks the prefix's letter
    * partition — never the vocabulary, never the corpus. Answers
    * t16's oracle VERBATIM. */
  def autocompleteIndexed(spark: SparkSession, dir: String): DataFrame =
    autocompleteOverIndex(spark,
      Similarity.landOnce(spark, dir, "graft_vocab_idx", vocabIdxLanded,
        source = "documents.parquet")(
        materializeVocabIndexOf(documents(spark, dir), _)),
      AutocompletePrefix, AutocompleteK)

  private[graft] def autocompleteOverIndex(spark: SparkSession, path: String,
      prefix: String, k: Int): DataFrame = {
    require(prefix.nonEmpty, "autocomplete needs a non-empty prefix")
    spark.read.schema(vocabSchema).parquet(s"$path/vocab")
      .filter(col("p1") === prefix.substring(0, 1) &&
        col("term").startsWith(prefix))
      .orderBy(desc("df"), col("term")).limit(k)
      .select(col("term"), col("df"))
      .orderBy(col("term"))
  }
}
