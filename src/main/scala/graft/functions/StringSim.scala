package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-similarity column expressions for fuzzy entity linking.
  *
  * Reference: `fuzz.token_sort_ratio` over normalized names
  * (ingest_fec_links.py:127-136, threshold 85) and `normalize_name`
  * (ingest_fec_links.py:34-43: upper, strip periods/commas, trim).
  *
  * Implemented as pure built-in column expressions — no UDF — so the
  * whole scoring pipeline stays inside whole-stage codegen: sort_array +
  * split does the "token sort", built-in `levenshtein` does the heavy
  * part. At 100 TB the score is evaluated only on blocked candidate
  * pairs (see FuzzyLink), never all-pairs.
  */
object StringSim {

  /** Reference normalize_name: uppercase, strip '.' and ',', trim. */
  def normalizeName(c: Column): Column =
    upper(trim(translate(c, ".,", "")))

  /** Whitespace tokens, sorted and re-joined — the "token sort" half of
    * token_sort_ratio. Empty tokens from leading blanks are removed so
    * "  a b" and "a b" agree. */
  def tokenSort(c: Column): Column =
    array_join(sort_array(filter(split(c, "\\s+"), t => t =!= lit(""))), " ")

  /** Similarity in [0,100]: 100*(1 - levenshtein/max(len)) over the
    * token-sorted strings, floored to an int like fuzzywuzzy's ratio.
    * Both-empty compares as 100 (identical). */
  def tokenSortRatio(a: Column, b: Column): Column =
    ratioOfSorted(tokenSort(a), tokenSort(b))

  /** The ratio over already-token-sorted strings. Use this form inside
    * joins: sort once per input row, score once per candidate pair. */
  def ratioOfSorted(sa: Column, sb: Column): Column = {
    val maxLen = greatest(length(sa), length(sb))
    when(maxLen === 0, lit(100))
      .otherwise(floor(lit(100) * (lit(1.0) - levenshtein(sa, sb) / maxLen)).cast("int"))
  }

  /** ratioOfSorted with a score floor: pairs that cannot reach minScore
    * get 0 instead of an exact score, letting levenshtein's banded
    * early-abandon kick in (cost O(threshold·len) instead of O(len²)).
    *
    * Safe under argmax-then-filter(score > minScore) semantics: a capped
    * pair has true score <= minScore, so it can neither survive the
    * filter nor outrank a surviving pair. Only the exact variant is safe
    * if sub-threshold scores are themselves consumed.
    */
  def ratioOfSortedCapped(sa: Column, sb: Column, minScore: Int): Column = {
    val maxLen = greatest(length(sa), length(sb))
    // max edit distance that can still yield floor(100*(1-d/len)) > minScore
    val cap = ceil(maxLen * (100 - minScore) / lit(100.0)).cast("int")
    val dist = call_function("levenshtein", sa, sb, cap)
    when(maxLen === 0, lit(100))
      .otherwise(when(dist === -1, lit(0))
        .otherwise(floor(lit(100) * (lit(1.0) - dist / maxLen)).cast("int")))
  }
}
