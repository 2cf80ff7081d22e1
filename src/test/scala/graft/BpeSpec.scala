package graft

import graft.operators.Bpe

/** t8's iterative learner pinned three ways: hand-computed merges on a
  * planted vocab (including the greedy-overlap rule and early stop), a
  * classic driver-side reference BPE over the fixture corpus, and the
  * framed-replace mechanics themselves. */
class BpeSpec extends SparkSpec {

  private def merges(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("planted vocab: weighted argmax, merged symbols feeding later rounds, early stop") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = merges(Bpe.learnMerges(spark, docs, rounds = 8).collect())
    // round 1: (a,a) twice inside aaab ×2 docs-weight → 4, beats (a,b)=3
    // round 2: aaab is now [aa][a][b] → (a,b) count 3 beats (aa,a)=2
    // round 3: [aa][ab] → (aa,ab)=2; then the vocab has no pairs → STOP
    assert(got.toSeq === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("greedy non-overlapping application: aaa under (a,a) becomes [aa][a]") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val got = merges(Bpe.learnMerges(spark, docs, rounds = 8).collect())
    // if replace overlapped, round 1 would consume all three a's at once
    // and round 2's (aa,a) pair could never appear
    assert(got.toSeq === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "aa", "a", "aaa", 2L)))
  }

  test("learned merges equal a classic reference BPE over the fixture corpus") {
    // the textbook algorithm (Sennrich et al. fig. 1), driver-side:
    // dict of symbol-tuples → freq, argmax weighted pair, merge pass
    val words = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
      .filterNot(w => w.contains("[") || w.contains("]"))
      .groupBy(identity).map { case (w, o) => w.map(_.toString).toVector -> o.size.toLong }
    var vocab = words
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    for (r <- 1 to Bpe.BpeRounds) {
      val counts = scala.collection.mutable.LinkedHashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((l, rr), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        expected += ((r, l, rr, l + rr, c))
        vocab = vocab.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              out += (l + rr); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> f
        }
      }
    }
    val got = merges(Bpe.bpeMerges(spark, sfDir).collect())
    assert(got.toSeq === expected.toSeq)
  }

  test("t8b tokenize: planted doc collapses to one symbol per fully-merged word") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = Bpe.bpeTokenizeOf(spark, docs).collect()
    assert(got.length === 1)
    // all three learned merges apply: aaab → [aaab], ab → [ab] — three
    // words, ten chars, three BPE tokens
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2),
      got(0).getLong(3), got(0).getLong(4)) === ((1L, 3L, 10L, 3L, 300000L)))
  }

  test("t8b: the application phase is scan work — no join, partial-agg rollup") {
    val p = Bpe.bpeTokenize(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("Join"),
      s"merge application must fold in as literals, not join the merge table:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no map-side partial aggregation in:\n$p")
    // sanity on the semantics: BPE tokens never exceed chars, never
    // fewer than words
    val rows = Bpe.bpeTokenize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(3) >= r.getLong(1))
    }
  }
}
