package graft

import org.apache.spark.sql.functions._
import graft.operators.LlmOps

/** X7 seam suite: the deterministic stub model, the column-plan
  * extraction, and the batched per-partition model path must all agree
  * — swapping a live model in changes only the CompletionModel body. */
class LlmOpsSpec extends SparkSpec {

  test("stub model: frequency-ranked, tie lexicographic, stopwords and short tokens dropped") {
    val model = new LlmOps.StubKeywordModel(3)
    val Seq(out) = model.completeBatch(Seq(
      "Wolf wolf WOLF sheep sheep goat goat that that that ox a of"))
    // wolf 3; sheep/goat tie at 2 -> lexicographic; 'that' stopword,
    // 'ox'/'a'/'of' under min length
    assert(out === "wolf,goat,sheep")
  }

  test("batched model path equals the column plan bit-for-bit") {
    val plan = LlmOps.extractKeywords(spark, sfDir).collect()
    val batched = LlmOps.extractKeywordsBatched(spark, sfDir, batchSize = 7).collect()
    assert(plan.length === batched.length)
    assert(plan.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      batched.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("every document with a qualifying token gets at most 5 keywords") {
    val rows = LlmOps.extractKeywords(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1).split(',').length <= 5))
    assert(rows.forall(_.getString(1).nonEmpty))
  }

  test("streaming extraction equals batch and processes each landed file once") {
    val root = java.nio.file.Files.createTempDirectory("graft_llmstream")
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // first landing: half the corpus, split across files
    docs.filter(col("doc_id") % 2 === 0).repartition(2).write.parquet(src)
    LlmOps.extractKeywordsStreamingTo(spark, src, out, ckpt)
    val firstCount = spark.read.parquet(out).count()
    assert(firstCount > 0)

    // second landing: the rest; a restarted stream must process ONLY
    // the new files (no doc extracted twice)
    docs.filter(col("doc_id") % 2 === 1).repartition(2)
      .write.mode("append").parquet(src)
    LlmOps.extractKeywordsStreamingTo(spark, src, out, ckpt)

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(streamed.map(_._1).distinct.length === streamed.length, "doc extracted twice")
    val batch = LlmOps.extractKeywords(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(streamed.toSeq === batch.toSeq, "streaming result diverges from batch plan")
  }

  test("rag answer grounds the top-k retrieved docs with their keywords") {
    val rows = LlmOps.ragAnswer(spark, sfDir, "customer order filter join", k = 5).collect()
    assert(rows.length === 5)
    // similarity-ordered, answers reference their own doc id
    val sims = rows.map(_.getAs[Double]("sim_r"))
    assert(sims.sorted.reverse.toSeq === sims.toSeq)
    rows.foreach { r =>
      assert(r.getAs[String]("answer").contains(s"doc ${r.getLong(0)}"))
    }
  }
}
