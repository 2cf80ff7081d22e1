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

  test("quarantine (x7d): failure classes reconcile and valid content matches x7") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the stub's failure modes, pinned on synthesized prompts of each class
    val model = new LlmOps.StubJsonModel(5)
    def promptWithNibble(c: Char): String =
      Iterator.from(0).map(i => s"alpha beta gamma probe$i")
        .find(p => md5hex(p).head == c).get
    val Seq(bad, drift, ok) =
      model.completeBatch(Seq(promptWithNibble('0'), promptWithNibble('1'),
        promptWithNibble('7')))
    assert(bad.startsWith("""{"keywords": """) && !bad.endsWith("}"),
      s"truncation class broken: $bad")
    assert(drift.startsWith("""{"topics":"""), s"drift class broken: $drift")
    assert(ok.matches("""\{"keywords": "[a-z,0-9]*"\}"""), s"valid class broken: $ok")

    // fixture: the three classes PARTITION the corpus exactly
    val roll = LlmOps.extractWithQuarantine(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(roll.values.map(_._1).sum === docs.length)
    assert(roll.values.map(_._2).sum === docs.map(_._1).sum)
    // class membership equals the stub's md5 rule
    def statusOf(text: String): String = md5hex(text).head match {
      case '0' => "malformed_json"
      case '1' => "missing_field"
      case _ => "valid"
    }
    val expected = docs.groupBy(d => statusOf(d._2))
      .map { case (s, ds) => s -> (ds.length.toLong, ds.map(_._1).sum) }
    expected.foreach { case (s, (n, idSum)) =>
      assert(roll(s)._1 === n && roll(s)._2 === idSum, s"class $s membership")
    }
    // valid-content hash: recompute from x7's own (oracle-checked) output
    val kw = LlmOps.extractKeywords(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val validIds = docs.filter(d => statusOf(d._2) == "valid").map(_._1)
    val expHash = validIds.map { id =>
      java.lang.Long.parseLong(md5hex(kw.getOrElse(id, "")).take(8), 16)
    }.sum
    assert(roll("valid")._3 === expHash, "valid keyword content drifted from x7")
  }
}
