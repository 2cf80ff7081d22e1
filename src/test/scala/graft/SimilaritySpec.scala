package graft

import org.apache.spark.sql.functions._
import graft.functions.Vectors
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  test("cosine of identical vectors is 1, orthogonal is 0, zero-vector guarded") {
    val df = spark.createDataFrame(Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))))
      .toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("sim"))
    val sims = df.collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1)) < 1e-12)
    assert(sims(2) === 0.0)
  }

  test("brute-force top-k is sorted desc and k-sized") {
    val rows = Similarity.cosineTopK(spark, sfDir, queryId = 0L, k = 10).collect()
    assert(rows.length === 10)
    val sims = rows.map(r => r.getDouble(r.fieldIndex("sim_r")))
    assert(sims.toSeq === sims.sorted.reverse.toSeq)
    assert(!rows.map(_.getLong(0)).contains(0L), "query vector must be excluded")
  }

  test("LSH top-k results agree with brute-force scores and have useful recall") {
    val brute = Similarity.cosineTopK(spark, sfDir, 0L, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("sim_r"))).toMap
    val lsh = Similarity.lshTopK(spark, sfDir, 0L, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("sim_r"))).toMap
    assert(lsh.nonEmpty)
    // any overlap must carry the identical (exact) similarity
    lsh.keySet.intersect(brute.keySet).foreach { id =>
      assert(lsh(id) === brute(id), s"sim mismatch for $id")
    }
    val recall = lsh.keySet.intersect(brute.keySet).size / 10.0
    // ~1/16 of the corpus per bucket at 4 planes: top neighbors cluster on
    // the query side of the hyperplanes, so recall well above random
    assert(recall >= 0.2, s"LSH recall@10 = $recall")
  }

  test("near-dup top pairs are within-label, deduped, sorted desc") {
    val rows = Similarity.nearDupTopPairs(spark, sfDir, k = 20).collect()
    assert(rows.length === 20)
    rows.foreach(r => assert(r.getLong(1) < r.getLong(2), "a_id < b_id expected"))
    val sims = rows.map(r => r.getDouble(r.fieldIndex("sim_r")))
    assert(sims.toSeq === sims.sorted.reverse.toSeq)
  }
}
