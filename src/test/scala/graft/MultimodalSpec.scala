package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

class MultimodalSpec extends SparkSpec {

  test("batched mapPartitions decode equals the expression decode") {
    val expr = Multimodal.decodeFeatures(spark, sfDir)
      .select("asset_id", "source", "n_bytes", "width", "height", "format")
    val batched = Multimodal.decodeFeaturesBatched(spark, sfDir)
      .select("asset_id", "source", "n_bytes", "width", "height", "format")
    assert(batched.exceptAll(expr).count() === 0)
    assert(expr.exceptAll(batched).count() === 0)
  }

  test("batched decode emits frame samples within payload bounds") {
    val rows = Multimodal.decodeFeaturesBatched(spark, sfDir)
      .select("n_bytes", "frame_offsets").collect()
    rows.foreach { r =>
      val n = r.getInt(0)
      // frame_offsets is csv-rendered in the driver-facing output
      val frames = r.getString(1).split(",").map(_.toInt)
      assert(frames.length === 4)
      frames.foreach(f => assert(f >= 0 && f < math.max(n, 1)))
    }
  }

  test("rolling fingerprints flag the exact-jaccard near-dup pairs") {
    val exact = Dedup.ngramJaccardPairs(spark, sfDir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rolling = Dedup.rollingFingerprintPairs(spark, sfDir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val caught = exact.intersect(rolling).size.toDouble / exact.size
    assert(caught >= 0.9, s"rolling fingerprints caught only $caught of near-dups")
  }

  test("winnowing is robust to a leading insertion (fingerprints mostly stable)") {
    import graft.functions.RollingFingerprint
    val df = spark.createDataFrame(Seq(
      Tuple1("the quick brown fox jumps over the lazy dog again and again and again"),
      Tuple1("PREFIX the quick brown fox jumps over the lazy dog again and again and again")))
      .toDF("text")
      .select(RollingFingerprint(col("text")).as("fp"))
    val Array(orig, shifted) = df.collect().map(_.getSeq[Long](0).toSet)
    val overlap = orig.intersect(shifted).size.toDouble / orig.size
    assert(overlap >= 0.7, s"fingerprints unstable under prefix insertion: $overlap")
  }
}
