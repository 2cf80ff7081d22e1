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

  test("paired curation accounts for every pair; both gates bite; bars are parameters") {
    val rows = Multimodal.pairedCuration(spark, sfDir01)
      .collect().map(r => (r.getInt(r.fieldIndex("label")),
        r.getLong(r.fieldIndex("n_pairs")), r.getLong(r.fieldIndex("n_kept")),
        r.getLong(r.fieldIndex("n_text_reject")), r.getLong(r.fieldIndex("n_vec_reject")),
        r.getLong(r.fieldIndex("n_both_reject"))))
    assert(rows.nonEmpty)
    rows.foreach { case (l, n, k, tr, vr, br) =>
      assert(k + tr + vr + br === n, s"label $l: confusion split must partition the pairs")
    }
    assert(rows.map(_._3).sum > 0 && rows.map(_._4).sum > 0 &&
      rows.map(_._5).sum > 0 && rows.map(_._6).sum > 0,
      "both gates must bite at the fixture bars")
    // an impossible cosine bar rejects every pair on the vector side
    val strict = Multimodal.pairedCuration(spark, sfDir01, cosineMinPpm = 2000000L)
      .collect().map(r => r.getLong(r.fieldIndex("n_kept"))).sum
    assert(strict === 0L)
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

  test("fingerprint hashes code points on both the BMP fast path and the supplementary path") {
    import graft.functions.RollingFingerprint
    // texts of exactly K code points → one k-window → the output is that
    // window's rolling hash, mirrored here over code points in BigInt
    // (the oracle's ord() domain). The BMP text exercises the
    // allocation-free charAt path, the emoji text the codePoints path;
    // both must land on the same polynomial-hash family.
    def expected(s: String): Long = {
      val B = BigInt(RollingFingerprint.B)
      val M = BigInt(RollingFingerprint.M)
      s.codePoints().toArray
        .foldLeft(BigInt(0))((h, c) => (h * B + c) % M).toLong
    }
    val bmp = "abcdefghijkl"          // 12 chars = K code points
    val supp = "😀" + "bcdefghijkl" // 😀 + 11 chars = K code points
    assert(bmp.codePoints().count() === RollingFingerprint.K)
    assert(supp.codePoints().count() === RollingFingerprint.K)
    val rows = spark.createDataFrame(Seq(Tuple1(bmp), Tuple1(supp))).toDF("text")
      .select(col("text"), RollingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows(bmp) === Seq(expected(bmp)))
    assert(rows(supp) === Seq(expected(supp)))
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

  test("phash near-dup (m4): localized edits pair, permutations don't, banding lossless") {
    import spark.implicits._
    // a long "payload" with structure (ramping sample values so block
    // means carry signal), plus: a copy with one localized edit (few
    // blocks flip), a token PERMUTATION of it (alignment destroyed —
    // the blockhash must NOT pair it), and an unrelated payload
    val base = (1 to 300).map(i => ('a' + i % 26).toChar.toString * 2).mkString(" ")
    val edited = base.updated(40, 'z').updated(41, 'z').updated(42, 'z')
    val permuted = base.split(" ").reverse.mkString(" ")
    val unrelated = (1 to 300).map(i => ('a' + (i * 17) % 26).toChar).mkString(" ")
    val planted = Seq((1L, base), (2L, edited), (3L, permuted), (4L, unrelated))
      .toDF("doc_id", "text")
    val got = Multimodal.phashPairsOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got.map(p => (p._1, p._2)) === Seq((1L, 2L)),
      s"expected exactly the edited copy to pair: $got")
    assert(got.head._3 <= Multimodal.PhashMaxHamming)

    // driver mirror of the hash + brute-force losslessness on the
    // fixture: banding must produce EXACTLY the ≤maxHamming pairs
    def blockHash(s: String): Long = {
      val cps = s.codePoints().toArray
      val n = cps.length.toLong
      if (n == 0) return 0L
      val bits = Multimodal.PhashBits
      val sums = new Array[Long](bits); val cnts = new Array[Long](bits)
      var total = 0L
      cps.zipWithIndex.foreach { case (v, i) =>
        val b = ((i.toLong * bits) / n).toInt
        sums(b) += v; cnts(b) += 1; total += v
      }
      (0 until bits).foldLeft(0L)((h, j) =>
        if (sums(j) * n > total * cnts(j)) h | (1L << j) else h)
    }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
    val hashes = docs.map { case (id, t) => (id, blockHash(t)) }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= Multimodal.PhashMaxHamming
    } yield (a, b, d)).sortBy(p => (p._1, p._2)).toSeq
    val fx = Multimodal.phashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(fx === brute, "banding must equal the brute-force pair set")
    // and the Spark expression equals the mirror hash everywhere
    val sparkHashes = Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), graft.functions.BlockHash60(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    hashes.foreach { case (id, h) =>
      assert(sparkHashes(id) === h, s"hash mismatch on doc $id")
    }
  }

  test("frame sample: geometry closed-form and signatures deterministic") {
    import spark.implicits._
    val rows = Multimodal.frameSample(spark, sfDir)
      .as[(Long, Long, Long, String)].collect()
    // every asset's sampled set is 0, step, ... < n_frames
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val n = rs.head._2
      val idx = rs.map(_._3).sorted.toSeq
      assert(idx === (0L until n by Multimodal.FrameSampleStep.toLong).toSeq)
    }
    // signature mirrors the driver-side digest arithmetic on one asset
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val (aid, n0, i0, sig) = rows.minBy(r => (r._1, r._3))
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(docs(aid).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expSig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$digest:$i0".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    assert(sig === expSig)
    assert(n0 === (java.lang.Integer.parseInt(digest.substring(12, 14), 16) % 24 + 8).toLong)
  }
}
