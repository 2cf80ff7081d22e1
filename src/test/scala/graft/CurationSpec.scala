package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, TextOps}

/** Curation-pipeline invariants the oracle rollup can't see directly:
  * stage monotonicity, survivor rules, and split stability. */
class CurationSpec extends SparkSpec {

  test("curated totals are a partition of the post-filter survivor set") {
    val docs = graft.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val rollup = Curation.curate(spark, sfDir).collect()
    val kept = rollup.map(_.getAs[Long]("n_docs")).sum
    assert(kept > 0 && kept <= nDocs)
    // every (lang, split) row distinct; split values only train/eval
    assert(rollup.map(r => (r.getString(0), r.getString(1))).distinct.length === rollup.length)
    assert(rollup.map(_.getString(1)).toSet.subsetOf(Set("train", "eval")))
  }

  test("the split is a pure function of doc_id — append never migrates a doc") {
    // curating a corpus PREFIX assigns every shared doc the same split
    // membership as the full corpus (the eval-contamination guarantee)
    val all = graft.Tables.documents(spark, sfDir)
    val prefix = all.filter(col("doc_id") < 200)
    def splitOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] = {
      val quality = df
        .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
        .filter(col("n_tokens") >= Curation.MinTokens)
      quality.select(col("doc_id"),
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % Curation.EvalBuckets === 0, lit("eval"))
          .otherwise(lit("train")).as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val fromPrefix = splitOf(prefix)
    val fromAll = splitOf(all)
    assert(fromPrefix.nonEmpty)
    fromPrefix.foreach { case (id, s) => assert(fromAll(id) === s) }
    // both classes are actually populated at fixture scale
    assert(fromAll.values.toSet === Set("train", "eval"))
  }

  test("sequence packing: contiguous bins, fill bounded by budget plus one doc") {
    import org.apache.spark.sql.expressions.Window
    val budget = Curation.PackBudget
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    // derived shard arithmetic: the fixture sits under the floor, so
    // the derivation must reproduce the historical constant 8 (c2's
    // output is pinned by its oracle on exactly this count)
    val nShards = Curation.derivedPackShards(nDocs)
    assert(nShards === 8L, s"fixture must derive the floor shard count, got $nShards")
    assert(Curation.derivedPackShards(Curation.PackShardPerDocs * 100) === 100L,
      "above the floor, one shard per PackShardPerDocs documents")
    val q = graft.Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      .filter(col("n_tokens") >= Curation.MinTokens)
      .withColumn("shard", pmod(col("doc_id"), lit(nShards)))
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = q.withColumn("bin",
      floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget.toDouble)))
      .collect()
    val maxDoc = binned.map(_.getAs[Int]("n_tokens")).max
    binned.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"))).foreach {
      case (_, rows) =>
        val bins = rows.map(_.getAs[Long]("bin")).distinct.sorted
        // contiguous: a doc STARTS in every bin from 0 to the last
        assert(bins.head === 0L && bins.toSeq === (0L to bins.last))
        // contiguous-fill bound: a bin's content never exceeds the
        // budget by more than one overflowing document
        rows.groupBy(_.getAs[Long]("bin")).values.foreach { binRows =>
          val fill = binRows.map(_.getAs[Int]("n_tokens").toLong).sum
          assert(fill <= budget + maxDoc, s"bin overfilled: $fill")
        }
    }
    // the rollup accounts for every filtered doc
    val rollup = Curation.sequencePacking(spark, sfDir).collect()
    assert(rollup.map(_.getAs[Long]("n_docs")).sum === binned.length)

    // shard-count INVARIANCE: shards change window parallelism, never
    // the packed corpus — per-lang doc and token totals are identical
    // at the derived count, the floor, and a 4x-derived count (bin
    // counts/extrema legitimately differ: each shard opens its own
    // bin 0, which is why the floor pins fixture output)
    def totals(shards: Long): Map[String, (Long, Long)] =
      Curation.sequencePacking(spark, sfDir, shards = shards).collect()
        .map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))).toMap
    val base = totals(nShards)
    assert(totals(32L).view.mapValues(identity).toMap === base,
      "per-lang totals must be shard-invariant")
  }

  test("near-dup stage drops exactly the greater id of each surviving pair") {
    // pairs computed over the same survivor frame the pipeline uses
    val quality = graft.Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      .filter(col("n_tokens") >= Curation.MinTokens)
    val exact = quality
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk")
    val pairs = Dedup.ngramJaccardPairsOf(exact.select(col("doc_id"), col("text"))).collect()
    // every b_id must be absent from the curated survivor set: compare
    // totals — dropping b-ids from exact reproduces the rollup count
    val expectedKept = exact.count() - pairs.map(_.getLong(1)).distinct.length
    val rollupKept = Curation.curate(spark, sfDir).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(rollupKept === expectedKept)
  }

  test("clustered curation (c1b) keeps exactly one doc per component") {
    // same survivor frame as the pipeline, pairs folded into components
    // by a driver-side union-find — the independent formulation
    val quality = graft.Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      .filter(col("n_tokens") >= Curation.MinTokens)
    val exact = quality
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk")
    val pairs = Dedup.ngramJaccardPairsOf(exact.select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val endpoints = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val components = endpoints.map(find).distinct.length
    // keep-one-per-component: clustered endpoints collapse to one
    // survivor each; untouched docs all survive
    val expectedKept = exact.count() - (endpoints.length - components)
    val rollupKept = Curation.curateClustered(spark, sfDir).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(rollupKept === expectedKept)
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
  }

  test("decontamination matches an independent gram-string formulation") {
    // recompute c3 without the 60-bit hash, the broadcasts, or the
    // posting-list reuse: raw gram STRINGS, plain joins — an
    // independent composition that must agree exactly
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("is_bench",
        conv(substring(md5(concat(lit("contam:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
          .cast("int") % Curation.BenchmarkBuckets === 0)
    val grams = docs.select(col("doc_id"), col("lang"), col("is_bench"),
      explode(Dedup.shingles(col("text"))).as("gram"))
    val rare = grams.join(
      grams.groupBy("gram").count()
        .filter(col("count") <= Dedup.derivedDfCap(docs.count()))
        .select("gram"),
      Seq("gram"))
    val expected = rare.filter(!col("is_bench"))
      .join(rare.filter(col("is_bench"))
        .select(col("gram"), col("doc_id").as("bench_id")), Seq("gram"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val got = Curation.decontaminate(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty, "fixture produced no contamination evidence")
    assert(got === expected)
    // no benchmark doc may ever be flagged as contaminated training data
    val benchIds = docs.filter(col("is_bench")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.keySet.intersect(benchIds).isEmpty)
  }

  test("stratified sample: exact hash membership, stable under append") {
    val sampled = Curation.stratifiedSample(spark, sfDir).collect()
    assert(sampled.nonEmpty)
    val denoms = Curation.SampleDenoms.toMap
    // membership is exactly the hash predicate (recomputed per row)
    val all = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(id: Long): Int =
      Integer.parseInt(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"sample:$id").substring(0, 4), 16)
    val expectedIds = all.collect { case (id, lang)
      if bucket(id) % denoms.getOrElse(lang, Curation.SampleDenomDefault) == 0 => id
    }.toSet
    assert(sampled.map(_.getLong(0)).toSet === expectedIds)
    // head language keeps roughly 1-in-2, tails roughly 1-in-4 — loose
    // binomial bounds, just catching a swapped or ignored denominator
    val byLang = sampled.groupBy(_.getString(1)).view.mapValues(_.length)
    val total = all.groupBy(_._2).view.mapValues(_.size)
    val enRate = byLang.getOrElse("en", 0).toDouble / total("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate")
  }

  test("mixture epochs: per-lang repetition counts and distinct shuffle keys") {
    val rows = Curation.mixtureEpochs(spark, sfDir).collect()
    val weights = Curation.MixtureEpochs.toMap
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.foreach { case (_, rs) =>
      val lang = rs.head.getString(1)
      val epochs = rs.map(_.getInt(2)).sorted
      assert(epochs === (1 to weights.getOrElse(lang, 1)).toArray,
        s"doc epochs $epochs for lang $lang")
    }
    // the training-order key must not collide across emitted rows
    // (md5-60bit over ~1k rows: any collision means a derivation bug)
    assert(rows.map(_.getLong(3)).distinct.length === rows.length)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(perDoc.size === nDocs)
  }

  test("weighted sample (c4b): membership is the integer Bernoulli, append-stable, quality-monotone") {
    import org.apache.spark.sql.functions._
    // recompute membership driver-side from the same derivation
    val docs = Tables.documents(spark, sfDir01)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      .withColumn("n_stop", size(filter(TextOps.tokens(col("text")),
        t => t.isin(Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with").map(lit): _*))))
      .select("doc_id", "lang", "n_tokens", "n_stop")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.filter { case (id, _, nt, ns) =>
      val ppm = if (nt == 0) 0L
        else math.floor((math.min(nt, 100) / 100.0 * 0.5 + ns.toDouble / nt * 0.5) * 1e6).toLong
      val u32 = java.lang.Long.parseLong(md5hex(s"wsamp:$id").take(8), 16)
      u32 * 1000000L < ppm * 4294967296L
    }
    val expByLang = expected.groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    val got = Curation.weightedSample(spark, sfDir01)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === expByLang.keySet)
    expByLang.foreach { case (lang, ids) =>
      assert(got(lang) === ((ids.size.toLong, ids.sum)), s"membership diverged for $lang")
    }
    // quality-monotone in aggregate: the kept fraction of the top
    // quality tercile exceeds the bottom tercile's
    val scoredAll = docs.map { case (id, _, nt, ns) =>
      val ppm = if (nt == 0) 0L
        else math.floor((math.min(nt, 100) / 100.0 * 0.5 + ns.toDouble / nt * 0.5) * 1e6).toLong
      (id, ppm)
    }.sortBy(_._2)
    val keptSet = expected.map(_._1).toSet
    val n = scoredAll.length
    val low = scoredAll.take(n / 3); val high = scoredAll.takeRight(n / 3)
    def rate(xs: Array[(Long, Long)]) = xs.count(x => keptSet(x._1)).toDouble / xs.length
    assert(rate(high) > rate(low), "higher quality must keep at a higher rate")
  }

  test("source caps (c7) equal the naive whole-corpus window, any salt fan-out") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val cap = Curation.SourceCap
    val out = Curation.sourceCaps(spark, sfDir01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._2 <= cap), "a source exceeded the cap")
    // the salted two-phase form is EXACT: identical to salts=1 (which
    // degenerates to the naive single-window ranking)
    val oneSalt = Curation.sourceCaps(spark, sfDir01, salts = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val manySalts = Curation.sourceCaps(spark, sfDir01, salts = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out === oneSalt)
    assert(out === manySalts)
    // derived fan-out arithmetic: fixture sources sit under the cell
    // target (floor applies); a 10^9-doc mega-domain splits into
    // size/SaltCellDocs cells
    assert(Curation.derivedCapSalts(25L) === Curation.CapSalts)
    assert(Curation.derivedCapSalts(Curation.SaltCellDocs * 40L) === 40)
    // kept + dropped accounts for every document of every source
    val srcCounts = Tables.documents(spark, sfDir01)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (src, kept, dropped, _, _) =>
      assert(kept + dropped === srcCounts(src), s"$src kept+dropped != total")
    }
  }

  test("source caps: under-cap sources pass through untouched") {
    import org.apache.spark.sql.functions._
    val out = Curation.sourceCaps(spark, sfDir01, cap = 1000000)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSeq
    assert(out.forall(_._2 === 0L), "nothing may be dropped under a huge cap")
    val idSums = Tables.documents(spark, sfDir01)
      .groupBy(col("source")).agg(sum(col("doc_id")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (src, _, keptSum) =>
      assert(keptSum === idSums(src), s"$src pass-through changed membership")
    }
  }

  test("shard manifest accounts for every doc, balances shards, and is append-stable per doc") {
    val m = Curation.shardManifest(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(m.map(_.getLong(1)).sum === nDocs, "every document lands in exactly one shard")
    assert(m.map(_.getLong(0)).toSet === (0L until Curation.ManifestShards).toSet)
    // hash sharding must stay near-uniform — the structural no-skew
    // claim (fixture measures 26..41 around an average of 31)
    val counts = m.map(_.getLong(1))
    val avg = counts.sum.toDouble / counts.length
    assert(counts.max <= avg * 1.6, s"shard skew high: max ${counts.max}, avg $avg")
    assert(counts.min >= avg / 1.6, s"shard skew low: min ${counts.min}, avg $avg")
    // assignment is a pure per-doc hash: recompute it driver-side for
    // each shard's first_doc — append stability follows (adding docs
    // can never move an existing one)
    def shardOf(docId: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % Curation.ManifestShards
    }
    m.foreach(r => assert(shardOf(r.getLong(3)) === r.getLong(0),
      s"first_doc ${r.getLong(3)} not in shard ${r.getLong(0)}"))
  }

  test("dsir weights match a driver-side mirror and favor target-heavy docs") {
    import spark.implicits._
    def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    def bucketOf(gram: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % Curation.DsirBuckets
    }
    // target sources speak "alpha beta"; raw-only sources speak
    // "gamma delta"; the probe docs mix them
    val planted = Seq(
      (1L, "alpha beta alpha beta alpha beta", "src0", "en"),
      (2L, "alpha beta alpha beta", "src1", "en"),
      (3L, "gamma delta gamma delta gamma delta", "src9", "en"),
      (4L, "gamma delta gamma delta", "src8", "en"),
      (5L, "alpha beta alpha beta alpha beta alpha", "src7", "en"), // target-like raw doc
      (6L, "gamma delta gamma delta gamma", "src6", "en"), // raw-like raw doc
      (7L, "", "src5", "en") // zero grams
    ).toDF("doc_id", "text", "source", "lang")
    val got = Curation.dsirOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq

    // driver mirror of the exact quantized arithmetic
    val grams = planted.collect().map(r => (r.getLong(0), r.getString(2),
      r.getString(1).trim.split("\\s+").filter(_.nonEmpty).sliding(2)
        .filter(_.length == 2).map(_.mkString(" ")).toSeq))
    val occ = grams.flatMap { case (id, src, gs) =>
      gs.map(g => (id, Curation.DsirTargetSources.contains(src), bucketOf(g)))
    }
    val byB = occ.groupBy(_._3)
    val qdiff = byB.map { case (b, os) =>
      b -> (flog2(os.count(_._2) + 1L) - flog2(os.length + 1L))
    }
    val cnorm = flog2(occ.count(_._2) + Curation.DsirBuckets.toLong) -
      flog2(occ.length + Curation.DsirBuckets.toLong)
    val expected = grams.map { case (id, _, gs) =>
      val w = gs.map(g => qdiff(bucketOf(g))).sum - gs.length * cnorm
      (id, gs.length.toLong, w, w >= 0)
    }.sortBy(_._1).toSeq
    assert(got === expected)
    // the selection gate orders docs the way DSIR promises: the
    // target-heavy probe doc outscores the raw-heavy one
    val w = got.map(r => r._1 -> r._3).toMap
    assert(w(5L) > w(6L), "target-like doc must outweigh raw-like doc")
    assert(got.find(_._1 == 7L).get._2 === 0L, "zero-gram doc accounted")
  }

  test("cluster caps (c9): per-cell top-cap by quality, rank contiguous, cap respected") {
    val cap = 25
    val got = Curation.clusterCaps(spark, sfDir, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.nonEmpty)
    // brute-force mirror from the two INPUT tiers (each oracle-checked
    // on its own): membership via the shared assignment, quality via t2
    val cells = graft.operators.Similarity.cellAssignments(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = graft.operators.TextOps.qualityScores(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("quality_ppm")).toMap
    val expected = cells.toSeq
      .flatMap { case (docId, cell) => quality.get(docId).map(q => (cell, docId, q)) }
      .groupBy(_._1)
      .flatMap { case (cell, members) =>
        members.sortBy { case (_, id, q) => (-q, id) }
          .take(cap).zipWithIndex
          .map { case ((c, id, q), i) => (c, id, q, i + 1) }
      }.toSeq.sortBy(t => (t._1, t._2))
    assert(got.toSeq.sortBy(t => (t._1, t._2)) === expected,
      "c9 selection diverged from the brute-force per-cell top-cap")
    // cap respected in every cell
    got.groupBy(_._1).foreach { case (cell, rows) =>
      assert(rows.length <= cap, s"cell $cell over cap")
    }
  }

  test("split leakage: classes reconcile with a driver-side split of the pair frame") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(spark, sfDir01)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Integer.parseInt(hex.substring(0, 4), 16) % Curation.EvalBuckets == 0)
        "eval" else "train"
    }
    val expected = pairs.map { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      ((if (sa <= sb) sa else sb, if (sa <= sb) sb else sa), (1L, a + b))
    }.groupBy(_._1).view.mapValues(v =>
      (v.map(_._2._1).sum, v.map(_._2._2).sum)).toMap
    val got = Curation.splitLeakage(spark, sfDir01)
      .as[(String, String, Long, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(got === expected)
  }

  test("c11: fully-covered source weighs zero; disjoint source takes the remaining mass") {
    import spark.implicits._
    // A's 2 grams are a subset of B's 3; C's 3 grams are disjoint.
    // unique mass: A = 2−2 = 0, B = 3−2 = 1, C = 3−0 = 3; total 4 →
    // ppm weights 0 / 250000 / 750000 (floor division, exact here)
    val docs = Seq(
      (1L, "w1 w2 w3 w4", "srcA"),
      (2L, "w1 w2 w3 w4 w5", "srcB"),
      (3L, "q1 q2 q3 q4 q5", "srcC"))
      .toDF("doc_id", "text", "source")
    val got = Curation.overlapWeightsOf(graft.operators.Dedup.sourceOverlapOf(docs),
        perSourceOf(docs))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      "srcA" -> ((2L, 2L, 0L)),
      "srcB" -> ((3L, 2L, 250000L)),
      "srcC" -> ((3L, 0L, 750000L))))
  }

  private def perSourceOf(docs: org.apache.spark.sql.DataFrame) = {
    val g = graft.operators.Dedup.sourceGramFrame(docs)
    val per = graft.operators.Dedup.perSourceSketches(g)
      .select(col("source"), col("n_grams")).localCheckpoint(true)
    g.unpersist()
    per
  }

  test("c11 degenerate shapes: a single source weighs 1000000 ppm; zero unique mass falls back proportional") {
    import spark.implicits._
    // K = 1: no pairs exist, but the per-source side still names the
    // source — the oracle's per-source CTE yields weight 1000000 at
    // K = 1, so must the engine (the round-12 empty-result hole)
    val solo = Seq((1L, "w1 w2 w3 w4", "only")).toDF("doc_id", "text", "source")
    val gotSolo = Curation.overlapWeightsOf(
        graft.operators.Dedup.sourceOverlapOf(solo), perSourceOf(solo))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(gotSolo === Map("only" -> ((2L, 0L, 1000000L))))

    // mirrored corpus: each source fully covered by the other → every
    // unique mass is 0; weights must fall back to n_grams-proportional
    // (NOT divide into null — the round-12 ÷0 hole)
    val mirror = Seq(
      (1L, "w1 w2 w3 w4", "left"),
      (2L, "w1 w2 w3 w4", "right"))
      .toDF("doc_id", "text", "source")
    val gotMirror = Curation.overlapWeightsOf(
        graft.operators.Dedup.sourceOverlapOf(mirror), perSourceOf(mirror))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(gotMirror === Map(
      "left" -> ((2L, 2L, 500000L)),
      "right" -> ((2L, 2L, 500000L))))
  }

  test("d11b: sketch-only estimates stay inside the exact-marginal envelope with hash-stable marginals") {
    import spark.implicits._
    // the landed-sketch production path on a planted corpus: marginals
    // exact, every estimate inside [−5%(n_a+n_b), min+5%(n_a+n_b)]
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5", "srcA"),
      (2L, "w1 w2 w3 q4 q5", "srcB"))
      .toDF("doc_id", "text", "source")
    val g = graft.operators.Dedup.sourceGramFrame(docs)
    val per = graft.operators.Dedup.perSourceSketches(g).localCheckpoint(true)
    g.unpersist()
    val got = graft.operators.Dedup.estimatesFromSketches(per)
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        (col("est") >= lit(-0.05) * (col("n_a") + col("n_b")) &&
          col("est") <= least(col("n_a"), col("n_b")) +
            lit(0.05) * (col("n_a") + col("n_b"))).as("ok"))
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(("srcA", "srcB", 3L, 3L, true)))
  }
}
