package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, SkewJoin}
import graft.streaming.EventsStream

/** Scale-technique suite: salting, keyset pagination, approximate
  * aggregates, stateful streaming dedup. */
class ScaleOpsSpec extends SparkSpec {

  test("frontier probing advances over small gaps, stops at a wide one") {
    import graft.operators.Incremental
    val sess = spark
    import sess.implicits._
    // ids: dense 1..100, stragglers 103 and 107 (gaps < maxMisses),
    // then 150 beyond a >maxMisses gap — like a sparse roll-call space
    val ids = ((1L to 100L) ++ Seq(103L, 107L, 150L)).toDF("id")
    val frontier = Incremental.probeFrontier(ids, "id",
      startFrontier = 90L, batchSize = 20, maxMisses = 10)
    assert(frontier === 107L,
      "must discover stragglers past small gaps but stop at the wide gap")
    // starting at the discovered frontier finds nothing new (idempotent)
    assert(Incremental.probeFrontier(ids, "id", 107L, 20, 10) === 107L)
    // batch alignment must not leak across a wide gap: 101..115 missing
    // (15 > maxMisses) hides 116 even when one batch spans the gap
    val gappy = (((1L to 100L) :+ 116L): Seq[Long]).toDF("id")
    assert(Incremental.probeFrontier(gappy, "id", 99L, 20, 10) === 100L,
      "sequential-probe semantics: a >maxMisses gap stops discovery " +
        "regardless of batch alignment")
  }

  test("salted join returns exactly the rows of the plain join") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = o.join(c, Seq("o_custkey"))
    val salted = SkewJoin.saltedJoin(o, c, "o_custkey", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.select("o_orderkey").exceptAll(plain.select("o_orderkey")).count() === 0)
  }

  test("salted sum equals plain sum") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice").cast("decimal(18,2)").as("v"))
    val plain = o.groupBy("o_custkey").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val salted = SkewJoin.saltedSum(o, "o_custkey", "v", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(salted === plain)
  }

  test("keyset pagination matches the offset page and pushes a range filter") {
    val keyset = Relational.keysetPagination(spark, sfDir, afterKey = 100L, pageSize = 50)
    val viaOffset = Tables.customer(spark, sfDir)
      .orderBy(col("c_custkey")).select(col("c_custkey"), col("c_name"))
      .filter(col("c_custkey") > 100).limit(50)
    assert(keyset.collect().toSeq === viaOffset.collect().toSeq)
    val plan = keyset.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(c_custkey,100)"), s"range not pushed:\n$plan")
  }

  test("approx distinct within 5% of exact, tolerance verdicts all true") {
    // raw sketch accuracy, independently of the operator's verdicts
    val raw = Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag"))
      .agg(org.apache.spark.sql.functions
        .approx_count_distinct(col("l_orderkey"), 0.02).as("ap"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Relational.countDistinctPerGroup(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = raw(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: approx $ap vs exact $ex")
    }
    // the operator's own verdict columns: exact counts pinned, every
    // tolerance boolean true (what the oracle hash-compares)
    val rows = Relational.approxDistinctPerGroup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_orders") === exact(r.getString(0)))
      assert(r.getAs[Boolean]("distinct_ok") && r.getAs[Boolean]("p50_ok")
        && r.getAs[Boolean]("p95_ok"), s"tolerance verdict false for ${r.getString(0)}")
    }
  }

  test("streaming insert-ignore emits once per key ACROSS micro-batches") {
    // two copies of the events file, paced one file per trigger → every
    // key arrives again in batch 2; emit-once must hold across batches
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("dup_events")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), d.resolve("ev_a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), d.resolve("ev_b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val out = EventsStream.streamingInsertIgnore(spark, d.toString,
      "events_dedup_multibatch", globFilter = "ev_*.parquet", maxFilesPerTrigger = Some(1))
    val expectedKeys = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct().count()
    assert(out.count() === expectedKeys,
      s"expected one row per key ($expectedKeys), got ${out.count()}")
    assert(out.filter(org.apache.spark.sql.functions.col("newly_inserted") === false).count() === 0)
  }

  test("watermark-bounded dedup removes same-batch duplicates, state stays bounded") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("wm_events")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), d.resolve("ev_a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), d.resolve("ev_b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val out = EventsStream.streamingDedupWithinWatermark(spark, d.toString,
      "events_wm_dedup_spec", globFilter = "ev_*.parquet")
    val keys = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct().count()
    // duplicated corpus in one batch → exactly one event per key survives
    assert(out.count() === keys, s"expected $keys deduped rows, got ${out.count()}")
    assert(out.select("user_id", "event_type").distinct().count() === keys)
  }

  test("streaming insert-ignore emits each key once with the true first-seen ts") {
    val out = EventsStream.streamingInsertIgnore(spark, sfDir, "events_dedup_spec")
    val ev = Tables.events(spark, sfDir)
    val expected = ev.groupBy("user_id", "event_type")
      .agg(min("ts").as("first_seen"))
    assert(out.select("user_id", "event_type").distinct().count() === out.count(),
      "duplicate keys emitted")
    assert(out.count() === expected.count())
    val mismatches = out.select("user_id", "event_type", "first_seen")
      .exceptAll(expected).count()
    assert(mismatches === 0, "first_seen timestamps wrong")
  }
}
