package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot (CDC-style) diff between two versions of a keyed table —
  * the corpus-release question every training-data pipeline answers
  * before shipping: what changed between corpus v1 and v2, and is the
  * delta the one we meant to ship? The reference's update loop answers
  * it row-by-row against Postgres (update_donations.py's per-batch
  * upsert counters); at corpus scale it is one co-partitioned compare.
  *
  * Classification: full-outer join on the key; each side carries a
  * content digest over its value columns computed map-side, so the
  * compare moves (key, 32-byte digest) through the shuffle — never the
  * payload (at 100 TB the text column stays in the scan stage; only
  * keys and digests reach the exchange). `inserted` = key only in new,
  * `deleted` = only in old, `updated` = both sides, digests differ,
  * `unchanged` otherwise.
  *
  * Scale shape: one hash shuffle per side on the key (co-partitioned
  * SMJ/hash join — with both snapshots bucketed or range-laid-out on
  * the key, s17-style, the exchanges vanish entirely); digesting is
  * map-only; the rollup is a |ops|-row partial aggregate. Null-safe:
  * value columns are sentinel-coalesced before digesting so NULL and
  * empty string produce different digests.
  */
object SnapshotDiff {

  /** Per-row diff of two snapshots: key columns + `op` column. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    // \u0001 separates fields (no boundary ambiguity: "ab","c" vs
    // "a","bc"); \u0002 is the null sentinel (distinct from "").
    // concat_ws silently SKIPS nulls, so coalesce runs first.
    def digest(df: DataFrame, as: String): DataFrame =
      df.select(keyCols.map(col) :+
        md5(concat_ws("\u0001",
          valueCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)).as(as): _*)
    val o = digest(oldDf, "old_digest")
    val n = digest(newDf, "new_digest")
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("old_digest").isNull, lit("inserted"))
          .when(col("new_digest").isNull, lit("deleted"))
          .when(col("old_digest") === col("new_digest"), lit("unchanged"))
          .otherwise(lit("updated")))
      .select(keyCols.map(col) :+ col("op"): _*)
  }

  /** Buckets used to derive the deterministic "v2" fixture snapshot:
    * bucket 0 deleted, bucket 1 rewritten, bucket 2 cloned as new docs
    * (doc_id + AddOffset). */
  val DeriveBuckets = 7
  val AddOffset = 10000000L

  private def bucketOf(docId: Column): Column =
    pmod(conv(substring(md5(docId.cast("string")), 1, 4), 16, 10).cast("bigint"),
      lit(DeriveBuckets.toLong))

  /** The derived next-release snapshot: a deterministic function of the
    * corpus (engine-portable, mirrored in the oracle), exercising all
    * three mutation kinds. */
  private[graft] def nextRelease(docs: DataFrame): DataFrame = {
    val b = bucketOf(col("doc_id"))
    val kept = docs.filter(b =!= 0)
      .withColumn("text",
        when(bucketOf(col("doc_id")) === 1, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
    // withColumn (not select) keeps whatever extra columns the corpus
    // carries — the probe's salted corpus has no n_chars
    val added = docs.filter(b === 2)
      .withColumn("doc_id", col("doc_id") + AddOffset)
      .withColumn("text", concat(col("text"), lit(" [new]")))
    kept.unionByName(added)
  }

  /** s19 gate: diff the corpus against its derived next release and
    * roll up per op — count plus key-sum, which pins exact row
    * MEMBERSHIP of every class in the hash compare. */
  def releaseDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = graft.Tables.documents(spark, dir)
    val v2 = nextRelease(v1)
    diff(v1, v2, Seq("doc_id"), Seq("text", "lang", "source"))
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("op"))
  }

  /** Changelog: the diff WITH the new-side payload attached — the
    * shippable artifact of a release compare (deleted rows carry null
    * values; `unchanged` rows are omitted, so the log's size is the
    * CHANGE volume, not the corpus). Same exchange discipline as
    * [[diff]]: old-side payloads never shuffle; the new side ships
    * payloads only for rows that changed. */
  def changelog(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val d = diff(oldDf, newDf, keyCols, valueCols)
      .filter(col("op") =!= "unchanged")
    d.join(newDf.select((keyCols ++ valueCols).map(col): _*), keyCols, "left")
      .select(keyCols.map(col) ++ (col("op") +: valueCols.map(col)): _*)
  }

  /** Apply a changelog to the old snapshot — the MERGE-from-changelog
    * form of incremental corpus sync (on a table format the body is one
    * transactional MERGE INTO; this is the same full-outer discipline
    * as MergeOps). Keys in the log leave the old snapshot (anti join);
    * non-deleted log rows come back with their new payload. One shuffle
    * on the key, sized by |old| + |changes| — re-applying a shipped
    * changelog never rescans the new corpus. */
  def applyChanges(oldDf: DataFrame, changes: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val cols = (keyCols ++ valueCols).map(col)
    oldDf.select(cols: _*)
      .join(changes.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(changes.filter(col("op") =!= "deleted").select(cols: _*))
  }

  /** s19b gate: reconstruct v2 as v1 + changelog, then roll up per
    * lang (rows, text bytes, key-sum). The oracle derives v2 DIRECTLY
    * and computes the same rollup — hash equality proves
    * changelog→apply reconstructs the release exactly. */
  def changelogApply(spark: SparkSession, dir: String): DataFrame = {
    val v1 = graft.Tables.documents(spark, dir)
    val v2 = nextRelease(v1)
    val keys = Seq("doc_id"); val vals = Seq("text", "lang", "source")
    val applied = applyChanges(v1, changelog(v1, v2, keys, vals), keys, vals)
    applied.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("text_chars"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))
  }
}
