package graft.plans

import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, IsNotNull}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** The whole-operator extension tier (SURVEY §7.3 option c): a TRUE
  * as-of join operator — custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan` — for the one join family Catalyst has no native
  * operator for (reference: pinecone_export.py's "latest snapshot
  * before the export cut" pairing; the engine's j11 attribution
  * query).
  *
  * Why a custom operator when j11/j11b already pass: Spark's
  * sort-merge join evaluates a time band as a RESIDUAL — every
  * (purchase × view) pair inside the equi-key cell is generated and
  * then filtered, so per-key work is O(p·v). j11b's horizon bucket
  * caps v at rate×horizon, but the pair enumeration remains. Both
  * sides are SORTED BY TIME inside each key cell, and an as-of match
  * is a single forward-moving cursor: the merge is O(p+v) with O(1)
  * state — the plan Catalyst cannot express but a physical operator
  * can ([[AsofMergeExec]]). This is the textbook case the build brief
  * reserves custom `SparkStrategy` work for: compose-from-built-ins
  * exists (j11), is oracle-proven, and is asymptotically worse.
  *
  * Semantics (backward as-of, left outer): for each left row, the
  * right row with the greatest (rightTime, rightTieBreak) such that
  * `rightKeys = leftKeys AND rightTime <= leftTime AND
  * rightTime >= leftTime - horizon`; unmatched left rows emit null
  * payload columns. Exactly j11's LEFT band join + rn=1 argmax —
  * driver-gated against j11's oracle VERBATIM (`j11c_merge_asof`).
  *
  * Scale contract: children hash-shuffle on the equi keys and sort by
  * (keys, time) — the same exchanges a sort-merge join would plan (no
  * extra shuffle vs j11) — then each partition merges in one pass.
  *
  * Null semantics (ENFORCED, round 7 — previously a silent caller
  * obligation): right rows with a null key or null time are removed by
  * an injected IsNotNull filter in [[AsofMerge.joinBackward]] — SQL
  * join semantics, they can never match. Left rows with a null key
  * survive UNMATCHED (left-outer semantics; with right nulls filtered,
  * a null left key group can equal no right key group, so the merge
  * emits the null payload). A null TIME reaching the merge — possible
  * only when the node is constructed directly, bypassing joinBackward
  * — fails loudly instead of evaluating as epoch-0.
  */
case class AsofMergeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    horizonUs: Long,
    rightPayload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofMergeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofMergeJoin]] as [[AsofMergeExec]]. Registered two ways:
  * via `GraftExtensions` (the spark.sql.extensions path) and
  * idempotently through `spark.experimental.extraStrategies` by
  * [[AsofMerge.ensureRegistered]], so the operator works on any
  * session the engine's API touches. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofMergeJoin =>
      AsofMergeExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.rightTieBreak, j.horizonUs, j.rightPayload,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level entry point for the as-of merge operator. */
object AsofMerge {

  /** Append [[GraftStrategy]] to the session's extra strategies if no
    * registration (extensions or a prior call) already planned it. */
  def ensureRegistered(spark: SparkSession): Unit =
    GraftShims.addStrategy(spark, GraftStrategy)

  /** Backward as-of join `left ASOF JOIN right` (left outer): for each
    * left row the latest right row within `[leftTime - horizonUs,
    * leftTime]` on matching keys, ties on rightTime broken by the
    * larger `rightTieBreak`. Output = all left columns + `rightPayload`
    * columns (null when unmatched). Column names are resolved against
    * each side; the two sides' output names must be disjoint. */
  def joinBackward(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String, rightTieBreak: String,
      horizonUs: Long, rightPayload: Seq[String]): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "as-of merge needs matching non-empty key lists")
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val overlap = lPlan.output.map(_.name).toSet
      .intersect(rPlan.output.map(_.name).toSet)
    require(overlap.isEmpty,
      s"as-of merge sides must have disjoint column names, both have: $overlap")
    def attr(plan: LogicalPlan, side: String)(n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$n' (has: ${plan.output.map(_.name).mkString(", ")})"))
    val la = attr(lPlan, "left") _
    val ra = attr(rPlan, "right") _
    (leftKeys.map(la) zip rightKeys.map(ra)).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"key type mismatch: ${l.name}:${l.dataType} vs ${r.name}:${r.dataType}")
    }
    // enforce the null contract (see the class scaladoc): a right row
    // with a null key or time can never be an as-of match — drop it
    // BEFORE the merge so a null never reaches the time cast or makes
    // two null keys compare equal under the natural ordering. On
    // already-non-nullable attributes the optimizer folds this away.
    val rGuard = Filter(
      (rightKeys.map(ra) :+ ra(rightTime))
        .map(IsNotNull(_): Expression).reduceLeft(And),
      rPlan)
    GraftShims.ofRows(spark, AsofMergeJoin(
      lPlan, rGuard, leftKeys.map(la), rightKeys.map(ra),
      la(leftTime), ra(rightTime), ra(rightTieBreak),
      horizonUs, rightPayload.map(ra)))
  }
}
