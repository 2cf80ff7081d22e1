package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical backward as-of join: one forward pass over two streams
  * that Spark has already hash-partitioned on the equi keys and
  * sorted by (keys, time) — the SAME exchanges a sort-merge join
  * plans, declared via `requiredChildDistribution` /
  * `requiredChildOrdering` so EnsureRequirements (and AQE) place and
  * co-align them; the operator itself never shuffles.
  *
  * Per partition the merge keeps O(1) state: the current key group
  * and the best candidate seen so far (the latest right row with
  * time <= the current left time — because BOTH sides arrive in
  * ascending time within a key group, candidates only improve, so
  * "latest within the band" is one cursor + one remembered row, with
  * the ascending (time, tieBreak) sort making "last advanced" equal
  * "argmax"). Per-key work is O(p + v), against the O(p·v) pair
  * enumeration a band-as-residual sort-merge join performs
  * (see [[AsofMergeJoin]]'s scaladoc for the comparison).
  *
  * The horizon check happens at EMIT time, not eviction time: a
  * remembered candidate can fall out of one purchase's band yet be
  * the correct match for a later purchase only if it re-enters — it
  * can't (left times ascend) — so a stale candidate just fails the
  * `bestTime >= leftTime - horizon` test and yields the null row.
  */
case class AsofMergeExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    horizonUs: Long,
    rightPayload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // same requirements a sort-merge join declares: cluster each side on
  // its keys (EnsureRequirements co-aligns the two hash exchanges) and
  // sort within partitions by (keys, time[, tieBreak])
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(rightTieBreak, Ascending)))

  // rows stream out in the left child's partitioning and order — report
  // both so a downstream group-by on the keys reuses the exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTimeE = leftTime
    val rTimeE = rightTime
    val payload = rightPayload
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    val horizon = horizonUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
        val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val lTimeB = BindReferences.bindReference(lTimeE, lOutput)
        val rTimeB = BindReferences.bindReference(rTimeE, rOutput)
        val payloadProj = UnsafeProjection.create(payload, rOutput)
        // bind payload references as NULLABLE to match the declared
        // output schema: the unmatched-left null row must project as
        // null, not as a garbage primitive read of a non-nullable field
        val resultProj = UnsafeProjection.create(outAttrs,
          lOutput ++ payload.map(_.withNullability(true)))
        val nullRow: InternalRow = new GenericInternalRow(payload.length)
        // a null time must fail loudly, never unbox to epoch-0 —
        // unreachable via joinBackward (right nulls filtered there;
        // guarded for direct construction of the node)
        @inline def nonNullTime(v: Any, side: String): Long = {
          if (v == null) throw new IllegalStateException(
            s"as-of merge: null $side time reached the merge — construct via " +
              "AsofMerge.joinBackward, which enforces the null contract")
          v.asInstanceOf[Long]
        }
        val joined = new JoinedRow
        val rBuf = rIter.buffered
        // O(1) merge state; projection outputs are reused buffers, so the
        // group key and the remembered candidate are defensive copies
        var curKey: UnsafeRow = null
        var best: UnsafeRow = null
        var bestTime = Long.MinValue
        lIter.map { lRow =>
          val k = lKeyProj(lRow)
          if (curKey == null || keyOrd.compare(k, curKey) != 0) {
            curKey = k.copy()
            best = null
            bestTime = Long.MinValue
            while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), curKey) < 0) {
              rBuf.next()
            }
          }
          val lTs = nonNullTime(lTimeB.eval(lRow), "left")
          while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), curKey) == 0 &&
              nonNullTime(rTimeB.eval(rBuf.head), "right") <= lTs) {
            val r = rBuf.next()
            bestTime = nonNullTime(rTimeB.eval(r), "right")
            best = payloadProj(r).copy()
          }
          joined(lRow, if (best != null && bestTime >= lTs - horizon) best else nullRow)
          resultProj(joined)
        }
      }
    }
  }
}
