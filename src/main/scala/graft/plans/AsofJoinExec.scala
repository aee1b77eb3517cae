package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Planner strategy for [[AsofJoin]]. Registered through
  * [[GraftExtensions]] (`injectPlannerStrategy` at session build;
  * `experimental.extraStrategies` for a live session — both public
  * extension seams, tried before the built-in strategies). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tb, outer) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, outer) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: ONE forward pass over two co-partitioned,
  * co-sorted children.
  *
  * Physical contract (EnsureRequirements supplies all of it):
  *  - both children hash-cluster on their keys (the only shuffles; at
  *    100 TB that is the same exchange cost as any keyed fact-fact
  *    join). SKEW CAVEAT (measured round 11, sf10 20%-hot-key
  *    fixture): AQE's OptimizeSkewedJoin matches only the built-in
  *    SortMergeJoin/ShuffledHashJoin nodes — a CUSTOM exec is never
  *    skew-split, so a hot key bounds this operator's wall time at
  *    its key fraction (≈2× vs uniform at a 20% hot key; lowering the
  *    skew thresholds does nothing here, while the same experiment
  *    halves aj1's compositional form). Since round 12 that routing
  *    is a MECHANISM, not a convention: [[AsofJoin.join]]'s default
  *    `auto` dispatch probes both sides' sampled key frequency and
  *    plans the compositional splittable form when a hot key is
  *    detected — this exec is planned (and is the right plan) for
  *    roughly-uniform keys, where it is the O(1)-memory fast path.
  *  - left sorts by (keys, time), right by (keys, time, tieBreak).
  *
  * The merge advances a single right-side cursor monotonically — the
  * last right row at-or-before the current left row's time IS the
  * as-of match (sort order makes "greatest time, then greatest
  * tie-break" the last qualifying row seen). Memory: exactly one
  * buffered right row per partition, O(1); the compositional
  * formulation (equi-join + row_number/max_by) materializes the full
  * per-key history expansion through a shuffle before ranking it away.
  * Time per partition: O(|L| + |R|) beyond the sorts.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    leftOuter: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  // left rows stream through in order; partitioning is the left child's
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering
  override def outputPartitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val keyTypes = lk.map(_.dataType)
    val timeType = lt.dataType
    val nRight = rOut.length
    val outer = leftOuter
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val rBuf = rIter.buffered
      // the single buffered right row: the best match seen for its key
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        while (rBuf.hasNext && {
            val c = keyOrd.compare(rKeyProj(rBuf.head), lKey)
            c < 0 || (c == 0 && timeOrd.compare(rTimeProj(rBuf.head), lTime) <= 0)
          }) {
          val r = rBuf.next()
          val rKey = rKeyProj(r)
          // sort order guarantees later qualifying rows are better
          // matches, so plain overwrite implements greatest-(time,
          // tie-break); null keys/times never match (SQL semantics)
          if (keyOrd.compare(rKey, lKey) == 0 &&
              !rKey.anyNull && !rTimeProj(r).anyNull) {
            lastMatch = r.copy()
            lastMatchKey = rKey.copy()
          } else {
            lastMatch = null
            lastMatchKey = null
          }
        }
        val matched = lastMatch != null && !lKey.anyNull && !lTime.anyNull &&
          keyOrd.compare(lastMatchKey, lKey) == 0
        if (matched) Iterator.single(resultProj(joined(l, lastMatch)))
        else if (outer) Iterator.single(resultProj(joined(l, nullRight)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
