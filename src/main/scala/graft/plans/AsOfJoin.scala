package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a FIRST-CLASS operator: custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, injected via `GraftExtensions` —
  * SURVEY.md §4 extension ladder tier (c), the one tier the repo had not
  * needed until now (everything else composed from built-ins or scalar
  * `Expression`s).
  *
  * Semantics (the reference's "latest state at event time" lookup: the
  * OpenSearch serving index holds the most recent replicated doc per
  * key, reference `firehose.py:114-116` / `README.md:455-457`; also
  * DuckDB's `ASOF JOIN`): for each left row, the single right row
  * with equal keys and the LARGEST right timestamp `<=` the left
  * timestamp, optionally within `toleranceUs` microseconds. Inner (drop
  * unmatched left rows) or left-outer (null-pad).
  *
  * Why a custom operator instead of the q09/q09b compositions: the
  * range-join + window form materializes EVERY in-tolerance (left,
  * right) pair and then discards all but one per left row — at 100 TB
  * with dense right-side histories that intermediate is quadratic in
  * events-per-key. This exec is a streaming MERGE over co-partitioned
  * sorted runs: one hash exchange per side (the same cost as the
  * equi-join's shuffle), one sort per side, then a single forward pass
  * holding O(1) state per partition — no pair blow-up, no window
  * buffering. Catalyst still plans the exchanges/sorts via
  * `requiredChildDistribution`/`requiredChildOrdering` (EnsureRequirements
  * co-partitions the sides exactly as it would a sort-merge join), so
  * AQE, whole-stage codegen on the inputs, and column pruning below the
  * node all keep working.
  *
  * Determinism: among right rows with identical (keys, ts) the merge
  * keeps the LAST in sort order, so callers wanting a pinned result
  * should pass `rightTieBreak` columns (appended to the right sort key)
  * — the survivor is then the max of the tie-break, matching q09b's
  * `ROW_NUMBER ... ORDER BY ts DESC, id DESC` convention.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression],
    toleranceUs: Option[Long],
    leftOuter: Boolean)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected with
  * `injectPlannerStrategy` so it participates in ordinary planning. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, tol, lo) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, tol, lo,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sort-merge as-of join. Each task walks its left run
  * once and its right run once, carrying only the latest in-window right
  * row per key — O(left + right) time, O(1) rows of state. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression],
    toleranceUs: Option[Long],
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  /** Same requirement shape as a shuffled equi-join: EnsureRequirements
    * hash-partitions BOTH sides on the keys with compatible partitioning
    * — the single shuffle per side that any keyed join pays. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Sorted runs per partition: (keys, ts) on the left, (keys, ts,
    * tieBreak) on the right so equal-ts survivors are pinned. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTieBreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tol = toleranceUs
    val outer = leftOuter
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val lTsBound = BindReferences.bindReference(lTsExpr, lOutput)
      val rTsBound = BindReferences.bindReference(rTsExpr, rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against nullability-WIDENED right attrs on the outer path,
      // or the generated projection elides the null check and reads the
      // padding row's backing zeros as values
      val bindSchema =
        if (outer) lOutput ++ rOutput.map(_.withNullability(true))
        else lOutput ++ rOutput
      val resultProj = UnsafeProjection.create(outAttrs, bindSchema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOutput.size)

      // one-row lookahead over the right run (rows/keys copied out of the
      // iterator's reused buffers; ts pre-evaluated)
      var rHead: InternalRow = null
      var rHeadKey: UnsafeRow = null
      var rHeadTs: java.lang.Long = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          rHead = r.copy()
          rHeadKey = rKeyProj(rHead).copy()
          val t = rTsBound.eval(rHead)
          rHeadTs = if (t == null) null else t.asInstanceOf[Long]
        } else { rHead = null; rHeadKey = null; rHeadTs = null }
      advanceRight()

      // latest right row with key == curKey and ts <= current left ts
      var curMatch: InternalRow = null
      var curMatchKey: UnsafeRow = null
      var curMatchTs: Long = 0L

      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lt = lTsBound.eval(l)
        if (lt != null && !lKey.anyNull) {
          val lTsVal = lt.asInstanceOf[Long]
          // drop right rows for keys already passed (their buffered match
          // can never serve a later, larger left key)
          while (rHead != null && keyOrd.compare(rHeadKey, lKey) < 0)
            advanceRight()
          // fold right rows for THIS key up to the left timestamp; null-ts
          // right rows sort first and are skipped (never a match)
          while (rHead != null && keyOrd.compare(rHeadKey, lKey) == 0 &&
              (rHeadTs == null || rHeadTs <= lTsVal)) {
            if (rHeadTs != null) {
              curMatch = rHead; curMatchKey = rHeadKey; curMatchTs = rHeadTs
            }
            advanceRight()
          }
        }
        val matched = curMatch != null && lt != null && !lKey.anyNull &&
          keyOrd.compare(curMatchKey, lKey) == 0 &&
          curMatchTs <= lt.asInstanceOf[Long] &&
          tol.forall(t => curMatchTs > lt.asInstanceOf[Long] - t)
        if (matched) Iterator.single(resultProj(joined(l, curMatch)))
        else if (outer) Iterator.single(resultProj(joined(l, nullRight)))
        else Iterator.empty
      }
    }
  }
}
