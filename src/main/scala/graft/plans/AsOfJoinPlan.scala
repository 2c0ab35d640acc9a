package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/**
 * Native as-of join — the whole-operator tier of the custom-operator
 * ladder: a [[LogicalPlan]] node + [[SparkStrategy]] + [[SparkPlan]],
 * registered through `SparkSessionExtensions` (or
 * `spark.experimental.extraStrategies`).
 *
 * Semantics (backward as-of, the reference pattern of enriching an event
 * with the latest preceding quote/state): for every left row, the right
 * row with equal key and the greatest `rightTime <= leftTime`; no such
 * row (or outside `toleranceUsec`) → right side null-padded. Equivalent
 * to DuckDB `ASOF LEFT JOIN` and to the window-form
 * [[graft.operators.Joins.asofJoin]] (which stays as the declarative
 * twin and the oracle cross-check).
 *
 * Physical shape — why a custom operator beats the window form at scale:
 * the window form unions both sides and runs `last(ignoreNulls)` over a
 * per-key sort, so the ENTIRE union (left + right, all carried value
 * columns) crosses one exchange and one sort whose state is the union
 * row. This exec instead requires each child clustered by its own key
 * and sorted (key, time) — Catalyst inserts the two exchanges/sorts,
 * AQE coalesces them independently — and then streams BOTH sides
 * through a zero-allocation per-partition merge: one pass, one buffered
 * right row per key, no union row, no window state. Times/keys must be
 * non-null (enforced by the API wrapper in
 * [[graft.operators.Joins.asofJoinNative]]).
 */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceUsec: Option[Long]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]; everything else falls
  * through to the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }

  /** Idempotent per-session registration (for sessions built without
    * `spark.sql.extensions=graft.functions.GraftExtensions`). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
}

/**
 * Co-partitioned sorted-merge as-of join. Both children are hash-
 * clustered on their key and sorted by (key, time) — the same
 * requirement mechanism SortMergeJoin uses, so EnsureRequirements
 * aligns partition counts and AQE stays applicable. Each partition is
 * then a single forward merge: left rows stream in (key, time) order;
 * the right iterator advances monotonically, keeping only the latest
 * right row at-or-before the current left time. O(|L|+|R|) per
 * partition, one copied right row of state.
 */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceUsec: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // Rows are emitted in left order, partitioned like the left child —
  // lets downstream sorts/aggregations over the left key elide work.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey, lOut)
    val rKeyB = BindReferences.bindReference(rightKey, rOut)
    val lTimeB = BindReferences.bindReference(leftTime, lOut)
    val rTimeB = BindReferences.bindReference(rightTime, rOut)
    val keyType = leftKey.dataType
    val rWidth = rOut.length
    val outAttrs = output
    val tol = toleranceUsec

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
        private val lKeyProj = UnsafeProjection.create(Seq(lKeyB))
        private val rKeyProj = UnsafeProjection.create(Seq(rKeyB))
        private val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rWidth)

        // Lookahead right row (copied — outlives its iterator slot).
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: Long = 0L
        // Latest right row at-or-before the current left time, same key.
        private var mRow: InternalRow = _
        private var mKey: UnsafeRow = _
        private var mTime: Long = 0L

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next().copy()
            rKey = rKeyProj(rRow).copy()
            rTime = rTimeB.eval(rRow).asInstanceOf[Long]
          } else {
            rRow = null
            rKey = null
          }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeB.eval(l).asInstanceOf[Long]
          if (mRow != null && keyOrd.compare(mKey, lKey) != 0) mRow = null
          var done = false
          while (!done) {
            if (rRow == null && rIter.hasNext) advanceRight()
            if (rRow == null) done = true
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) rRow = null // right key behind every remaining left: discard
              else if (c > 0) done = true
              else if (rTime <= lTime) { // newest-so-far match; consume and look further
                mRow = rRow; mKey = rKey; mTime = rTime
                rRow = null
              } else done = true
            }
          }
          numOutputRows += 1
          if (mRow != null && tol.forall(t => mTime >= lTime - t))
            resultProj(joined(l, mRow))
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }
}
