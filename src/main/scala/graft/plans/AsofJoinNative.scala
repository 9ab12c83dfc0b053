package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow,
  SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** Native ASOF JOIN as a first-class Catalyst operator — the (c)-path
  * demonstration from SURVEY §4: a custom `LogicalPlan` node, a
  * `SparkStrategy` that plans it, and a `SparkPlan` that executes a
  * per-partition two-iterator merge. Spark has no built-in as-of
  * join; [[graft.ops.AsofJoin]] composes one from union + running
  * `last(_, ignoreNulls)` window (one shuffle + one sort on the
  * combined stream). This operator expresses the same semantics as
  * its own physical node: both children are hash-clustered on the
  * key and sorted (key, time) — declared via
  * `requiredChildDistribution` / `requiredChildOrdering`, so
  * EnsureRequirements inserts exactly the exchanges and sorts the
  * plan needs — and the merge keeps ONE candidate row, never a
  * windowed union stream.
  *
  * Semantics (LEFT as-of, backward): for each left row, the right
  * row on the same key with the greatest `rightTime <= leftTime`;
  * ties on time resolve to the greatest `rightTie` (the merge takes
  * the LAST qualifying row in (key, time, tie) ascending order —
  * identical to the `ORDER BY ts DESC, id DESC LIMIT 1` oracle).
  * NULL keys and NULL times never match, matching SQL comparison
  * semantics.
  *
  * Scale shape: one shuffle per side on the join key, sort within
  * partitions, then a streaming merge that holds O(1) state (the
  * current best right row) — strictly less memory than the window
  * formulation's running frame, and the right side never carries
  * null-struct padding through the shuffle.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightTie: Attribute,
    direction: String = "backward", // backward | forward | nearest
    toleranceMicros: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Every child column survives to the output — declared so
    * ColumnPruning never inserts a Project that would drop payload
    * columns the node's expressions don't mention. */
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]]; injected per-session
  * via `spark.experimental.extraStrategies` (the public extension
  * point) or cluster-wide via `GraftExtensions`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lt, rk, rt, rtie, dir, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rtie,
        dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightTie: Attribute,
    direction: String = "backward",
    toleranceMicros: Option[Long] = None) extends BinaryExecNode {

  require(Set("backward", "forward", "nearest")(direction), direction)
  require((toleranceMicros.isEmpty && direction != "nearest") ||
    leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType]
    || leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.LongType],
    "tolerance/nearest require a long-backed time column (timestamp or bigint)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash-cluster both sides on the key: EnsureRequirements inserts
    * co-partitioned exchanges (or reuses existing ones), exactly as
    * for a shuffled join. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
    ClusteredDistribution(rightKey :: Nil) :: Nil

  /** Sorted merge order; the right tie column makes equal-time right
    * rows deterministic (last = greatest tie wins). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTimeB = BindReferences.bindReference(leftTime: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTimeB = BindReferences.bindReference(rightTime: Expression, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.size
    val dir = direction
    val tol = toleranceMicros
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val nullRight = new GenericInternalRow(nRight)
        private val joined = new JoinedRow
        private var rHead: InternalRow = _ // lookahead, not yet consumed
        private var bestRow: InternalRow = _ // last qualifying right row
        private var bestKey: Any = _
        private var bestTime: Any = _

        /** Within-tolerance check — only reachable for long-backed
          * time types (the exec's require), where eval yields Long. */
        private def inTol(young: Any, old: Any): Boolean = tol.forall(t =>
          young.asInstanceOf[Long] - old.asInstanceOf[Long] <= t)

        /** BACKWARD: consume right rows up to (lk, lt); the last
          * qualifying row on key lk becomes `bestRow`. O(1) state,
          * each right row visited once across the whole partition. */
        private def advanceBackward(lk: Any, lt: Any): Unit = {
          var done = false
          while (!done) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next() else done = true
            } else {
              val rk = rKeyB.eval(rHead)
              if (rk == null) rHead = null // NULL key never matches
              else {
                val kc = keyOrd.compare(rk, lk)
                if (kc < 0) rHead = null // key already passed
                else if (kc == 0) {
                  val rt = rTimeB.eval(rHead)
                  if (rt == null) rHead = null // NULL time never matches
                  else if (timeOrd.compare(rt, lt) <= 0) {
                    bestRow = rHead.copy() // unsafe rows are reused
                    bestKey = rKeyB.eval(bestRow)
                    bestTime = rTimeB.eval(bestRow)
                    rHead = null
                  } else done = true // future time: stop before it
                } else done = true // next key: stop before it
              }
            }
          }
        }

        /** FORWARD: discard right rows strictly before (lk, lt); the
          * lookahead head is then the earliest at-or-after candidate
          * (ties resolve to the smallest tie — first in sort order). */
        private def advanceForward(lk: Any, lt: Any): Unit = {
          var done = false
          while (!done) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next() else done = true
            } else {
              val rk = rKeyB.eval(rHead)
              if (rk == null) rHead = null
              else {
                val kc = keyOrd.compare(rk, lk)
                if (kc < 0) rHead = null
                else if (kc == 0) {
                  val rt = rTimeB.eval(rHead)
                  if (rt == null) rHead = null
                  else if (timeOrd.compare(rt, lt) < 0) rHead = null
                  else done = true // earliest at-or-after: keep as head
                } else done = true
              }
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyB.eval(l)
          val lt = lTimeB.eval(l)
          if (lk == null || lt == null) joined(l, nullRight)
          else if (dir == "forward") {
            advanceForward(lk, lt)
            val m = rHead != null && {
              val rk = rKeyB.eval(rHead)
              rk != null && keyOrd.compare(rk, lk) == 0 &&
                inTol(rTimeB.eval(rHead), lt)
            }
            // Copy: the head stays buffered for later left rows while
            // this joined row flows downstream.
            joined(l, if (m) rHead.copy() else nullRight)
          } else if (dir == "nearest") {
            // One pass serves both directions: after the backward
            // advance, `bestRow` is the backward candidate and the
            // un-consumed lookahead is the earliest future row on
            // this key — the forward candidate. Distance ties go
            // backward (the pandas convention and the oracle's).
            advanceBackward(lk, lt)
            val bOk = bestKey != null &&
              keyOrd.compare(bestKey, lk) == 0 && inTol(lt, bestTime)
            var fTime: Any = null
            val fOk = rHead != null && {
              val rk = rKeyB.eval(rHead)
              rk != null && keyOrd.compare(rk, lk) == 0 && {
                fTime = rTimeB.eval(rHead)
                fTime != null && inTol(fTime, lt)
              }
            }
            if (bOk && fOk) {
              val dl = lt.asInstanceOf[Long] - bestTime.asInstanceOf[Long]
              val df = fTime.asInstanceOf[Long] - lt.asInstanceOf[Long]
              joined(l, if (dl <= df) bestRow else rHead.copy())
            } else if (bOk) joined(l, bestRow)
            else if (fOk) joined(l, rHead.copy())
            else joined(l, nullRight)
          } else {
            advanceBackward(lk, lt)
            val m = bestKey != null && keyOrd.compare(bestKey, lk) == 0 &&
              inTol(lt, bestTime)
            joined(l, if (m) bestRow else nullRight)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinNative {

  /** Build a DataFrame over the native operator. Registers the
    * strategy on the session (idempotent) through the public
    * `experimental.extraStrategies` hook. Column names resolve
    * against each side's analyzed output; right-side columns come
    * back nullable. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String, rightTie: String,
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$n' (has: ${p.output.map(_.name)})"))
    val node = AsofJoinPlan(lp, rp,
      attr(lp, leftKey, "left"), attr(lp, leftTime, "left"),
      attr(rp, rightKey, "right"), attr(rp, rightTime, "right"),
      attr(rp, rightTie, "right"), direction, toleranceMicros)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }
}
