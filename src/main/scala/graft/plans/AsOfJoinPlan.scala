package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, Unevaluable, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** The whole-operator extension tier for the as-of join — a custom
  * logical node, optimizer rule, planner strategy, and physical operator
  * wired through Spark's public extension points (the (c) option in the
  * engine's preference ladder, used here because an as-of join is a
  * genuinely different JOIN ALGORITHM, not an expression).
  *
  * Construction path:
  *   1. `AsOfJoin.native(...)` builds a LEFT OUTER join whose condition
  *      is the inert boolean `AsOfMarker(lk, rk, lt, rt)` (Unevaluable —
  *      if the strategy is ever missing, planning fails loudly instead
  *      of silently computing something else).
  *   2. `AsOfMarkerRewrite` (optimizer rule) replaces that join with the
  *      dedicated `AsOfJoinNode`.
  *   3. `AsOfJoinStrategy` plans the node as `AsOfJoinExec` (and, as a
  *      belt-and-braces fallback, plans the raw marker join directly).
  *
  * Physical algorithm: both children hash-cluster on the key and sort by
  * (key, time) — the same distribution contract as a sort-merge join, so
  * EnsureRequirements co-partitions them — then ONE forward merge pass
  * per partition attaches to each left row the latest right row with
  * `rt <= lt` for the same key. O(|L|+|R|) per partition, zero
  * allocation beyond one buffered candidate row, no range explosion —
  * at 100 TB this is two shuffles and a streaming merge, with per-key
  * history never materialized (contrast the union+window formulation in
  * `operators.AsOfJoin.backward`, which buffers window frames).
  */
object AsOfJoinPlan {

  /** Inert join-condition carrier. Unevaluable on purpose. `forward`
    * rides along as a non-child field (it's a planning directive, not an
    * expression), surviving every tree copy.
    */
  case class AsOfMarker(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        forward: Boolean = false)
      extends Expression with Unevaluable {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def children: Seq[Expression] =
      Seq(leftKey, rightKey, leftTime, rightTime)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(c(0), c(1), c(2), c(3))
  }

  /** Dedicated logical operator (right side nullable: left-outer). */
  case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTime: Expression, rightTime: Expression,
                          forward: Boolean)
      extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Join(marker) → AsOfJoinNode. */
  object AsOfMarkerRewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case Join(l, r, LeftOuter, Some(m: AsOfMarker), _) =>
        AsOfJoinNode(l, r, m.leftKey, m.rightKey, m.leftTime, m.rightTime,
          m.forward)
    }
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, fwd) =>
        AsOfJoinExec(lk, rk, lt, rt, fwd, planLater(l), planLater(r)) :: Nil
      case Join(l, r, LeftOuter, Some(m: AsOfMarker), _) =>
        AsOfJoinExec(m.leftKey, m.rightKey, m.leftTime, m.rightTime,
          m.forward, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Idempotent runtime wiring for sessions created without
    * `spark.sql.extensions=graft.GraftExtensions` (tests, the driver's
    * harness session).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfMarkerRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfMarkerRewrite
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_asof",
      (children: Seq[Expression]) => {
        require(children.length == 4, "graft_asof(lk, rk, lt, rt)")
        AsOfMarker(children(0), children(1), children(2), children(3))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_asof_fwd",
      (children: Seq[Expression]) => {
        require(children.length == 4, "graft_asof_fwd(lk, rk, lt, rt)")
        AsOfMarker(children(0), children(1), children(2), children(3),
          forward = true)
      },
      "scala_udf")
  }
}

/** Streaming-merge as-of join: children arrive clustered on the key and
  * sorted by (key, time); each partition is one merge pass.
  *
  * `forward = false` (backward): latest right row with rt <= lt — one
  * retained candidate row, consumed rows never revisited.
  * `forward = true`: EARLIEST right row with rt >= lt — no candidate at
  * all: strictly-useless rows (smaller key, or same key with rt < lt —
  * useless for every later left row too, since left times only grow
  * within a key) are consumed, and the match is the un-consumed head.
  */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        forward: Boolean,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(Seq(lk), lOut)
      val rkProj = UnsafeProjection.create(Seq(rk), rOut)
      val ltProj = UnsafeProjection.create(Seq(lt), lOut)
      val rtProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against NULLABLE right attrs: unmatched left rows emit the
      // all-null row, and a non-nullable input binding would skip the
      // null check and read primitive zeros instead (caught by spec)
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      if (forward) {
        lIter.map { lRow =>
          val lKey = lkProj(lRow)
          // drop rows useless for this AND all later left rows
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val c = keyOrd.compare(rkProj(head), lKey)
            if (c < 0 || (c == 0 &&
                timeOrd.compare(rtProj(head), ltProj(lRow)) < 0)) rBuf.next()
            else advancing = false
          }
          // the head (NOT consumed — later left rows may match it too) is
          // the earliest remaining row; a key match means rt >= lt holds
          val matched =
            if (rBuf.hasNext && keyOrd.compare(rkProj(rBuf.head), lKey) == 0)
              rBuf.head
            else null
          outProj(joined(lRow, if (matched == null) nullRight else matched))
        }
      } else {
        // the single retained right row: latest with candKey, time <= left's
        var candKey: InternalRow = null
        var candRow: InternalRow = null
        lIter.map { lRow =>
          val lKey = lkProj(lRow)
          // consume right rows that are now or never useful: smaller keys,
          // or same key with time <= this left row's time (left times only
          // grow within a key, so "latest consumed" stays the candidate)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val c = keyOrd.compare(rkProj(head), lKey)
            if (c < 0 || (c == 0 && timeOrd.compare(rtProj(head), ltProj(lRow)) <= 0)) {
              val rRow = rBuf.next()
              if (c == 0) { candRow = rRow.copy(); candKey = lKey.copy() }
              else { candRow = null; candKey = null }
            } else advancing = false
          }
          val matched =
            if (candKey != null && keyOrd.compare(candKey, lKey) == 0) candRow
            else null
          outProj(joined(lRow, if (matched == null) nullRight else matched))
        }
      }
    }
  }
}
