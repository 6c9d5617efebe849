package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression,
  GenericInternalRow, JoinedRow, SortOrder, Unevaluable, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport,
  SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType,
  IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

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
    * harness session). Synchronized: the check-then-append on the
    * session's `experimental` arrays is a read-modify-write, and two
    * threads first-using the as-of join concurrently could otherwise
    * register a strategy twice (or lose one append).
    */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
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
  *
  * NULL semantics are SQL's (matching the DuckDB ASOF oracle): a NULL
  * key or time on either side never matches — NULL-key/time right rows
  * are consumed and discarded (they sort first under the required
  * nulls-first ordering, so consuming them is safe), and a NULL-key/time
  * left row emits the all-null right extension without advancing the
  * merge. The natural-ordering formulation this replaced matched NULL
  * keys to each other — silently divergent the day nulls appeared.
  */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        forward: Boolean,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** (ordinal, accessor kind) per key/time column when ALL four are
    * long-backed direct column references — the condition for both the
    * codegen path and the primitive interpreted path. kind: 0=long-read,
    * 1=int, 2=short, 3=byte (temporal types order as their backing
    * integral, so raw-long comparison is exact; float/double excluded —
    * NaN ordering differs).
    */
  private lazy val primOrds: Option[Array[(Int, Int)]] = {
    def info(e: Expression, out: Seq[Attribute]): Option[(Int, Int)] =
      BindReferences.bindReference(e, out, allowFailures = true) match {
        case br: BoundReference =>
          val kind = br.dataType match {
            case LongType | TimestampType | TimestampNTZType => 0
            case IntegerType | DateType => 1
            case ShortType => 2
            case ByteType => 3
            case _ => -1
          }
          if (kind >= 0) Some((br.ordinal, kind)) else None
        case _ => None
      }
    for {
      a <- info(leftKey, left.output); b <- info(leftTime, left.output)
      c <- info(rightKey, right.output); d <- info(rightTime, right.output)
    } yield Array(a, b, c, d)
  }

  // ---- whole-stage codegen (SMJ-shaped: this node HEADS its stage; the
  // generated loop drives the left input and the right-side merge is
  // INLINED as generated Java — raw long reads/compares, the buffered
  // head and retained candidate as generated-class fields, no helper
  // call per row; round-8 verdict item 5) ----

  override def supportCodegen: Boolean = primOrds.isDefined

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    Seq(left.execute(), right.execute())

  // the retained candidate / un-consumed head is reused across rows, so
  // a buffering parent must copy (same contract as SortMergeJoinExec)
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val Array((lkOrd, lkKind), (ltOrd, ltKind), (rkOrd, rkKind),
      (rtOrd, rtKind)) = primOrds.get
    def getExpr(row: String, ord: Int, kind: Int): String = kind match {
      case 0 => s"$row.getLong($ord)"
      case 1 => s"(long) $row.getInt($ord)"
      case 2 => s"(long) $row.getShort($ord)"
      case _ => s"(long) $row.getByte($ord)"
    }
    val rowCls = classOf[InternalRow].getName
    val unsafeCls = classOf[UnsafeRow].getName
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")
    // the merge's cross-row state, all generated-class fields: the
    // buffered right head, and (backward only) the single retained
    // candidate — a reusable UnsafeRow copy target, exactly the
    // interpreted path's discipline (sort output reuses row objects, so
    // retention must copy; 64 bytes grows on demand inside copyFrom)
    val head = ctx.addMutableState(rowCls, "asofHead")
    val candValid = ctx.addMutableState("boolean", "asofCandValid")
    val candKey = ctx.addMutableState("long", "asofCandKey")
    val candRow = ctx.addMutableState(rowCls, "asofCandRow")
    val candBuf = ctx.addMutableState(unsafeCls, "asofCandBuf",
      v => s"$v = new $unsafeCls(${right.output.length}); " +
        s"$v.pointTo(new byte[64], 64);")
    val leftRow = ctx.addMutableState(rowCls, "asofLeftRow")
    val cand = ctx.freshName("asofCand")
    // left columns evaluate straight off the left row
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // right columns read from the candidate row, all-null when unmatched
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val code =
        code"""
          |boolean $isNull = ($cand == null) || $cand.isNullAt($i);
          |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)}
          |  : (${CodeGenerator.getValue(cand, a.dataType, i.toString)});
        """.stripMargin
      ExprCode(code, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    val lk = ctx.freshName("asofLk")
    val lt = ctx.freshName("asofLt")
    val adv = ctx.freshName("asofAdvancing")
    val hk = ctx.freshName("asofHk")
    // the merge loop INLINE in the generated Java (round-8 verdict item
    // 5 — previously a per-left-row call into the AsOfScanner helper):
    // one-slot right buffer in `head`, null = consumed. `continue`
    // re-enters the fill; `break` leaves the candidate/head as the
    // match state for this left row.
    val advanceCode = if (forward)
      s"""
         |boolean $adv = true;
         |while ($adv) {
         |  if ($head == null) {
         |    if (!$rightInput.hasNext()) break;
         |    $head = ($rowCls) $rightInput.next();
         |  }
         |  if ($head.isNullAt($rkOrd)) { $head = null; continue; }
         |  long $hk = ${getExpr(head, rkOrd, rkKind)};
         |  if ($hk < $lk) { $head = null; continue; }
         |  if ($hk == $lk && ($head.isNullAt($rtOrd) ||
         |      ${getExpr(head, rtOrd, rtKind)} < $lt)) {
         |    $head = null; continue;
         |  }
         |  $adv = false;
         |}
         |if ($head != null && !$head.isNullAt($rkOrd)
         |    && ${getExpr(head, rkOrd, rkKind)} == $lk) {
         |  $cand = $head;
         |}
       """.stripMargin
    else
      s"""
         |boolean $adv = true;
         |while ($adv) {
         |  if ($head == null) {
         |    if (!$rightInput.hasNext()) break;
         |    $head = ($rowCls) $rightInput.next();
         |  }
         |  if ($head.isNullAt($rkOrd)) { $head = null; continue; }
         |  long $hk = ${getExpr(head, rkOrd, rkKind)};
         |  if ($hk < $lk) { $head = null; $candValid = false; $candRow = null; continue; }
         |  if ($hk > $lk) { $adv = false; continue; }
         |  if ($head.isNullAt($rtOrd)) { $head = null; continue; }
         |  if (${getExpr(head, rtOrd, rtKind)} <= $lt) {
         |    if ($head instanceof $unsafeCls) {
         |      $candBuf.copyFrom(($unsafeCls) $head);
         |      $candRow = $candBuf;
         |    } else {
         |      $candRow = $head.copy();
         |    }
         |    $candKey = $hk; $candValid = true; $head = null;
         |  } else {
         |    $adv = false;
         |  }
         |}
         |if ($candValid && $candKey == $lk) { $cand = $candRow; }
       """.stripMargin
    s"""
       |while ($leftInput.hasNext()) {
       |  $leftRow = ($rowCls) $leftInput.next();
       |  $rowCls $cand = null;
       |  if (!$leftRow.isNullAt($lkOrd) && !$leftRow.isNullAt($ltOrd)) {
       |    long $lk = ${getExpr(leftRow, lkOrd, lkKind)};
       |    long $lt = ${getExpr(leftRow, ltOrd, ltKind)};
       |    $advanceCode
       |  }
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** The merge streams left rows in their incoming order, so the left
    * child's (key, ts) sort survives — declaring it lets a downstream
    * consumer with the same requirement (e.g. the second merge of the
    * nearest-join composition, or a window over the same key) skip its
    * Sort entirely.
    */
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  private def kindGetter(kind: Int): (InternalRow, Int) => Long = kind match {
    case 0 => (r, i) => r.getLong(i)
    case 1 => (r, i) => r.getInt(i).toLong
    case 2 => (r, i) => r.getShort(i).toLong
    case _ => (r, i) => r.getByte(i).toLong
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val outAttrs = output
    val prim = primOrds
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bound-expression eval, not UnsafeProjection-per-comparison: the
      // hot loop extracts one key and one time value per row touched, so
      // a boxed eval beats building a single-field UnsafeRow each probe
      // (measured 0.62 s -> see commit; the projections also forced a
      // copy() per retained candidate key)
      val boundLk = BindReferences.bindReference(lk, lOut)
      val boundLt = BindReferences.bindReference(lt, lOut)
      val boundRk = BindReferences.bindReference(rk, rOut)
      val boundRt = BindReferences.bindReference(rt, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lk.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(lt.dataType)
      // bind against NULLABLE right attrs: unmatched left rows emit the
      // all-null row, and a non-nullable input binding would skip the
      // null check and read primitive zeros instead (caught by spec)
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      if (prim.isDefined) {
        // PRIMITIVE path (long/int/date/timestamp keys and times — the
        // overwhelmingly common as-of shape): raw long reads + compares,
        // no boxing. Normally whole-stage codegen plans this node instead
        // (doProduce above); this branch covers codegen-off sessions.
        val Array((lkOrd, lkKind), (ltOrd, ltKind), (rkOrd, rkKind),
          (rtOrd, rtKind)) = prim.get
        val lkGet = kindGetter(lkKind); val ltGet = kindGetter(ltKind)
        val rkGet = kindGetter(rkKind); val rtGet = kindGetter(rtKind)
        if (forward) {
          lIter.map { lRow =>
            var matched: InternalRow = null
            if (!lRow.isNullAt(lkOrd) && !lRow.isNullAt(ltOrd)) {
              val lKey = lkGet(lRow, lkOrd)
              val lTime = ltGet(lRow, ltOrd)
              var advancing = true
              while (advancing && rBuf.hasNext) {
                val head = rBuf.head
                if (head.isNullAt(rkOrd)) rBuf.next()
                else {
                  val hKey = rkGet(head, rkOrd)
                  if (hKey < lKey) rBuf.next()
                  else if (hKey == lKey &&
                    (head.isNullAt(rtOrd) || rtGet(head, rtOrd) < lTime))
                    rBuf.next()
                  else advancing = false
                }
              }
              if (rBuf.hasNext) {
                val head = rBuf.head
                if (!head.isNullAt(rkOrd) && rkGet(head, rkOrd) == lKey)
                  matched = head
              }
            }
            outProj(joined(lRow, if (matched == null) nullRight else matched))
          }
        } else {
          var candValid = false
          var candKey = 0L
          var candRow: InternalRow = null
          // reusable copy target: retaining a candidate is a memcpy into
          // this buffer, not a fresh allocation per consumed right row
          // (sort output reuses its row object, so retention MUST copy)
          val candBuf = new UnsafeRow(rOut.length)
          candBuf.pointTo(new Array[Byte](64), 64)
          lIter.map { lRow =>
            var matched: InternalRow = null
            if (!lRow.isNullAt(lkOrd) && !lRow.isNullAt(ltOrd)) {
              val lKey = lkGet(lRow, lkOrd)
              val lTime = ltGet(lRow, ltOrd)
              var advancing = true
              while (advancing && rBuf.hasNext) {
                val head = rBuf.head
                if (head.isNullAt(rkOrd)) rBuf.next()
                else {
                  val hKey = rkGet(head, rkOrd)
                  if (hKey < lKey) { rBuf.next(); candValid = false; candRow = null }
                  else if (hKey > lKey) advancing = false
                  else if (head.isNullAt(rtOrd)) rBuf.next()
                  else if (rtGet(head, rtOrd) <= lTime) {
                    candRow = rBuf.next() match {
                      case u: UnsafeRow => candBuf.copyFrom(u); candBuf
                      case other => other.copy()
                    }
                    candKey = hKey; candValid = true
                  } else advancing = false
                }
              }
              if (candValid && candKey == lKey) matched = candRow
            }
            outProj(joined(lRow, if (matched == null) nullRight else matched))
          }
        }
      } else if (forward) {
        lIter.map { lRow =>
          val lKey = boundLk.eval(lRow)
          val lTime = boundLt.eval(lRow)
          var matched: InternalRow = null
          if (lKey != null && lTime != null) {
            // drop rows useless for this AND all later left rows: NULL
            // key/time rows (never matchable), smaller keys, same key
            // with rt < lt (left times only grow within a key)
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val head = rBuf.head
              val hKey = boundRk.eval(head)
              if (hKey == null) rBuf.next()
              else {
                val c = keyOrd.compare(hKey, lKey)
                if (c < 0) rBuf.next()
                else if (c == 0) {
                  val hTime = boundRt.eval(head)
                  if (hTime == null || timeOrd.compare(hTime, lTime) < 0)
                    rBuf.next()
                  else advancing = false
                } else advancing = false
              }
            }
            // the head (NOT consumed — later left rows may match it too)
            // is the earliest remaining row; a key match means rt >= lt
            if (rBuf.hasNext) {
              val head = rBuf.head
              val hKey = boundRk.eval(head)
              if (hKey != null && keyOrd.compare(hKey, lKey) == 0)
                matched = head
            }
          }
          outProj(joined(lRow, if (matched == null) nullRight else matched))
        }
      } else {
        // the single retained right row: latest with candKey, time <= left's
        var candKey: Any = null
        var candRow: InternalRow = null
        lIter.map { lRow =>
          val lKey = boundLk.eval(lRow)
          val lTime = boundLt.eval(lRow)
          if (lKey != null && lTime != null) {
            // consume right rows that are now or never useful: NULL
            // key/time rows (never matchable), smaller keys, or same key
            // with time <= this left row's time (left times only grow
            // within a key, so "latest consumed" stays the candidate)
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val head = rBuf.head
              val hKey = boundRk.eval(head)
              if (hKey == null) rBuf.next()
              else {
                val c = keyOrd.compare(hKey, lKey)
                if (c < 0) { rBuf.next(); candRow = null; candKey = null }
                else if (c == 0) {
                  val hTime = boundRt.eval(head)
                  if (hTime == null) rBuf.next()
                  else if (timeOrd.compare(hTime, lTime) <= 0) {
                    // copy first: iterator rows are reused, and the key
                    // value must be read from the stable copy
                    candRow = rBuf.next().copy()
                    candKey = boundRk.eval(candRow)
                  } else advancing = false
                } else advancing = false
              }
            }
          }
          val matched =
            if (lKey != null && candKey != null &&
              keyOrd.compare(candKey, lKey) == 0) candRow
            else null
          outProj(joined(lRow, if (matched == null) nullRight else matched))
        }
      }
    }
  }
}
