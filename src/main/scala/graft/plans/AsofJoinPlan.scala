package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** Whole-operator as-of join as a first-class Catalyst citizen: a
  * logical node, a planner strategy, and a physical operator — the
  * (c) tier of the extension ladder, for semantics the relational
  * algebra can't say directly ("latest earlier row per key") and the
  * composed form pays for twice (`AsofJoin.asof` materializes a
  * unioned frame and carries state through a window; this operator
  * streams both sorted sides once with O(1) state per partition).
  *
  * Physical contract — exactly what a sort-merge join would demand,
  * so the planner's existing machinery (EnsureRequirements, AQE
  * coalescing, exchange reuse) does all the distribution work:
  *
  *  - both children hash-clustered on their key
  *    (`ClusteredDistribution`), so matching keys co-locate;
  *  - left sorted by (key, time), right by (key, time, payload) —
  *    the payload tiebreak makes equal-timestamp winners
  *    deterministic (largest payload, nulls lowest), matching
  *    `AsofJoin.asof`;
  *  - the merge keeps ONE candidate row of state per partition and
  *    emits left rows in their incoming order, so the operator itself
  *    never shuffles, spills, or re-sorts: at 100 TB its cost is the
  *    two sorts the window formulation also pays, minus the union
  *    materialization and the window-frame state machine.
  *
  * Null semantics mirror `AsofJoin.asof` (join-like): a null key or
  * null time never matches on either side; a matched right row whose
  * payload is null yields null while staying distinct from "no match"
  * (the merge tracks matched-ness separately from the value).
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Attribute, payloadOut: AttributeReference,
    strict: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] as [[AsofJoinExec]]; everything else falls
  * through to the built-in strategies.
  */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.rightKey, n.leftTime, n.rightTime,
        n.payload, n.payloadOut, n.strict) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned, sorted, single-pass as-of merge. Per partition the
  * state is one (key, payload, matched) triple — the most recent
  * eligible right row — so memory is O(1) regardless of key width or
  * skew, and the output preserves the left child's row order.
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Attribute, payloadOut: AttributeReference,
    strict: Boolean) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(payload, Ascending)))

  // the merge is order- and partition-preserving on the left side, so
  // downstream operators keep both properties for free (e.g. a later
  // groupBy on the key plans with zero additional exchanges)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched left rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOutput = left.output
    val outAttrs = output
    val inclusive = !strict
    val lrdd = left.execute()
    val rrdd = right.execute()
    require(lrdd.getNumPartitions == rrdd.getNumPartitions,
      s"as-of children not co-partitioned: ${lrdd.getNumPartitions} vs " +
        s"${rrdd.getNumPartitions} (EnsureRequirements contract violated)")
    // the time-series common case — BIGINT key and time — merges on
    // primitive ordinal reads (zero boxing per row); anything else
    // takes the generic interpreted-ordering path. Payload extraction
    // stays generic on both: it only runs on eligible right rows.
    val longFast = leftKey.dataType == org.apache.spark.sql.types.LongType &&
      leftTime.dataType == org.apache.spark.sql.types.LongType
    if (longFast) {
      val lkI = leftOutput.indexWhere(_.exprId == leftKey.exprId)
      val ltI = leftOutput.indexWhere(_.exprId == leftTime.exprId)
      val rkI = right.output.indexWhere(_.exprId == rightKey.exprId)
      val rtI = right.output.indexWhere(_.exprId == rightTime.exprId)
      require(lkI >= 0 && ltI >= 0 && rkI >= 0 && rtI >= 0,
        "as-of key/time attributes must be direct child outputs")
      val pvB = BindReferences.bindReference(payload: Expression, right.output)
      lrdd.zipPartitions(rrdd, preservesPartitioning = true) { (lIter, rIter) =>
        new Iterator[InternalRow] {
          private val joined = new JoinedRow
          private val payloadRow = new GenericInternalRow(1)
          private val proj =
            UnsafeProjection.create(outAttrs, leftOutput :+ payloadOut)
          private var rHead: InternalRow =
            if (rIter.hasNext) rIter.next() else null
          private var curKey = 0L
          private var curVal: Any = null
          private var curMatched = false
          private def nextRight(): Unit =
            rHead = if (rIter.hasNext) rIter.next() else null
          private def advanceRight(k: Long, t: Long): Unit = {
            var go = true
            while (go && rHead != null) {
              if (rHead.isNullAt(rkI)) nextRight()
              else {
                val rk = rHead.getLong(rkI)
                if (rk > k) go = false
                else {
                  val rtNull = rHead.isNullAt(rtI)
                  val rt = if (rtNull) 0L else rHead.getLong(rtI)
                  val eligible = rk < k || rtNull ||
                    rt < t || (inclusive && rt == t)
                  if (!eligible) go = false
                  else {
                    if (rk == k && !rtNull) {
                      curKey = rk
                      curVal = InternalRow.copyValue(pvB.eval(rHead))
                      curMatched = true
                    }
                    nextRight()
                  }
                }
              }
            }
          }
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val lrow = lIter.next()
            var out: Any = null
            if (!lrow.isNullAt(lkI) && !lrow.isNullAt(ltI)) {
              val k = lrow.getLong(lkI)
              advanceRight(k, lrow.getLong(ltI))
              if (curMatched && curKey == k) {
                out = curVal
                numMatched += 1
              }
            }
            payloadRow.update(0, out)
            numOutputRows += 1
            proj(joined(lrow, payloadRow))
          }
        }
      }
    } else {
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      val lkB = BindReferences.bindReference(leftKey: Expression, left.output)
      val ltB = BindReferences.bindReference(leftTime: Expression, left.output)
      val rkB = BindReferences.bindReference(rightKey: Expression, right.output)
      val rtB = BindReferences.bindReference(rightTime: Expression, right.output)
      val pvB = BindReferences.bindReference(payload: Expression, right.output)
      lrdd.zipPartitions(rrdd, preservesPartitioning = true) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val payloadRow = new GenericInternalRow(1)
        private val proj =
          UnsafeProjection.create(outAttrs, leftOutput :+ payloadOut)
        private var rHead: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        // carry state: the most recent eligible right row's key/payload.
        // Values are copied out of the (buffer-reused) unsafe rows.
        private var curKey: Any = null
        private var curVal: Any = null
        private var curMatched = false

        /** Consume right rows that sort at-or-before the probe (k, t);
          * remember the last one with a matching key. Rows with a null
          * key or time sort first within their group and can never
          * match, so they are consumed unconditionally when reached.
          */
        private def advanceRight(k: Any, t: Any): Unit = {
          var go = true
          while (go && rHead != null) {
            val rk = rkB.eval(rHead)
            if (rk == null) { rHead = if (rIter.hasNext) rIter.next() else null }
            else {
              val cmpK = keyOrd.compare(rk, k)
              if (cmpK > 0) go = false
              else {
                val rt = rtB.eval(rHead)
                val eligible = cmpK < 0 || rt == null || {
                  val cmpT = timeOrd.compare(rt, t)
                  cmpT < 0 || (inclusive && cmpT == 0)
                }
                if (!eligible) go = false
                else {
                  if (cmpK == 0 && rt != null) {
                    curKey = InternalRow.copyValue(rk)
                    curVal = InternalRow.copyValue(pvB.eval(rHead))
                    curMatched = true
                  }
                  rHead = if (rIter.hasNext) rIter.next() else null
                }
              }
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lrow = lIter.next()
          val k = lkB.eval(lrow)
          val t = ltB.eval(lrow)
          var out: Any = null
          if (k != null && t != null) {
            advanceRight(k, t)
            if (curMatched && curKey != null && keyOrd.compare(curKey, k) == 0) {
              out = curVal
              numMatched += 1
            }
          }
          payloadRow.update(0, out)
          numOutputRows += 1
          proj(joined(lrow, payloadRow))
        }
      }
      }
    }
  }
}

/** DataFrame-level entry point. Usable two ways: ad hoc (this builder
  * self-registers the strategy on the session via the public
  * `spark.experimental.extraStrategies` hook) or by deploying
  * [[graft.functions.GraftExtensions]], which injects the strategy
  * into every session of the application.
  */
object AsofExec {

  /** Idempotently add the strategy to an existing session. */
  def ensureStrategy(s: SparkSession): Unit = {
    val em = GraftBridge.experimentalMethods(s)
    if (!em.extraStrategies.exists(_.isInstanceOf[AsofJoinStrategy]))
      em.extraStrategies = em.extraStrategies :+ new AsofJoinStrategy
  }

  /** As-of join through [[AsofJoinExec]]: semantics identical to
    * `AsofJoin.asof` (pinned by `AsofExecSpec`). The right side is
    * re-aliased through a fresh projection so self-joins (the common
    * attribution shape: a table as-of-joined to its own past) never
    * carry duplicate attribute ids into the binary node.
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: String, payloadAlias: String,
      strict: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val r = right.select(
      col(rightKey).as("__rk"), col(rightTime).as("__rt"),
      col(payload).as("__rp"))
    val lp = left.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.filter(_.name == name) match {
        case Seq(a) => a
        case as => throw new IllegalArgumentException(
          s"asof: column '$name' resolves to ${as.size} attributes")
      }
    val pAttr = attr(rp, "__rp")
    val node = AsofJoinNode(lp, rp,
      attr(lp, leftKey), attr(rp, "__rk"),
      attr(lp, leftTime), attr(rp, "__rt"),
      pAttr,
      AttributeReference(payloadAlias, pAttr.dataType, nullable = true)(),
      strict)
    GraftBridge.ofRows(spark, node)
  }
}
