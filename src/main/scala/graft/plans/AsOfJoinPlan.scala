package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Whole-operator extension path (SURVEY.md §7.4 path (c), the one the
  * builder prompt reserves for semantics Spark's operators can't
  * express directly): a first-class AS-OF JOIN as
  * logical node -> planner Strategy -> physical `AsOfJoinExec`.
  *
  * Contrast with `operators/AsOf.asofJoin` (union + carry-forward over
  * one window): that formulation materializes a unioned row set and
  * pays a window's full sort machinery. The planned operator instead
  * declares exactly what it needs from the engine —
  * `ClusteredDistribution` on the key for BOTH children plus
  * (key, time) `requiredChildOrdering` — and then streams the two
  * co-partitioned sorted iterators through a single-pass merge with
  * O(1) state (the most recent right row per key). EnsureRequirements
  * inserts the exchanges/sorts only when the children aren't already
  * partitioned/sorted right, so an upstream bucketed or pre-sorted
  * table joins with NO extra shuffle — the property the union
  * formulation can never express.
  *
  * The logical node carries column NAMES, not Attributes: both sides
  * of an as-of join routinely share lineage (events vs events), and
  * the analyzer's relation deduplication rewrites the right child's
  * exprIds — attributes captured at construction would dangle (found
  * the hard way: ATTRIBUTE_NOT_FOUND under self-join + column
  * pruning). Names survive both dedup and pruning; `references` is
  * overridden so the optimizer keeps exactly the needed child columns,
  * and the Strategy resolves names to the (by then stable) child
  * attributes at planning time.
  *
  * v1 scope (checked at construction): key and time columns must be
  * long/timestamp — both are 8-byte longs in UnsafeRow, so the merge
  * compares primitives. Composite keys are a projection away (hash
  * the tuple to one long upstream).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    key: String, leftTime: String, rightTime: String,
    payload: Seq[String]) extends BinaryNode {

  private def byName(side: LogicalPlan, n: String): Option[Attribute] =
    side.output.find(_.name == n)

  def leftKeyAttr: Attribute = byName(left, key).get
  def rightKeyAttr: Attribute = byName(right, key).get
  def leftTimeAttr: Attribute = byName(left, leftTime).get
  def rightTimeAttr: Attribute = byName(right, rightTime).get
  def payloadAttrs: Seq[Attribute] = payload.map(byName(right, _).get)

  override lazy val resolved: Boolean = childrenResolved &&
    byName(left, key).isDefined && byName(right, key).isDefined &&
    byName(left, leftTime).isDefined &&
    byName(right, rightTime).isDefined &&
    payload.forall(byName(right, _).isDefined)

  override def output: Seq[Attribute] =
    left.output ++ payloadAttrs.map(_.withNullability(true))

  /** Column pruning must keep the key/time/payload child columns even
    * though they appear nowhere above as expressions.
    */
  override def references: AttributeSet = AttributeSet(
    Seq(leftKeyAttr, rightKeyAttr, leftTimeAttr, rightTimeAttr) ++
      payloadAttrs)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]]; injected via `GraftExtensions`
  * (injectPlannerStrategy) or `session.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKeyAttr, n.rightKeyAttr, n.leftTimeAttr, n.rightTimeAttr,
        n.payloadAttrs) :: Nil
    case _ => Nil
  }

  /** Idempotently install on an already-built session. */
  def setup(spark: SparkSession): Unit = {
    val exp = PlanBridge.experimental(spark)
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = AsOfJoinStrategy +: exp.extraStrategies
  }
}

/** Co-partitioned sort-merge as-of join: for each left row, the most
  * recent right row with the same key and rightTime <= leftTime.
  * Single forward pass per partition, O(1) held state.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending),
        SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending),
        SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk: Expression = leftKey
    val lt: Expression = leftTime
    val rk: Expression = rightKey
    val rt: Expression = rightTime
    val pay = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lktProj = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rktProj = UnsafeProjection.create(Seq(rk, rt), rightOut)
      val payProj = UnsafeProjection.create(pay.map(e => e: Expression),
        rightOut)
      val nullPay = new GenericInternalRow(pay.size)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(
        outAttrs.map(e => e: Expression), leftOut ++ pay)
      // right lookahead (not yet consumed into the held state)
      var rValid = false
      var rKey = 0L
      var rTs = 0L
      var rRow: InternalRow = null
      // most recent right row already consumed, and its key
      var heldValid = false
      var heldKey = 0L
      var held: InternalRow = nullPay
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIter.hasNext) {
          val r = rIter.next()
          val kt = rktProj(r)
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            rKey = kt.getLong(0); rTs = kt.getLong(1); rRow = r
            rValid = true
          } // null key/time can never match — skip
        }
      }
      advanceRight()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val kt = lktProj(l)
          if (kt.isNullAt(0) || kt.isNullAt(1))
            outProj(joined(l, nullPay))
          else {
            val k = kt.getLong(0)
            val ts = kt.getLong(1)
            while (rValid && (rKey < k || (rKey == k && rTs <= ts))) {
              if (rKey == k) {
                held = payProj(rRow).copy() // iterator reuses rows
                heldKey = k
                heldValid = true
              }
              advanceRight()
            }
            val p = if (heldValid && heldKey == k) held else nullPay
            outProj(joined(l, p))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame API over the planned operator. */
object PlannedAsOf {

  /** As-of join `left` with `right` on single key/time columns; the
    * strategy is installed on the session if missing. Key and time
    * must be long/timestamp on both sides.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    AsOfJoinStrategy.setup(spark)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    // LongType and TimestampType are both 8-byte longs in UnsafeRow,
    // so the merge's getLong comparisons are exact; narrower integrals
    // would need widening casts — rejected rather than silently wrong
    def longish(a: Attribute): Unit = a.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType => ()
      case dt => throw new IllegalArgumentException(
        s"asof v1 needs long/timestamp key+time, got $dt for $a")
    }
    Seq(attr(lPlan, key), attr(rPlan, key), attr(lPlan, leftTime),
      attr(rPlan, rightTime)).foreach(longish)
    payload.foreach(attr(rPlan, _))
    PlanBridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan, key, leftTime, rightTime, payload))
  }
}
