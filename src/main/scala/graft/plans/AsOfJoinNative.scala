package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the tier-(c) custom-operator path (SURVEY.md
  * §7.3): a dedicated `LogicalPlan` node, a planner `Strategy`, and a
  * `BinaryExecNode` whose physical algorithm is a single forward merge
  * over co-partitioned, co-sorted children.
  *
  * Compared to the composed formulation ([[graft.ext.AsOf]]): the union
  * trick shuffles left+right together and runs a running-window over the
  * combined stream; this operator declares
  * `requiredChildDistribution`/`requiredChildOrdering` so Catalyst
  * inserts exactly one hash exchange + sort per side, and the merge is
  * O(|L|+|R|) per partition with O(1) state — the SortMergeJoin shape,
  * specialized to point-in-time semantics.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        matchedAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ matchedAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, m) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, m) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        matchedAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchedAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttr)

  // co-partition on the key, co-sort by (key, time): Catalyst inserts
  // the minimal exchanges/sorts, and AQE can still re-plan them
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(rightTime.dataType)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val matchRow = new GenericInternalRow(1)
      val joined = new JoinedRow

      var rHead: InternalRow = null
      var rKey: Any = null
      var rTime: Any = null
      // skip right rows that can never match (null key or null time —
      // both sort first under the required NULLS FIRST ordering)
      def advanceR(): Unit = {
        var ok = false
        while (!ok) {
          if (rIt.hasNext) {
            rHead = rIt.next()
            rKey = rkB.eval(rHead)
            rTime = rtB.eval(rHead)
            ok = rKey != null && rTime != null
          } else { rHead = null; ok = true }
        }
      }
      advanceR()

      var curKey: Any = null
      var haveCur = false
      var lastTime: Any = null

      lIt.map { lRow =>
        val lk = lkB.eval(lRow)
        val lt = ltB.eval(lRow)
        if (lk == null) {
          matchRow.update(0, null)
        } else {
          if (!haveCur || keyOrd.compare(lk, curKey) != 0) {
            // copy like rTime below: for buffer-backed key types
            // (UTF8String/binary/decimal) lk can alias the left sort
            // iterator's reused buffer, and an aliased curKey would make
            // the key-change compare above always return 0
            curKey = InternalRow.copyValue(lk); haveCur = true; lastTime = null
          }
          var continue = rHead != null && lt != null
          while (continue) {
            val kc = keyOrd.compare(rKey, lk)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTime, lt) <= 0)) {
              // copy buffer-backed values (e.g. UTF8String): rTime may
              // point into a reused sort/spill buffer that the next
              // advanceR() overwrites
              if (kc == 0) lastTime = InternalRow.copyValue(rTime)
              advanceR()
              continue = rHead != null
            } else continue = false
          }
          matchRow.update(0, lastTime)
        }
        proj(joined(lRow, matchRow))
      }
    }
  }
}

/** User-facing API: installs the strategy on the live session (works in
  * any session — no extensions wiring needed) and builds the plan from
  * the analyzed children.
  */
object AsOfJoinNative {
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    // read-modify-write of a session-global: synchronize so concurrent
    // first calls can't lose the update or install duplicates
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
      }
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .orElse(p.output.find(_.name.equalsIgnoreCase(n)))
      .getOrElse(throw new IllegalArgumentException(s"column $n not found"))
    val lKey = attr(lPlan, key); val rKey = attr(rPlan, key)
    val lTime = attr(lPlan, leftTime); val rTime = attr(rPlan, rightTime)
    // the merge compares raw values — mismatched types would mis-compare
    // or ClassCastException at runtime, so fail at build time instead
    require(lKey.dataType == rKey.dataType,
      s"as-of key types differ: ${lKey.dataType} vs ${rKey.dataType}")
    require(lTime.dataType == rTime.dataType,
      s"as-of time types differ: ${lTime.dataType} vs ${rTime.dataType} (cast first)")
    val matched = AttributeReference("matched", rTime.dataType, nullable = true)()
    val node = AsOfJoinPlan(lPlan, rPlan, lKey, rKey, lTime, rTime, matched)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, node)
  }
}
