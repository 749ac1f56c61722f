package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Runtime helpers for the vector expressions — one tight primitive loop
  * per pair instead of Spark's interpreted higher-order
  * `aggregate(zip_with(...))` machinery (HigherOrderFunction lambdas never
  * enter whole-stage codegen, and the similarity operators evaluate one
  * dot product per *candidate pair*, making this the hot path of the ANN
  * and near-dup family).
  */
object VecUtil {
  // mismatched dimensions mean corrupt input; a silent common-prefix
  // result would rank a truncated vector with a plausible-but-wrong
  // similarity, so fail loudly instead
  private def checkLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"vector length mismatch: $n vs ${b.numElements()}")
    n
  }

  /** Σ aᵢ·bᵢ; both arrays must have the same length. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Σ (aᵢ−bᵢ)²; both arrays must have the same length. */
  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
}

private[expr] trait VecBinaryOp extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** Codegen'd dot product of two double arrays (SURVEY.md §7.3 tier (b)). */
case class VecDot(left: Expression, right: Expression) extends VecBinaryOp {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VecUtil.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared L2 distance of two double arrays. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryOp {
  override def prettyName: String = "vec_l2sq"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VecUtil.l2sq($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}
