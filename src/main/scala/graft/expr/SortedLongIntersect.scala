package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Runtime helper for [[SortedLongIntersect]]. */
object SortedIntersectUtil {

  /** Opt-in precondition check (`-Dgraft.sorted.check=true`): the merge
    * silently under-counts on unsorted input, so SQL users debugging a
    * plausible-but-wrong intersect count can turn misuse into a loud
    * error. A static final boolean — JIT erases the branch when off.
    */
  private val strict = java.lang.Boolean.getBoolean("graft.sorted.check")

  private def requireSorted(a: ArrayData, side: String): Unit = {
    var i = 1
    while (i < a.numElements()) {
      if (a.getLong(i - 1) > a.getLong(i))
        throw new IllegalArgumentException(
          s"sorted_long_intersect: $side array is not ascending at index $i " +
            s"(${a.getLong(i - 1)} > ${a.getLong(i)}); sort_array(...) the input")
      i += 1
    }
  }

  /** Count of elements of sorted array `a` present in sorted array `b`,
    * with a-side multiplicity (each a element counted once if found) —
    * exactly DuckDB's `length(list_filter(a, x -> list_contains(b, x)))`.
    * Single merge pass, no allocation. BOTH INPUTS MUST BE SORTED
    * ASCENDING (see [[strict]]).
    */
  def count(a: ArrayData, b: ArrayData): Long = {
    if (strict) { requireSorted(a, "left"); requireSorted(b, "right") }
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (y < x) j += 1
      else {
        if (x == y) n += 1
        i += 1
      }
    }
    n
  }
}

/** Codegen'd membership-count of one sorted ARRAY<BIGINT> in another —
  * the exact-verification kernel of the hashed-shingle near-dup
  * operators: `array_intersect` builds a hash set per row pair, this is
  * one allocation-free merge over primitive longs.
  */
case class SortedLongIntersect(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_long_intersect"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.SortedIntersectUtil.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)
}
