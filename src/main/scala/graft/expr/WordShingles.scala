package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[WordShingles]]. */
object ShingleUtil {
  /** All k-grams of the single-space-split tokens of `s`, space-joined —
    * exactly `transform(sequence(1, n-k+1), i -> concat_ws(' ',
    * slice(split(s, ' '), i, k)))` (and DuckDB's
    * `list_transform(range(1, n-k+2), i -> array_to_string(
    * list_slice(string_split(s, ' '), i, i+k-1), ' '))`), in one pass.
    * Empty result when there are fewer than k tokens.
    */
  def wordShingles(s: UTF8String, k: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val n = toks.length - k + 1
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) {
      sb.setLength(0)
      var i = 0
      while (i < k) {
        if (i > 0) sb.append(' ')
        sb.append(toks(j + i))
        i += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd word-shingling (SURVEY.md §7.3 tier (b)): Spark's
  * higher-order array functions run interpreted, which made shingle
  * construction the dominant cost of the near-dup operators; this builds
  * the k-gram array in a single pass per row inside whole-stage codegen.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  // reject non-string input at analysis instead of codegen/runtime
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.wordShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleUtil.wordShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
