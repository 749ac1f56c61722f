package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[SubwordTokenCount]]. */
object SubwordUtil {

  /** Greedy longest-match subword vocabulary (WordPiece/BPE-style merge
    * results, frozen): common English subword units. Entries contain no
    * spaces, so per-word greedy matching equals whole-string matching
    * with space as a hard delimiter. The DuckDB oracle derives its
    * literal from this same list (see ExtQueries.x19Sql) — identical by
    * construction.
    */
  val vocab: Seq[String] = Seq(
    "the", "ing", "tion", "and", "ent", "ous", "ness", "ment",
    "er", "ed", "es", "re", "un", "ly", "en", "ar", "or", "an",
    "al", "st", "le", "on", "at", "it", "is", "te", "ra", "ro")

  private val byLenDesc: Array[String] = vocab.sortBy(v => (-v.length, v)).toArray

  /** Number of greedy longest-prefix-match subword tokens in `s`: at each
    * position take the longest vocab entry that prefixes the remainder,
    * else consume one CODE POINT (not one UTF-16 char — the oracle's
    * substr counts code points, so a surrogate pair must be one fallback
    * token, not two); spaces delimit and are not counted.
    */
  def count(s: UTF8String): Long = {
    val str = s.toString
    val len = str.length
    var i = 0
    var n = 0L
    while (i < len) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var m = 0
        var j = 0
        while (m == 0 && j < byLenDesc.length) {
          val v = byLenDesc(j)
          if (v.length <= len - i && str.startsWith(v, i)) m = v.length
          j += 1
        }
        if (m == 0) m = Character.charCount(str.codePointAt(i))
        n += 1
        i += m
      }
    }
    n
  }
}

/** Codegen'd greedy subword token count (SURVEY.md §7.3 tier (b)) — the
  * tokenizer a training-data pipeline runs over every document, so it
  * must live inside whole-stage codegen rather than a UDF or an
  * interpreted lambda chain.
  */
case class SubwordTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "subword_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"subword_token_count requires STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    SubwordUtil.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SubwordUtil.count($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordTokenCount =
    copy(child = newChild)
}
