package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[UrlCanonical]]: the single-pass-per-stage
  * re-implementation of `UrlCanon.canonicalizeRegex`'s six-regex chain
  * (drop fragment → lowercase scheme+authority → strip tracking params →
  * collapse `&&` → `?&`→`?` → strip trailing `?`/`&`). Each stage is a
  * plain character scan — no java.util.regex compilation, backtracking,
  * or per-stage Matcher allocation — so URL canonicalization runs at
  * scan speed on a 100 TB web corpus (the regex chain was the #2
  * hottest declared query, VERDICT r4).
  *
  * Semantics are replicated from the Java-regex chain EXACTLY, including
  * its line-terminator quirks (`.` stops at terminators, `$` matches
  * before a final terminator) so the DuckDB oracle and the
  * property-based equivalence spec stay byte-identical:
  * reference behavior `video_processor.py:150-166` (resolved-URL
  * normalization before dedup).
  */
object UrlCanonUtil {

  /** Java-regex line terminators (UNIX_LINES off): what `.` refuses to
    * match and what a final `$` anchors before.
    */
  private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  private def isAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  private def isKeyChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '_'

  /** End index (exclusive) of `^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*`, or 0
    * when the prefix is absent. Deterministic without backtracking: the
    * scheme class contains no `:`, so the greedy run's end is the only
    * position `://` can start.
    */
  private def prefixEnd(s: String): Int = {
    val n = s.length
    if (n == 0 || !isAlpha(s.charAt(0))) return 0
    var j = 1
    while (j < n && isSchemeChar(s.charAt(j))) j += 1
    if (j + 3 > n || s.charAt(j) != ':' || s.charAt(j + 1) != '/' ||
      s.charAt(j + 2) != '/') return 0
    var k = j + 3
    while (k < n && { val c = s.charAt(k); c != '/' && c != '?' && c != '#' }) k += 1
    k
  }

  /** If `(utm_[A-Za-z0-9_]*|expire|ref|fbclid)=[^&#]*` matches at `p`
    * (just past a `?`/`&` delimiter), the end index of the value;
    * else -1. The alternatives share no prefix and the key classes
    * exclude `=`, so first-match order needs no backtracking.
    */
  private def trackingEnd(s: String, p: Int): Int = {
    val n = s.length
    var eq = -1
    if (s.startsWith("utm_", p)) {
      var j = p + 4
      while (j < n && isKeyChar(s.charAt(j))) j += 1
      if (j < n && s.charAt(j) == '=') eq = j
    } else if (s.startsWith("expire=", p)) eq = p + 6
    else if (s.startsWith("ref=", p)) eq = p + 3
    else if (s.startsWith("fbclid=", p)) eq = p + 6
    if (eq < 0) return -1
    var k = eq + 1
    while (k < n && s.charAt(k) != '&' && s.charAt(k) != '#') k += 1
    k
  }

  def canon(s: String): String = {
    val n = s.length
    // stage 1 — regexp_replace(u, "#.*", ""): every '#' through the end
    // of its line vanishes (Java '.' stops at line terminators), so no
    // '#' survives into later stages.
    val b1 = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '#') { i += 1; while (i < n && !isLineTerm(s.charAt(i))) i += 1 }
      else { b1.append(c); i += 1 }
    }
    val noFrag = b1.toString
    // stage 2 — lowercase the scheme://authority prefix with Spark's own
    // `lower` (UTF8String.toLowerCase) so non-ASCII authorities fold
    // identically to the regexp_extract+lower chain.
    val pe = prefixEnd(noFrag)
    val lowered =
      if (pe == 0) noFrag
      else UTF8String.fromString(noFrag.substring(0, pe)).toLowerCase.toString +
        noFrag.substring(pe)
    // stage 3 — strip tracking params, keeping the `?`/`&` delimiter
    // (left-to-right, non-overlapping, resuming at each match end).
    val n2 = lowered.length
    val b2 = new java.lang.StringBuilder(n2)
    var k = 0
    while (k < n2) {
      val c = lowered.charAt(k)
      b2.append(c)
      if (c == '?' || c == '&') {
        val e = trackingEnd(lowered, k + 1)
        k = if (e >= 0) e else k + 1
      } else k += 1
    }
    val stripped = b2.toString
    // stage 4 — "&{2,}" → "&": emit one '&' per run.
    val n3 = stripped.length
    val b3 = new java.lang.StringBuilder(n3)
    k = 0
    while (k < n3) {
      val c = stripped.charAt(k)
      b3.append(c)
      if (c == '&') { while (k < n3 && stripped.charAt(k) == '&') k += 1 }
      else k += 1
    }
    val collapsed = b3.toString
    // stage 5 — "\?&" → "?" (left-to-right, non-overlapping).
    val n4 = collapsed.length
    val b4 = new java.lang.StringBuilder(n4)
    k = 0
    while (k < n4) {
      val c = collapsed.charAt(k)
      b4.append(c)
      if (c == '?' && k + 1 < n4 && collapsed.charAt(k + 1) == '&') k += 2
      else k += 1
    }
    val tidy = b4.toString
    // stage 6 — "[?&]+$": Java '$' (MULTILINE off) anchors at the end of
    // input OR just before one final line terminator ("\r\n" counts as
    // one); strip the maximal ?/& run ending at that anchor.
    val n5 = tidy.length
    var anchor = n5
    if (n5 > 0) {
      val last = tidy.charAt(n5 - 1)
      if (last == '\n')
        anchor = if (n5 > 1 && tidy.charAt(n5 - 2) == '\r') n5 - 2 else n5 - 1
      else if (isLineTerm(last)) anchor = n5 - 1
    }
    var st = anchor
    while (st > 0 && { val c = tidy.charAt(st - 1); c == '?' || c == '&' }) st -= 1
    if (st == anchor) tidy
    else tidy.substring(0, st) + tidy.substring(anchor)
  }

  def canon(s: UTF8String): UTF8String = UTF8String.fromString(canon(s.toString))
}

/** Codegen'd Catalyst expression (SURVEY.md §7.3 tier (b)) computing the
  * canonical dedup key of a URL in one call — replaces the six chained
  * regex expressions on the x43 hot path. Declared-query parity with the
  * DuckDB regex oracle is held by `UrlCanonSpec`'s property-based
  * equivalence against the retained regex chain plus the t2 hash gate.
  */
case class UrlCanonical(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonical"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_canonical requires STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    UrlCanonUtil.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.UrlCanonUtil.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonical =
    copy(child = newChild)
}
