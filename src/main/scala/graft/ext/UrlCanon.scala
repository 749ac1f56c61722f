package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup (the FineWeb/CCNet
  * "normalized URL" key): lowercase the scheme+authority, drop the
  * fragment, strip tracking query parameters (`utm_*`, `expire`, `ref`,
  * `fbclid`) while PRESERVING meaningful ones, and tidy the leftover
  * `?`/`&` punctuation. Pure codegen'd string expressions — no UDF, no
  * parsing library — so the canonical key is computed inline in the
  * scan projection at corpus scale.
  *
  * Deliberately NOT done: query-parameter reordering (changes semantics
  * on some sites) and percent-decoding (risks double-decode bugs);
  * both are documented extensions.
  */
object UrlCanon {

  /** `scheme://authority` prefix (RFC 3986 scheme chars, authority up to
    * the first `/`, `?` or `#`).
    */
  val schemeHostPattern = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  private val trackingPattern = "([?&])(utm_[A-Za-z0-9_]*|expire|ref|fbclid)=[^&#]*"

  /** Canonical dedup key, computed by the single-pass codegen'd
    * [[graft.expr.UrlCanonical]] expression — byte-identical to
    * [[canonicalizeRegex]] (property-checked in `ExtSpec`) but without
    * six java.util.regex passes per row on the corpus-scale hot path.
    */
  def canonicalize(u: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expr.UrlCanonical(
        org.apache.spark.sql.GraftColumnBridge.expression(u)))

  /** The original composed-builtin regex chain; retained as the
    * executable specification the native expression is property-tested
    * against (and as documentation of the exact semantics).
    */
  def canonicalizeRegex(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, schemeHostPattern, 0)),
      regexp_replace(noFrag, schemeHostPattern, ""))
    val stripped = regexp_replace(lowered, trackingPattern, "$1")
    val collapsed = regexp_replace(
      regexp_replace(stripped, "&{2,}", "&"), "\\?&", "?")
    regexp_replace(collapsed, "[?&]+$", "")
  }

  /** DuckDB mirror of [[canonicalize]] over a SQL expression `e` —
    * identical regexes (both engines speak the same class syntax here);
    * DuckDB needs the explicit 'g' flag where Spark replaces globally
    * by default.
    */
  def canonicalizeSql(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |  lower(regexp_extract(regexp_replace($e, '#.*', ''), '$schemeHostPattern')) ||
       |    regexp_replace(regexp_replace($e, '#.*', ''), '$schemeHostPattern', ''),
       |  '([?&])(utm_[A-Za-z0-9_]*|expire|ref|fbclid)=[^&#]*', '\\1', 'g'),
       |  '&{2,}', '&', 'g'), '\\?&', '?'), '[?&]+$$', '')""".stripMargin
}
