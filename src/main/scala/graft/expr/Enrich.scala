package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar enrichment functions (SURVEY.md §2.3, P1–P12)
  * re-expressed as pure `Column` combinators over Spark built-ins — every
  * one stays inside whole-stage codegen (no UDFs).
  */
object Enrich {

  // --- P1: ids -------------------------------------------------------------

  /** Nondeterministic UUIDv4, as the reference generates per run
    * (`video_processor.py:24-30`).
    */
  def freshUuid(): Column = uuid()

  /** Deterministic id variant for oracle-checked paths: content-addressed
    * sha256 of (url, role). Replaces `uuid.uuid4()` where reproducibility
    * is required (SURVEY.md §7.4 risk 1).
    */
  def detId(url: Column, role: String): Column =
    sha2(concat(url, lit(role)), 256)

  // --- P2: timestamps, dual format ----------------------------------------

  /** `"%Y-%m-%dT%H:%M:%S"` rendering (`video_processor.py:36`). */
  def fmtTs(ts: Column): Column = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")

  /** ISO-8601 with `Z` suffix (`video_processor.py:35`). Deterministic
    * variant formats a data column at second precision.
    */
  def fmtTsIso(ts: Column): Column = concat(fmtTs(ts), lit("Z"))

  // --- P3: HLS detection ---------------------------------------------------

  /** `'.m3u8' in url.lower()` → 0/1 int (`video_processor.py:182-184,275`). */
  def hlsFlag(url: Column): Column =
    contains(lower(url), lit(".m3u8")).cast("int")

  // --- P4: URL path extension ----------------------------------------------

  /** Path portion of a URL: everything between the authority (when a
    * scheme is present) and `?`/`#`. Mirrors `urlparse(url).path`
    * including schemeless inputs (`video_processor.py:188-189`).
    * Pure-regex (not `parse_url`) so the same expression is portable to
    * the DuckDB oracle.
    */
  def urlPath(url: Column): Column =
    regexp_extract(url, "^(?:[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)?([^?#]*)", 1)

  /** Lower-cased text after the last `.` of the path; empty when the path
    * has no dot (`video_processor.py:186-192`: `path.split('.')[-1]
    * .split('?')[0].lower()`).
    */
  def fileExtension(url: Column): Column =
    lower(regexp_extract(urlPath(url), "\\.([^.]*)$", 1))

  // --- P5: codec / bitrate lookup ------------------------------------------

  /** ext → codec, default `MP4A` (`video_processor.py:197-205,217`). */
  private val codecMap: Column = map(
    lit("m4a"), lit("MP4A"), lit("mp4"), lit("MP4A"), lit("mp3"), lit("MP3"),
    lit("aac"), lit("AAC"), lit("webm"), lit("OPUS"), lit("ogg"), lit("OGG"),
    lit("m3u8"), lit("HLS"))

  /** `try_element_at`: ANSI mode (Spark 4 default) makes plain
    * `element_at` throw on a missing map key; the reference's `.get`
    * semantics want null → default.
    */
  def codecFor(ext: Column): Column =
    coalesce(try_element_at(codecMap, ext), lit("MP4A"))

  /** ext → bitrate; every mapped value and the default are 128
    * (`video_processor.py:207-215,217`).
    */
  def bitrateFor(ext: Column): Column = lit(128)

  // --- P6: tag extraction --------------------------------------------------

  /** The reference's 18-word stop list, verbatim (`video_processor.py:222`). */
  val stopwords: Seq[String] = Seq(
    "the", "and", "or", "but", "in", "on", "at", "to", "for", "of", "with",
    "by", "official", "video", "audio", "hd", "tamil", "song")

  private val stopwordArray: Column = array(stopwords.map(lit): _*)

  /** Tokenize lowercased title on `\w+`, drop stopwords and tokens ≤2
    * chars, keep the first 6, join with "," (`video_processor.py:219-224`).
    * `(?U)` makes Java's `\w` unicode-aware like Python's `re` (the
    * reference tokenizes unicode titles; identical to plain `\w` on the
    * ASCII oracle data).
    */
  def tagsFromTitle(title: Column): Column =
    array_join(
      slice(
        filter(
          regexp_extract_all(lower(title), lit("(?U)\\w+"), lit(0)),
          t => length(t) > 2 && !array_contains(stopwordArray, t)),
        1, 6),
      ",")

  // --- P7: language inference ----------------------------------------------

  /** Indicator substrings checked in insertion order
    * (`video_processor.py:230-241`). Each entry: language → indicators.
    * Note `tamizh`/`tam` etc. are substring (not token) matches, exactly
    * as `indicator in title_lower` behaves.
    */
  val languageIndicators: Seq[(String, Seq[String])] = Seq(
    "tamil" -> Seq("tamil", "tamizh", "tam"),
    "hindi" -> Seq("hindi", "hind"),
    "english" -> Seq("english", "eng"),
    "telugu" -> Seq("telugu", "tel"),
    "malayalam" -> Seq("malayalam", "mal"),
    "kannada" -> Seq("kannada", "kan"))

  private def containsAny(t: Column, subs: Seq[String]): Column =
    subs.map(s => contains(t, lit(s))).reduce(_ || _)

  /** Language display name; default `Tamil` (`video_processor.py:239-244`). */
  def languageFromTitle(title: Column): Column = {
    val t = lower(title)
    languageIndicators.foldRight(lit("Tamil")) { case ((langName, subs), rest) =>
      when(containsAny(t, subs), lit(langName.capitalize)).otherwise(rest)
    }
  }

  /** `language.upper()[:5]` (`video_processor.py:241`): TAMIL, HINDI,
    * ENGLI, TELUG, MALAY, KANNA; default TAMIL.
    */
  def languageCodeFromTitle(title: Column): Column =
    upper(substring(languageFromTitle(title), 1, 5))

  // --- P8: filename sanitization -------------------------------------------

  /** `re.sub(r'[^\w\s-]','',t)` then `re.sub(r'[-\s]+','_',t)`
    * (`video_processor.py:246-251`). Spark regexp_replace is global by
    * default (DuckDB needs the 'g' flag — SURVEY.md §2.3 P8 gotcha);
    * `(?U)` matches Python's unicode `\w`/`\s` classes.
    */
  def sanitizeTitle(title: Column): Column =
    regexp_replace(regexp_replace(title, "(?U)[^\\w\\s-]", ""), "(?U)[-\\s]+", "_")

  /** `f"{safe_title}.{ext}"`, defaulting to `.m4a` when the URL has no
    * extension (`video_processor.py:250-251`).
    */
  def filenameFor(title: Column, url: Column): Column = {
    val ext = fileExtension(url)
    concat(sanitizeTitle(title), lit("."),
      when(ext === "", lit("m4a")).otherwise(ext))
  }

  // --- P9: truncation ------------------------------------------------------

  /** `s[:n]` (`video_processor.py:285,290,301`). */
  def truncate(c: Column, n: Int): Column = substring(c, 1, n)

  // --- P11/P12: fallbacks --------------------------------------------------

  /** `video_info.get('thumbnail', default)` (`video_processor.py:289`);
    * Python `.get` with empty-string thumbnails still returns the empty
    * string, so this is pure null-coalescing.
    */
  def faviconFor(thumbnail: Column): Column =
    coalesce(thumbnail, lit("https://youtube.com/favicon.ico"))

  /** `info.get('title', 'Unknown Title')` (`video_processor.py:102`). */
  def titleOrUnknown(title: Column): Column =
    coalesce(title, lit("Unknown Title"))
}
