package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.expr.Enrich
import graft.model.Tables
import graft.pipeline.Station

/** Declared-query inventory for the reference surface (SURVEY.md §2) —
  * each entry is a deterministic Spark query plus a DuckDB oracle mirror.
  *
  * Conventions (SURVEY.md §7.4):
  *  - every query ends with a total ORDER BY on a non-null unique key;
  *  - column names are aliased identically on both sides;
  *  - money sums go through DECIMAL casts so both engines agree exactly;
  *  - no uuid()/current_timestamp() — deterministic variants only.
  */
object RefQueries {

  type Q = (SparkSession, String) => DataFrame

  private val stopListSql =
    "['the','and','or','but','in','on','at','to','for','of','with','by','official','video','audio','hd','tamil','song']"

  /** DuckDB mirror of the P4 extension extract on a column named by `c`. */
  private def extSql(c: String): String =
    s"lower(regexp_extract(regexp_extract($c, '^(?:[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)?([^?#]*)', 1), '\\.([^.]*)$$', 1))"

  /** DuckDB mirror of the P7 language CASE chain over expression `t`. */
  private def langSql(t: String): String =
    s"""CASE
       |  WHEN contains(lower($t), 'tamil') OR contains(lower($t), 'tamizh') OR contains(lower($t), 'tam') THEN 'Tamil'
       |  WHEN contains(lower($t), 'hindi') OR contains(lower($t), 'hind') THEN 'Hindi'
       |  WHEN contains(lower($t), 'english') OR contains(lower($t), 'eng') THEN 'English'
       |  WHEN contains(lower($t), 'telugu') OR contains(lower($t), 'tel') THEN 'Telugu'
       |  WHEN contains(lower($t), 'malayalam') OR contains(lower($t), 'mal') THEN 'Malayalam'
       |  WHEN contains(lower($t), 'kannada') OR contains(lower($t), 'kan') THEN 'Kannada'
       |  ELSE 'Tamil' END""".stripMargin

  /** DuckDB mirror of the P6 tag pipeline over expression `t`. */
  private def tagsSql(t: String): String =
    s"array_to_string(list_slice(list_filter(regexp_extract_all(lower($t), '\\w+'), " +
      s"x -> length(x) > 2 AND NOT list_contains($stopListSql, x)), 1, 6), ',')"

  /** DuckDB mirror of the P8 sanitize+extension filename over `t`/`ext`. */
  private def filenameSql(t: String, ext: String): String =
    s"substr(regexp_replace(regexp_replace($t, '[^\\w\\s-]', '', 'g'), '[-\\s]+', '_', 'g') || '.' || " +
      s"CASE WHEN $ext = '' THEN 'm4a' ELSE $ext END, 1, 80)"

  // --- P13 flagship -----------------------------------------------------

  /** The full 37-field station projection over the synthetic links
    * (`video_processor.py:281-319`), deterministic-id mode, totally
    * ordered by url.
    */
  val flagshipStation: Q = (spark, sfDir) =>
    Station.enrich(SynthLinks.resolved(spark, sfDir)).orderBy("url")

  private val flagshipStationSql: String =
    SynthLinks.cte +
      s""", enr AS (
         |  SELECT *, coalesce(title, 'Unknown Title') AS t,
         |    ${extSql("stream_url")} AS ext,
         |    strftime(ts, '%Y-%m-%dT%H:%M:%S') AS tfmt
         |  FROM resolved
         |), enr2 AS (
         |  SELECT *, ${langSql("t")} AS language, ${tagsSql("t")} AS tags_full
         |  FROM enr
         |)
         |SELECT
         |  sha256(url || 'change') AS changeuuid,
         |  sha256(url || 'station') AS stationuuid,
         |  sha256(url || 'server') AS serveruuid,
         |  substr(t, 1, 80) AS name,
         |  url,
         |  stream_url AS url_resolved,
         |  'https://youtube.com' AS homepage,
         |  coalesce(thumbnail, 'https://youtube.com/favicon.ico') AS favicon,
         |  substr(tags_full, 1, 80) AS tags,
         |  'User Defined (' || language || ' Videos)' AS country,
         |  upper(substr(language, 1, 5)) AS countrycode,
         |  language || ' State' AS state,
         |  language,
         |  lower(substr(upper(substr(language, 1, 5)), 1, 2)) AS languagecodes,
         |  0 AS votes,
         |  tfmt AS lastchangetime,
         |  tfmt || 'Z' AS lastchangetime_iso8601,
         |  CASE ext WHEN 'm4a' THEN 'MP4A' WHEN 'mp4' THEN 'MP4A' WHEN 'mp3' THEN 'MP3'
         |    WHEN 'aac' THEN 'AAC' WHEN 'webm' THEN 'OPUS' WHEN 'ogg' THEN 'OGG'
         |    WHEN 'm3u8' THEN 'HLS' ELSE 'MP4A' END AS codec,
         |  128 AS bitrate,
         |  ${filenameSql("t", "ext")} AS file_name_from_url,
         |  CAST(contains(lower(stream_url), '.m3u8') AS INT) AS hls,
         |  1 AS lastcheckok,
         |  tfmt AS lastchecktime,
         |  tfmt || 'Z' AS lastchecktime_iso8601,
         |  tfmt AS lastcheckoktime,
         |  tfmt || 'Z' AS lastcheckoktime_iso8601,
         |  tfmt AS lastlocalchecktime,
         |  tfmt || 'Z' AS lastlocalchecktime_iso8601,
         |  tfmt AS clicktimestamp,
         |  tfmt || 'Z' AS clicktimestamp_iso8601,
         |  0 AS clickcount,
         |  0 AS clicktrend,
         |  0 AS ssl_error,
         |  CAST(NULL AS DOUBLE) AS geo_lat,
         |  CAST(NULL AS DOUBLE) AS geo_long,
         |  CAST(NULL AS DOUBLE) AS geo_distance,
         |  false AS has_extended_info
         |FROM enr2 ORDER BY url""".stripMargin

  // --- S1/D2: link-file parsing ----------------------------------------

  /** Raw link-file lines synthesized from `part` (comment, blank, and
    * whitespace-padded cases), then parsed per `video_processor.py:328-330`.
    */
  val s1ParseLinks: Q = (spark, sfDir) => {
    val p = Tables.part(spark, sfDir)
    val line = when(col("p_partkey") % 13 === 0, concat(lit("# "), col("p_name")))
      .when(col("p_partkey") % 13 === 1, lit("   "))
      .otherwise(concat(lit("  https://www.youtube.com/watch?v="), col("p_partkey"), lit("  ")))
    Station.parseLinks(p.select(line.as("line"))).orderBy("url")
  }

  private val s1ParseLinksSql: String =
    """WITH raw AS (
      |  SELECT CASE
      |    WHEN p_partkey % 13 = 0 THEN '# ' || p_name
      |    WHEN p_partkey % 13 = 1 THEN '   '
      |    ELSE '  https://www.youtube.com/watch?v=' || p_partkey || '  ' END AS line
      |  FROM part
      |)
      |SELECT trim(line) AS url FROM raw
      |WHERE length(trim(line)) > 0 AND trim(line) NOT LIKE '#%'
      |ORDER BY url""".stripMargin

  // --- D1: exact dedup ---------------------------------------------------

  /** `list(set(links))` (`video_processor.py:330`) — distinct URLs from a
    * duplicated derivation (one URL per order, repeated per lineitem).
    */
  val d1DistinctUrls: Q = (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .select(concat(lit("https://www.youtube.com/watch?v="), col("l_orderkey")).as("url"))
      .distinct().orderBy("url")

  private val d1DistinctUrlsSql: String =
    """SELECT DISTINCT 'https://www.youtube.com/watch?v=' || l_orderkey AS url
      |FROM lineitem ORDER BY url""".stripMargin

  // --- D3+D4: resolution validity ---------------------------------------

  val d3ValidStreams: Q = (spark, sfDir) =>
    SynthLinks.resolved(spark, sfDir).select("url", "stream_url").orderBy("url")

  private val d3ValidStreamsSql: String =
    SynthLinks.cte + "\nSELECT url, stream_url FROM resolved ORDER BY url"

  // --- D5: error-class routing ------------------------------------------

  /** CASE/LIKE routing of a status column (`video_processor.py:115-128`). */
  val d5ErrorRouting: Q = (spark, sfDir) =>
    Tables.events(spark, sfDir).select(
      col("event_id"), col("event_type"),
      when(contains(col("event_type"), lit("error")), lit("fallback"))
        .when(col("event_type").isin("click", "view"), lit("process"))
        .otherwise(lit("archive")).as("route"))
      .orderBy("event_id")

  private val d5ErrorRoutingSql: String =
    """SELECT event_id, event_type,
      |  CASE WHEN contains(event_type, 'error') THEN 'fallback'
      |       WHEN event_type IN ('click', 'view') THEN 'process'
      |       ELSE 'archive' END AS route
      |FROM events ORDER BY event_id""".stripMargin

  // --- P3: HLS flag ------------------------------------------------------

  val p3HlsFlag: Q = (spark, sfDir) =>
    SynthLinks.resolved(spark, sfDir)
      .select(col("url"), Enrich.hlsFlag(col("stream_url")).as("hls"))
      .orderBy("url")

  private val p3HlsFlagSql: String =
    SynthLinks.cte +
      "\nSELECT url, CAST(contains(lower(stream_url), '.m3u8') AS INT) AS hls FROM resolved ORDER BY url"

  // --- P4: URL extension -------------------------------------------------

  val p4Extension: Q = (spark, sfDir) =>
    SynthLinks.resolved(spark, sfDir)
      .select(col("url"), Enrich.fileExtension(col("stream_url")).as("extension"))
      .orderBy("url")

  private val p4ExtensionSql: String =
    SynthLinks.cte +
      s"\nSELECT url, ${extSql("stream_url")} AS extension FROM resolved ORDER BY url"

  // --- P5: codec / bitrate lookup -----------------------------------------

  val p5Codec: Q = (spark, sfDir) => {
    val ext = Enrich.fileExtension(col("stream_url"))
    SynthLinks.resolved(spark, sfDir)
      .select(col("url"), Enrich.codecFor(ext).as("codec"), Enrich.bitrateFor(ext).as("bitrate"))
      .orderBy("url")
  }

  private val p5CodecSql: String =
    SynthLinks.cte +
      s""", e AS (SELECT url, ${extSql("stream_url")} AS ext FROM resolved)
         |SELECT url,
         |  CASE ext WHEN 'm4a' THEN 'MP4A' WHEN 'mp4' THEN 'MP4A' WHEN 'mp3' THEN 'MP3'
         |    WHEN 'aac' THEN 'AAC' WHEN 'webm' THEN 'OPUS' WHEN 'ogg' THEN 'OGG'
         |    WHEN 'm3u8' THEN 'HLS' ELSE 'MP4A' END AS codec,
         |  128 AS bitrate
         |FROM e ORDER BY url""".stripMargin

  // --- P6: tag extraction -------------------------------------------------

  val p6Tags: Q = (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), Enrich.tagsFromTitle(col("text")).as("tags"))
      .orderBy("doc_id")

  private val p6TagsSql: String =
    s"SELECT doc_id, ${tagsSql("text")} AS tags FROM documents ORDER BY doc_id"

  // --- P7: language inference ----------------------------------------------

  val p7Language: Q = (spark, sfDir) => {
    val langCode = Enrich.languageCodeFromTitle(col("text"))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      Enrich.languageFromTitle(col("text")).as("language"),
      langCode.as("countrycode"),
      lower(substring(langCode, 1, 2)).as("languagecodes"))
      .orderBy("doc_id")
  }

  private val p7LanguageSql: String =
    s"""WITH l AS (SELECT doc_id, ${langSql("text")} AS language FROM documents)
       |SELECT doc_id, language,
       |  upper(substr(language, 1, 5)) AS countrycode,
       |  lower(substr(upper(substr(language, 1, 5)), 1, 2)) AS languagecodes
       |FROM l ORDER BY doc_id""".stripMargin

  // --- P8: filename sanitization -------------------------------------------

  val p8Filename: Q = (spark, sfDir) =>
    SynthLinks.resolved(spark, sfDir)
      .select(col("url"),
        Enrich.truncate(
          Enrich.filenameFor(Enrich.titleOrUnknown(col("title")), col("stream_url")), 80)
          .as("file_name_from_url"))
      .orderBy("url")

  private val p8FilenameSql: String =
    SynthLinks.cte +
      s""", e AS (
         |  SELECT url, coalesce(title, 'Unknown Title') AS t,
         |    ${extSql("stream_url")} AS ext
         |  FROM resolved
         |)
         |SELECT url, ${filenameSql("t", "ext")} AS file_name_from_url
         |FROM e ORDER BY url""".stripMargin

  // --- P2: dual timestamp formatting ---------------------------------------

  /** Deterministic variant: format the data timestamp column
    * (`video_processor.py:32-37`, SURVEY.md §2.3 P2).
    */
  val p2FormatTs: Q = (spark, sfDir) =>
    SynthLinks.links(spark, sfDir)
      .select(col("lkey"),
        Enrich.fmtTs(col("ts")).as("lastchangetime"),
        Enrich.fmtTsIso(col("ts")).as("lastchangetime_iso8601"))
      .orderBy("lkey")

  private val p2FormatTsSql: String =
    SynthLinks.cte +
      """
        |SELECT lkey,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS lastchangetime,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS lastchangetime_iso8601
        |FROM links ORDER BY lkey""".stripMargin

  // --- P9: truncation -------------------------------------------------------

  val p9Truncate: Q = (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), Enrich.truncate(col("text"), 80).as("excerpt"))
      .orderBy("doc_id")

  private val p9TruncateSql: String =
    "SELECT doc_id, substr(text, 1, 80) AS excerpt FROM documents ORDER BY doc_id"

  // --- P10/P11/P12: constants + fallbacks ------------------------------------

  val p10Constants: Q = (spark, sfDir) =>
    SynthLinks.links(spark, sfDir).select(
      col("url"),
      lit("https://youtube.com").as("homepage"),
      Enrich.faviconFor(col("thumbnail")).as("favicon"),
      Enrich.titleOrUnknown(col("title")).as("name"),
      lit(0).as("votes"),
      lit(1).as("lastcheckok"),
      lit(0).as("ssl_error"),
      lit(null).cast("double").as("geo_lat"),
      lit(false).as("has_extended_info"))
      .orderBy("url")

  private val p10ConstantsSql: String =
    SynthLinks.cte +
      """
        |SELECT url,
        |  'https://youtube.com' AS homepage,
        |  coalesce(thumbnail, 'https://youtube.com/favicon.ico') AS favicon,
        |  coalesce(title, 'Unknown Title') AS name,
        |  0 AS votes, 1 AS lastcheckok, 0 AS ssl_error,
        |  CAST(NULL AS DOUBLE) AS geo_lat,
        |  false AS has_extended_info
        |FROM links ORDER BY url""".stripMargin

  // --- A1-A4: array format-selection logic -----------------------------------

  /** The resolver's format-selection cascade (`video_processor.py:84-99`)
    * over token arrays: filter (A1), preference filter (A2), last-element
    * pick with coalesce fallbacks (A3/A4). `try_element_at` keeps the
    * empty-array case null under ANSI mode.
    */
  val a1FormatSelection: Q = (spark, sfDir) => {
    val d = Tables.documents(spark, sfDir)
    val tokens = regexp_extract_all(col("text"), lit("\\w+"), lit(0))
    val audio = filter(tokens, t => length(t) > 3)
    val preferred = filter(audio, t => contains(t, lit("a")) || contains(t, lit("e")))
    d.select(
      col("doc_id"),
      coalesce(
        try_element_at(preferred, lit(-1)),
        try_element_at(audio, lit(-1)),
        try_element_at(tokens, lit(-1))).as("pick"))
      .orderBy("doc_id")
  }

  private val a1FormatSelectionSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_extract_all(text, '\w+') AS tokens FROM documents
      |), x AS (
      |  SELECT doc_id, tokens, list_filter(tokens, t -> length(t) > 3) AS audio FROM tok
      |), y AS (
      |  SELECT doc_id, tokens, audio,
      |    list_filter(audio, t -> contains(t, 'a') OR contains(t, 'e')) AS preferred
      |  FROM x
      |)
      |SELECT doc_id, coalesce(preferred[-1], audio[-1], tokens[-1]) AS pick
      |FROM y ORDER BY doc_id""".stripMargin

  // --- G1/G2/G3: aggregations -------------------------------------------------

  val g1StatusCounts: Q = (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  private val g1StatusCountsSql: String =
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type"

  val g2DistinctUsers: Q = (spark, sfDir) =>
    Tables.events(spark, sfDir).agg(countDistinct(col("user_id")).as("n"))

  private val g2DistinctUsersSql: String =
    "SELECT count(DISTINCT user_id) AS n FROM events"

  /** G3 batch-collect made deterministic: per-user sorted event-type list
    * (`video_processor.py:370,383-384`).
    */
  val g3BatchCollect: Q = (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_list(col("event_type"))), ",").as("types"))
      .orderBy("user_id")

  private val g3BatchCollectSql: String =
    """SELECT user_id, array_to_string(list_sort(list(event_type)), ',') AS types
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- Analytics headliners (bench; beyond-reference aggregations) -------------

  /** TPC-H Q1-flavored pricing summary; DECIMAL casts keep both engines
    * bit-identical (SURVEY.md §7.4 risk 5).
    */
  val q1Pricing: Q = (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_base"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Three-way star join with revenue rollup per market segment; exercises
    * broadcast (customer/orders side) + shuffle agg.
    */
  val q3Revenue: Q = (spark, sfDir) => {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    // Fixed-point money: price in cents and discount in percent are exact
    // BIGINTs (the generator emits 2-dp doubles, so round() is never at a
    // tie), making the sum bit-identical on any engine — double→decimal
    // cast rounding modes vary across DuckDB versions. revenue_e4 is in
    // units of 1e-4 dollars: cents * (100 - pct) = (price*1e2)*(frac*1e2).
    val revE4 = sum(
      round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long")))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(revE4.as("revenue_e4"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  private val q3RevenueSql: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
      |  count(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --- W1/W2/W3: event-time windows (streaming-shaped, batch-checked) ----------

  /** Tumbling 1 h windows keyed by epoch seconds of the window start. */
  val w1Tumbling: Q = (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("ws"), col("event_type"))
      .groupBy("ws", "event_type").agg(count(lit(1)).as("n"))
      .orderBy("ws", "event_type")

  private val w1TumblingSql: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws,
      |  event_type, count(*) AS n
      |FROM events GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin

  /** Sliding 1 h / 30 min windows via Spark's native `window()`; oracle
    * expands each event into its two member windows.
    */
  val w2Sliding: Q = (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type")

  private val w2SlidingSql: String =
    """WITH x AS (
      |  SELECT unnest([
      |    CAST(floor(epoch(ts)/1800)*1800 AS BIGINT),
      |    CAST(floor(epoch(ts)/1800)*1800 - 1800 AS BIGINT)]) AS ws,
      |    event_type
      |  FROM events
      |)
      |SELECT ws, event_type, count(*) AS n FROM x
      |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin

  /** Session windows (30 min gap) per user via Spark's `session_window`;
    * oracle reproduces them with gaps-and-islands window functions.
    */
  val w3Sessions: Q = (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"), col("n"))
      .orderBy("user_id", "session_start")

  private val w3SessionsSql: String =
    """WITH l AS (
      |  SELECT user_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events
      |), f AS (
      |  SELECT user_id, ts,
      |    CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
      |  FROM l
      |), s AS (
      |  SELECT user_id, ts,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM f
      |)
      |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start, count(*) AS n
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  // --- assembled maps -----------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "flagship_station" -> flagshipStation,
    "s1_parse_links" -> s1ParseLinks,
    "d1_distinct_urls" -> d1DistinctUrls,
    "d3_valid_streams" -> d3ValidStreams,
    "d5_error_routing" -> d5ErrorRouting,
    "p2_format_ts" -> p2FormatTs,
    "p3_hls_flag" -> p3HlsFlag,
    "p4_extension" -> p4Extension,
    "p5_codec" -> p5Codec,
    "p6_tags" -> p6Tags,
    "p7_language" -> p7Language,
    "p8_filename" -> p8Filename,
    "p9_truncate" -> p9Truncate,
    "p10_constants" -> p10Constants,
    "a1_format_selection" -> a1FormatSelection,
    "g1_status_counts" -> g1StatusCounts,
    "g2_distinct_users" -> g2DistinctUsers,
    "g3_batch_collect" -> g3BatchCollect,
    "q1_pricing" -> q1Pricing,
    "q3_revenue" -> q3Revenue,
    "w1_tumbling" -> w1Tumbling,
    "w2_sliding" -> w2Sliding,
    "w3_sessions" -> w3Sessions)

  val oracle: Map[String, String] = Map(
    "flagship_station" -> flagshipStationSql,
    "s1_parse_links" -> s1ParseLinksSql,
    "d1_distinct_urls" -> d1DistinctUrlsSql,
    "d3_valid_streams" -> d3ValidStreamsSql,
    "d5_error_routing" -> d5ErrorRoutingSql,
    "p2_format_ts" -> p2FormatTsSql,
    "p3_hls_flag" -> p3HlsFlagSql,
    "p4_extension" -> p4ExtensionSql,
    "p5_codec" -> p5CodecSql,
    "p6_tags" -> p6TagsSql,
    "p7_language" -> p7LanguageSql,
    "p8_filename" -> p8FilenameSql,
    "p9_truncate" -> p9TruncateSql,
    "p10_constants" -> p10ConstantsSql,
    "a1_format_selection" -> a1FormatSelectionSql,
    "g1_status_counts" -> g1StatusCountsSql,
    "g2_distinct_users" -> g2DistinctUsersSql,
    "g3_batch_collect" -> g3BatchCollectSql,
    "q1_pricing" -> q1PricingSql,
    "q3_revenue" -> q3RevenueSql,
    "w1_tumbling" -> w1TumblingSql,
    "w2_sliding" -> w2SlidingSql,
    "w3_sessions" -> w3SessionsSql)
}
