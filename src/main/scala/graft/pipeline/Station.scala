package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.Enrich

/** The reference's end-to-end enrichment pipeline (SURVEY.md §3 E1),
  * declared as lazy DataFrame transforms so Catalyst plans the whole
  * chain: scan → dedup → resolve → filters → 37-field projection.
  */
object Station {

  /** S1 + D2: parse raw link lines — trim, drop blanks and `#` comments
    * (`video_processor.py:328-330`). Input: one string column; output:
    * a single `url` column.
    */
  def parseLinks(lines: DataFrame): DataFrame = {
    val c = trim(col(lines.columns.head))
    lines.select(c.as("url"))
      .filter(length(col("url")) > 0 && !col("url").startsWith("#"))
  }

  /** D1: exact URL dedup — `list(set(links))`, order destroyed
    * (`video_processor.py:330`).
    */
  def dedupLinks(links: DataFrame): DataFrame = links.distinct()

  /** D3 + D4: drop failed resolutions (null VideoInfo,
    * `video_processor.py:261-264`) and unresolved stream URLs still
    * pointing at a watch page (`video_processor.py:270-273`).
    */
  def validResolutions(resolved: DataFrame): DataFrame =
    resolved
      .filter(col("stream_url").isNotNull)
      .filter(!col("stream_url").contains("youtube.com/watch"))

  /** P13: the 37-field station projection (`video_processor.py:281-319`).
    *
    * Input columns: `url`, `title`, `thumbnail`, `stream_url`, and a
    * timestamp column `ts`. `ids` supplies the three id columns — pass
    * [[deterministicIds]] for oracle-checked runs or [[randomIds]] for
    * run-parity with the reference.
    */
  def enrich(resolved: DataFrame, ids: Column => Seq[(String, Column)] = deterministicIds): DataFrame = {
    val title = Enrich.titleOrUnknown(col("title"))
    val streamUrl = col("stream_url")
    val ext = Enrich.fileExtension(streamUrl)
    val language = Enrich.languageFromTitle(title)
    val languageCode = Enrich.languageCodeFromTitle(title)
    val t = Enrich.fmtTs(col("ts"))
    val tIso = Enrich.fmtTsIso(col("ts"))
    val idCols = ids(col("url")).map { case (n, c) => c.as(n) }

    resolved.select(
      idCols ++ Seq(
        Enrich.truncate(title, 80).as("name"),
        col("url").as("url"),
        streamUrl.as("url_resolved"),
        lit("https://youtube.com").as("homepage"),
        Enrich.faviconFor(col("thumbnail")).as("favicon"),
        Enrich.truncate(Enrich.tagsFromTitle(title), 80).as("tags"),
        concat(lit("User Defined ("), language, lit(" Videos)")).as("country"),
        languageCode.as("countrycode"),
        concat(language, lit(" State")).as("state"),
        language.as("language"),
        lower(Enrich.truncate(languageCode, 2)).as("languagecodes"),
        lit(0).as("votes"),
        t.as("lastchangetime"),
        tIso.as("lastchangetime_iso8601"),
        Enrich.codecFor(ext).as("codec"),
        Enrich.bitrateFor(ext).as("bitrate"),
        Enrich.truncate(Enrich.filenameFor(title, streamUrl), 80).as("file_name_from_url"),
        Enrich.hlsFlag(streamUrl).as("hls"),
        lit(1).as("lastcheckok"),
        t.as("lastchecktime"),
        tIso.as("lastchecktime_iso8601"),
        t.as("lastcheckoktime"),
        tIso.as("lastcheckoktime_iso8601"),
        t.as("lastlocalchecktime"),
        tIso.as("lastlocalchecktime_iso8601"),
        t.as("clicktimestamp"),
        tIso.as("clicktimestamp_iso8601"),
        lit(0).as("clickcount"),
        lit(0).as("clicktrend"),
        lit(0).as("ssl_error"),
        lit(null).cast("double").as("geo_lat"),
        lit(null).cast("double").as("geo_long"),
        lit(null).cast("double").as("geo_distance"),
        lit(false).as("has_extended_info")): _*)
  }

  /** Deterministic content-addressed ids (SURVEY.md §7.4 risk 1). */
  def deterministicIds(url: Column): Seq[(String, Column)] = Seq(
    "changeuuid" -> Enrich.detId(url, "change"),
    "stationuuid" -> Enrich.detId(url, "station"),
    "serveruuid" -> Enrich.detId(url, "server"))

  /** Fresh UUIDv4s per row, as the reference does per run
    * (`video_processor.py:24-30`). Not oracle-comparable.
    */
  def randomIds(url: Column): Seq[(String, Column)] = Seq(
    "changeuuid" -> Enrich.freshUuid(),
    "stationuuid" -> Enrich.freshUuid(),
    "serveruuid" -> Enrich.freshUuid())

  /** Full batch pipeline: raw lines → stations. The resolver is injected
    * as a DataFrame transform so production (network) and test (mock)
    * implementations share the plan shape (SURVEY.md §2.1 S3).
    *
    * `ts` is the P2 "now" stamped on every record
    * (`video_processor.py:257-258`); pass a fixed timestamp for
    * deterministic/golden runs.
    */
  def pipeline(lines: DataFrame, resolve: DataFrame => DataFrame,
               ids: Column => Seq[(String, Column)] = deterministicIds,
               ts: Column = current_timestamp()): DataFrame =
    enrich(validResolutions(resolve(dedupLinks(parseLinks(lines)))).withColumn("ts", ts), ids)
}
