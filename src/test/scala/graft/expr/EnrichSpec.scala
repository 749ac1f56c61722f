package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference-derived cases for the scalar enrichment functions
  * (SURVEY.md §2.3; sources cited per test).
  */
class EnrichSpec extends SparkSpec {

  private def eval(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).collect().head.get(0)
  }

  // P3 — `video_processor.py:182-184`
  test("hls flag detects .m3u8 case-insensitively") {
    assert(eval(Enrich.hlsFlag(lit("http://x/St.M3U8?a=1"))) == 1)
    assert(eval(Enrich.hlsFlag(lit("http://x/st.mp3"))) == 0)
  }

  // P4 — `video_processor.py:186-192`
  test("file extension: last dot of path, query stripped, lowercased") {
    assert(eval(Enrich.fileExtension(lit("https://h/media/v.M4A?expire=1"))) == "m4a")
    assert(eval(Enrich.fileExtension(lit("https://h/media/v.x.webm"))) == "webm")
    assert(eval(Enrich.fileExtension(lit("https://h/media/noext?x=.mp3"))) == "")
    assert(eval(Enrich.fileExtension(lit("https://h/"))) == "")
  }

  // P5 — `video_processor.py:194-217`
  test("codec map with MP4A default; bitrate constant 128") {
    assert(eval(Enrich.codecFor(lit("webm"))) == "OPUS")
    assert(eval(Enrich.codecFor(lit("m3u8"))) == "HLS")
    assert(eval(Enrich.codecFor(lit("xyz"))) == "MP4A")
    assert(eval(Enrich.codecFor(lit(""))) == "MP4A")
    assert(eval(Enrich.bitrateFor(lit("mp3"))) == 128)
  }

  // P6 — `video_processor.py:219-224`
  test("tags: stopwords and short tokens dropped, first 6, comma-joined") {
    assert(eval(Enrich.tagsFromTitle(
      lit("The Official Video Song HD - Super Hit Tamil Melody Best Songs Forever"))) ==
      "super,hit,melody,best,songs,forever")
    assert(eval(Enrich.tagsFromTitle(lit("a an of to"))) == "")
  }

  // P7 — `video_processor.py:226-244`; note 'mal' substring-matches "normal"
  test("language: insertion-order substring indicators, Tamil default") {
    assert(eval(Enrich.languageFromTitle(lit("Best Hindi Hits"))) == "Hindi")
    assert(eval(Enrich.languageFromTitle(lit("normal day"))) == "Malayalam")
    assert(eval(Enrich.languageFromTitle(lit("nursery rhymes"))) == "Tamil")
    // 'tam' wins over 'eng' because tamil is checked first
    assert(eval(Enrich.languageFromTitle(lit("tamturbo english"))) == "Tamil")
    assert(eval(Enrich.languageCodeFromTitle(lit("english classics"))) == "ENGLI")
  }

  // P8 — `video_processor.py:246-251`
  test("filename: strip specials, collapse separators, default .m4a") {
    assert(eval(Enrich.filenameFor(lit("Hey! There - Now"), lit("http://h/x.ogg"))) ==
      "Hey_There_Now.ogg")
    assert(eval(Enrich.filenameFor(lit("a  b"), lit("http://h/noext"))) == "a_b.m4a")
  }

  // P9 — `video_processor.py:285`
  test("truncation keeps first n chars") {
    assert(eval(Enrich.truncate(lit("x" * 100), 80)) == "x" * 80)
  }

  // P11/P12 — `video_processor.py:289,102`
  test("fallbacks coalesce nulls only") {
    assert(eval(Enrich.faviconFor(lit(null).cast("string"))) ==
      "https://youtube.com/favicon.ico")
    assert(eval(Enrich.titleOrUnknown(lit(null).cast("string"))) == "Unknown Title")
    assert(eval(Enrich.titleOrUnknown(lit(""))) == "")
  }

  // P2 — `video_processor.py:32-37`
  test("dual timestamp format") {
    val ts = to_timestamp(lit("2024-03-01 10:20:30"))
    assert(eval(Enrich.fmtTs(ts)) == "2024-03-01T10:20:30")
    assert(eval(Enrich.fmtTsIso(ts)) == "2024-03-01T10:20:30Z")
  }
}
