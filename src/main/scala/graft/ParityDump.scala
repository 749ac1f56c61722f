package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expr.Enrich

/** Dumps the enrichment-function outputs for a fixed adversarial input
  * set, so `tools/reference_parity.py` can diff them against the
  * reference implementation's own Python functions
  * (`video_processor.py`) — a direct behavioral-fidelity check that
  * covers unicode, odd URLs, and stopword edge cases the oracle's ASCII
  * tables never exercise. `runMain graft.ParityDump <outDir>`.
  */
object ParityDump {

  val titles: Seq[String] = Seq(
    "Best Tamil Melody Songs",
    "The Official Video Song HD - Super Hits",
    "a an of to in",
    "Hey! There - Now... (remix) [2024]",
    "café tamil déjà vu",                      // unicode letters
    "Tokyo 東京 hits",                          // CJK
    "MALAYALAM classics eng sub",
    "x" * 100,                                  // truncation
    "under_score and-dash  double  space",
    "normal day",                               // 'mal' substring
    "tamturbo english",                         // tamil-before-english order
    "123 456 7890 numbers only",
    "",
    "   ",
    "émigré naïve façade")

  val urls: Seq[String] = Seq(
    "https://cdn.example.org/media/1.m4a?expire=86400",
    "https://cdn.example.org/media/2.M3U8",
    "https://h/p/noext",
    "https://h/",
    "http://h/a.b.c.webm",
    "https://h/dot.at.end.",
    "example.com/v.mp3",                        // schemeless
    "file.OGG",                                 // bare filename
    "https://h/x.aac#frag",
    "https://h/q.mp4?x=.mp3")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/parity")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rows = for { t <- titles; u <- urls } yield (t, u)
    val df = rows.toDF("title", "url").select(
      col("title"), col("url"),
      Enrich.tagsFromTitle(col("title")).as("tags"),
      Enrich.languageFromTitle(col("title")).as("language"),
      Enrich.languageCodeFromTitle(col("title")).as("language_code"),
      Enrich.truncate(Enrich.filenameFor(col("title"), col("url")), 80).as("filename"),
      Enrich.fileExtension(col("url")).as("ext"),
      Enrich.codecFor(Enrich.fileExtension(col("url"))).as("codec"),
      Enrich.bitrateFor(Enrich.fileExtension(col("url"))).as("bitrate"),
      Enrich.hlsFlag(col("url")).as("hls"),
      Enrich.truncate(col("title"), 80).as("name80"))
    // keep null fields in the JSON: a regression to null must NOT read
    // back as the same as empty string in the parity diff
    df.coalesce(1).write.mode("overwrite")
      .option("ignoreNullFields", "false").json(out)
    println(s"parity dump: $out (${rows.size} rows)")
    spark.stop()
  }
}
