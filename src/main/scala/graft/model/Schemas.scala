package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Record shapes of the reference pipeline plus loaders for the driver's
  * test tables.
  *
  * Reference data model (see SURVEY.md §1):
  *  - link record: one URL per line (`video_processor.py:325-336`)
  *  - VideoInfo: 7 fields from the resolver (`video_processor.py:101-109`)
  *  - Station: 37-field output record (`video_processor.py:281-319`)
  */
object Schemas {

  /** Input link record (`video_processor.py:328-330`). */
  val link: StructType = StructType(Seq(StructField("url", StringType, nullable = false)))

  /** Resolver output (`video_processor.py:101-109`). `description`,
    * `duration`, `uploader`, `view_count` are extracted but dropped
    * downstream — kept here for fidelity of the intermediate shape.
    */
  val videoInfo: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("thumbnail", StringType),
    StructField("stream_url", StringType),
    StructField("duration", LongType),
    StructField("uploader", StringType),
    StructField("view_count", LongType)
  ))

  /** The 37-field station record (`video_processor.py:281-319`).
    * `hls`/`lastcheckok` are 0/1 ints, not booleans
    * (`video_processor.py:275,303`); timestamps are rendered as strings in
    * two formats (`video_processor.py:32-37`); `geo_*` are always-null
    * doubles (`video_processor.py:315-317`).
    */
  val station: StructType = StructType(Seq(
    StructField("changeuuid", StringType),
    StructField("stationuuid", StringType),
    StructField("serveruuid", StringType),
    StructField("name", StringType),
    StructField("url", StringType),
    StructField("url_resolved", StringType),
    StructField("homepage", StringType),
    StructField("favicon", StringType),
    StructField("tags", StringType),
    StructField("country", StringType),
    StructField("countrycode", StringType),
    StructField("state", StringType),
    StructField("language", StringType),
    StructField("languagecodes", StringType),
    StructField("votes", IntegerType),
    StructField("lastchangetime", StringType),
    StructField("lastchangetime_iso8601", StringType),
    StructField("codec", StringType),
    StructField("bitrate", IntegerType),
    StructField("file_name_from_url", StringType),
    StructField("hls", IntegerType),
    StructField("lastcheckok", IntegerType),
    StructField("lastchecktime", StringType),
    StructField("lastchecktime_iso8601", StringType),
    StructField("lastcheckoktime", StringType),
    StructField("lastcheckoktime_iso8601", StringType),
    StructField("lastlocalchecktime", StringType),
    StructField("lastlocalchecktime_iso8601", StringType),
    StructField("clicktimestamp", StringType),
    StructField("clicktimestamp_iso8601", StringType),
    StructField("clickcount", IntegerType),
    StructField("clicktrend", IntegerType),
    StructField("ssl_error", IntegerType),
    StructField("geo_lat", DoubleType),
    StructField("geo_long", DoubleType),
    StructField("geo_distance", DoubleType),
    StructField("has_extended_info", BooleanType)
  ))

  /** Column order of the station record, for stable projection. */
  val stationColumns: Seq[String] = station.fields.map(_.name).toSeq
}

/** Resolver-stage intermediate record (`video_processor.py:101-109`). */
case class VideoInfo(
    url: String,
    title: String,
    description: String,
    thumbnail: String,
    stream_url: String,
    duration: Long,
    uploader: String,
    view_count: Long)

/** Loaders for the driver-generated test tables (TESTDATA.md).
  * All reads go through parquet so Catalyst gets column pruning and
  * predicate pushdown for free.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  /** `events.ts` arrives in whatever physical form the test-data
    * generator chose that round; normalize every variant to a µs
    * TimestampType (LTZ) so downstream code sees ONE type:
    *  - TIMESTAMP(NANOS) parquet under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` reads as a
    *    ns-since-epoch long → rebuild via timestamp_micros;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as
    *    TIMESTAMP_NTZ → cast to timestamp (all sessions here pin the
    *    UTC session timezone, so the instant is unchanged). Left as
    *    NTZ it would poison every `withWatermark("ts", …)` downstream
    *    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — watermarks require LTZ).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
