package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Station

/** Streaming incarnation of the reference pipeline (SURVEY.md §3 E2/E3).
  *
  * The reference is a cron-driven full recompute: every 2 h (or on input
  * change) it re-reads `links.txt`, re-enriches everything, and rewrites
  * one JSON array file committed by CI (`update-streams.yml:4-10,80-100`).
  * Spark-natively that is a file-source stream with
  * `Trigger.AvailableNow` (one drain per invocation — the cron analog) or
  * `Trigger.ProcessingTime("2 hours")` (long-running daemon analog), a
  * streaming dedup, and an idempotent `foreachBatch` sink that rewrites
  * the full output — checkpointed, so re-delivery can't double-publish
  * (the S5 "idempotent publish" contract).
  */
object StationStream {

  /** S1 as a stream: one text line per record from a watched directory. */
  def linkStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.text(inputDir)

  /** The full streaming pipeline: parse → streaming dedup → resolve →
    * filter → enrich.
    *
    * Dedup in motion uses `dropDuplicatesWithinWatermark` on a
    * processing-time column: links carry no event time, so state for a
    * URL can be dropped once the watermark passes — bounded state at
    * 100 TB-scale ingest, unlike an unbounded `dropDuplicates`
    * (`video_processor.py:330` only ever deduped within one batch).
    */
  def stations(links: DataFrame, resolve: DataFrame => DataFrame,
               ids: Column => Seq[(String, Column)] = Station.deterministicIds): DataFrame = {
    val parsed = Station.parseLinks(links)
      .withColumn("seen_at", current_timestamp())
      .withWatermark("seen_at", "2 hours")
      .dropDuplicatesWithinWatermark("url")
      .drop("seen_at")
    Station.enrich(
      Station.validResolutions(resolve(parsed))
        .withColumn("ts", current_timestamp()), ids)
  }

  /** S4: the full published station set as ONE JSON array file
    * (`video_processor.py:338-354`). Inherently a driver-side write —
    * the reference's output is a single small artifact (its scale is the
    * station list, not the data volume), so `collect()` here is the
    * correct tool, not an anti-pattern.
    *
    * Streaming batches are incremental (the file source reads each input
    * once), while the reference's contract is "the output file holds ALL
    * current stations" — so each batch MERGES into the existing file
    * keyed by `url` (new batch wins), never rewrites with only its own
    * rows. This also makes re-delivered batches idempotent (S5) and
    * makes the trailing empty watermark-advance batch of AvailableNow a
    * no-op (C6: never clobber output with an empty run,
    * `video_processor.py:411-416`).
    */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  /** Merge key: the parsed `url` field; rows without one key on their own
    * serialized form (self-identity — such a row is only replaced by an
    * identical row).
    */
  private def mergeKey(node: com.fasterxml.jackson.databind.JsonNode): String =
    if (node.hasNonNull("url")) node.get("url").asText
    else mapper.writeValueAsString(node)

  /** Python-parity escaping: identical to `json.dumps(...,
    * ensure_ascii=False)` — short escapes for the JSON control set,
    * `\\uXXXX` for other chars < 0x20, everything else raw UTF-8.
    */
  private def pyEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Renders a parsed node exactly as `json.dump(..., indent=2,
    * ensure_ascii=False)` does (the reference's write call,
    * `video_processor.py:347`): 2-space nesting, `": "` key separator,
    * empty containers inline, ints/bools/null byte-identical. (Floats
    * follow Jackson's shortest-round-trip rendering, which matches
    * Python `repr` for the values the pipeline emits.)
    */
  private def pyRender(node: com.fasterxml.jackson.databind.JsonNode, indent: Int): String = {
    import scala.jdk.CollectionConverters._
    val pad = " " * indent
    val childPad = " " * (indent + 2)
    if (node.isTextual) "\"" + pyEscape(node.asText) + "\""
    else if (node.isObject) {
      if (!node.fields().hasNext) "{}"
      else node.fields().asScala.map { e =>
        childPad + "\"" + pyEscape(e.getKey) + "\": " + pyRender(e.getValue, indent + 2)
      }.mkString("{\n", ",\n", "\n" + pad + "}")
    } else if (node.isArray) {
      if (node.size() == 0) "[]"
      else node.elements().asScala.map(e => childPad + pyRender(e, indent + 2))
        .mkString("[\n", ",\n", "\n" + pad + "]")
    } else node.toString
  }

  /** `pretty = true` writes the byte format of the reference's
    * `json.dump(stations, f, indent=2, ensure_ascii=False)`, so a user
    * diffing against the reference's committed `output.json` sees
    * identical bytes; the default stays the compact one-object-per-line
    * array (smaller, still a valid JSON array, and what the merge parser
    * reads back either way).
    */
  def writeJsonArray(batch: DataFrame, outFile: String, pretty: Boolean = false): Unit = {
    val rows = batch.toJSON.collect()
    val path = Paths.get(outFile)
    if (rows.nonEmpty || !Files.exists(path)) {
      // parse the existing array with Jackson (not line/regex heuristics):
      // survives re-formatting, hand edits, and other writers, and keys on
      // the actual url field
      val existing: Seq[(String, String)] =
        if (Files.exists(path)) {
          val txt = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
          try {
            val root = mapper.readTree(txt)
            if (root != null && root.isArray) {
              import scala.jdk.CollectionConverters._
              root.elements().asScala
                .map(e => (mergeKey(e), mapper.writeValueAsString(e))).toSeq
            } else {
              System.err.println(
                s"[StationStream] $outFile is not a JSON array; rewriting from this batch")
              Seq.empty
            }
          } catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              System.err.println(
                s"[StationStream] $outFile unparseable (${e.getMessage}); rewriting from this batch")
              Seq.empty
          }
        } else Seq.empty
      val newKeys = rows.map(r => mergeKey(mapper.readTree(r))).toSet
      val merged = existing.collect {
        case (k, json) if !newKeys.contains(k) => json
      } ++ rows
      val json =
        if (merged.isEmpty) "[]"
        else if (pretty)
          merged.map(s => "  " + pyRender(mapper.readTree(s), 2))
            .mkString("[\n", ",\n", "\n]")
        else merged.mkString("[\n  ", ",\n  ", "\n]")
      Files.createDirectories(path.toAbsolutePath.getParent)
      // write-temp-then-atomic-rename: a crash mid-write must never leave
      // a truncated array on disk — the parse fallback above would then
      // discard all accumulated output (C6: never clobber)
      val tmp = path.toAbsolutePath.getParent.resolve(path.getFileName.toString + ".tmp")
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
      try Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  /** E2/E3: start the checkpointed stream. `availableNow = true` mirrors
    * the cron batch (drain everything, exit); false runs the 2-hourly
    * daemon (C5).
    */
  def run(spark: SparkSession, inputDir: String, outFile: String,
          checkpointDir: String, resolve: DataFrame => DataFrame,
          availableNow: Boolean = true,
          interval: String = "2 hours",
          prettyJson: Boolean = false): StreamingQuery = {
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(interval)
    stations(linkStream(spark, inputDir), resolve)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeJsonArray(batch, outFile, prettyJson)
      }
      .start()
  }
}
