package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input-side utilities (SURVEY.md §2.1).
  *
  * S2 — source pre-flight guard (`video_processor.py:404-406,331-333`):
  * the reference exits 1 when `links.txt` is missing; here a missing
  * input surfaces as an IllegalArgumentException before any job runs,
  * instead of a mid-plan AnalysisException.
  */
object Sources {

  /** Batch link-file source with the S2 pre-flight check. */
  def linkFile(spark: SparkSession, path: String): DataFrame = {
    require(Files.exists(Paths.get(path)), s"input link file not found: $path")
    spark.read.text(path)
  }

  /** Streaming link-directory source with the S2 pre-flight check. */
  def linkStream(spark: SparkSession, dir: String): DataFrame = {
    require(Files.isDirectory(Paths.get(dir)), s"input link directory not found: $dir")
    spark.readStream.text(dir)
  }

  /** S6 — sink validation / count (`update-streams.yml:49-72`): the
    * reference re-reads the written file and counts entries; Spark-native
    * is an in-flight `observe` — metrics ride the job that writes, no
    * second scan. Returns the instrumented frame plus the observation
    * handle (`obs.get` after the action). Also covers G1's run counters
    * without an accumulator side channel.
    */
  def withSinkMetrics(df: DataFrame, resolvedCol: String):
      (DataFrame, org.apache.spark.sql.Observation) = {
    import org.apache.spark.sql.functions._
    val obs = org.apache.spark.sql.Observation()
    (df.observe(obs,
      count(lit(1)).as("rows"),
      count(col(resolvedCol)).as("resolved"),
      sum(when(col(resolvedCol).isNull, 1L).otherwise(0L)).as("failed")), obs)
  }
}
