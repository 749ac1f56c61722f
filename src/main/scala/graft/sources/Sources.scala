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
    *
    * BATCH ONLY: `Observation` rejects streaming Datasets — for a
    * streaming sink use [[withSinkMetricsStream]] +
    * [[SinkMetricsListener]].
    */
  def withSinkMetrics(df: DataFrame, resolvedCol: String):
      (DataFrame, org.apache.spark.sql.Observation) = {
    require(!df.isStreaming,
      "withSinkMetrics is batch-only (Observation rejects streaming frames); " +
        "use withSinkMetricsStream + SinkMetricsListener")
    val obs = org.apache.spark.sql.Observation()
    val cols = sinkMetricCols(resolvedCol)
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** Streaming variant of S6: the named `observe` overload is legal on
    * streaming frames, and per-microbatch metric rows surface through
    * `StreamingQueryProgress.observedMetrics` — attach a
    * [[SinkMetricsListener]] (or read `query.lastProgress`) to consume
    * them. Same metric columns as the batch path.
    */
  def withSinkMetricsStream(df: DataFrame, resolvedCol: String,
                            name: String = "sink_metrics"): DataFrame = {
    val cols = sinkMetricCols(resolvedCol)
    df.observe(name, cols.head, cols.tail: _*)
  }

  private def sinkMetricCols(resolvedCol: String): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    Seq(count(lit(1)).as("rows"),
      count(col(resolvedCol)).as("resolved"),
      sum(when(col(resolvedCol).isNull, 1L).otherwise(0L)).as("failed"))
  }

  /** Accumulates the observed sink metrics across microbatches (S6/G1
    * for the streaming path). Register with
    * `spark.streams.addListener(...)`; totals are monotone sums over all
    * progress events carrying the named metric row.
    */
  class SinkMetricsListener(name: String = "sink_metrics")
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._

    @volatile var rows: Long = 0L
    @volatile var resolved: Long = 0L
    @volatile var failed: Long = 0L

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val m = event.progress.observedMetrics
      if (m.containsKey(name)) {
        val r = m.get(name)
        rows += r.getAs[Long]("rows")
        resolved += r.getAs[Long]("resolved")
        failed += r.getAs[Long]("failed")
      }
    }
  }
}
