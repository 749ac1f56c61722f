package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time windowing over the `events` stream — the Structured
  * Streaming surface the north star mandates. The same aggregations run
  * in batch mode as declared queries (w1/w2/w3 in RefQueries), which is
  * how the DuckDB oracle checks their semantics; these builders add the
  * watermark/output-mode plumbing a live stream needs.
  *
  * Scale notes: watermarks bound state; tumbling/sliding aggs shuffle on
  * (window, key) which is uniform; session windows shuffle on user_id —
  * skewed users would be the thing to watch at 100 TB (mitigate with a
  * session-id salt or `flatMapGroupsWithState` with per-key caps).
  */
object EventWindows {

  /** Tumbling 1 h counts per event type, 1 h late-data allowance. */
  def tumbling(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Sliding 1 h / 30 min counts per event type. */
  def sliding(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session windows, 30 min inactivity gap, per user. */
  def sessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Per-user running state via `mapGroupsWithState` — the custom-state
    * escape hatch (SURVEY.md §7 north star). Tracks a running count and
    * last-seen time per user, emitting one row per updated user per
    * trigger. State never expires here (`NoTimeout` — a timeout-driven
    * variant would set `ProcessingTimeTimeout` + `setTimeoutDuration`,
    * at the cost of the scheduler firing timeout batches forever, which
    * is also why the drain-based local tests use NoTimeout); production
    * deployments with unbounded key spaces should add the timeout.
    */
  case class UserActivity(userId: Long, events: Long, lastTs: java.sql.Timestamp)

  def userActivity(spark: SparkSession, events: DataFrame): Dataset[UserActivity] = {
    import spark.implicits._
    events.select(col("user_id").as[Long](org.apache.spark.sql.Encoders.scalaLong),
        col("ts").cast("timestamp").as("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(UserActivity(user, 0L, null))
          val batch = rows.toSeq
          val latest = (Option(prev.lastTs) ++ batch.map(_._2)).maxBy(_.getTime)
          val next = UserActivity(user, prev.events + batch.size, latest)
          state.update(next)
          next
      }
  }

  /** Drive any of the above to a memory sink and block until drained —
    * the local smoke path (file stream over the parquet-derived input).
    */
  def drainToMemory(spark: SparkSession, df: DataFrame, name: String,
                    mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
