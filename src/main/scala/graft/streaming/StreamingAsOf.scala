package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stream-stream incarnation of
  * [[graft.ext.AsOf]]. Spark's built-in stream-stream joins only
  * support range predicates, not "latest right ≤ left time", so this is
  * the `flatMapGroupsWithState` formulation: per key, keep the
  * time-ordered history of right-side events in state; each left event
  * emits the latest right time at or before it.
  *
  * Semantics/limits (documented, asserted in tests):
  *  - Both sides union into one keyed stream; within a microbatch events
  *    process in time order (ties: right before left, matching the batch
  *    operator's exact-time visibility).
  *  - A left event emits IMMEDIATELY with the best match seen so far —
  *    a right event that arrives in a LATER batch with an earlier
  *    timestamp does not retract the emitted row (append mode cannot
  *    retract). Feed right-before-left (the enrichment pattern: slowly
  *    changing dimension stream + fact stream) for batch-exact results.
  *  - State per key is the right-side history. `pruneBelow` drops
  *    entries strictly below a caller-supplied horizon minus one (the
  *    latest entry at or below the horizon must survive — it is still
  *    the match for future lefts), bounding state like a watermark
  *    would; at 100 TB keys this is the difference between O(rights)
  *    and O(1)-ish state.
  *  - Rows with a null key/ts/leftId are DROPPED on both sides (the
  *    typed `Ev` pipeline has primitive Long fields, so a null would
  *    otherwise NPE inside the running streaming query).
  */
object StreamingAsOf {

  /** Tagged event: `side` 0 = right (enrichment), 1 = left (probe). */
  case class Ev(key: Long, ts: Long, side: Int, leftId: Long)

  /** Output: every left event with the matched right time (null → None). */
  case class Matched(leftId: Long, key: Long, matched: Option[Long])

  /** Internal state: ascending right-side timestamps per key. */
  private def step(pruneBelow: Long)(
      key: Long, it: Iterator[Ev], state: GroupState[List[Long]]): Iterator[Matched] = {
    var rights = state.getOption.getOrElse(Nil) // ascending
    val out = scala.collection.mutable.ListBuffer[Matched]()
    // time order; right (side 0) before left at equal ts
    it.toSeq.sortBy(e => (e.ts, e.side)).foreach { e =>
      if (e.side == 0) {
        // insert keeping ascending order (appends are O(1) for in-order
        // arrival, the common case)
        rights =
          if (rights.isEmpty || rights.last <= e.ts) rights :+ e.ts
          else (rights :+ e.ts).sorted
      } else {
        val m = rights.takeWhile(_ <= e.ts).lastOption
        out += Matched(e.leftId, key, m)
      }
    }
    // prune: everything strictly below the horizon except the newest
    // such entry (still the as-of match for lefts at/above the horizon)
    val (below, above) = rights.partition(_ < pruneBelow)
    state.update(below.lastOption.toList ++ above)
    out.iterator
  }

  /** Wires `left` (key, ts, leftId) and `right` (key, ts) streams into
    * the stateful as-of. `pruneBelow` is the state-retention horizon in
    * the same units as `ts` (epoch micros); pass Long.MinValue to keep
    * everything.
    */
  def asOfStream(left: DataFrame, right: DataFrame,
                 pruneBelow: Long = Long.MinValue): Dataset[Matched] = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left
      .filter(col("key").isNotNull && col("ts").isNotNull && col("leftId").isNotNull)
      .select(col("key").cast("long"), col("ts").cast("long"),
        lit(1).as("side"), col("leftId").cast("long"))
    val r = right.filter(col("key").isNotNull && col("ts").isNotNull)
      .select(col("key").cast("long"), col("ts").cast("long"),
        lit(0).as("side"), lit(-1L).as("leftId"))
    l.unionByName(r).as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        step(pruneBelow))
  }
}
