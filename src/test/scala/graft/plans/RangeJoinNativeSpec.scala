package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** The native sweep range join must agree with the bucketized composed
  * formulation on planted edge cases and on real data, with a broadcast
  * of the interval side and no shuffle of the point side.
  */
class RangeJoinNativeSpec extends SparkSpec {

  test("native range join handles boundaries, nesting, nulls, empty intervals") {
    import spark.implicits._
    val points = Seq(
      (1L, Some(0.0)), (2L, Some(10.0)), (3L, Some(25.0)), (4L, Some(19.999)),
      (5L, None), (6L, Some(-5.0)), (7L, Some(100.0))).toDF("pid", "p")
      .select(col("pid"), col("p").cast("double").as("p"))
    val ivs = Seq(
      (10L, Some(0.0), Some(20.0)),   // [0, 20): catches 1, 2, 4
      (11L, Some(10.0), Some(30.0)),  // [10, 30): catches 2, 3, 4
      (12L, Some(5.0), Some(5.0)),    // empty: catches nothing
      (13L, None, Some(50.0)),        // null lo: dropped
      (14L, Some(0.0), None)          // null hi: dropped
    ).toDF("iid", "lo", "hi")
      .select(col("iid"), col("lo").cast("double").as("lo"), col("hi").cast("double").as("hi"))
    val got = RangeJoinNative.pointsInIntervals(points, ivs, "p", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 10L), (4L, 11L)))
  }

  test("native range join equals the bucketized composed join on events") {
    val bands = spark.range(20).select(col("id").as("band_id"),
      (col("id") * lit(25.0)).as("lo"), (col("id") * lit(25.0) + lit(37.5)).as("hi"))
    val pts = Tables.events(spark, sf())
      .select(col("event_id"), col("value").cast("double").as("value"))
    val native = RangeJoinNative.pointsInIntervals(pts, bands, "value", "lo", "hi")
      .select("event_id", "band_id")
    val composed = graft.ext.RangeJoin.pointsInIntervals(spark, pts, bands,
      "value", "lo", "hi", bucketWidth = 25.0)
      .select("event_id", "band_id")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() == composed.count())
  }

  test("plan broadcasts the interval side and adds no exchange on the point side") {
    import spark.implicits._
    val points = Seq((1L, 1.0)).toDF("pid", "p")
    val ivs = Seq((1L, 0.0, 2.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoinNative.pointsInIntervals(points, ivs, "p", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin")) // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle:\n$plan")
  }
}
