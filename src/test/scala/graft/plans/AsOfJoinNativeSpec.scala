package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.AsOf
import graft.model.Tables

/** The native as-of operator must agree with the composed formulation
  * on planted edge cases and on real data, and its plan must show the
  * custom exec node fed by per-side exchanges.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  test("native as-of matches planted edge cases") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 205L), (2L, 50L), (3L, 7L)).toDF("k", "t")
    val right = Seq((1L, 90L), (1L, 100L), (1L, 210L), (2L, 60L)).toDF("k", "rt")
    val got = AsOfJoinNative.asOf(left, right, "k", "t", "rt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, 100L, 100L), (1L, 205L, 100L), (2L, 50L, -1L), (3L, 7L, -1L)))
  }

  test("forward as-of picks the earliest right row at or after each left time") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 205L), (2L, 50L), (3L, 7L)).toDF("k", "t")
    val right = Seq((1L, 90L), (1L, 100L), (1L, 210L), (2L, 40L)).toDF("k", "rt")
    val got = AsOfJoinNative.asOf(left, right, "k", "t", "rt", direction = "forward")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // (1,100): exact match 100; (1,205): next is 210; (2,50): 40 is in the
    // past -> none; (3,7): no key-3 rows
    assert(got == Set((1L, 100L, 100L), (1L, 205L, 210L), (2L, 50L, -1L), (3L, 7L, -1L)))
  }

  test("tolerance drops matches farther than the bound, in both directions") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 300L)).toDF("k", "t")
    val right = Seq((1L, 90L), (1L, 320L)).toDF("k", "rt")
    val back = AsOfJoinNative.asOf(left, right, "k", "t", "rt",
      toleranceUs = Some(15L)).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // t=100: 90 is within 15; t=300: latest ≤ is 90, 210 away -> null
    assert(back == Set((100L, 90L), (300L, -1L)))
    val fwd = AsOfJoinNative.asOf(left, right, "k", "t", "rt",
      direction = "forward", toleranceUs = Some(15L)).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // t=100: next ≥ is 320, 220 away -> null; t=300: 320 within 20? no, 20 > 15 -> null
    assert(fwd == Set((100L, -1L), (300L, -1L)))
    val fwdWide = AsOfJoinNative.asOf(left, right, "k", "t", "rt",
      direction = "forward", toleranceUs = Some(25L)).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(fwdWide == Set((100L, -1L), (300L, 320L)))
  }

  test("native as-of equals the composed as-of on events x orders") {
    val e = Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val o = Tables.orders(spark, sf())
      .select(col("o_custkey").as("user_id"), col("o_orderdate"))
    val native = AsOfJoinNative.asOf(e, o, "user_id", "ts", "o_orderdate")
      .select("event_id", "matched")
    val composed = AsOf.asOfTime(e, o, "user_id", "ts", "o_orderdate")
      .select("event_id", "matched")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() == e.count())
  }

  test("plan shows the custom exec node with per-side exchanges") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 90L)).toDF("k", "rt")
    val df = AsOfJoinNative.asOf(left, right, "k", "t", "rt")
    // the exec node renders with "Exec" stripped
    val p = df.queryExecution.executedPlan.treeString
    assert(p.contains("AsOfJoin"), p.take(1500))
    assert(p.contains("Exchange hashpartitioning") && p.contains("Sort ["), p.take(1500))
  }
}
