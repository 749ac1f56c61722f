package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The opt-in approx-distinct optimizer rule: off by default (exact
  * plans, exact results — every declared oracle row depends on this),
  * and with the session flag on, `count(DISTINCT string)` plans swap to
  * the HLL aggregate and land within the m=256 error envelope.
  */
class ApproxDistinctSpec extends SparkSpec {

  private def withFlag[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.approxCountDistinct", on.toString)
    try f finally spark.conf.unset("spark.graft.approxCountDistinct")
  }

  private val n = 10000L

  private def terms = spark.range(n)
    .select(concat(lit("t"), col("id")).as("s"), (col("id") % 4).as("g"))

  test("flag off: count distinct stays exact and the plan has no hll") {
    val df = terms.agg(countDistinct(col("s")).as("nd"))
    assert(df.collect()(0).getLong(0) == n)
    assert(!df.queryExecution.optimizedPlan.toString.contains("hll_count_distinct"))
  }

  test("flag on: the plan swaps to hll_count_distinct and estimates inside the envelope") {
    withFlag(on = true) {
      val df = terms.agg(countDistinct(col("s")).as("nd"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("hll_count_distinct"), plan.take(500))
      assert(!plan.contains("count(distinct"), plan.take(500))
      val est = df.collect()(0).getLong(0)
      // raw HLL at m=256 is ~6.5% sigma; 20% is a 3-sigma envelope
      assert(math.abs(est - n).toDouble / n < 0.2, s"estimate $est vs $n")
      // grouped aggregates rewrite too, per group
      val grouped = terms.groupBy("g").agg(countDistinct(col("s")).as("nd"))
      assert(grouped.queryExecution.optimizedPlan.toString.contains("hll_count_distinct"))
      grouped.collect().foreach { r =>
        assert(math.abs(r.getLong(1) - n / 4).toDouble / (n / 4) < 0.2)
      }
    }
  }

  test("flag on leaves non-string, filtered, and plain counts alone") {
    withFlag(on = true) {
      // non-string distinct: untouched (register hash is defined on strings)
      val longs = terms.agg(countDistinct(col("g")).as("nd"))
      assert(!longs.queryExecution.optimizedPlan.toString.contains("hll_count_distinct"))
      assert(longs.collect()(0).getLong(0) == 4L)
      // plain (non-distinct) count: untouched
      val plain = terms.agg(count(col("s")).as("c"))
      assert(!plain.queryExecution.optimizedPlan.toString.contains("hll_count_distinct"))
      assert(plain.collect()(0).getLong(0) == n)
      // FILTER clause: untouched (the rewrite only covers the bare shape)
      val filtered = terms.agg(
        count_distinct(col("s")).as("a"),
        expr("count(DISTINCT s) FILTER (WHERE g = 0)").as("f"))
      val plan = filtered.queryExecution.optimizedPlan.toString
      assert(plan.contains("hll_count_distinct")) // the bare one rewrote
      val row = filtered.collect()(0)
      assert(row.getLong(1) == n / 4) // the filtered one stayed exact
    }
  }
}
