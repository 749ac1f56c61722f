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

  test("flag on: small-range groups are exact (linear counting), empty is 0") {
    withFlag(on = true) {
      // ADVICE r6: the raw estimator maps an empty register file to
      // ~184 and a 1-distinct group to ~184 too — linear counting must
      // return exact small counts instead.
      val df = spark.range(100).select(
        (col("id") % 4).as("g"),
        when(col("id") % 4 === 0, lit(null).cast("string"))     // group 0: all null
          .when(col("id") % 4 === 1, lit("only"))               // group 1: 1 distinct
          .when(col("id") % 4 === 2, concat(lit("lo"), col("id") % 20)) // group 2: 5 distinct
          .otherwise(concat(lit("t"), col("id"))).as("s"))      // group 3: 25 distinct
      val got = df.groupBy("g").agg(countDistinct(col("s")).as("nd"))
      assert(got.queryExecution.optimizedPlan.toString.contains("hll_count_distinct"))
      val m = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m(0L) == 0L, s"empty group estimated ${m(0L)}")
      assert(m(1L) == 1L, s"1-distinct group estimated ${m(1L)}")
      // linear counting is exact-ish but not guaranteed exact; at these
      // cardinalities vs m=256 it is in practice exact
      assert(m(2L) == 5L, s"5-distinct group estimated ${m(2L)}")
      assert(math.abs(m(3L) - 25L) <= 2, s"25-distinct group estimated ${m(3L)}")
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
