package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables

/** Beyond-reference analytics breadth — the relational surface a user of
  * a complete engine expects (top-k, grouping sets, set operations,
  * semi/anti joins, ranking windows, JSON extraction), each
  * oracle-mirrored. Naming: a<N>_<op>.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  // --- a1: global top-k (ORDER BY ... LIMIT) --------------------------------

  val a1TopOrders: Q = (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(10)

  private val a1Sql =
    """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin

  // --- a2: rollup (grouping sets) -------------------------------------------

  /** ROLLUP over (returnflag, linestatus); grouping nulls are coalesced to
    * 'ALL' so the total order behaves identically in both engines (Spark
    * sorts nulls first, DuckDB last).
    */
  val a2Rollup: Q = (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  private val a2Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // --- a17: cube + grouping_id -------------------------------------------------

  /** Full cube over (returnflag, linestatus) with the standard
    * `grouping_id` bit-vector disambiguating aggregated-away NULLs from
    * data NULLs (both engines follow the SQL-standard bit order).
    */
  val a17Cube: Q = (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("gid").cast("long").as("gid"), col("n"))
      .orderBy("gid", "rf", "ls")

  private val a17Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, rf, ls""".stripMargin

  // --- a3: set operations ----------------------------------------------------

  /** Customers that bought (semi via INTERSECT) minus a price-band cohort
    * (EXCEPT).
    */
  val a3SetOps: Q = (spark, sfDir) => {
    val o = Tables.orders(spark, sfDir)
    val big = o.filter(col("o_totalprice") > 100000).select(col("o_custkey").as("ck"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("ck"))
    val recent = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey").as("ck"))
    big.intersect(urgent).except(recent).orderBy("ck")
  }

  private val a3Sql =
    """(SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 100000
      | INTERSECT
      | SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT')
      |EXCEPT
      |SELECT o_custkey AS ck FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |ORDER BY ck""".stripMargin

  // --- a4: semi / anti joins --------------------------------------------------

  /** Customers partitioned into buyers (EXISTS) and dormant (NOT EXISTS),
    * via left_semi/left_anti + union.
    */
  val a4SemiAnti: Q = (spark, sfDir) => {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val buyers = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("buyer").as("segment"))
    val dormant = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("dormant").as("segment"))
    buyers.unionAll(dormant).orderBy("c_custkey")
  }

  private val a4Sql =
    """SELECT c_custkey, 'buyer' AS segment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'dormant' AS segment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --- a5: ranking window over aggregates --------------------------------------

  /** Suppliers dense-ranked by total shipped quantity (aggregate first →
    * unique keys → deterministic rank). The global rank is computed by
    * [[graft.ext.Ranking.denseRankDesc]] — range-partition +
    * partition-offset merge — instead of an unpartitioned window, which
    * would move every row to a single task.
    */
  val a5SupplierRank: Q = (spark, sfDir) => {
    val per = Tables.lineitem(spark, sfDir)
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    graft.ext.Ranking.denseRankDesc(per, "qty", "rnk")
      .select(col("l_suppkey"), col("qty"), col("rnk"))
      .orderBy("l_suppkey")
  }

  private val a5Sql =
    """WITH per AS (
      |  SELECT l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY l_suppkey
      |)
      |SELECT l_suppkey, qty,
      |  CAST(dense_rank() OVER (ORDER BY qty DESC) AS BIGINT) AS rnk
      |FROM per ORDER BY l_suppkey""".stripMargin

  // --- a6: JSON extraction -------------------------------------------------------

  /** The props JSON column → typed value (radio-station API records are
    * JSON; this is the parse side).
    */
  val a6JsonExtract: Q = (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  private val a6Sql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  // --- a7: as-of (point-in-time) join ---------------------------------------

  /** Each event matched to the latest order of the same customer at or
    * before the event time — composed as union + running last_value (one
    * shuffle on the key; see [[graft.ext.AsOf]]), oracle-checked against
    * DuckDB's native ASOF LEFT JOIN.
    */
  val a7AsofJoin: Q = (spark, sfDir) => {
    val e = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"))
    graft.ext.AsOf.asOfTime(e, o, "user_id", "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"), col("matched"))
      .orderBy("event_id")
  }

  private val a7Sql =
    """SELECT e.event_id, e.user_id, o.o_orderdate AS matched
      |FROM events e ASOF LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  // --- a8: salted two-phase aggregation ---------------------------------------

  /** Skew-mitigated count: salt → partial → merge. The oracle is the
    * plain GROUP BY — the whole point is that the salted plan produces
    * identical results.
    */
  val a8SaltedCounts: Q = (spark, sfDir) =>
    graft.ext.Skew.saltedCounts(Tables.events(spark, sfDir), "event_type", 8)
      .orderBy("event_type")

  private val a8Sql =
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type"

  // --- a10: native as-of join (custom LogicalPlan + Strategy + ExecNode) ------

  /** Identical semantics and oracle to a7, but executed by the native
    * [[graft.plans.AsOfJoinExec]] operator — one exchange + sort per
    * side, O(|L|+|R|) merge per partition.
    */
  val a10AsofNative: Q = (spark, sfDir) => {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"))
    graft.plans.AsOfJoinNative.asOf(e, o, "user_id", "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"), col("matched"))
      .orderBy("event_id")
  }

  // --- a14/a15: as-of directions and tolerance (pandas merge_asof parity) -----

  /** Forward as-of: for each event, the EARLIEST order date ≥ ts of the
    * same user. The oracle is the plain min-aggregated theta join (fine
    * at oracle scale; the operator is the scalable formulation).
    */
  val a14AsofForward: Q = (spark, sfDir) => {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"))
    graft.plans.AsOfJoinNative.asOf(e, o, "user_id", "ts", "o_orderdate",
      direction = "forward")
      .select(col("event_id"), col("user_id"), col("matched"))
      .orderBy("event_id")
  }

  private val a14Sql =
    """SELECT e.event_id, e.user_id, min(o.o_orderdate) AS matched
      |FROM events e LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
      |GROUP BY e.event_id, e.user_id
      |ORDER BY e.event_id""".stripMargin

  /** Backward as-of with a 30-day tolerance: latest order within
    * [ts − 30d, ts].
    */
  val a15AsofTolerance: Q = (spark, sfDir) => {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"))
    graft.plans.AsOfJoinNative.asOf(e, o, "user_id", "ts", "o_orderdate",
      toleranceUs = Some(30L * 86400 * 1000000))
      .select(col("event_id"), col("user_id"), col("matched"))
      .orderBy("event_id")
  }

  private val a15Sql =
    """SELECT e.event_id, e.user_id, max(o.o_orderdate) AS matched
      |FROM events e LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
      |  AND o.o_orderdate >= e.ts - INTERVAL 30 DAY
      |GROUP BY e.event_id, e.user_id
      |ORDER BY e.event_id""".stripMargin

  // --- a16: running / framed window aggregates ---------------------------------

  /** Per-customer running order-value sum, previous order gap (lag), and
    * a centered 3-order moving count — the window-frame breadth beyond
    * a5's ranking.
    */
  val a16RunningWindows: Q = (spark, sfDir) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val cents = round(col("o_totalprice") * 100).cast("long")
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), cents.as("price_e2"))
      .withColumn("running_e2",
        sum("price_e2").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_order", lag("o_orderkey", 1).over(w))
      .withColumn("win3",
        count(lit(1)).over(w.rowsBetween(-1, 1)))
      .orderBy("o_orderkey")
  }

  // The outer CAST wraps the whole window expression: DuckDB's windowed
  // sum(BIGINT) widens to HUGEINT (arrow decimal128), which the driver
  // hashes differently from Spark's int64 even when values are equal.
  private val a16Sql =
    """SELECT o_orderkey, o_custkey,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_e2,
      |  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_order,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS win3
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // --- a9: range (interval) join ----------------------------------------------

  /** Events matched to every overlapping value band — bucketized
    * equi-join (see [[graft.ext.RangeJoin]]), never a nested loop.
    */
  val a9RangeJoin: Q = (spark, sfDir) => {
    val bands = spark.range(20).select(col("id").as("band_id"),
      (col("id") * lit(25.0)).as("lo"), (col("id") * lit(25.0) + lit(37.5)).as("hi"))
    graft.ext.RangeJoin.pointsInIntervals(spark,
      Tables.events(spark, sfDir).select("event_id", "value"), bands,
      "value", "lo", "hi", bucketWidth = 25.0)
      .select("event_id", "band_id")
      .orderBy("event_id", "band_id")
  }

  private val a9Sql =
    """WITH bands AS (
      |  SELECT range AS band_id, range*25.0 AS lo, range*25.0 + 37.5 AS hi FROM range(20)
      |)
      |SELECT e.event_id, b.band_id
      |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
      |ORDER BY event_id, band_id""".stripMargin

  // --- a13: native range join ---------------------------------------------------

  /** Same query as a9 through the native sweep operator
    * ([[graft.plans.RangeJoinNative]]): broadcast intervals, zero shuffle
    * of the point side, O(n + m log m + output) per partition.
    */
  val a13RangeJoinNative: Q = (spark, sfDir) => {
    val bands = spark.range(20).select(col("id").as("band_id"),
      (col("id") * lit(25.0)).as("lo"), (col("id") * lit(25.0) + lit(37.5)).as("hi"))
    graft.plans.RangeJoinNative.pointsInIntervals(
      Tables.events(spark, sfDir).select(col("event_id"), col("value").cast("double").as("value")),
      bands, "value", "lo", "hi")
      .select("event_id", "band_id")
      .orderBy("event_id", "band_id")
  }

  // --- a11: pivot --------------------------------------------------------------

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Per-user event-type matrix via `pivot`; absent combinations
    * coalesced to 0 to match the FILTER-count oracle.
    */
  val a11Pivot: Q = (spark, sfDir) => {
    val pivoted = Tables.events(spark, sfDir)
      .groupBy("user_id").pivot("event_type", eventTypes).agg(count(lit(1)))
    pivoted.select(col("user_id") +:
      eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_id")
  }

  private val a11Sql =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'error') AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- a12: exact percentiles ----------------------------------------------------

  /** Exact linear-interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont` — both use the (n−1)·p convention).
    */
  val a12Quantiles: Q = (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"))
      .orderBy("l_returnflag")

  private val a12Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.9) AS p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --- a18: unpivot / melt -------------------------------------------------------

  /** Wide per-flag measures melted to (flag, measure, value) — the
    * relational unpivot surface. Money sums in exact integer cents so
    * both engines agree bit-for-bit regardless of summation order.
    */
  val a18Unpivot: Q = (spark, sfDir) => {
    val wide = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity")).cast("long").as("qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("price_e2"),
        count(lit(1)).as("n"))
    wide.unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("price_e2"), col("n")), "measure", "value")
      .orderBy("l_returnflag", "measure")
  }

  private val a18Sql =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(sum(l_quantity) AS BIGINT) AS qty,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_e2,
      |    count(*) AS n
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM wide
      |UNION ALL SELECT l_returnflag, 'price_e2' AS measure, price_e2 AS value FROM wide
      |UNION ALL SELECT l_returnflag, 'n' AS measure, n AS value FROM wide
      |ORDER BY l_returnflag, measure""".stripMargin

  // --- a19: window navigation (ntile / percent_rank / cume_dist) -----------------

  /** Distribution-style window functions per customer — all windows
    * PARTITIONED (the PlanSpec gate forbids the unpartitioned kind);
    * fractional ranks rounded to 6 dp for engine-stable hashing.
    */
  val a19WindowNav: Q = (spark, sfDir) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .withColumn("nt", ntile(4).over(w))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .orderBy("o_orderkey")
  }

  private val a19Sql =
    """SELECT o_orderkey, o_custkey,
      |  CAST(ntile(4) OVER w AS INT) AS nt,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // --- a20: salted skew join -----------------------------------------------------

  /** Events joined to their customer's nation through the SALTED join
    * ([[graft.ext.Skew.saltedJoin]], 8 salts) — the skewed-fact-table
    * mitigation when the dimension can't broadcast. The oracle is the
    * plain join: salting must be invisible in the result.
    */
  val a20SaltedJoin: Q = (spark, sfDir) => {
    val e = Tables.events(spark, sfDir).select(col("user_id"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    graft.ext.Skew.saltedJoin(e, c, "user_id", 8)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  private val a20Sql =
    """SELECT c_nationkey, count(*) AS n
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // --- a21: value-based RANGE window frames ----------------------------------------

  /** Per customer, for each order: how many of their orders (and how
    * much total) fall within $10.00 BELOW this order's price — a
    * value-based `RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW` frame,
    * deterministic because the frame is defined by the ORDER BY value
    * itself (peers share identical results, no tie ambiguity).
    */
  val a21RangeFrames: Q = (spark, sfDir) => {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val w = Window.partitionBy("o_custkey").orderBy("price_e2")
      .rangeBetween(-1000L, 0L)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), cents.as("price_e2"))
      .withColumn("near_cnt", count(lit(1)).over(w))
      .withColumn("near_sum_e2", sum("price_e2").over(w).cast("long"))
      .orderBy("o_orderkey")
  }

  private val a21Sql =
    """WITH t AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2
      |  FROM orders
      |)
      |SELECT o_orderkey, o_custkey, price_e2,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY price_e2
      |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS near_cnt,
      |  CAST(sum(price_e2) OVER (PARTITION BY o_custkey ORDER BY price_e2
      |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_sum_e2
      |FROM t ORDER BY o_orderkey""".stripMargin

  // --- a22: conditional / boolean / exact-median aggregates -------------------------

  /** Aggregate-function breadth: conditional count, boolean aggregates,
    * exact median per status. Median interpolation of two doubles is
    * rounded to 4 dp (inputs carry 2 decimal digits, so the midpoint has
    * at most 3 — the rounding is exact, not a fudge).
    */
  val a22MiscAggs: Q = (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(
        count(when(col("o_totalprice") > 150000, 1)).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_totalprice") > 400000).as("any_huge"),
        round(median(col("o_totalprice")), 4).as("med_price"))
      .orderBy("o_orderstatus")

  private val a22Sql =
    """SELECT o_orderstatus,
      |  CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  bool_or(o_totalprice > 400000) AS any_huge,
      |  round(median(o_totalprice), 4) AS med_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --- a23: explicit GROUPING SETS ------------------------------------------------

  /** Arbitrary grouping-set lattice — the general form that ROLLUP (a2)
    * and CUBE (a17) are shorthands of, via the Spark 4 `groupingSets`
    * Dataset API. One pass over orders produces all three granularities
    * (priority×status, priority, grand total); Catalyst expands the
    * sets before aggregation so partial (map-side) aggregation still
    * applies per set. Money in exact integer cents (a18's discipline)
    * so summation order can't drift the hash.
    */
  val a23GroupingSets: Q = (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq.empty[org.apache.spark.sql.Column]),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("price_e2"),
        grouping_id().as("g"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        col("g").cast("long").as("gid"), col("n"), col("price_e2"))
      .orderBy("gid", "pri", "st")

  private val a23Sql =
    """SELECT coalesce(o_orderpriority, 'ALL') AS pri,
      |  coalesce(o_orderstatus, 'ALL') AS st,
      |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_e2
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, pri, st""".stripMargin

  // --- a26: window distribution functions ------------------------------------------

  /** ntile / percent_rank / cume_dist over per-priority windows.
    * `o_orderkey` is unique (verified in the generated data), so window
    * order is total and the rank-ratio doubles are single divisions of
    * exact integers — bit-identical across engines. Windows partition
    * by priority (5-way parallel, never single-partition).
    */
  val a26WindowDist: Q = (spark, sfDir) => {
    val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("o_orderkey")
  }

  private val a26Sql =
    """SELECT o_orderpriority, o_orderkey,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM orders
      |WHERE o_orderkey % 10 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // --- a27: per-user rolling 7-day time-RANGE window --------------------------------

  /** Trailing-week activity per event: count and money-sum of each
    * user's events in the 7 days up to (and including) this one —
    * a value-based RANGE frame over epoch seconds, partitioned by user
    * (never single-partition). Money rides as exact integer cents so
    * in-frame summation order can't drift the hash; same-second events
    * are frame peers in both engines.
    */
  val a27RollingEvents: Q = (spark, sfDir) => {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("es"),
        round(col("value") * 100).cast("long").as("v2"))
    val w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-604800L, 0L)
    ev.select(col("event_id"), col("user_id"), col("es"),
        count(lit(1)).over(w).as("n_7d"),
        sum(col("v2")).over(w).as("v2_7d"))
      .orderBy("event_id")
  }

  private val a27Sql =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    CAST(round(value * 100) AS BIGINT) AS v2
      |  FROM events
      |)
      |SELECT event_id, user_id, es,
      |  count(*) OVER w AS n_7d,
      |  CAST(sum(v2) OVER w AS BIGINT) AS v2_7d
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY es
      |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // --- a24: weekly cohort retention -----------------------------------------------

  /** Cohort analysis: users bucketed by first-seen week; for each
    * (cohort, weeks-since-cohort offset), distinct returning users.
    * Week keys are epoch seconds (the engine-portable window-key
    * pattern from w1) and the offset is integer division of exact
    * epoch deltas. Two aggregations + one equi-join on user_id — the
    * user dimension shuffles once, and the per-(cohort, k) counts are
    * partial-aggregated.
    */
  val a24CohortRetention: Q = (spark, sfDir) => {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(date_trunc("week", col("ts"))).as("wk"))
    val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    val active = ev.distinct()
    active.join(cohort, "user_id")
      .select(col("cohort"), expr("(wk - cohort) div 604800").as("k"), col("user_id"))
      .groupBy("cohort", "k")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "k")
  }

  private val a24Sql =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS wk
      |  FROM events
      |), cohort AS (
      |  SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id
      |), active AS (
      |  SELECT DISTINCT user_id, wk FROM ev
      |)
      |SELECT cohort, (wk - cohort) // 604800 AS k,
      |  count(DISTINCT user_id) AS n_users
      |FROM active JOIN cohort USING (user_id)
      |GROUP BY cohort, k ORDER BY cohort, k""".stripMargin

  // --- a25: ordered funnel --------------------------------------------------------

  /** Strictly-ordered conversion funnel signup → click → purchase: a
    * user advances a step only if that event's FIRST occurrence is
    * after the previous step's first occurrence. One conditional
    * min-aggregation per user (single shuffle), then a global count —
    * timestamps compare as exact µs integers, no float anywhere.
    */
  val a25Funnel: Q = (spark, sfDir) => {
    val m = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    m.select(
      sum(when(col("t_signup").isNotNull, 1L).otherwise(0L)).as("n_signup"),
      sum(when(col("t_signup").isNotNull && col("t_click") > col("t_signup"), 1L)
        .otherwise(0L)).as("n_click_after"),
      sum(when(col("t_signup").isNotNull && col("t_click") > col("t_signup") &&
        col("t_purchase") > col("t_click"), 1L).otherwise(0L)).as("n_purchase_after"))
  }

  private val a25Sql =
    """WITH m AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id
      |)
      |SELECT
      |  CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after,
      |  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
      |    AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after
      |FROM m""".stripMargin

  // --- assembled maps -------------------------------------------------------------

  // --- a28: local supplier volume (TPC-H Q5 shape) ---------------------------

  /** The classic 6-table star: revenue per nation where the customer and
    * the supplier share the nation, restricted to one region. Exercises
    * the canonical warehouse plan — fact table joined to four broadcast
    * dimensions plus an equi-constraint BETWEEN dimensions
    * (c_nationkey = s_nationkey rides the customer join condition, so
    * Catalyst keeps every join a BroadcastHashJoin and the region
    * filter prunes before anything shuffles). Money is fixed-point
    * BIGINT e4 units (the q3 discipline — double→decimal cast rounding
    * varies across engines).
    */
  val a28LocalVolume: Q = (spark, sfDir) => {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    val revE4 = sum(
      round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long")))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(revE4.as("revenue_e4"), count(lit(1)).as("n"))
      .orderBy("n_name")
  }

  private val a28Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
      |  count(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --- a29: bilateral trade volume (TPC-H Q7 shape) --------------------------

  /** Nation-pair shipping flows by year: the nation dimension joins the
    * fact TWICE under different roles (supplier's nation vs customer's
    * nation) — the self-joined-dimension pattern Q5 doesn't cover —
    * and the pair inequality keeps only cross-border flows. Both
    * nation joins broadcast; output is |nations|²·|years| bounded.
    */
  val a29TradeVolume: Q = (spark, sfDir) => {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val revE4 = sum(
      round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long")))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).as("yr"))
      .agg(revE4.as("revenue_e4"), count(lit(1)).as("n"))
      .orderBy("supp_nation", "cust_nation", "yr")
  }

  private val a29Sql =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  year(o_orderdate) AS yr,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
      |  count(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE sn.n_name != cn.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  val queries: Map[String, Q] = Map(
    "a1_top_orders" -> a1TopOrders,
    "a2_rollup" -> a2Rollup,
    "a3_setops" -> a3SetOps,
    "a4_semi_anti" -> a4SemiAnti,
    "a5_supplier_rank" -> a5SupplierRank,
    "a6_json_extract" -> a6JsonExtract,
    "a7_asof_join" -> a7AsofJoin,
    "a8_salted_counts" -> a8SaltedCounts,
    "a9_range_join" -> a9RangeJoin,
    "a28_local_volume" -> a28LocalVolume,
    "a29_trade_volume" -> a29TradeVolume,
    "a10_asof_native" -> a10AsofNative,
    "a11_pivot" -> a11Pivot,
    "a12_quantiles" -> a12Quantiles,
    "a13_range_join_native" -> a13RangeJoinNative,
    "a14_asof_forward" -> a14AsofForward,
    "a15_asof_tolerance" -> a15AsofTolerance,
    "a16_running_windows" -> a16RunningWindows,
    "a17_cube" -> a17Cube,
    "a18_unpivot" -> a18Unpivot,
    "a19_window_nav" -> a19WindowNav,
    "a20_salted_join" -> a20SaltedJoin,
    "a21_range_frames" -> a21RangeFrames,
    "a22_misc_aggs" -> a22MiscAggs,
    "a23_grouping_sets" -> a23GroupingSets,
    "a24_cohort_retention" -> a24CohortRetention,
    "a25_funnel" -> a25Funnel,
    "a26_window_dist" -> a26WindowDist,
    "a27_rolling_events" -> a27RollingEvents)

  val oracle: Map[String, String] = Map(
    "a1_top_orders" -> a1Sql,
    "a2_rollup" -> a2Sql,
    "a3_setops" -> a3Sql,
    "a4_semi_anti" -> a4Sql,
    "a5_supplier_rank" -> a5Sql,
    "a6_json_extract" -> a6Sql,
    "a7_asof_join" -> a7Sql,
    "a8_salted_counts" -> a8Sql,
    "a9_range_join" -> a9Sql,
    "a28_local_volume" -> a28Sql,
    "a29_trade_volume" -> a29Sql,
    "a10_asof_native" -> a7Sql,
    "a11_pivot" -> a11Sql,
    "a12_quantiles" -> a12Sql,
    "a13_range_join_native" -> a9Sql,
    "a14_asof_forward" -> a14Sql,
    "a15_asof_tolerance" -> a15Sql,
    "a16_running_windows" -> a16Sql,
    "a17_cube" -> a17Sql,
    "a18_unpivot" -> a18Sql,
    "a19_window_nav" -> a19Sql,
    "a20_salted_join" -> a20Sql,
    "a21_range_frames" -> a21Sql,
    "a22_misc_aggs" -> a22Sql,
    "a23_grouping_sets" -> a23Sql,
    "a24_cohort_retention" -> a24Sql,
    "a25_funnel" -> a25Sql,
    "a26_window_dist" -> a26Sql,
    "a27_rolling_events" -> a27Sql)
}
