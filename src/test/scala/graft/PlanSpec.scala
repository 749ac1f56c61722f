package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{ExtQueries, RefQueries}

/** Physical-plan quality gates (the 100 TB posture, checked): column
  * pruning reaches the parquet scans, star joins broadcast their small
  * side, candidate generation never degenerates into a nested-loop /
  * cartesian join, and the hot paths stay inside whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.treeString

  test("q3: star join broadcasts, no shuffle of the dimension side") {
    val p = plan(RefQueries.q3Revenue(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q1: aggregation is partial before the exchange") {
    val p = plan(RefQueries.q1Pricing(spark, sf()))
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
    assert(p.contains("Exchange"))
  }

  test("lineitem scans prune columns (no full-width reads)") {
    val p = plan(RefQueries.q1Pricing(spark, sf()))
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty)
    // q1 touches 5 of 11 lineitem columns; the scan must not read more
    assert(readSchemas.forall(s => !s.contains("l_shipdate") && !s.contains("l_partkey")),
      readSchemas.mkString("\n"))
  }

  test("filters push down to the parquet scan") {
    val df = graft.model.Tables.lineitem(spark, sf())
      .filter(col("l_quantity") > 40).select("l_orderkey")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      p.take(2000))
  }

  test("LSH candidate joins are equi-joins, never nested-loop") {
    Seq(ExtQueries.x2MinhashLsh(spark, sf()),
      ExtQueries.x4NgramJaccard(spark, sf()),
      ExtQueries.x7SimLsh(spark, sf())).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        p.take(2000))
    }
  }

  test("flagship enrichment stays inside whole-stage codegen") {
    // AQE reveals codegen stages only in the final (executed) plan
    val df = RefQueries.flagshipStation(spark, sf())
    df.collect()
    // codegen stages render as "*(n) Operator" in the final tree
    val p = df.queryExecution.executedPlan.treeString
    assert(p.contains("*("), p.take(2000))
  }
}
