package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** The SQL-string surface: users of the engine can register the tables
  * as views and run plain `spark.sql` — results must match the
  * DataFrame-API formulation (same Catalyst plans underneath).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame API") {
    Seq("lineitem", "orders", "customer").foreach { t =>
      Tables.table(spark, sf(), t).createOrReplaceTempView(t)
    }
    val viaSql = spark.sql(
      """SELECT c_mktsegment, count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    val viaApi = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf()), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
  }

  test("custom expressions are SQL-callable after registration") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => graft.expr.WordShingles(exprs.head, 2), "scala_udf")
    val got = spark.sql("SELECT word_shingles('a b c') AS s").collect().head.getSeq[String](0)
    assert(got == Seq("a b", "b c"))
  }

  test("the full GraftExtensions function library is SQL-callable") {
    import graft.expr._
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", xs => VecDot(xs.head, xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_l2sq", xs => VecL2Sq(xs.head, xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_long_intersect",
      xs => SortedLongIntersect(xs.head, xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("subword_token_count",
      xs => SubwordTokenCount(xs.head), "scala_udf")
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(1d, 2d), array(3d, 4d)) AS d,
        |  vec_l2sq(array(0d, 0d), array(3d, 4d)) AS l2,
        |  sorted_long_intersect(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS n,
        |  subword_token_count('the ration') AS t""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 3L)
    // the extensions installer injects the same builders without throwing
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
