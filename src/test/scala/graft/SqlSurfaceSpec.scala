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
}
