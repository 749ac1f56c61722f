package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Hashing

/** The custom codegen'd hash must be value-identical to the built-in
  * composition it replaces (and to the DuckDB oracle derivation).
  */
class Md5Prefix64Spec extends SparkSpec {

  test("Md5Prefix64 equals conv(substr(md5)) for 8 and 15 digits") {
    import spark.implicits._
    val df = (Seq("", "a", "abc", "hello world", "ünïcödé", "x" * 1000)
      ++ (0 until 200).map(i => s"shingle $i token"))
      .toDF("s")
    val checked = df.select(
      Hashing.h32(col("s")).as("fast32"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("ref32"),
      Hashing.h60(col("s")).as("fast60"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref60"))
    assert(checked.filter(col("fast32") =!= col("ref32") ||
      col("fast60") =!= col("ref60")).count() == 0)
  }

  test("driver-side HashUtil matches the expression (planeSigns parity)") {
    import spark.implicits._
    val inputs = Seq("rp-0-1", "rp-7-64", "anything")
    val fromExpr = inputs.toDF("s").select(Hashing.h32(col("s")))
      .collect().map(_.getLong(0))
    val fromDriver = inputs.map(s => HashUtil.md5Prefix64(s, 8))
    assert(fromExpr.toSeq == fromDriver)
  }

  test("md5_prefix64 is callable from SQL via the installed extensions") {
    // the shared test session is built withExtensions(GraftExtensions)
    // (SparkSpec) — no hand registration; a temp-function copy here
    // would shadow the injected one and mask arity/wiring bugs
    val got = spark.sql("SELECT md5_prefix64('abc', 8) AS h").collect().head.getLong(0)
    assert(got == HashUtil.md5Prefix64("abc", 8))
  }
}
