package graft.expr

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class SubwordTokensSpec extends SparkSpec {

  private def count(s: String): Long = SubwordUtil.count(UTF8String.fromString(s))

  test("greedy longest-match: hand-computed examples") {
    // "the" is one vocab token
    assert(count("the") == 1L)
    // "theme": "the" + "m" + "e"? — greedy takes "the", then "me" is not
    // in vocab, "m" 1 char, "e" 1 char => 3
    assert(count("theme") == 3L)
    // "ration": "ra" + "tion" => 2
    assert(count("ration") == 2L)
    // "z" alone: fallback single char
    assert(count("z") == 1L)
    // spaces delimit, aren't counted; empty string is 0
    assert(count("the the") == 2L)
    assert(count("") == 0L)
    assert(count("   ") == 0L)
    // longest match wins over shorter: "ing" (3) not "in"+"g"
    assert(count("ing") == 1L)
    // a non-BMP code point (surrogate pair in UTF-16) is ONE fallback
    // token, matching the oracle's code-point substr
    assert(count("𝄞") == 1L) // 𝄞
    assert(count("a𝄞b") == 3L)
  }

  test("expression matches the helper over real documents") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
    val got = docs.select(col("text"),
      GraftColumnBridge.column(SubwordTokenCount(
        GraftColumnBridge.expression(col("text")))).as("n"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == count(r.getString(0)))
    }
  }

  test("non-string input fails at analysis time") {
    import spark.implicits._
    val df = Seq(1L).toDF("x")
    val err = intercept[Exception] {
      df.select(GraftColumnBridge.column(SubwordTokenCount(
        GraftColumnBridge.expression(col("x"))))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getClass.getName.contains("Analysis"))
  }
}
