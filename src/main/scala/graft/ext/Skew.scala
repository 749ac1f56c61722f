package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (100 TB posture): when a groupBy key is
  * heavily skewed (one user/tenant dominating), a single reducer owns the
  * hot key. Salting splits each key into `salts` sub-keys for the first
  * (wide) aggregation, then re-aggregates the partials — two small
  * shuffles instead of one skewed one. Results are identical to the
  * direct groupBy (the oracle checks exactly that).
  *
  * AQE's skew-join handling covers joins; salting is the aggregation-side
  * counterpart (and works on any Spark version/mode, streaming included).
  */
object Skew {

  /** Two-phase salted count/sum aggregation over `key`.
    * `aggs` are (partialExpr → mergeExpr) pairs applied around the salt.
    */
  def saltedCounts(df: DataFrame, key: String, valueCol: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(valueCol), lit(salts)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"))
    partial.groupBy(col(key))
      .agg(sum(col("_n")).as("n"))
  }
}
