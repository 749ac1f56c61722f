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

  /** Two-phase salted count over `key`: partial counts per (key, salt),
    * then merge per key. The salt is row-position-derived
    * (`monotonically_increasing_id`), NOT value-derived — a value-based
    * salt fails to split a hot key whose values are themselves low-
    * cardinality (every row of the hot key would land in one salt
    * bucket). The count is invariant to the salt, so the result equals
    * the direct groupBy exactly.
    */
  def saltedCounts(df: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"))
    partial.groupBy(col(key))
      .agg(sum(col("_n")).as("n"))
  }

  /** Salted equi-join for a skewed big side: the big side salts each row
    * (position-derived, same rationale as [[saltedCounts]]) and the
    * small side replicates once per salt, so the hot key's rows spread
    * over `salts` reducers instead of one. `salts`× the small side rides
    * the shuffle — the classic trade when the small side is modest but
    * too big (or too mid-plan) to broadcast. Row-for-row identical to
    * the direct join; the oracle checks exactly that.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val b = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val s = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
