package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the classic operator Spark lacks
  * natively. For each left row, find the latest right row of the same
  * key whose time is ≤ the left row's time.
  *
  * Implemented by composition (SURVEY.md §7.3 preference (a)): tag both
  * sides, union, and take a running `last_value(…, ignoreNulls)` over
  * (key, time, side) — right rows sort before left rows at equal time,
  * so an exact-time match is visible to the left row. One shuffle on the
  * key, no range join, no per-key state larger than the window frame:
  * this shape survives arbitrary key cardinality and skew-salts like any
  * windowed aggregation, which is why it beats a range-join formulation
  * at scale.
  */
object AsOf {

  /** `left` (key, leftTime, …) as-of-joined to `right` (key, rightTime):
    * output = every left column + `matched` = max right time ≤ leftTime
    * (null when no right row precedes). Times are compared in the right
    * side's type (left is cast — e.g. ltz → ntz under the session zone).
    * Generalizes to value columns by packing them into a struct ordered
    * by rightTime.
    */
  def asOfTime(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    val rtType = right.schema(rightTime).dataType
    val l = left
      .withColumn("_t", col(leftTime).cast(rtType))
      .withColumn("_side", lit(1))
      .withColumn("_rt", lit(null).cast(rtType))
    // drop null-key right rows: window partitionBy groups NULLs together,
    // which would let a null-key left row match a null-key right row —
    // SQL ASOF equality (and the native operator) treat NULL keys as
    // matching nothing
    val r = right.filter(col(key).isNotNull)
      .select(col(key), col(rightTime).cast(rtType).as("_t"),
        lit(0).as("_side"), col(rightTime).cast(rtType).as("_rt"))
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("matched", last(col("_rt"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_t", "_side", "_rt")
  }
}
