package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to every interval containing
  * them — expressed as an equi-join through interval bucketization, the
  * shape that survives scale: a naive `p BETWEEN lo AND hi` theta-join
  * degenerates to a broadcast-nested-loop whose cost is |points|·|intervals|;
  * bucketizing by a width `w` explodes each interval into its covered
  * buckets and each point into exactly one, so the hash join fans out
  * only to intervals actually overlapping the point's bucket.
  *
  * Pick `w` near the typical interval length: shorter → more duplicate
  * interval rows; longer → more false candidates filtered post-join.
  */
object RangeJoin {

  /** `points` (pointCol, …) ⋈ `intervals` (loCol, hiCol, …) where
    * lo ≤ point < hi. Output: all point columns + all interval columns.
    */
  def pointsInIntervals(spark: SparkSession, points: DataFrame, intervals: DataFrame,
                        pointCol: String, loCol: String, hiCol: String,
                        bucketWidth: Double): DataFrame = {
    val w = lit(bucketWidth)
    val p = points.withColumn("_b", floor(col(pointCol) / w))
    val iv = intervals.withColumn("_b",
      explode(sequence(floor(col(loCol) / w), floor(col(hiCol) / w))))
    p.join(iv, Seq("_b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_b")
  }
}
