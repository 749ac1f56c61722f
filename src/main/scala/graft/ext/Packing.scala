package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM pretraining: concatenate documents in id
  * order and chunk the token stream into fixed-size context windows.
  * Each document is assigned the global token offset where it starts,
  * the bin (= context window) containing that offset, and its position
  * inside the bin.
  *
  * The global running sum is the scale hazard: a naive
  * `sum() OVER (ORDER BY id)` funnels the whole corpus through ONE task
  * (same failure mode the two-phase [[Ranking]] kills). Here the same
  * two-phase shape computes a distributed prefix sum:
  *
  *  1. range-partition by id (ascending), materialize once;
  *  2. per-partition running sum via a PARTITIONED window (parallel);
  *  3. driver-side fold of per-partition totals into start offsets —
  *     #partitions values, not #rows — broadcast back and added.
  */
object Packing {

  /** For (idCol, nCol) rows: global token offset in id order, plus
    * `bin_id` = offset div binSize and `bin_pos` = offset mod binSize.
    * `nCol` must be non-null and >= 0.
    */
  def tokenOffsets(df: DataFrame, idCol: String, nCol: String, binSize: Long,
                   numPartitions: Int = 0): DataFrame = {
    require(binSize > 0, "tokenOffsets: binSize must be positive")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else try spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
      catch { case _: NumberFormatException => math.max(df.rdd.getNumPartitions, 1) }
    // identical ranged layout for the totals job and the final job
    val ranged = df.repartitionByRange(n, col(idCol).asc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // one row per partition — driver-sized no matter the corpus.
    // sum() is NULL when a partition is all-NULL, so coalesce before
    // getLong: the friendly NULL-input require below must be the error
    // that fires, not a NullPointerException (ADVICE r4).
    val totals = ranged.groupBy("_pid")
      .agg(coalesce(sum(col(nCol)), lit(0L)).as("tot"),
        count(when(col(nCol).isNull, 1)).as("nulls"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    require(totals.map(_._3).sum == 0,
      s"tokenOffsets: $nCol contains NULLs — offsets would be undefined")
    var acc = 0L
    val offsets = totals.sortBy(_._1).map { case (p, tot, _) =>
      val o = (p, acc); acc += tot; o
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy("_pid").orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offDf), "_pid")
      .withColumn("_cum",
        coalesce(sum(col(nCol)).over(w), lit(0L)) + col("_off"))
      .withColumn("token_offset", col("_cum").cast("long"))
      .withColumn("bin_id", expr(s"_cum div ${binSize}L").cast("long"))
      .withColumn("bin_pos", (col("_cum") % binSize).cast("long"))
      .drop("_pid", "_off", "_cum")
  }
}
