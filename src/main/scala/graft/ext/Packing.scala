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

  /** First-fit-decreasing bin packing within length buckets (VERDICT
    * r7 #6) — the padding-conscious upgrade over [[tokenOffsets]]'s
    * concat-and-chunk: chunking wastes zero tokens but SPLITS documents
    * across context windows; production packers keep each document
    * whole and accept padding, and FFD is the standard way to keep
    * that padding small.
    *
    * Global FFD is inherently sequential, so the distributed shape
    * buckets documents by length band (`bucket = len div bucketWidth`)
    * and runs EXACT FFD independently inside each bucket: hash
    * repartition on the bucket key co-locates each bucket, rows sort
    * (len desc, id) within it, and one linear pass per bucket assigns
    * bins ([[org.apache.spark.sql.Dataset.mapPartitions]] — genuine
    * per-partition imperative state, the sanctioned last resort).
    * Buckets pack in parallel; within a band lengths are similar, so
    * per-bucket FFD loses little to the global variant while removing
    * the sequential bottleneck. Deterministic: bin ids depend only on
    * the (len desc, id) order within each bucket, so any engine
    * replays the exact assignment (the x95 oracle steps the same FFD
    * with a recursive CTE).
    *
    * The first-fit search runs on a growable max-segment-tree over bin
    * remainders (leftmost leaf with rem ≥ len, O(log bins) per doc —
    * the linear scan is quadratic per bucket and dies around 10^5
    * bins), so a bucket packs n docs in O(n log n); the per-bucket
    * tree is the only task-local state (8 bytes/bin). Returns
    * (doc_id, len, bucket, bin) — `bin` is the 0-based bin index
    * WITHIN the bucket.
    */
  def ffdPackBuckets(df: DataFrame, idCol: String, lenCol: String,
                     binSize: Long, bucketWidth: Long): DataFrame = {
    require(binSize >= 1, s"ffdPackBuckets: binSize must be >= 1, got $binSize")
    require(bucketWidth >= 1,
      s"ffdPackBuckets: bucketWidth must be >= 1, got $bucketWidth")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"))
      .withColumn("bucket", expr(s"len div ${bucketWidth}L"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("len").desc, col("id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // hash partitioning puts every row of a bucket in one partition;
        // rows arrive bucket-grouped, so per-bucket state resets on the
        // bucket boundary
        var curBucket = Long.MinValue
        var tree: FirstFitTree = null
        it.map { case (id, len, bucket) =>
          require(len >= 0 && len <= binSize,
            s"ffdPackBuckets: doc $id has len $len outside [0, $binSize]")
          if (bucket != curBucket) {
            curBucket = bucket
            tree = new FirstFitTree(binSize)
          }
          (id, len, bucket, tree.place(len).toLong)
        }
      }.toDF("doc_id", "len", "bucket", "bin")
  }

  /** Growable max-segment-tree over bin remainders: `place` returns the
    * LOWEST-index bin with remaining ≥ len (first fit), opening a new
    * bin when none fits — O(log bins) per call, bit-identical to the
    * linear first-fit scan.
    */
  private final class FirstFitTree(binSize: Long) {
    private var cap = 1                    // leaf capacity (power of two)
    private var rem = new Array[Long](1)   // remaining per open bin
    private var n = 0                      // open bins
    private var tree = Array.fill(2)(Long.MinValue) // 1-based max tree

    private def update(i: Int, v: Long): Unit = {
      var node = cap + i
      tree(node) = v
      node >>= 1
      while (node >= 1) {
        tree(node) = math.max(tree(2 * node), tree(2 * node + 1))
        node >>= 1
      }
    }

    def place(len: Long): Int = {
      if (n == 0 || tree(1) < len) {
        // no open bin fits — first fit IS a fresh bin at index n
        if (n == cap) {
          cap *= 2
          val r2 = new Array[Long](cap)
          System.arraycopy(rem, 0, r2, 0, n)
          rem = r2
          tree = Array.fill(2 * cap)(Long.MinValue)
          var i = 0
          while (i < n) { tree(cap + i) = rem(i); i += 1 }
          var j = cap - 1
          while (j >= 1) { tree(j) = math.max(tree(2 * j), tree(2 * j + 1)); j -= 1 }
        }
        rem(n) = binSize
        n += 1
        update(n - 1, binSize)
      }
      var node = 1
      while (node < cap)
        node = if (tree(2 * node) >= len) 2 * node else 2 * node + 1
      val idx = node - cap
      rem(idx) -= len
      update(idx, rem(idx))
      idx
    }
  }

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
