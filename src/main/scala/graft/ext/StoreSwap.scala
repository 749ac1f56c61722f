package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The one store-replacement discipline shared by every rewriting
  * maintenance pass ([[IvfIndex.rewrite]], [[Dedup.compactNearDupIndex]],
  * [[Ledger.compact]]): the new store is fully written to a sibling tmp
  * directory FIRST ([[prepareTmp]] clears any stale one from a crashed
  * earlier pass), then two renames swap it in. The previous store is
  * retained under `<dir>.old` for the caller's retention policy (roll
  * back, archive, delete); a stale `.old` is replaced — maintenance is
  * re-runnable at any cadence, and only one rollback generation is
  * kept.
  *
  * Runs on the store's own Hadoop FileSystem (local, HDFS, or an object
  * store with a rename-capable committer), so stores addressed by URI
  * work the same as local paths. NOTE the swap is atomic per rename,
  * not across both: between them `dir` does not exist, so maintenance
  * needs a single-writer window (readers retry or schedule around it),
  * and a crash there leaves the data under `<dir>.old` (complete old
  * store) + tmp (complete new store) for manual election — never a
  * half-written `dir`.
  */
private[ext] object StoreSwap {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Delete any stale tmp left by a crashed pass and return the path to
    * write the new store to.
    */
  def prepareTmp(spark: SparkSession, tmp: String): String = {
    val p = new Path(tmp)
    fs(spark, p).delete(p, true)
    tmp
  }

  /** Replace the store at `dir` with the fully-written store at `tmp`. */
  def swap(spark: SparkSession, dir: String, tmp: String): Unit = {
    val p = new Path(dir)
    val f = fs(spark, p)
    val old = new Path(s"$dir.old")
    f.delete(old, true)
    if (!f.rename(p, old))
      throw new java.io.IOException(s"store swap: cannot retire $dir to $old")
    if (!f.rename(new Path(tmp), p))
      throw new java.io.IOException(s"store swap: cannot promote $tmp to $dir")
  }
}
