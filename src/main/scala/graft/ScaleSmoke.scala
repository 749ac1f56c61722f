package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.model.Tables

/** Manual scale probe (not part of the driver contract): replicate
  * documents Nx with distinct ids and run the MinHash-LSH pipeline, to
  * sanity-check that candidate volume and runtime scale as designed.
  * `runMain graft.ScaleSmoke [factor]`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.documents(spark, "/root/testdata/sf0.1")
    val big = d.crossJoin(spark.range(factor).select(col("id").as("rep")))
      .select((col("doc_id") * factor + col("rep")).as("doc_id"),
        // perturb replicas so they are near-dups, not exact dups
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
    println(s"docs: ${big.count()}")
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashLshPairs(big, "doc_id", "text")
    val n = pairs.count()
    println(f"minhash pairs: $n%d in ${(System.nanoTime()-t0)/1e9}%.1fs")
    val high = pairs.filter(col("jaccard") >= 0.8)
    println(s"near-dups (j>=0.8): ${high.count()}")
    // connected-components at scale: every original doc should collapse
    // its replica clique into one cluster
    val t1 = System.nanoTime()
    val clusters = Dedup.dedupClusters(high)
    val members = clusters.count()
    val distinctClusters = clusters.select("cluster_id").distinct().count()
    println(f"clusters: $distinctClusters%d over $members%d members " +
      f"in ${(System.nanoTime() - t1) / 1e9}%.1fs")
    spark.stop()
  }
}
