package graft
import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke: run SparkEntry.entry and
  * assert rows > 0. `runMain graft.Smoke` (optional arg: cpus).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.select("name", "url_resolved", "codec", "language", "tags", "hls",
      "file_name_from_url").show(5, truncate = false)
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
