package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: touch every table (parquet footers, codegen, JIT)
    // so per-query timings measure the queries, not JVM start.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    // Build the shared persisted SynthLinks intermediate up front and
    // time it as its own line item: ~16 queries start from it, and
    // whichever ran first used to absorb the whole build cost (±2 s of
    // per-query attribution noise between rounds, VERDICT r2).
    val tLinks0 = System.nanoTime()
    try graft.queries.SynthLinks.links(spark, sfDir).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] synthlinks warm failed: ${e.getMessage}")
    }
    val linksSec = (System.nanoTime() - tLinks0) / 1e9
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results0 = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val results = results0 + ("synthlinks_build" -> linksSec)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
