package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Station
import graft.resolve.MockResolver

/** Shared builder for the golden end-to-end run (SURVEY.md §5.4):
  * deterministic inputs (A1-shaped link lines), deterministic resolver,
  * sha2 ids, pinned clock → byte-stable single JSON array.
  */
object GoldenFixture {

  val pinnedClock = "2024-01-01 00:00:00"

  def fixtureLines(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (Seq("# golden fixture input", "", "  https://www.youtube.com/watch?v=dup  ",
      "https://www.youtube.com/watch?v=dup") ++
      (0 until 40).map(i => s"https://www.youtube.com/watch?v=golden$i"))
      .toDF("value")
  }

  def stations(spark: SparkSession): DataFrame =
    Station.pipeline(
      fixtureLines(spark),
      new MockResolver().stage(spark),
      Station.deterministicIds,
      to_timestamp(lit(pinnedClock)))
      .orderBy("url")

  def json(spark: SparkSession): String = {
    val rows = stations(spark).toJSON.collect()
    rows.mkString("[\n  ", ",\n  ", "\n]")
  }
}

/** Regenerates the committed golden file:
  * `sbt "Test/runMain graft.GoldenGen"` — only rerun when the pipeline's
  * semantics intentionally change, and review the diff.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/golden_stations.json")
    val s = SparkSpec.session
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out).toAbsolutePath.getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      GoldenFixture.json(s).getBytes("UTF-8"))
    println(s"golden written: $out")
    s.stop()
  }
}
