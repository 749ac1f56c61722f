package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas
import graft.resolve.MockResolver

/** End-to-end pipeline over the A1 link-file fixture (FIXTURES.md):
  * comments/blanks dropped, whitespace trimmed, duplicates removed,
  * failed resolutions filtered, 37-field output.
  */
class StationPipelineSpec extends SparkSpec {

  private def fixtureLines = {
    import spark.implicits._
    Seq(
      "# comment line",
      "",
      "https://www.youtube.com/watch?v=AAAAAAAAAAA",
      "https://www.youtube.com/watch?v=BBBBBBBBBBB",
      "https://www.youtube.com/watch?v=AAAAAAAAAAA",
      "  https://www.youtube.com/watch?v=CCCCCCCCCCC").toDF("value")
  }

  test("parseLinks drops comments/blanks and trims (S1/D2)") {
    val urls = Station.parseLinks(fixtureLines).collect().map(_.getString(0))
    assert(urls.length == 4)
    assert(urls.forall(_.startsWith("https://")))
  }

  test("dedupLinks removes exact duplicates (D1)") {
    assert(Station.dedupLinks(Station.parseLinks(fixtureLines)).count() == 3)
  }

  test("full pipeline emits 37 columns in station order") {
    val out = Station.pipeline(fixtureLines, new MockResolver().stage(spark))
    assert(out.columns.toSeq == Schemas.stationColumns)
  }

  test("pipeline filters failed and unresolved extractions (D3/D4)") {
    import spark.implicits._
    // 200 distinct URLs: MockResolver fails ~2/37 of them deterministically
    val lines = (0 until 200).map(i => s"https://www.youtube.com/watch?v=$i").toDF("value")
    val out = Station.pipeline(lines, new MockResolver().stage(spark))
    val n = out.count()
    assert(n > 150 && n < 200)
    assert(out.filter(col("url_resolved").contains("youtube.com/watch")).count() == 0)
  }

  test("random-id mode (reference parity) yields fresh distinct uuids") {
    import spark.implicits._
    val lines = (0 until 30).map(i => s"https://www.youtube.com/watch?v=$i").toDF("value")
    val out = Station.pipeline(lines, new MockResolver().stage(spark), Station.randomIds)
      .select("changeuuid", "stationuuid", "serveruuid").collect()
    val all = out.flatMap(r => Seq(r.getString(0), r.getString(1), r.getString(2)))
    assert(all.distinct.length == all.length, "uuid collision")
    val uuidRe = "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}".r
    assert(all.forall(u => uuidRe.matches(u)), s"not a uuid: ${all.find(u => !uuidRe.matches(u))}")
  }

  test("constants and invariants hold on every row") {
    import spark.implicits._
    val lines = (0 until 50).map(i => s"https://www.youtube.com/watch?v=$i").toDF("value")
    val out = Station.pipeline(lines, new MockResolver().stage(spark)).cache()
    assert(out.filter(col("bitrate") =!= 128).count() == 0)
    assert(out.filter(col("lastcheckok") =!= 1).count() == 0)
    assert(out.filter(length(col("name")) > 80).count() == 0)
    assert(out.filter(length(col("tags")) > 80).count() == 0)
    assert(out.filter(size(split(col("tags"), ",")) > 6).count() == 0)
    assert(out.filter(col("homepage") =!= "https://youtube.com").count() == 0)
    // hls ⇔ .m3u8 extension
    assert(out.filter(col("hls") === 1 && !lower(col("url_resolved")).contains(".m3u8")).count() == 0)
    out.unpersist()
  }
}
