package graft

/** Byte-for-byte golden diff of the deterministic end-to-end run
  * (SURVEY.md §5.4). If this fails after an intentional semantic change,
  * regenerate with `sbt "Test/runMain graft.GoldenGen"` and review.
  */
class GoldenSpec extends SparkSpec {
  test("deterministic pipeline output matches the committed golden file") {
    val goldenUrl = getClass.getResource("/golden_stations.json")
    assert(goldenUrl != null, "golden_stations.json missing — run Test/runMain graft.GoldenGen")
    val golden = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(goldenUrl.toURI)), "UTF-8")
    val fresh = GoldenFixture.json(spark)
    assert(fresh == golden, "pipeline output diverged from golden fixture")
  }
}
