package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench regression gate's input parser (VERDICT r5 #1: the
  * original marker-only parse returned empty on every driver BENCH tail
  * since r3, so the gate compared nothing). No SparkSession needed.
  */
class BenchParseSpec extends AnyFunSuite {

  private def tmpWith(content: String): String = {
    val f = java.io.File.createTempFile("benchspec", ".json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.print(content) finally w.close()
    f.getAbsolutePath
  }

  test("full bench_full.json format parses the min map exactly") {
    val p = tmpWith(
      """{"metric":"total","value":5.5,"unit":"sec","sf":"/x","compared":2,""" +
        """"queries":{"q1_pricing":1.25,"x54_bpe_learn":4.25},""" +
        """"pass1":{"q1_pricing":1.5,"x54_bpe_learn":9.0},""" +
        """"pass2":{"q1_pricing":1.25,"x54_bpe_learn":4.25},""" +
        """"regressions":[],"failed":[]}""")
    val m = Bench.prevQueryTimes(p)
    assert(m === Map("q1_pricing" -> 1.25, "x54_bpe_learn" -> 4.25))
  }

  test("keys outside the current query surface are dropped (ADVICE r6)") {
    // a future numeric wrapper/metadata key must never enter the
    // prev-times map and fire phantom regressions
    val p = tmpWith(
      """{"queries":{"q1_pricing":1.25,"total_wall_ms":123.4,""" +
        """"retired_query":9.9,"neardup_pairs_build":5.8}}""")
    val m = Bench.prevQueryTimes(p)
    assert(m === Map("q1_pricing" -> 1.25, "neardup_pairs_build" -> 5.8))
  }

  test("real driver BENCH_r05.json artifact (2000-char escaped tail, marker cut off) yields non-empty pass2 times") {
    // The committed driver artifact itself: wrapper JSON whose "tail" is
    // the last 2000 chars of stdout with quotes escaped and the
    // "queries":{ marker truncated away. This is exactly the input the
    // r3–r5 gate silently returned empty on.
    val artifact = new java.io.File("BENCH_r05.json")
    assume(artifact.isFile, "committed BENCH_r05.json present in repo root")
    val m = Bench.prevQueryTimes(artifact.getAbsolutePath)
    assert(m.nonEmpty, "truncated driver tail must still yield query times")
    assert(m.size > 50, s"expected a substantial pass2 slice, got ${m.size}")
    // spot-check a pair visible in the r5 tail
    assert(m.get("x54_bpe_learn").exists(v => v > 0.1 && v < 60))
    assert(m.get("x28_redact_pii").exists(v => v > 0.0 && v < 60))
    // wrapper's own numeric keys must not be mistaken for queries
    assert(!m.contains("n") && !m.contains("rc") && !m.contains("cpus") &&
      !m.contains("sf") && !m.contains("value") && !m.contains("compared"))
  }

  test("synthetic 2000-char truncated tail of this round's own line parses") {
    // Simulate the driver's truncation on the NEW output order: build a
    // long line, keep only the last 2000 chars (head of the min map gone),
    // and require the scrape fallback to recover the surviving entries.
    // real query names: the scrape fallback allowlists to the current
    // surface, so fictional names would (correctly) be dropped
    val names = SparkEntry.queries.keySet.toSeq.sorted
    val entries = names.zipWithIndex.map { case (n, i) => s""""$n":$i.25""" }
    val line = s"""{"sf":"/x","pass_detail":"bench_full.json","queries":{${entries.mkString(",")}},"regressions":[],"compared":113,"failed":[],"metric":"total","value":52.4,"unit":"sec"}"""
    assert(line.length > 2000)
    val tail = line.substring(line.length - 2000)
    val m = Bench.prevQueryTimes(tmpWith(tail))
    assert(m.nonEmpty)
    assert(m.get(names.last).contains((names.size - 1) + 0.25))
    assert(!m.contains("compared") && !m.contains("value"))
  }

  test("missing file degrades to empty map") {
    assert(Bench.prevQueryTimes("/nonexistent/bench.json") === Map.empty)
  }
}
