package graft.expr

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** ScalaCheck-generated shape invariants of the enrichment functions
  * over arbitrary printable input (SURVEY.md §5.3). Uses Gen directly
  * (no scalatestplus bridge in the offline cache).
  */
class EnrichPropertySpec extends SparkSpec {

  private val titles: Gen[String] =
    Gen.listOfN(40, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '-', '!', '.', '?', '_')))
      .map(_.mkString)

  private def evalMany(inputs: Seq[String], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] = {
    import spark.implicits._
    inputs.toDF("t").select(coalesce(f(col("t")), lit("")).as("v"))
      .collect().map(_.getString(0)).toSeq
  }

  test("bloom JVM-side and column-side probes agree on arbitrary unicode terms") {
    import spark.implicits._
    val mBits = 2048; val k = 3
    // unicode-heavy terms: the add() path hashes term.toString UTF-8
    // bytes, the column probe hashes UTF8String concat bytes — they
    // must be the same bytes for every codepoint mix
    val strs: Gen[String] = Gen.listOfN(12,
      Gen.oneOf(Gen.alphaNumChar.map(_.toString),
        Gen.oneOf("√", "é", "中", "🙂", "ß", "؀", " ")))
      .map(_.mkString)
    val inserted = Gen.listOfN(200, strs).sample.get.distinct
    val outside = inserted.map(_ + "∉")
    val filt = inserted.toDF("s")
      .agg(BloomSketchAgg.sketch(col("s"), mBits, k).as("w"))
    val got = (inserted ++ outside).toDF("s").crossJoin(broadcast(filt))
      .select(col("s"), BloomSketchAgg.mightContain(col("w"), col("s"), mBits, k))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val bits = new BloomBits(mBits, k)
    inserted.foreach(s => bits.add(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    (inserted ++ outside).foreach { s =>
      val jvm = bits.mightContain(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got(s) == jvm, s"probe disagreement on '$s': column=${got(s)} jvm=$jvm")
    }
    inserted.foreach(s => assert(got(s), s"false negative on '$s'"))
  }

  test("sanitized titles contain only word chars and underscores") {
    val inputs = Gen.listOfN(60, titles).sample.get
    val re = "^[A-Za-z0-9_]*$".r
    evalMany(inputs, Enrich.sanitizeTitle).foreach { s =>
      assert(re.matches(s), s"bad sanitize output: '$s'")
    }
  }

  test("truncate never exceeds n; tags never exceed 6 entries") {
    val inputs = Gen.listOfN(60, titles).sample.get
    evalMany(inputs, c => Enrich.truncate(c, 80)).foreach(s => assert(s.length <= 80))
    evalMany(inputs, Enrich.tagsFromTitle).foreach { s =>
      if (s.nonEmpty) {
        val tags = s.split(",")
        assert(tags.length <= 6)
        assert(tags.forall(t => t.length > 2))
      }
    }
  }

  test("language is always one of the seven known values") {
    val known = Set("Tamil", "Hindi", "English", "Telugu", "Malayalam", "Kannada")
    val inputs = Gen.listOfN(60, titles).sample.get
    evalMany(inputs, Enrich.languageFromTitle).foreach(l => assert(known.contains(l)))
  }

  test("dedup is idempotent") {
    import spark.implicits._
    val urls = Gen.listOfN(100, Gen.oneOf((0 until 30).map(i => s"u$i"))).sample.get
    val df = urls.toDF("url")
    val once = graft.pipeline.Station.dedupLinks(df)
    val twice = graft.pipeline.Station.dedupLinks(once)
    assert(once.count() == twice.count())
    assert(once.count() == urls.distinct.size)
  }
}
