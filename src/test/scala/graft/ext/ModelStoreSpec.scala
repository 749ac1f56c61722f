package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Trained-model persistence: a fresh session reading the artifact must
  * segment/score BIT-identically to the training session — all three
  * artifacts carry integer fixed-point parameters, so equality is
  * exact, not approximate. The read side runs through `newSession()`
  * (fresh session state, none of ExtQueries' memoization).
  */
class ModelStoreSpec extends SparkSpec {

  test("BPE merge table round-trips and re-tokenizes identically from disk") {
    val docs = Tables.documents(spark, sf())
    val wf = TextAnalytics.wordFreq(docs, "text")
    val (merges, vocab) = TextAnalytics.bpeTrain(wf, rounds = 6)
    val dir = Files.createTempDirectory("bpestore").toString
    ModelStore.writeBpe(merges, dir)
    ModelStore.writeBpeVocab(vocab, dir)
    val fresh = spark.newSession()
    // table round-trips row-for-row in training order
    val back = ModelStore.readBpe(fresh, dir).collect()
    val orig = merges.orderBy("round").collect()
    assert(back.map(_.toSeq).toSeq == orig.map(_.toSeq).toSeq)
    // the persisted merge sequence tokenizes the corpus bit-identically
    val pairs = ModelStore.readBpeMerges(fresh, dir)
    assert(pairs == orig.map(_.getString(1)).toSeq)
    val inSession = docs
      .select(col("doc_id"),
        TextAnalytics.applyMerges(col("text"), orig.map(_.getString(1)).toSeq)
          .as("bpe")).collect().map(r => (r.getLong(0), r.getString(1)))
    val fromDisk = Tables.documents(fresh, sf())
      .select(col("doc_id"),
        TextAnalytics.applyMerges(col("text"), pairs).as("bpe"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(fromDisk.sortBy(_._1).toSeq == inSession.sortBy(_._1).toSeq)
    // the deployable path: the persisted VOCAB tokenizes the corpus by
    // equi-join (x86's discipline), bit-identical from disk
    val segMem = vocab.collect()
      .map(r => (r.getString(0), r.getString(2).count(_ == ' ') + 1L))
      .sorted.toSeq
    val segDisk = ModelStore.readBpeVocab(fresh, dir)
      .select(col("word"), size(split(col("repr"), " ")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(segDisk == segMem)
  }

  test("unigram piece table round-trips and segments identically from disk") {
    val docs = Tables.documents(spark, sf())
    val wf = TextAnalytics.wordFreq(docs, "text")
    val model = UnigramLm.trainModel(wf)
    val dir = Files.createTempDirectory("unistore").toString
    ModelStore.writeUnigram(model, spark, dir)
    val fresh = spark.newSession()
    val back = ModelStore.readUnigram(fresh, dir)
    // the piece table IS the model: pieces and cost map both round-trip
    assert(back.pieces == model.pieces)
    assert(back.cost == model.cost)
    // x119's consumption shape from the persisted artifact: segment the
    // distinct vocabulary under the disk model — identical (word, n_sub)
    val freshWf = TextAnalytics.wordFreq(Tables.documents(fresh, sf()), "text")
    val fromDisk = UnigramLm.segmentLengths(freshWf, back)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val inSession = UnigramLm.segmentLengths(wf, model)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(fromDisk == inSession)
  }

  test("x119 reproduces bit-identically from the persisted unigram artifact") {
    // the VERDICT r9 #3 contract verbatim: a fresh session that never
    // trained tokenizes the corpus from the shipped vocab file and
    // emits the DECLARED x119 rows exactly
    val declared = graft.queries.ExtQueries.queries("x119_unigram_tokens")(
        spark, sf()).collect().map(_.toSeq).toSeq
    val dir = Files.createTempDirectory("x119store").toString
    ModelStore.writeUnigram(
      graft.queries.ExtQueries.unigramLmModel(spark, sf()), spark, dir)
    val fresh = spark.newSession()
    val model = ModelStore.readUnigram(fresh, dir)
    val docs = Tables.documents(fresh, sf())
    val wf = TextAnalytics.wordFreq(docs, "text")
    val fromDisk = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(UnigramLm.segmentLengths(wf, model), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
      .orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(fromDisk == declared)
  }

  test("x114's trained weights round-trip bit-identically through the store") {
    // the exact artifact the declared x93/x102/x114 rows score with —
    // persisting and re-reading it changes nothing
    val w = graft.queries.ExtQueries.qualityWeights(spark, sf())
    val dir = Files.createTempDirectory("x114store").toString
    ModelStore.writeQualityWeights(w, dir)
    val back = ModelStore.readQualityWeights(spark.newSession(), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mem = w.select(col("bucket").cast("long"), col("wt").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(back == mem)
  }

  test("quality weights round-trip and score identically from disk") {
    val docs = Tables.documents(spark, sf())
    val tokens = split(col("text"), " ")
    val labels = docs.select(col("doc_id"),
      when(size(filter(tokens, t => t.isin("the", "a", "of", "and"))) * 16
        > size(tokens), 1L).otherwise(-1L).as("y"))
    val w = QualityModel.trainPerceptron(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", labels,
      buckets = 512, rounds = 8)
    val dir = Files.createTempDirectory("qwstore").toString
    ModelStore.writeQualityWeights(w, dir)
    val fresh = spark.newSession()
    val back = ModelStore.readQualityWeights(fresh, dir)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == w.select(col("bucket").cast("long"), col("wt").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // x114's consumption shape: score a holdout-bearing slice against
    // the persisted weights — exact integer scores, exact keep bits
    def scored(s: org.apache.spark.sql.SparkSession,
               wt: org.apache.spark.sql.DataFrame) =
      QualityModel.scoreDocuments(Tables.documents(s, sf()), "doc_id",
          "text", wt, 512)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).sorted.toSeq
    assert(scored(fresh, back) == scored(spark, w))
  }

  test("n-gram LM counts round-trip and perplexity-score identically from disk") {
    val docs = Tables.documents(spark, sf())
    val clean = col("doc_id") % 3 === 0
    val counts = NgramLm.trainCounts(docs.filter(clean), "text")
    val dir = Files.createTempDirectory("lmstore").toString
    ModelStore.writeNgramLm(counts, dir)
    val fresh = spark.newSession()
    val back = ModelStore.readNgramLm(fresh, dir)
    // integer counts round-trip exactly
    assert(back.c1.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == counts.c1.selectExpr("cast(hw as long)", "cast(c1 as long)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // scoring a new shard from the persisted artifact equals the
    // train-session path (6-dp rounded log arithmetic, same inputs)
    def sc(s: org.apache.spark.sql.SparkSession, c: NgramLm.Counts) =
      NgramLm.scoreWith(c, Tables.documents(s, sf()), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getString(4))).sorted.toSeq
    val fromDisk = sc(fresh, back)
    assert(fromDisk == sc(spark, counts))
    // and the one-call training path is literally train + score
    val direct = NgramLm.perplexityScores(docs, "doc_id", "text", clean)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getString(4))).sorted.toSeq
    assert(fromDisk == direct)
    assert(direct.map(_._5).distinct.size >= 2, "buckets should vary")
  }
}
