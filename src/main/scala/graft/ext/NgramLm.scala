package graft.ext

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity filtering — the CCNet move (Wenzek
  * et al., "CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data"): score every document under a language model
  * trained on a known-clean target slice, then bucket the corpus into
  * head/middle/tail by model fit. The LM here is a hashed bigram model
  * with stupid backoff (Brants et al., "Large Language Models in
  * Machine Translation" — score(w2|w1) = c(w1 w2)/c(w1), backing off
  * to 0.4·(c(w2)+1)/(N+V) when the bigram or its context is unseen),
  * the classic web-scale choice BECAUSE it is pure counting: no
  * normalization pass, so training is one aggregation.
  *
  * Spark-first shape, built to the x85/x100 discipline:
  *  - every n-gram hashes into a FIXED bucket space (unigrams → `b1`,
  *    bigrams → `b2`) via the engine-portable md5-prefix
  *    [[Hashing.h32]], so both count tables are bounded — ≤ b2 rows —
  *    and broadcast regardless of corpus size;
  *  - training is explode → groupBy(bucket) count: bounded distinct
  *    keys, map-side partial aggregation collapses the shuffle;
  *  - scoring joins the corpus-sized exploded bigram stream against
  *    the broadcast count tables (NO corpus-keyed shuffle except the
  *    final per-doc sum, which partial-aggregates to ~one row per doc
  *    before the exchange);
  *  - per-bigram log-scores round to 6 dp BEFORE the per-doc sum and
  *    the sum rounds again, so DuckDB replays every value.
  */
object NgramLm {

  /** Per-document LM fit under a stupid-backoff hashed bigram model
    * trained on the `isTarget` slice of `docs` itself (CCNet trains on
    * Wikipedia; here the target is the caller's clean-slice predicate,
    * so no external artifact is needed).
    *
    * Output: (doc_id, n_bigrams, logprob, bin, ppl_bucket) where
    * `logprob` is the summed 6-dp bigram log-score, `bin` =
    * floor(10·logprob/n_bigrams) (an integer resolution of the average
    * per-bigram log-score — integer so threshold comparisons replay
    * exactly), and `ppl_bucket` labels head/middle/tail at the
    * `headBin`/`midBin` thresholds (docs with < 2 tokens score no
    * bigram and land in 'unscored').
    */
  def perplexityScores(docs: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, b1: Int = 4096, b2: Int = 65536,
                       headBin: Int = -34, midBin: Int = -36): DataFrame =
    scoreWith(trainCounts(docs.filter(isTarget), textCol, b1, b2),
      docs, idCol, textCol, headBin, midBin)

  /** The trained LM artifact: hashed unigram-context counts (hw, c1)
    * and bigram counts (hb, c2), CARRYING the bucket sizes they were
    * trained with — hash bucketing is part of the model, so a scorer
    * can never silently pair counts with the wrong spaces. This is the
    * CCNet deployment shape: the clean-corpus LM ships once and every
    * new shard scores against it ([[ModelStore.writeNgramLm]] persists
    * all four; `n = Σc1` is derived, never stored).
    */
  final case class Counts(c1: DataFrame, c2: DataFrame, b1: Int, b2: Int)

  /** Count the model over a clean target corpus. */
  def trainCounts(target: DataFrame, textCol: String,
                  b1: Int = 4096, b2: Int = 65536): Counts = {
    require(b1 >= 1 && b2 >= 1, s"bucket spaces must be >= 1, got $b1/$b2")
    val c1 = target
      .select(explode(split(col(textCol), " ")).as("u"))
      .select((Hashing.h32(col("u")) % b1).as("hw"))
      .groupBy("hw").agg(count(lit(1)).as("c1"))
    val c2 = bigrams(target, textCol, b1, b2)
      .groupBy("hb").agg(count(lit(1)).as("c2"))
    Counts(c1, c2, b1, b2)
  }

  // bigram stream: hb plus both word buckets — hw1 keys the backoff
  // decision (unseen context), hw2 keys the backoff score
  private def bigrams(src: DataFrame, textCol: String, b1: Int, b2: Int,
                      cols: Column*): DataFrame = {
    val bg = GraftColumnBridge.column(graft.expr.WordShingles(
      GraftColumnBridge.expression(col(textCol).cast("string")), 2))
    src.select(cols :+ explode(bg).as("f"): _*)
      .select(cols ++ Seq(
        (Hashing.h32(col("f")) % b2).as("hb"),
        (Hashing.h32(substring_index(col("f"), " ", 1)) % b1).as("hw1"),
        (Hashing.h32(substring_index(col("f"), " ", -1)) % b1).as("hw2")): _*)
  }

  /** Score `docs` against an already-trained (possibly
    * disk-round-tripped) model; the counts carry their own bucket
    * sizes, so scoring cannot disagree with training.
    */
  def scoreWith(counts: Counts, docs: DataFrame, idCol: String,
                textCol: String,
                headBin: Int = -34, midBin: Int = -36): DataFrame = {
    require(headBin > midBin,
      s"headBin must sit above midBin, got $headBin <= $midBin")
    val Counts(c1, c2, b1, b2) = counts
    val tots = c1.agg(coalesce(sum("c1"), lit(0L)).as("n"))
    // per-occurrence log-score: in-model ratio, else stupid backoff;
    // c2's bucket may collide onto a context whose c1 bucket is empty,
    // so the in-model branch requires BOTH counts positive
    val lp = bigrams(docs, textCol, b1, b2, col(idCol).as("doc_id"))
      .join(broadcast(c2), Seq("hb"), "left")
      .join(broadcast(c1.withColumnRenamed("hw", "hw1")
        .withColumnRenamed("c1", "c1w1")), Seq("hw1"), "left")
      .join(broadcast(c1.withColumnRenamed("hw", "hw2")
        .withColumnRenamed("c1", "c1w2")), Seq("hw2"), "left")
      .crossJoin(broadcast(tots))
      .select(col("doc_id"),
        round(when(coalesce(col("c2"), lit(0L)) > 0 &&
            coalesce(col("c1w1"), lit(0L)) > 0,
          log(col("c2")) - log(col("c1w1")))
          .otherwise(log(lit(0.4)) + log(coalesce(col("c1w2"), lit(0L)) + 1)
            - log(col("n") + b1)), 6).as("lp"))
    val sc = lp.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(sum("lp"), 6).as("logprob"))
    docs.select(col(idCol).as("doc_id"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob"), lit(0.0)).as("logprob"))
      .withColumn("bin",
        when(col("n_bigrams") === 0, lit(0L))
          .otherwise(floor(col("logprob") * 10 / col("n_bigrams"))))
      .withColumn("ppl_bucket",
        when(col("n_bigrams") === 0, lit("unscored"))
          .when(col("bin") >= headBin, lit("head"))
          .when(col("bin") >= midBin, lit("middle"))
          .otherwise(lit("tail")))
  }
}
