package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much more likely its hashed n-gram
  * features are under a TARGET distribution (a small high-quality
  * exemplar set) than under the RAW corpus distribution, then keep the
  * target-leaning documents. The published pipeline's estimator is
  * exactly two smoothed bag-of-hashed-ngrams unigram models; the log
  * importance weight of a document is
  *
  *   logw(d) = Σ_tokens [ ln p̂_target(b(tok)) − ln p̂_raw(b(tok)) ]
  *
  * with add-one smoothing over `buckets` hash buckets.
  *
  * Scale shape (100 TB): two corpus passes, both fully map-side
  * partial-aggregated. Pass 1 estimates BOTH models in one
  * aggregation (per bucket: raw count + target count — the target
  * model is a filtered sum, not a second scan), collapsing to
  * `buckets` rows regardless of corpus size; the λ = ln p̂_t − ln p̂_r
  * table rides back as ONE broadcast. Pass 2 scores: explode →
  * broadcast-join λ → per-doc sum, so the only exchange is the final
  * doc_id aggregation and map-side partials collapse it to ~one row
  * per document first (the x85 scoring shape). λ is rounded to 6 dp
  * before the per-doc sum and the sum again to 6 dp, so cross-engine
  * libm/summation-order noise cannot flip the selection predicate.
  */
object Dsir {

  /** Tokens hashed to buckets: (doc_id, is_t, b). */
  private def hashedTokens(docs: DataFrame, idCol: String, textCol: String,
                           targetPred: Column, buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), targetPred.as("is_t"),
        explode(split(col(textCol), " ")).as("f"))
      .select(col("doc_id"), col("is_t"),
        (Hashing.h32(col("f")) % buckets).as("b"))

  /** Per-document log importance weight under hashed-unigram bag
    * models: (doc_id, n_tokens, logw, selected) with selected = 1 iff
    * logw > 0 (the document looks more target- than raw-like; the
    * threshold-free form of DSIR's resampling — compose with the
    * weighted sampler (x30) on exp(logw) for the sampled variant).
    * `targetPred` marks the exemplar documents (evaluated per row of
    * `docs`).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val toks = hashedTokens(docs, idCol, textCol, targetPred, buckets)
    val counts = toks.groupBy("b").agg(count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val tots = counts.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val lam = counts.crossJoin(broadcast(tots))
      .select(col("b"),
        round(log(col("ct") + 1) - log(col("tt") + buckets)
          - log(col("cr") + 1) + log(col("tr") + buckets), 6).as("lam"))
    toks.join(broadcast(lam), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), round(sum("lam"), 6).as("logw"))
      .select(col("doc_id"), col("n_tokens"), col("logw"),
        when(col("logw") > 0, lit(1)).otherwise(lit(0)).as("selected"))
  }
}
