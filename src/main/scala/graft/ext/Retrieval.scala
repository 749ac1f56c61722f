package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — BM25, the canonical ranked
  * keyword search (Robertson & Zaragoza, "The Probabilistic Relevance
  * Framework: BM25 and Beyond"; the Lucene-style idf
  * ln(1 + (N − df + ½)/(df + ½)), always positive). The retrieval
  * complement to the ANN family: embeddings answer "semantically
  * near", BM25 answers "lexically relevant" — LLM data pipelines run
  * both (eval-set decontamination sweeps, targeted corpus audits,
  * RAG-style lookups).
  *
  * Scale shape (100 TB): ONE corpus tokenization feeds everything.
  * The query set is tiny and broadcast; the per-term document
  * frequencies are joined down to query terms FIRST (the resulting
  * (term, df) frame is |query vocabulary|-sized, then broadcast), so
  * the only corpus-sized work is the (doc, term) frequency aggregation
  * and one doc-keyed equi-join against per-doc lengths. The final
  * top-k window partitions by query id — never a global sort of the
  * corpus. Scores are ranked on their ROUNDED value (6 dp) so
  * cross-engine float-summation-order noise cannot flip ranks.
  */
object Retrieval {

  /** Top-k documents per query by BM25: (qid, rank, doc_id, score,
    * n_hits). `queries` is a small (qid, qtext) frame — it is
    * broadcast; query terms are deduplicated (set semantics, the
    * standard short-query form).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("t"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg("len").as("avgdl"))
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val qterms = queries.select(col("qid"),
      explode(array_distinct(split(col("qtext"), " "))).as("t"))
    // df restricted to query terms before it is broadcast: the full
    // per-term df relation is vocabulary-sized, the restricted one is
    // |query vocabulary|-sized
    val qdf = tok.select("doc_id", "t").distinct()
      .join(broadcast(qterms.select("t").distinct()), "t")
      .groupBy("t").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(qterms), "t")
      .join(broadcast(qdf), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgdl")))).as("w"))
      .groupBy("qid", "doc_id")
      .agg(round(sum("w"), 6).as("score"), count(lit(1)).as("n_hits"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"), col("n_hits"))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke's RRF) of several ranked
    * retrieval lists — the standard hybrid-retrieval combiner: each
    * list contributes 1/(kRrf + rank) for every (query, doc) it ranks,
    * the fused score is the sum, and a doc ranked moderately by SEVERAL
    * systems beats a doc ranked top by one — exactly the property that
    * makes BM25 + ANN fusion robust to either system's blind spots.
    *
    * `rankTables` are (qid, doc_id, rank) frames (any extra columns
    * ignored). Scale shape: each input is already a per-query top-k
    * (tiny relative to the corpus); fusion is one union + one
    * partial-aggregating groupBy + a per-query window — nothing
    * corpus-sized. Fused scores are rounded to 6 dp before ranking so
    * float noise cannot flip ranks between engines; `n_lists` reports
    * how many systems surfaced the doc.
    */
  def reciprocalRankFusion(rankTables: Seq[DataFrame], kRrf: Int = 60,
                           topK: Int = 10): DataFrame = {
    require(rankTables.nonEmpty, "rrf: need at least one rank table")
    require(kRrf >= 1 && topK >= 1, s"rrf: bad kRrf=$kRrf topK=$topK")
    val tagged = rankTables
      .map(_.select(col("qid"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = tagged.groupBy("qid", "doc_id")
      .agg(round(sum(lit(1.0) / (lit(kRrf) + col("rank"))), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf"), col("n_lists"))
  }
}
