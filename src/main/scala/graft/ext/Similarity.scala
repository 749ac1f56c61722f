package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — north-star extension.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k via a broadcast of the query
  *    set against every candidate — the correctness baseline. At scale
  *    the query side is small (broadcast), the candidate scan is
  *    embarrassingly parallel, and the top-k is a per-query window.
  *  - [[lshTopK]]: random-hyperplane LSH — each vector gets an 8-bit
  *    sign bucket; candidates are only same-bucket vectors, turning the
  *    cross join into an equi-join on bucket. Recall < 1 by design;
  *    bucket count (2^planes) tunes the recall/cost trade.
  *
  * All arithmetic is double-precision with results rounded to 6 dp so
  * summation-order differences between engines vanish (SURVEY.md §7.4
  * risk 5); ranking orders by the rounded value with id tie-breaks, so
  * ranks are engine-stable too.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, in doubles. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query vector (`queryPred` selects the
    * query rows; self-matches excluded): (qid, rank, cid, sim).
    */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = broadcast(q).join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(cosine(col("qe"), col("ce")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
      .orderBy("qid", "rank")
  }

  /** Deterministic pseudo-random hyperplane component r(j, i) ∈ {+1, −1}
    * derived from a portable hash of the (plane, dimension) pair.
    */
  private def rComp(j: Column, i: Column): Column =
    when(Hashing.h32(concat(lit("rp-"), j.cast("string"), lit("-"), i.cast("string"))) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** 8-bit sign bucket of a vector under planes j = 0..7. */
  def hyperplaneBucket(e: Column, planes: Int = 8, dim: Int = 64): Column =
    array_join(
      transform(sequence(lit(0), lit(planes - 1)), j =>
        when(
          aggregate(sequence(lit(1), lit(dim)),
            lit(0.0),
            (acc, i) => acc + element_at(e, i).cast("double") * rComp(j, i)) > 0,
          lit("1")).otherwise(lit("0"))),
      "")

  /** Bucketed ANN: same output shape as [[bruteForceTopK]] but candidates
    * restricted to the query's hyperplane bucket.
    */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      hyperplaneBucket(col("embedding")).as("bucket"))
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("bucket"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(cosine(col("qe"), col("ce")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
      .orderBy("qid", "rank")
  }

  /** Embedding-cosine near-duplicate pairs, blocked by a column (e.g.
    * `label`) to bound the pair count: (a_id, b_id, sim ≥ threshold).
    */
  def embeddingNearDups(emb: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("ae"), col(blockCol).as("blk"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("be"), col(blockCol).as("blk"))
    a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), round(cosine(col("ae"), col("be")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy("a_id", "b_id")
  }
}
