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
  * Performance notes: vectors are unit-normalized ONCE before any join,
  * so the per-pair work is a single 64-slot dot product; the hyperplane
  * sign matrix is materialized as a literal at plan-build time (it's
  * input-independent — recomputing its hashes per row would be 512
  * md5 calls/row). All arithmetic is double with results rounded to
  * 6 dp so engine summation-order differences vanish (SURVEY.md §7.4
  * risk 5); ranking orders by the rounded value with id tie-breaks.
  */
object Similarity {

  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  // codegen'd tight loop (graft.expr.VecDot) — the interpreted
  // aggregate(zip_with(...)) formulation dominated every ANN/near-dup
  // query because it runs once per candidate PAIR
  private[ext] def dot(a: Column, b: Column): Column =
    toCol(graft.expr.VecDot(toExpr(a), toExpr(b)))

  private[ext] def l2sq(a: Column, b: Column): Column =
    toCol(graft.expr.VecL2Sq(toExpr(a), toExpr(b)))

  /** Cosine similarity of two float-array columns, in doubles. */
  def cosine(a: Column, b: Column): Column = {
    def dd(x: Column) = transform(x, v => v.cast("double"))
    val (ad, bd) = (dd(a), dd(b))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** (vec_id, unit, extra…) with unit = embedding/‖embedding‖ as doubles —
    * normalize once, join after.
    */
  private def unitized(emb: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val ed = transform(col("embedding"), x => x.cast("double"))
    emb.select((Seq(col("vec_id"), ed.as("ed")) ++ extra.map(col)): _*)
      .withColumn("nrm", sqrt(dot(col("ed"), col("ed"))))
      .select((Seq(col("vec_id"),
        transform(col("ed"), x => x / col("nrm")).as("unit")) ++ extra.map(col)): _*)
  }

  /** Rank a scored (qid, cid, sim) pair relation and keep each query's
    * top k. Public so recall/cost diagnostics (x53) can derive the
    * top-k and the candidate count from ONE persisted scored frame
    * instead of re-deriving the method's whole pipeline per consumer
    * (VERDICT r6 #2).
    */
  def topKFrom(scored: DataFrame, k: Int): DataFrame = rankTopK(scored, k)

  /** Rank the scored pairs and keep each query's top k. */
  private[ext] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
      .orderBy("qid", "rank")
  }

  /** Every (query, candidate) pair brute force scores — the pre-top-k
    * relation, exposed so recall/cost diagnostics (x53) can count the
    * work a method does in the SAME plan that measures its recall.
    * Counting prunes `sim`, so the cost probe doesn't pay for the dot
    * products.
    */
  def bruteForceScored(emb: DataFrame, queryPred: Column): DataFrame = {
    val u = unitized(emb)
    val q = u.filter(queryPred).select(col("vec_id").as("qid"), col("unit").as("qu"))
    val c = u.select(col("vec_id").as("cid"), col("unit").as("cu"))
    broadcast(q).join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(dot(col("qu"), col("cu")), 6).as("sim"))
  }

  /** Exact top-k neighbors for each query vector (`queryPred` selects the
    * query rows; self-matches excluded): (qid, rank, cid, sim).
    */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame =
    rankTopK(bruteForceScored(emb, queryPred), k)

  /** Deterministic ±1 hyperplane components, precomputed at plan build.
    * Must stay bit-identical to the oracle's runtime derivation:
    * +1 iff ('0x' ‖ md5("rp-<j>-<i>")[0,8)) is even.
    */
  private lazy val planeSigns: IndexedSeq[Seq[Double]] =
    (0 until 8).map { j =>
      (1 to 64).map { i =>
        if (graft.expr.HashUtil.md5Prefix64(s"rp-$j-$i", 8) % 2 == 0) 1.0 else -1.0
      }
    }

  /** 8-bit sign bucket of a vector under the precomputed planes. */
  def hyperplaneBucket(e: Column): Column =
    concat((0 until 8).map { j =>
      val plane = typedLit(planeSigns(j))
      when(dot(transform(e, x => x.cast("double")), plane) > 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Same-bucket (query, candidate) pairs with their cosine — LSH's
    * pre-top-k relation (see [[bruteForceScored]] for why it's public).
    */
  def lshScored(emb: DataFrame, queryPred: Column): DataFrame = {
    val bucketed = unitized(emb.withColumn("bucket", hyperplaneBucket(col("embedding"))),
      extra = Seq("bucket"))
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("qid"), col("unit").as("qu"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("cid"), col("unit").as("cu"), col("bucket"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(dot(col("qu"), col("cu")), 6).as("sim"))
  }

  /** Bucketed ANN: same output shape as [[bruteForceTopK]] but candidates
    * restricted to the query's hyperplane bucket.
    */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame =
    rankTopK(lshScored(emb, queryPred), k)

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    * its nearest centroid cell; queries probe their `probes` nearest
    * cells (multi-probe recovers recall lost at cell boundaries for the
    * cost of `probes`× the candidate volume — still an equi-join, never a
    * cross join).
    *
    * Centroids here are the per-`label` means (deterministic, no
    * iterative k-means — the plumbing is the point; components rounded
    * to 6 dp so both engines agree bit-for-bit). At scale this is the
    * classic IVF shape: centroid table broadcast, one shuffle to
    * cell-partition the corpus, probes are equi-joins on cell id.
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int, probes: Int = 1): DataFrame =
    ivfTopKWith(emb, labelMeanCentroids(emb), queryPred, k, probes)

  /** Per-`label` mean centroids (deterministic, 6 dp), re-assembled into
    * ordered arrays — the non-iterative coarse quantizer [[ivfTopK]] uses.
    */
  def labelMeanCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("label", "i").agg(round(avg(col("v").cast("double")), 6).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c")).as("ce"))
      .select(col("label").as("cent_label"), col("ce"))

  /** IVF search against learned centroids (e.g. [[KMeans.centroids]],
    * renamed to (cent_label, ce)) — same cell-equi-join shape, no label
    * column required on the corpus.
    */
  def ivfTopKWith(emb: DataFrame, cent: DataFrame, queryPred: Column,
                  k: Int, probes: Int = 1): DataFrame =
    rankTopK(ivfScoredWith(emb, cent, queryPred, probes), k)

  /** IVF's pre-top-k relation: probed-cell (query, candidate) pairs with
    * their cosine (see [[bruteForceScored]] for why it's public).
    */
  def ivfScoredWith(emb: DataFrame, cent: DataFrame, queryPred: Column,
                    probes: Int = 1): DataFrame = {
    // assign each vector to its nearest centroid (L2, label tiebreak)
    val ed = transform(col("embedding"), x => x.cast("double"))
    val dist = l2sq(col("ed"), col("ce"))
    val ranked = emb.select(col("vec_id"), ed.as("ed"))
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), col("ed"), col("cent_label"), dist.as("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d"), col("cent_label"))))
      .filter(col("rn") <= math.max(1, probes))
      .withColumn("nrm", sqrt(dot(col("ed"), col("ed"))))
      .select(col("vec_id"), col("cent_label").as("cell"), col("rn"),
        transform(col("ed"), x => x / col("nrm")).as("unit"))

    // corpus vectors live in their home cell only; queries fan out to all
    // probed cells (each candidate has one home cell, so no pair dedup)
    val q = ranked.filter(queryPred)
      .select(col("vec_id").as("qid"), col("unit").as("qu"), col("cell"))
    val c = ranked.filter(col("rn") === 1)
      .select(col("vec_id").as("cid"), col("unit").as("cu"), col("cell"))
    broadcast(q).join(c, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(dot(col("qu"), col("cu")), 6).as("sim"))
  }

  /** [[ivfTopK]]'s pre-top-k pair relation with per-label mean centroids. */
  def ivfScored(emb: DataFrame, queryPred: Column, probes: Int = 1): DataFrame =
    ivfScoredWith(emb, labelMeanCentroids(emb), queryPred, probes)

  /** Embedding-cosine near-duplicate pairs, blocked by a column (e.g.
    * `label`) to bound the pair count: (a_id, b_id, sim ≥ threshold).
    *
    * Skew guard (VERDICT r6 #3): the within-block join is O(|block|²),
    * so a coarse or skewed block key (one label holding most of a
    * clustered corpus — the realistic 100 TB shape) would recreate the
    * quadratic the blocking exists to avoid. Blocks larger than
    * `maxBlock` rows are SUBDIVIDED by the vector's 8-bit hyperplane
    * sign bucket ([[hyperplaneBucket]] — deterministic, so both engines
    * replay it): cosine is scale-invariant and near-parallel vectors
    * share sign bits with high probability, so true near-dups stay
    * co-located while the block fans out up to 256-way. Pairs split
    * across sign buckets are the (documented) recall trade — exactly
    * the LSH bargain the hyperplane ANN path already makes. The default
    * cap never triggers at the tested SFs, so declared rows stay
    * oracle-exact; a residual hot sub-block after widening is a genuine
    * near-dup clique whose pair count is output, not waste.
    */
  def embeddingNearDups(emb: DataFrame, blockCol: String, threshold: Double,
                        maxBlock: Int = 4096,
                        sorted: Boolean = true): DataFrame = {
    require(maxBlock >= 1, s"maxBlock must be >= 1, got $maxBlock")
    val u = unitized(emb, extra = Seq(blockCol)).withColumnRenamed(blockCol, "blk0")
    // oversized-block census: tiny by construction (keys above the cap),
    // so the flag reaches the rows via broadcast
    val oversized = u.groupBy("blk0").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlock).select(col("blk0"), lit(1).as("__wide"))
    val widened = u.join(broadcast(oversized), Seq("blk0"), "left")
      .withColumn("blk",
        when(col("__wide").isNotNull,
          concat(col("blk0").cast("string"), lit("#"), hyperplaneBucket(col("unit"))))
          .otherwise(col("blk0").cast("string")))
    val a = widened.select(col("vec_id").as("a_id"), col("unit").as("au"), col("blk"))
    val b = widened.select(col("vec_id").as("b_id"), col("unit").as("bu"), col("blk"))
    val pairs = a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), round(dot(col("au"), col("bu")), 6).as("sim"))
      .filter(col("sim") >= threshold)
    // the declared x5 row needs the total order; set-shaped consumers
    // (connected components, ledger kernels) skip the range exchange
    if (sorted) pairs.orderBy("a_id", "b_id") else pairs
  }

  /** First-occurrence curation verdicts for an arriving tranche of
    * embeddings — [[graft.ext.Dedup.ledgerProbe]]'s exact semantics at
    * the SEMANTIC layer, completing the five-modality verdict grid the
    * x112 batch ledger carries (text, image, audio, video, embedding):
    * exact_dup when the IDENTICAL vector is already standing (or a
    * smaller-id copy shares the tranche; identity is the vector alone,
    * block-independent), near_dup on a `blockCol`-blocked cosine ≥
    * `threshold` pair — [[embeddingNearDups]]' criterion, same 6-dp
    * rounding — against any standing vector or an earlier-first
    * tranche vector, kept otherwise.
    *
    * Verdicts are final at arrival and judged at the DISTINCT-VECTOR
    * level: exact duplication comes from vector identity alone, and
    * only each distinct vector's first occurrence enters the cosine
    * probe — a re-encoded 10k-copy embedding is ONE probed row, never
    * m² member pairs. Standing blocks beyond `maxBlock` DISTINCT
    * vectors are dropped from near-candidate generation (the capped
    * probe discipline of the text/image layers; below the cap the
    * verdicts equal a first-seen replay of the batch operator —
    * [[embeddingNearDups]] instead sub-buckets oversized blocks, so
    * above the cap the two diverge by design).
    *
    * Scale path: when the standing corpus is a persisted vector store
    * rather than a frame, use [[IvfIndex.ledgerProbe]] — same verdict
    * contract with IVF cells as the blocks and the standing side read
    * through partition-pruned cell filters.
    */
  def ledgerProbe(standing: DataFrame, incoming: DataFrame,
                  idCol: String, embCol: String, blockCol: String,
                  threshold: Double, maxBlock: Int = 4096): DataFrame = {
    require(maxBlock >= 1, s"maxBlock must be >= 1, got $maxBlock")
    def mem(df: DataFrame): DataFrame = df.select(col(idCol).as("id"),
      transform(col(embCol), x => x.cast("double")).as("e"),
      col(blockCol).as("blk"))
    val memS = mem(standing)
    val memN = mem(incoming)
    val firstOcc = memN.groupBy("e")
      .agg(min(struct(col("id"), col("blk"))).as("m"))
      .select(col("e"), col("m.id").as("fid"), col("m.blk").as("blk"))
    val standingV = memS.select("e").distinct()
    val exact = memN.join(standingV, Seq("e"), "left_semi").select("id")
      .unionByName(memN.join(firstOcc.select("e", "fid"), "e")
        .filter(col("id") =!= col("fid")).select("id"))
      .distinct().withColumn("ex", lit(1))
    def unit(df: DataFrame): DataFrame = df
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      .withColumn("u", transform(col("e"), x => x / col("nrm")))
    val sDist = memS.select("e", "blk").distinct()
    val oversized = sDist.groupBy("blk").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlock).select("blk")
    val sCap = unit(sDist.join(broadcast(oversized), Seq("blk"), "left_anti"))
      .select(col("blk"), col("u").as("su"))
    val pN = unit(firstOcc)
    val cross = pN.join(sCap, "blk")
      .filter(round(dot(col("u"), col("su")), 6) >= threshold)
      .select(col("e"))
    val within = pN.as("a")
      .join(pN.select(col("blk"), col("fid").as("p_fid"),
        col("u").as("pu")), "blk")
      .filter(col("p_fid") < col("fid") &&
        round(dot(col("u"), col("pu")), 6) >= threshold)
      .select(col("a.e"))
    val nearC = cross.unionByName(within).distinct()
    val near = memN.join(nearC, Seq("e"), "left_semi")
      .select("id").distinct().withColumn("nd", lit(1))
    incoming.select(col(idCol).as("doc_id"))
      .join(exact.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .join(near.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex") === 1, lit("exact_dup"))
          .when(col("nd") === 1, lit("near_dup"))
          .otherwise(lit("kept")).as("decision"))
  }
}
