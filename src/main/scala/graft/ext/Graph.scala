package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link analysis over edge relations — the textbook
  * bulk-synchronous PageRank shape (one edges⋈ranks shuffle + one
  * partial-aggregating groupBy per round), with INTEGER-EXACT
  * arithmetic so ranks are bit-identical in any engine and under any
  * partitioning: all mass is held in scaled BIGINTs, per-node
  * contributions use truncating integer division, and the damped
  * update is `base + (85 * Σcontrib) div 100`. Floating-point PageRank
  * cannot be oracle-checked across engines (summation order drifts);
  * this formulation can. Reference analog: the view-count popularity
  * signal the reference extracts but drops (`video_processor.py:106`),
  * upgraded to a graph-global score.
  *
  * Scale: per round, ranks ride one equi-join keyed by node id and one
  * sum keyed by destination — both bounded-width rows; degrees are a
  * node-sized relation that AQE broadcasts when small. Each round is
  * `localCheckpoint`ed (the KMeans/CC lineage pattern) so round N's
  * plan never re-analyzes rounds 1..N-1. Choose `scale` such that
  * `nodes * scale * 85` stays below 2^63 (1e9 is safe to ~1e8 nodes;
  * drop to 1e6 for a 1e11-node web graph).
  */
object Graph {

  /** `iters` damped PageRank rounds over a directed edge list. Every
    * node must have at least one out-edge (pass an undirected /
    * symmetrized edge set, as near-dup graphs naturally are): dangling
    * nodes would silently leak mass, so they fail loudly instead.
    * Returns `(node, rank)` with `rank` in units of `scale` (initial
    * rank == `scale`, corpus mass ≈ nodes × scale).
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 10, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && scale >= 100, "pageRankInt: need iters >= 1, scale >= 100")
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v")).localCheckpoint()
    val dangling = e.select(col("v").as("node"))
      .join(e.select(col("u").as("node")), Seq("node"), "left_anti").count()
    require(dangling == 0L,
      s"pageRankInt: $dangling node(s) have no out-edges — symmetrize the " +
        "edge set (dangling nodes would silently leak rank mass)")
    // the static out-degree rides inside the rank relation, so a round
    // is ONE edges⋈contribs equi-join plus one partial-aggregating sum —
    // no separate rank⋈degree join per round
    val deg = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val base = 15L * scale / 100L
    var rank = deg.select(col("node"), col("d"), lit(scale).as("rank"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val contribs = rank.select(col("node").as("u"),
        expr("rank div d").as("contrib"))
      val sums = e.join(contribs, "u")
        .groupBy(col("v").as("node")).agg(sum("contrib").as("s"))
      rank = deg.join(sums, Seq("node"), "left")
        .select(col("node"), col("d"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        .localCheckpoint()
      i += 1
    }
    rank.select("node", "rank")
  }

  /** Personalized (seeded) PageRank — the seed-expansion move of corpus
    * curation: given a curated seed set, rank every node by graph
    * proximity to it (label propagation with damping). Same
    * integer-exact machinery as [[pageRankInt]], but mass enters ONLY
    * at seeds: seeds start at `scale` and receive the teleport base
    * each round, non-seeds start at 0 and receive none, so a node
    * further than `iters` hops from every seed exactly holds rank 0 —
    * the output is naturally sparse however large the graph.
    * `seeds` must be a node-id relation (one column); same no-dangling
    * requirement as [[pageRankInt]].
    */
  def personalizedPageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                              seeds: DataFrame, iters: Int = 10,
                              scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && scale >= 100,
      "personalizedPageRankInt: need iters >= 1, scale >= 100")
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v")).localCheckpoint()
    val dangling = e.select(col("v").as("node"))
      .join(e.select(col("u").as("node")), Seq("node"), "left_anti").count()
    require(dangling == 0L,
      s"personalizedPageRankInt: $dangling node(s) have no out-edges — " +
        "symmetrize the edge set")
    val sd = seeds.select(seeds.columns.head).toDF("node")
      .select(col("node").cast("long").as("node")).distinct()
    val deg = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
      .join(sd.select(col("node"), lit(1L).as("seed")), Seq("node"), "left")
      .select(col("node"), col("d"), coalesce(col("seed"), lit(0L)).as("seed"))
      .localCheckpoint()
    val base = 15L * scale / 100L
    var rank = deg.select(col("node"), col("d"), col("seed"),
      (col("seed") * scale).as("rank")).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contribs = rank.select(col("node").as("u"),
        expr("rank div d").as("contrib"))
      val sums = e.join(contribs, "u")
        .groupBy(col("v").as("node")).agg(sum("contrib").as("s"))
      rank = deg.join(sums, Seq("node"), "left")
        .select(col("node"), col("d"), col("seed"),
          (col("seed") * base +
            expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        .localCheckpoint()
      i += 1
    }
    rank.select("node", "rank")
  }
}
