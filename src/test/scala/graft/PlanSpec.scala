package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{ExtQueries, RefQueries}

/** Physical-plan quality gates (the 100 TB posture, checked): column
  * pruning reaches the parquet scans, star joins broadcast their small
  * side, candidate generation never degenerates into a nested-loop /
  * cartesian join, and the hot paths stay inside whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.treeString

  test("q3: star join broadcasts, no shuffle of the dimension side") {
    val p = plan(RefQueries.q3Revenue(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q1: aggregation is partial before the exchange") {
    val p = plan(RefQueries.q1Pricing(spark, sf()))
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
    assert(p.contains("Exchange"))
  }

  test("lineitem scans prune columns (no full-width reads)") {
    val p = plan(RefQueries.q1Pricing(spark, sf()))
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty)
    // q1 touches 5 of 11 lineitem columns; the scan must not read more
    assert(readSchemas.forall(s => !s.contains("l_shipdate") && !s.contains("l_partkey")),
      readSchemas.mkString("\n"))
  }

  test("filters push down to the parquet scan") {
    val df = graft.model.Tables.lineitem(spark, sf())
      .filter(col("l_quantity") > 40).select("l_orderkey")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      p.take(2000))
  }

  test("LSH candidate joins are equi-joins, never nested-loop") {
    Seq(ExtQueries.x2MinhashLsh(spark, sf()),
      ExtQueries.x4NgramJaccard(spark, sf()),
      ExtQueries.x7SimLsh(spark, sf())).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        p.take(2000))
    }
  }

  test("x85: model weights broadcast, no UDF — the scoring plan is codegen + one doc exchange") {
    // VERDICT r6 next-round #4's plan gate: the learned quality filter
    // must join its weight vector broadcast (never shuffle the exploded
    // feature stream against it) and keep scoring inside codegen'd
    // expressions — a Scala UDF here would break whole-stage codegen on
    // the corpus-sized path.
    val df = ExtQueries.x85ModelQuality(spark, sf())
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p.take(2000))
    // partial aggregation runs before the doc_id exchange: the explode
    // never rides a shuffle unreduced. The tree prints top-down
    // (execution is bottom-up), so the partial HashAggregate must
    // appear BELOW the doc_id exchange and ABOVE the Generate that
    // explodes the features (ADVICE r7: a bare contains("HashAggregate")
    // is satisfied by any aggregate anywhere and guards nothing).
    val exIdx = p.indexOf("Exchange hashpartitioning(doc_id")
    assert(exIdx >= 0, p.take(3000))
    val genIdx = p.indexOf("Generate", exIdx)
    assert(genIdx >= 0, p.take(3000))
    val partialIdx = p.indexOf("HashAggregate", exIdx)
    assert(partialIdx >= 0 && partialIdx < genIdx,
      s"no HashAggregate between the doc_id exchange and the feature " +
        s"explode — the unreduced feature stream rides the shuffle:\n${p.take(3000)}")
  }

  test("x104: LM count tables broadcast; scoring stays codegen with one doc exchange") {
    // the x85 discipline applied to the bigram LM: all three count
    // tables (c2, c1 twice) must reach the corpus-sized bigram stream
    // as broadcasts — a shuffle of the exploded stream against any of
    // them is the 100 TB scale bug — and per-doc summation must
    // partial-aggregate below the doc_id exchange
    val df = ExtQueries.queries("x104_lm_perplexity")(spark, sf())
    val p = plan(df)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p.take(3000))
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p.take(2000))
    val exIdx = p.indexOf("Exchange hashpartitioning(doc_id")
    assert(exIdx >= 0, p.take(3000))
    val genIdx = p.indexOf("Generate", exIdx)
    val partialIdx = p.indexOf("HashAggregate", exIdx)
    assert(genIdx >= 0 && partialIdx >= 0 && partialIdx < genIdx,
      s"no partial HashAggregate between the doc_id exchange and the " +
        s"bigram explode — the unreduced stream rides the shuffle:\n${p.take(3000)}")
    // the unigram count table c1 joins the stream TWICE (context key
    // hw1, backoff key hw2); its training aggregation must be computed
    // once and reused, not rebuilt per join — the initial plan prints
    // two builds, so assert on the EXECUTED plan where AQE dedupes
    df.collect()
    val ep = df.queryExecution.executedPlan.toString
    assert("ReusedExchange|ReusedQueryStage|Reused".r.findAllIn(ep).nonEmpty,
      s"c1's broadcast build is duplicated — no exchange reuse in:\n${ep.take(3000)}")
  }

  test("a28/a29: the warehouse stars join entirely by broadcast, fact never shuffles") {
    // the canonical 100 TB warehouse plan: the lineitem fact joins four
    // (a28) / four+twice-nation (a29) broadcast dimensions — a
    // SortMergeJoin anywhere means a dimension rode a corpus-sized
    // shuffle
    Seq("a28_local_volume", "a29_trade_volume").foreach { q =>
      val p = plan(graft.queries.AnalyticsQueries.queries(q)(spark, sf()))
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, s"$q:\n${p.take(2000)}")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q fact shuffled for a dimension join:\n${p.take(2000)}")
    }
  }

  test("x107: the ensemble reads the corpus twice, not once per signal") {
    // the fusion contract: every count table (DSIR cr/ct, LM c1/c2)
    // and every total is a filtered view of ONE (kind, bucket)
    // training aggregate, shared via exchange reuse, so the executed
    // plan scans the documents parquet exactly twice — once for
    // training, once for scoring. A third scan means a signal
    // regressed to paying its own corpus IO.
    val df = ExtQueries.queries("x107_quality_ensemble")(spark, sf())
    df.collect()
    // structural count of EXECUTED parquet-scan sites: descend through
    // AQE wrappers and query stages, but never into an
    // InMemoryTableScan — the cached training aggregate's interior
    // build plan ran once at materialization, not per consumer
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def scans(p: SparkPlan): Int = p match {
      case _: InMemoryTableScanExec => 0
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case _: FileSourceScanExec => 1
      case o => (o.children ++ o.subqueries).map(scans).sum
    }
    val ep = df.queryExecution.executedPlan
    val n = scans(ep)
    assert(n <= 2, s"expected <=2 executed corpus-scan sites, got $n:\n${ep.toString.take(3000)}")
    assert(ep.toString.contains("InMemoryTableScan"),
      s"training aggregate not cached — each consumer pays its own scan:\n${ep.toString.take(3000)}")
  }

  test("x87: sets exchanges reuse; band exchanges stay narrow (no collect_set on the wire)") {
    // Two deliberate plan properties of the incremental probe:
    //  1. the VERIFICATION-set frames (collect_set buffers — the wide
    //     rows) materialize once per side and are reused by both join
    //     consumers (executed plan shows ReusedExchange);
    //  2. the BAND-side exchanges are a SEPARATE, column-pruned
    //     pipeline: candidate generation shuffles only (id, sig slots)
    //     — if a collect_set buffer ever rides a band exchange, the
    //     whole corpus' shingle sets ride the candidate shuffle, which
    //     is the scale bug the split exists to prevent. Full subtree
    //     reuse is therefore NOT the goal; narrowness is.
    val docs = graft.model.Tables.documents(spark, sf())
    val df = graft.ext.Dedup.incrementalNearDupPairs(
      docs.filter(col("doc_id") % 4 =!= 0),
      docs.filter(col("doc_id") % 4 === 0), "doc_id", "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val reused = "ReusedExchange|ReusedQueryStage|Reused".r.findAllIn(p).length
    assert(reused >= 2, s"expected >=2 reused set-frame exchanges, got $reused\n${p.take(3000)}")
    // every exchange that carries a collect_set buffer must partition by
    // id (the sets pipeline); band-key exchanges carry none of them
    val bandExchanges = p.split("\n").filter(l =>
      l.contains("Exchange hashpartitioning(bk"))
    assert(bandExchanges.forall(!_.contains("collect_set")),
      s"a band exchange carries shingle sets:\n${bandExchanges.mkString("\n")}")
  }

  test("video shingles are one doc-keyed window, not a frame self-join") {
    // VERDICT r8 #2: lead() over (doc_id, frame_no) produces the
    // 2-frame shingles with ONE exchange; the former self-join paid two
    // shuffles and a join on the frame table — at 100× frame volume
    // that join dominates. The shingle derivation (everything below the
    // distinct) must plan zero joins and exactly one doc-keyed window.
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}
    val frames = graft.ext.VideoHash.frameHashes(
      graft.model.Tables.documents(spark, sf()), "doc_id", "text")
    val sh = graft.ext.VideoHash.shingles(frames)
    val lp = sh.queryExecution.optimizedPlan
    assert(lp.collect { case j: LJoin => j }.isEmpty,
      s"shingles still self-join the frame table:\n${lp.treeString.take(2000)}")
    val wins = lp.collect { case w: LWindow => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"expected a doc-partitioned window:\n${lp.treeString.take(2000)}")
  }

  test("x53: each method's scored frame is derived once (exchanges reused)") {
    // VERDICT r6 #2: the top-k window and the candidate count of every
    // ANN method must read ONE scored pipeline. The sharing mechanism is
    // an explicit qid repartition both consumers sit on; after execution
    // the adaptive plan must show reused exchanges/stages, not five
    // duplicated scoring pipelines.
    val df = ExtQueries.x53AnnRecall(spark, sf())
    // collect() runs THIS frame's query execution (count() would spawn a
    // separate one, leaving df's adaptive plan unexecuted)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val reused = "ReusedExchange|ReusedQueryStage|Reused".r.findAllIn(p).length
    assert(reused >= 5, s"expected >=5 reused exchange/stage nodes, got $reused\n${p.take(3000)}")
  }

  test("partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    graft.model.Tables.events(spark, sf())
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("event_type") === "click")
      .select("event_id")
    val p = plan(df)
    // the event_type predicate must move into PartitionFilters, not a
    // post-scan Filter over all partitions
    assert(p.contains("PartitionFilters: ["), p.take(2000))
    assert("PartitionFilters: [^\\n]*event_type[^\\n]*".r.findFirstIn(p).isDefined,
      p.take(2000))
  }

  test("bucketed tables co-locate the join: no exchange between them") {
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a crashed prior run can leave the managed location behind
      rmrf(new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath, t))
    }
    graft.model.Tables.orders(spark, sf()).limit(1000)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    graft.model.Tables.lineitem(spark, sf()).limit(1000)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    // force the sort-merge path (tiny test tables would broadcast, which
    // hides bucketing); at real scale both sides exceed the threshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_custkey")
      val p = plan(j)
      // co-bucketed scans feed the join directly: no shuffle on either side
      assert(p.contains("SortMergeJoin"), p.take(3000))
      assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
      assert(p.contains("Bucketed: true"), p.take(3000))
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("runtime bloom-filter pruning injects into selective shuffle joins") {
    // At 100 TB the selective side of a shuffle join should row-filter
    // the big side's scan before the exchange: Spark's runtime bloom
    // filter does exactly that. The size thresholds are tuned for real
    // clusters, so lower the application-side floor to let the rewrite
    // fire at test scale and assert the bloom agg + might_contain pair
    // lands in the optimized plan.
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val scanKey = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val prevScan = spark.conf.get(scanKey)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(scanKey, "0")
      val li = graft.model.Tables.lineitem(spark, sf("sf0.01"))
      val o = graft.model.Tables.orders(spark, sf("sf0.01"))
        .filter(col("o_totalprice") > 400000)
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_totalprice")
      val p = j.queryExecution.optimizedPlan.treeString
      assert(p.contains("bloom_filter_agg") && p.contains("might_contain"),
        p.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set(scanKey, prevScan)
    }
  }

  test("no declared query plans an unpartitioned (single-partition) window", graft.Slow) {
    // Window.orderBy with no partitionBy moves EVERY row to one task
    // ("No Partition Defined" warning) — correct, but a scale-killer.
    // Global ranks must go through graft.ext.Ranking or a top-k
    // aggregate instead.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf())
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name plans an unpartitioned window: ${bad.headOption}")
    }
  }

  test("balanced sample plans the bounded-heap aggregate, not a window sort") {
    // the whole point of x47 over the row_number formulation: no Window
    // node, no per-stratum sort — partial top_k_pairs rides the exchange
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = ExtQueries.x47BalancedSample(spark, sf())
    assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty)
    assert(plan(df).contains("top_k_pairs"))
  }

  test("zorder histogram is one partial-aggregated exchange over a pruned scan") {
    val p = plan(ExtQueries.x46ZOrder(spark, sf()))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(readSchemas.forall(s => s.contains("p_size") && !s.contains("p_name")),
      readSchemas.mkString("\n"))
  }

  test("x52 IVF-PQ: scoring joins carry only codes, never raw vectors") {
    // the point of IVF-PQ at 100 TB: after training, the corpus side of
    // candidate generation + ADC scoring is (cell, sub, code) rows —
    // no join in the plan may move an array (vector) column around
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    import org.apache.spark.sql.types.ArrayType
    val df = ExtQueries.x52SimIvfPq(spark, sf())
    val joins = df.queryExecution.optimizedPlan.collect { case j: LJoin => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val arrays = j.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"join output carries array columns ${arrays.map(_.name)}:\n$j")
    }
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("flagship enrichment stays inside whole-stage codegen") {
    // AQE reveals codegen stages only in the final (executed) plan
    val df = RefQueries.flagshipStation(spark, sf())
    df.collect()
    // codegen stages render as "*(n) Operator" in the final tree
    val p = df.queryExecution.executedPlan.treeString
    assert(p.contains("*("), p.take(2000))
  }
}
