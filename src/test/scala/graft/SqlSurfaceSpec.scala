package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** The SQL-string surface: users of the engine can register the tables
  * as views and run plain `spark.sql` — results must match the
  * DataFrame-API formulation (same Catalyst plans underneath).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame API") {
    Seq("lineitem", "orders", "customer").foreach { t =>
      Tables.table(spark, sf(), t).createOrReplaceTempView(t)
    }
    val viaSql = spark.sql(
      """SELECT c_mktsegment, count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    val viaApi = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf()), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
  }

  test("the full GraftExtensions function library is SQL-callable end-to-end") {
    // the shared test session is built .withExtensions(new
    // GraftExtensions) (SparkSpec) — every call here goes through the
    // real injectFunction wiring, no hand-registered builders
    val r = spark.sql(
      """SELECT
        |  md5_prefix64('hello', 8) AS h,
        |  word_shingles('a b c', 2) AS s,
        |  vec_dot(array(1d, 2d), array(3d, 4d)) AS d,
        |  vec_l2sq(array(0d, 0d), array(3d, 4d)) AS l2,
        |  sorted_long_intersect(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS n,
        |  subword_token_count('the ration') AS t,
        |  url_canonical('HTTP://H.org/p?utm_a=1&q=2#f') AS u""".stripMargin)
      .collect().head
    assert(r.getLong(0) == graft.expr.HashUtil.md5Prefix64("hello", 8))
    assert(r.getSeq[String](1) == Seq("a b", "b c"))
    assert(r.getDouble(2) == 11.0)
    assert(r.getDouble(3) == 25.0)
    assert(r.getLong(4) == 2L)
    assert(r.getLong(5) == 3L)
    assert(r.getString(6) == "http://h.org/p?q=2")
  }

  test("top_k_pairs aggregate is SQL-callable end-to-end") {
    val rows = spark.sql(
      """SELECT g, top_k_pairs(score, term, 2) AS top
        |FROM VALUES (1, 5L, 'a'), (1, 7L, 'b'), (1, 3L, 'c'), (2, 1L, 'z')
        |  AS t(g, score, term)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getString(1)))
    assert(g1 == Seq((7L, "b"), (5L, "a")))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(1L))
  }

  test("cms_sketch aggregate is SQL-callable end-to-end") {
    val r = spark.sql(
      """SELECT cms_sketch(t, 2, 8) AS sk
        |FROM VALUES ('a'), ('a'), ('b') AS v(t)""".stripMargin).collect().head
    val sk = r.getSeq[Long](0)
    assert(sk.length == 16)
    assert(sk.sum == 6L) // 3 terms x 2 rows
    // row-0 cell of 'a' holds both copies
    val b0 = (graft.expr.HashUtil.md5Prefix64("0:a", 8) % 8).toInt
    assert(sk(b0) >= 2L)
  }

  test("asof_join is callable as a SQL table-valued function") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 10L)).toDF("k", "t").createOrReplaceTempView("asof_l")
    Seq((1L, 5L), (1L, 9L), (1L, 11L)).toDF("k", "t").createOrReplaceTempView("asof_r")
    val back = spark.sql(
      "SELECT k, matched FROM asof_join('asof_l', 'asof_r', 'k', 't') ORDER BY k")
      .collect()
    assert(back(0).getLong(1) == 9L)   // latest right <= 10
    assert(back(1).isNullAt(1))        // key 2 has no right rows
    val fwd = spark.sql(
      "SELECT matched FROM asof_join('asof_l', 'asof_r', 'k', 't', 'forward') WHERE k = 1")
      .collect()
    assert(fwd.head.getLong(0) == 11L) // earliest right >= 10
    val nonLit = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('asof_l', 'asof_r', 'k', lower('T'))").collect()
    }
    assert(nonLit.getMessage.contains("string literal"))
  }

  test("range_join is callable as a SQL table-valued function") {
    import spark.implicits._
    Seq((1L, 5L), (2L, 15L)).toDF("id", "p").createOrReplaceTempView("rj_pts")
    Seq((10L, 0L, 9L), (20L, 10L, 19L), (30L, 4L, 16L))
      .toDF("iid", "lo", "hi").createOrReplaceTempView("rj_iv")
    val rows = spark.sql(
      """SELECT id, iid FROM range_join('rj_pts', 'rj_iv', 'p', 'lo', 'hi')
        |ORDER BY id, iid""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (1L, 30L), (2L, 20L), (2L, 30L)))
  }

  test("chunk_dedup and substring_dedup are callable as SQL table functions") {
    import spark.implicits._
    val span = (1 to 16).map(i => s"s$i").mkString(" ")
    Seq((0L, s"$span tail a"), (1L, s"$span tail a"), (2L, "fresh words here"))
      .toDF("doc_id", "text").createOrReplaceTempView("sd_docs")
    val cd = spark.sql(
      """SELECT doc_id, n_kept FROM chunk_dedup('sd_docs', 'doc_id', 'text', 16)
        |ORDER BY doc_id""".stripMargin).collect()
    assert(cd.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 2L), (1L, 0L), (2L, 1L)))   // exact dup keeps nothing
    val sd = spark.sql(
      """SELECT doc_id, n_removed
        |FROM substring_dedup('sd_docs', 'doc_id', 'text', 16)
        |ORDER BY doc_id""".stripMargin).collect()
    assert(sd.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 18L), (2L, 0L)))  // dup doc fully covered
  }

  test("budget_select and first_occurrence_dedup are callable as SQL table functions") {
    import spark.implicits._
    Seq((1L, 9L, 10L), (2L, 9L, 10L), (3L, 5L, 100L), (4L, 1L, 1L))
      .toDF("doc_id", "quality", "n_tokens").createOrReplaceTempView("bs_docs")
    val bs = spark.sql(
      """SELECT doc_id, cum_tokens
        |FROM budget_select('bs_docs', 'quality', 'doc_id', 'n_tokens', 25)
        |ORDER BY doc_id""".stripMargin).collect()
    assert(bs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    Seq((1L, "A", 1, 10L), (2L, "B", 1, 11L), (3L, "A", 2, 5L), (4L, "C", 2, 6L),
      (5L, "C", 2, 7L))
      .toDF("id", "k", "tranche", "arrival").createOrReplaceTempView("fo_rows")
    val fo = spark.sql(
      """SELECT id, status
        |FROM first_occurrence_dedup('fo_rows', 'k', 'tranche', 'arrival')
        |ORDER BY id""".stripMargin).collect()
    assert(fo.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "kept"), (2L, "kept"), (3L, "dup_cross"),
        (4L, "kept"), (5L, "dup_within")))
  }

  test("containment_pairs, curriculum_interleave and sq8_stats are callable as SQL table functions") {
    import spark.implicits._
    val words = (0 until 60).map(i => s"w$i")
    Seq((0L, words.mkString(" ")), (1L, words.take(10).mkString(" ")),
      (2L, (100 until 140).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text").createOrReplaceTempView("cp_docs")
    val cp = spark.sql(
      """SELECT a_id, b_id, containment
        |FROM containment_pairs('cp_docs', 'doc_id', 'text', 5, 0.8)
        |ORDER BY a_id, b_id""".stripMargin).collect()
    assert(cp.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((0L, 1L, 1.0)))
    (1L to 10L).map(i => (i, i * 100L)).toDF("doc_id", "score_ppm")
      .createOrReplaceTempView("ci_docs")
    val ci = spark.sql(
      """SELECT doc_id, bucket, pos
        |FROM curriculum_interleave('ci_docs', 'doc_id', 'score_ppm', 4)
        |ORDER BY pos, bucket""".stripMargin).collect()
    assert(ci.length == 10)
    assert(ci.take(4).map(_.getAs[Long]("bucket")).toSet == Set(0L, 1L, 2L, 3L))
    Seq((1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 3.0f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("sq_vecs")
    val sq = spark.sql(
      "SELECT dim, mn, mx FROM sq8_stats('sq_vecs', 'embedding') ORDER BY dim")
      .collect()
    assert(sq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 0L, 1000000L), (1L, 1000000L, 3000000L)))
  }

  test("hll_sketch aggregate is SQL-callable end-to-end") {
    import spark.implicits._
    (1 to 500).map(i => s"term$i").toDF("s").createOrReplaceTempView("hll_terms")
    val r = spark.sql(
      """SELECT size(hll_sketch(s)) AS m,
        |  round(0.7213/(1 + 1.079/256) * 65536 /
        |    aggregate(hll_sketch(s), 0.0D, (acc, x) -> acc + power(2.0D, -x)), 1) AS est
        |FROM hll_terms""".stripMargin).collect()(0)
    assert(r.getInt(0) == 256)
    assert(math.abs(r.getDouble(1) - 500.0) / 500.0 < 0.5)
  }

  test("table_profile and snapshot_diff table functions work from pure SQL") {
    import spark.implicits._
    Seq((1L, Some("a"), 10L), (2L, Some("a"), 20L), (3L, None, 20L))
      .toDF("id", "s", "v").createOrReplaceTempView("tp_t")
    val prof = spark.sql(
      """SELECT col_name, n_nonnull, n_null, n_distinct, min_s, max_s
        |FROM table_profile('tp_t') ORDER BY col_name""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(prof.toSeq == Seq(
      ("id", 3L, 0L, 3L, "1", "3"),
      ("s", 2L, 1L, 1L, "a", "a"),
      ("v", 3L, 0L, 2L, "10", "20")))
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "body")
      .createOrReplaceTempView("snap_a")
    Seq((2L, "y"), (3L, "Z"), (4L, "w")).toDF("id", "body")
      .createOrReplaceTempView("snap_b")
    val diff = spark.sql(
      "SELECT id, status FROM snapshot_diff('snap_a', 'snap_b', 'id') ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(diff.toSeq == Seq(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // schema mismatch is an analysis-time error, not silent garbage
    Seq((1L, 2L)).toDF("id", "other").createOrReplaceTempView("snap_c")
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM snapshot_diff('snap_a', 'snap_c', 'id')").collect()
    }
    assert(err.getMessage.contains("schemas differ"))
  }

  test("bloom_sketch aggregate is SQL-callable end-to-end") {
    import spark.implicits._
    (1 to 300).map(i => s"key$i").toDF("s").createOrReplaceTempView("bloom_keys")
    // 1024 bits / 4 hashes -> 16 words; popcount grows with inserts but
    // stays below saturation at n=300 (fill 1-e^(-1200/1024) ~ 69%)
    val r = spark.sql(
      """SELECT size(bloom_sketch(s, 1024, 4)) AS words,
        |  aggregate(bloom_sketch(s, 1024, 4), 0, (acc, w) -> acc + bit_count(w)) AS bits
        |FROM bloom_keys""".stripMargin).collect()(0)
    assert(r.getInt(0) == 16)
    assert(r.getInt(1) > 400 && r.getInt(1) < 1024, s"bits set ${r.getInt(1)}")
    // build + probe entirely from SQL: inserted keys all positive, a
    // disjoint key set mostly negative (FP-rate bounded)
    val probed = spark.sql(
      """WITH f AS (SELECT bloom_sketch(s, 1024, 4) AS w FROM bloom_keys)
        |SELECT count(*) FILTER (WHERE bloom_might_contain(w, s, 1024, 4)
        |                        AND s LIKE 'key%') AS pos_in,
        |  count(*) FILTER (WHERE bloom_might_contain(w, s, 1024, 4)
        |                   AND s LIKE 'other%') AS pos_out
        |FROM (SELECT s FROM bloom_keys
        |      UNION ALL SELECT concat('other', s) FROM bloom_keys) CROSS JOIN f
        |""".stripMargin).collect()(0)
    assert(probed.getLong(0) == 300L, s"false negatives via SQL probe: $probed")
    assert(probed.getLong(1) < 200L, s"SQL probe FP count out of envelope: $probed")
  }

  test("model_quality_score and incremental_neardup_pairs are callable as SQL table functions") {
    import spark.implicits._
    // hand-built 2-bucket model: any feature hashing to bucket 0 scores
    // +5, bucket 1 scores -3 — the per-doc sums are checkable by eye
    Seq((0L, 5L), (1L, -3L)).toDF("bucket", "wt")
      .createOrReplaceTempView("mq_weights")
    Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
      .createOrReplaceTempView("mq_docs")
    val mq = spark.sql(
      """SELECT doc_id, n_features, score, keep
        |FROM model_quality_score('mq_docs', 'mq_weights', 'doc_id', 'text', 2)
        |ORDER BY doc_id""".stripMargin).collect()
    def b(f: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(x => f"$x%02x").mkString, 16) % 2
    }
    def wt(x: Long): Long = if (x == 0) 5 else -3
    val s1 = Seq("a", "b", "a b").map(f => wt(b(f))).sum
    val s2 = wt(b("c"))
    assert(mq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq ==
      Seq((1L, 3L, s1, if (s1 > 0) 1 else 0), (2L, 1L, s2, if (s2 > 0) 1 else 0)))
    // incremental pairs: the standing pair (10,11) must NOT be emitted;
    // the new doc matches both standing docs (cross) and its in-batch
    // twin (within)
    val base = (0 until 30).map(i => s"t$i").mkString(" ")
    Seq((10L, base), (11L, base + " x")).toDF("doc_id", "text")
      .createOrReplaceTempView("inc_standing")
    Seq((20L, base + " y"), (21L, base + " y")).toDF("doc_id", "text")
      .createOrReplaceTempView("inc_new")
    val inc = spark.sql(
      """SELECT a_id, b_id, src
        |FROM incremental_neardup_pairs('inc_standing', 'inc_new', 'doc_id', 'text')
        |ORDER BY a_id, b_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(inc.toSeq == Seq((10L, 20L, "cross"), (10L, 21L, "cross"),
      (11L, 20L, "cross"), (11L, 21L, "cross"), (20L, 21L, "within")))
  }

  test("ivf_assign_with and codebook_drift are callable as SQL table functions") {
    import spark.implicits._
    def vec(base: Double): Array[Float] = {
      val a = Array.fill(8)(0.0f); a(0) = base.toFloat; a
    }
    (0 until 20).map(i => (i.toLong, vec(if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("cb_standing")
    Seq((100L, vec(1.0)), (101L, vec(-1.0)), (102L, vec(8.0)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("cb_new")
    val asg = spark.sql(
      """SELECT vec_id, cell, dist
        |FROM ivf_assign_with('cb_new', 'cb_standing', 2, 2)
        |ORDER BY vec_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the two in-distribution vectors sit exactly on their centroids
    assert(asg.length == 3)
    assert(asg(0)._3 == 0L && asg(1)._3 == 0L)
    assert(asg(0)._2 != asg(1)._2)
    assert(asg(2)._3 > 0L)
    val drift = spark.sql(
      """SELECT cell, n_new, retrain
        |FROM codebook_drift('cb_standing', 'cb_new', 2, 2, 2)
        |ORDER BY cell""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // the far vector drags exactly one cell's appended mean over 2x
    assert(drift.count(_._3 == 1) == 1, drift.mkString(","))
  }

  test("bm25_topk is callable as a SQL table function") {
    import spark.implicits._
    Seq((1L, "spark query engine"), (2L, "spark spark spark runtime"),
      (3L, "query planner"), (4L, "none of these words"))
      .toDF("doc_id", "text").createOrReplaceTempView("bm_docs")
    Seq((1L, "spark query")).toDF("qid", "qtext")
      .createOrReplaceTempView("bm_queries")
    val r = spark.sql(
      """SELECT rank, doc_id, n_hits
        |FROM bm25_topk('bm_docs', 'bm_queries', 'doc_id', 'text', 2)
        |ORDER BY rank""".stripMargin).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 2)
    assert(r(0) == ((1, 1L, 2L)), r.mkString(","))
  }

  test("round-8 kernels are callable as SQL table functions") {
    import spark.implicits._
    // hamming_neardup_pairs: ids 1/2 share a hash, 3 is one bit away,
    // 4 is far
    Seq((1L, 0x0f0fL), (2L, 0x0f0fL), (3L, 0x0f0eL), (4L, -1L))
      .toDF("id", "h").createOrReplaceTempView("ph_hashes")
    val ph = spark.sql(
      """SELECT a_id, b_id, hamming
        |FROM hamming_neardup_pairs('ph_hashes', 'id', 'h', 6)
        |ORDER BY a_id, b_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(ph.toSeq == Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)), ph.mkString(","))
    // rrf_fuse: the shared second-ranked doc must fuse to rank 1
    Seq((1L, 100L, 1), (1L, 7L, 2)).toDF("qid", "doc_id", "rank")
      .createOrReplaceTempView("rrf_a")
    Seq((1L, 200L, 1), (1L, 7L, 2)).toDF("qid", "doc_id", "rank")
      .createOrReplaceTempView("rrf_b")
    val fused = spark.sql(
      """SELECT rank, doc_id, n_lists FROM rrf_fuse('rrf_a', 'rrf_b', 60, 3)
        |ORDER BY rank""".stripMargin).collect()
    assert(fused.head.getLong(1) == 7L && fused.head.getLong(2) == 2L)
    // train_quality_model -> model_quality_score round trip: the
    // positive class is marked by a dedicated token, which training
    // must weight positive
    Seq((1L, "good alpha beta"), (2L, "good gamma delta"),
      (3L, "junk alpha beta"), (4L, "junk gamma delta"))
      .toDF("doc_id", "text").createOrReplaceTempView("tq_docs")
    Seq((1L, 1L), (2L, 1L), (3L, -1L), (4L, -1L)).toDF("doc_id", "y")
      .createOrReplaceTempView("tq_labels")
    spark.sql(
      """SELECT * FROM train_quality_model(
        |  'tq_docs', 'tq_labels', 'doc_id', 'text', 4096, 8)""".stripMargin)
      .createOrReplaceTempView("tq_weights")
    val scored = spark.sql(
      """SELECT doc_id, keep
        |FROM model_quality_score('tq_docs', 'tq_weights', 'doc_id', 'text', 4096)
        |ORDER BY doc_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(scored.toSeq == Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0)),
      scored.mkString(","))
    // ffd_pack: three 100-token docs into 256-token bins, one bucket
    Seq((1L, 100L), (2L, 100L), (3L, 100L)).toDF("doc_id", "len")
      .createOrReplaceTempView("ffd_docs")
    val packed = spark.sql(
      """SELECT doc_id, bin FROM ffd_pack('ffd_docs', 'doc_id', 'len', 256, 32)
        |ORDER BY doc_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(packed.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 1L)), packed.mkString(","))
  }

  test("lm_perplexity and intradoc_dedup are callable as SQL table functions") {
    import spark.implicits._
    Seq((0L, "the cat sat on the mat"), (1L, "the cat sat on the mat"),
      (2L, "zz yy xx ww vv uu"))
      .toDF("doc_id", "text").createOrReplaceTempView("lm_docs")
    // LM trained on the first two rows: the in-domain doc's per-bigram
    // average must beat the novel-token doc's pure-backoff average
    val lm = spark.sql(
      """SELECT doc_id, n_bigrams, logprob FROM
        |lm_perplexity('lm_docs', 'doc_id', 'text', 'doc_id <= 1')
        |ORDER BY doc_id""".stripMargin).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2) / r.getLong(1))).toMap
    assert(lm(0L) > lm(2L), lm.toString)
    Seq((1L, "a b c d a b c d e f")).toDF("doc_id", "text")
      .createOrReplaceTempView("loop_docs")
    val dd = spark.sql(
      """SELECT n_segs, n_removed, clean_text FROM
        |intradoc_dedup('loop_docs', 'doc_id', 'text', 4)""".stripMargin).collect()
    assert(dd.head.getLong(0) == 3 && dd.head.getLong(1) == 1 &&
      dd.head.getString(2) == "a b c d e f", dd.head.toString)
  }

  test("score_psi and lsh_recall_audit are callable as SQL table functions") {
    import spark.implicits._
    // identical distributions -> near-zero PSI; a constant shift alarms
    (0 until 100).map(i => Tuple1((i % 10).toLong)).toDF("score")
      .createOrReplaceTempView("psi_std")
    (0 until 100).map(i => Tuple1((i % 10).toLong)).toDF("score")
      .createOrReplaceTempView("psi_same")
    (0 until 100).map(i => Tuple1((i % 10 + 9).toLong)).toDF("score")
      .createOrReplaceTempView("psi_shift")
    def total(t: String) = spark.sql(
      s"SELECT sum(psi) FROM score_psi('psi_std', '$t', 'score', 10)")
      .collect()(0).getDouble(0)
    assert(math.abs(total("psi_same")) < 0.01)
    assert(total("psi_shift") > 0.5)
    // two near-identical docs and one unrelated: the identical pair is
    // truth AND caught; the audit reports it in the top band
    Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "z y x w v u t s"))
      .toDF("doc_id", "text").createOrReplaceTempView("lsh_docs")
    val bands = spark.sql(
      """SELECT jband, n_truth, n_caught FROM
        |lsh_recall_audit('lsh_docs', 'doc_id', 'text') ORDER BY jband""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bands.toSeq == Seq((9L, 1L, 1L)), bands.mkString(","))
  }

  test("unigram_train and ledger_probe are callable as SQL table functions") {
    import spark.implicits._
    // a tiny corpus where 'ab' dominates: the trained vocab must keep
    // every single character plus the dominant multi-char piece, and
    // every cost must be a positive fixed-point -log2
    Seq((1L, "abab abab c"), (2L, "abab ab c")).toDF("doc_id", "text")
      .createOrReplaceTempView("uni_docs")
    val pieces = spark.sql(
      """SELECT piece, cnt, cost_fp FROM
        |unigram_train('uni_docs', 'text', 8, 2) ORDER BY piece""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ps = pieces.map(_._1).toSet
    assert(Set("a", "b", "c").subsetOf(ps), pieces.mkString(","))
    assert(pieces.forall(_._3 >= 0L), pieces.mkString(","))
    assert(pieces.exists(p => p._1.length > 1 && p._2 > 0), pieces.mkString(","))
    // ledger_probe: an exact copy, a near-dup, and a fresh doc
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "entirely different standing content right here"))
      .toDF("doc_id", "text").createOrReplaceTempView("led_std")
    Seq((10L, "the quick brown fox jumps over the lazy dog"),
        (11L, "the quick brown fox jumps over the lazy cat"),
        (12L, "zq wx vu ts rq po nm lk"))
      .toDF("doc_id", "text").createOrReplaceTempView("led_new")
    val verdicts = spark.sql(
      """SELECT doc_id, decision FROM
        |ledger_probe('led_std', 'led_new', 'doc_id', 'text')
        |ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(verdicts.toSeq == Seq((10L, "exact_dup"), (11L, "near_dup"),
      (12L, "kept")), verdicts.mkString(","))
  }

  test("embedding_ledger_probe is callable as a SQL table function") {
    import spark.implicits._
    def v(xs: Double*) = xs.map(_.toFloat)
    Seq((1L, v(1, 0, 0, 0), 0), (2L, v(0, 1, 0, 0), 1))
      .toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("sem_std")
    Seq((10L, v(1, 0, 0, 0), 0),     // identical → exact
        (11L, v(2, 0, 0.1, 0), 0),   // colinear, same label → near
        (12L, v(0, 0, 1, 0), 2))     // fresh direction → kept
      .toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("sem_new")
    val verdicts = spark.sql(
      """SELECT doc_id, decision FROM
        |embedding_ledger_probe('sem_std', 'sem_new', 'vec_id', 'embedding', 'label')
        |ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(verdicts.toSeq == Seq((10L, "exact_dup"), (11L, "near_dup"),
      (12L, "kept")), verdicts.mkString(","))
  }

  test("the curation read side is SQL-callable: curation_releases, corpus_asof, corpus_diff") {
    // VERDICT r14 ask #8: a SQL-only auditor reaches the deployment's
    // read side from the catalog, addressing it by its ledger path —
    // and every row matches the Scala API byte-for-byte.
    import graft.ext.Curation
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
      .filter(col("doc_id") < 160)
    val root = java.nio.file.Files.createTempDirectory("sqlcur").toString
    val stores = Curation.Stores(s"$root/text", s"$root/img", s"$root/aud",
      s"$root/vid", s"$root/emb", s"$root/led")
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 0), 0L, stores)
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 1), 1L, stores)
    Curation.publishRelease(spark, stores, 0L)
    Curation.publishRelease(spark, stores, 1L)
    import spark.implicits._
    val gone = Curation.corpusAsOf(spark, stores, 0L)
      .select("doc_id").orderBy("doc_id").limit(2).collect()
      .map(_.getLong(0)).toSeq
    Curation.retract(spark, gone.toDF("doc_id"), stores)
    val led = stores.ledger
    def viaSql(q: String) = spark.sql(q).collect().toSeq
    assert(viaSql(s"SELECT cutoff, rows, digest, withdrawn FROM " +
      s"curation_releases('$led') ORDER BY cutoff") ==
      Curation.releases(spark, stores)
        .select("cutoff", "rows", "digest", "withdrawn")
        .orderBy("cutoff").collect().toSeq)
    assert(viaSql(s"SELECT * FROM corpus_asof('$led', 0) " +
      "ORDER BY doc_id, modality") ==
      Curation.corpusAsOf(spark, stores, 0L)
        .orderBy("doc_id", "modality").collect().toSeq)
    // the retraction is visible through SQL exactly as through Scala
    assert(!viaSql(s"SELECT doc_id FROM corpus_asof('$led', 1)")
      .exists(r => gone.contains(r.getLong(0))))
    assert(viaSql(s"SELECT * FROM corpus_diff('$led', 0, 1) " +
      "ORDER BY doc_id, modality, change") ==
      Curation.corpusDiff(spark, stores, 0L, 1L)
        .orderBy("doc_id", "modality", "change").collect().toSeq)
    // literal enforcement matches the house style
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM corpus_asof('$led', length('xy'))").collect()
    }
    assert(bad.getMessage.contains("integer literal"))
  }

  test("the curation serve + export sides are SQL-callable: serve_ann, export_release", graft.Slow) {
    // VERDICT r15 #4: a SQL-only consumer serves ANN under the
    // takedown contract and materializes a published release from the
    // catalog; a withdrawn release refuses through SQL exactly as
    // through Scala.
    import graft.ext.Curation
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
      .filter(col("doc_id") < 160)
    val emb = Tables.embeddings(spark, sf())
    val root = java.nio.file.Files.createTempDirectory("sqlserve").toString
    val stores = Curation.Stores(s"$root/text", s"$root/img", s"$root/aud",
      s"$root/vid", s"$root/emb", s"$root/led", pqIndex = s"$root/pq")
    def embOf(b: org.apache.spark.sql.DataFrame) = emb.join(
      b.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 0), 0L,
      stores, embeddings = Some(embOf(docs.filter(col("doc_id") % 2 === 0))))
    Curation.trainServing(spark, stores)
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 1), 1L,
      stores, embeddings = Some(embOf(docs.filter(col("doc_id") % 2 === 1))))
    Curation.publishRelease(spark, stores, 0L)
    Curation.publishRelease(spark, stores, 1L)
    import spark.implicits._
    // a takedown AFTER release 0 shipped: serve excludes it at read
    // time, the export names it a hole
    val gone = Curation.readRelease(spark, stores, 0L)
      .select("doc_id").orderBy("doc_id").limit(2).collect()
      .map(_.getLong(0)).toSeq
    Curation.retract(spark, gone.toDF("doc_id"), stores)
    val led = stores.ledger
    embOf(docs.orderBy("doc_id").limit(3)).drop("label")
      .createOrReplaceTempView("serve_q")
    val sqlServe = spark.sql(
      s"""SELECT * FROM serve_ann('$led', '${stores.pqIndex}', 'serve_q', 5)
         |ORDER BY qid, rank""".stripMargin).collect().toSeq
    val scalaServe = Curation.serveAnn(spark, stores,
        spark.table("serve_q"), topK = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(sqlServe == scalaServe, "serve_ann diverges from Curation.serveAnn")
    assert(!sqlServe.exists(r => gone.contains(r.getAs[Long]("cid"))),
      "serve_ann shipped a retracted candidate")
    // the 7-arg export joins every store; it must equal the Scala call
    val sqlExp = spark.sql(
      s"""SELECT * FROM export_release('$led', 0, '${stores.textIndex}',
         |'${stores.image}', '${stores.audio}', '${stores.video}',
         |'${stores.embedding}') ORDER BY doc_id, modality""".stripMargin)
      .collect().toSeq
    val scalaExp = Curation.exportRelease(spark, stores, 0L)
      .orderBy("doc_id", "modality").collect().toSeq
    assert(sqlExp == scalaExp, "export_release diverges from the Scala API")
    assert(sqlExp.exists(r => r.getAs[String]("status") == "hole" &&
      gone.contains(r.getAs[Long]("doc_id"))),
      "post-publication takedown not named a hole through SQL")
    // the 2-arg ledger-only form: same statuses, content refs null
    val sqlExp2 = spark.sql(
      s"""SELECT doc_id, modality, status, content_ref
         |FROM export_release('$led', 0)
         |ORDER BY doc_id, modality""".stripMargin).collect().toSeq
    assert(sqlExp2.map(r => (r.getLong(0), r.getString(1), r.getString(2))) ==
      sqlExp.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("modality"),
        r.getAs[String]("status"))),
      "ledger-only export statuses diverge from the full-store form")
    assert(sqlExp2.forall(_.isNullAt(3)),
      "ledger-only export fabricated content refs")
    // the train-ready payload read, from the catalog
    val sqlPay = spark.sql(
      s"""SELECT * FROM export_release_payload('$led', 0, 'text',
         |'${stores.textIndex}') ORDER BY doc_id""".stripMargin)
      .collect().toSeq
    assert(sqlPay == Curation.exportReleasePayload(spark, stores, 0L, "text")
      .orderBy("doc_id").collect().toSeq,
      "export_release_payload diverges from the Scala API")
    assert(!sqlPay.exists(r => gone.contains(r.getLong(0))),
      "export_release_payload shipped a retracted id")
    // a withdrawn release refuses through SQL, actionably
    Curation.unpublishRelease(spark, stores, 0L,
      "manifest metadata subject to takedown (spec)")
    val refused = intercept[Exception] {
      spark.sql(s"SELECT * FROM export_release('$led', 0)").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${msgs(t.getCause)}"
    assert(msgs(refused).contains("WITHDRAWN"), msgs(refused))
  }

  test("the curation operator console is SQL-callable: fsck, maintenance_report, verify_*", graft.Slow) {
    // VERDICT r16 #5: the read/serve side was SQL-reachable but the
    // compliance actions a console needs — deployment audit, scheduled
    // due report, release/backup integrity — still required Scala.
    // SQL must equal the Scala API row-for-row, INCLUDING the pending
    // and violation verdict strings.
    import graft.ext.Curation
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
      .filter(col("doc_id") < 160)
    val emb = Tables.embeddings(spark, sf())
    val root = java.nio.file.Files.createTempDirectory("sqlconsole").toString
    val stores = Curation.Stores(s"$root/text", s"$root/img", s"$root/aud",
      s"$root/vid", s"$root/emb", s"$root/led", pqIndex = s"$root/pq")
    def embOf(b: org.apache.spark.sql.DataFrame) = emb.join(
      b.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 0), 0L,
      stores, embeddings = Some(embOf(docs.filter(col("doc_id") % 2 === 0))))
    Curation.trainServing(spark, stores)
    Curation.publishRelease(spark, stores, 0L)
    val dest = java.nio.file.Files.createTempDirectory("sqlsnap")
      .toString + "/s"
    Curation.snapshot(spark, stores, dest)
    import spark.implicits._
    // a takedown AFTER the snapshot and the publish: fsck reads
    // snapshot_stale PENDING, verify_release reads recut_matches false
    val gone = Curation.readRelease(spark, stores, 0L)
      .select("doc_id").orderBy("doc_id").limit(2).collect()
      .map(_.getLong(0)).toSeq
    Curation.retract(spark, gone.toDF("doc_id"), stores)
    val led = stores.ledger
    val full = s"'${stores.textIndex}', '${stores.image}', " +
      s"'${stores.audio}', '${stores.video}', '${stores.embedding}', " +
      s"'$led', '${stores.pqIndex}'"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    // fsck: the full 7-path form equals the Scala audit row-for-row
    val sqlFsck = rows(spark.sql(
      s"SELECT * FROM curation_fsck($full) ORDER BY check"))
    assert(sqlFsck == rows(Curation.fsck(spark, stores).orderBy("check")),
      "curation_fsck diverges from Curation.fsck")
    assert(sqlFsck.exists(r => r.getAs[String]("check") == "snapshot_stale"
      && r.getAs[String]("status") == "pending"),
      s"post-takedown staleness not pending through SQL: $sqlFsck")
    // ...and the ledger-only form audits the ledger-side state
    val sqlFsck1 = rows(spark.sql(
      s"SELECT * FROM curation_fsck('$led') ORDER BY check"))
    assert(sqlFsck1 == rows(Curation.fsck(spark,
      Curation.Stores("", "", "", "", "", led)).orderBy("check")),
      "ledger-only curation_fsck diverges")
    assert(sqlFsck1.exists(_.getAs[String]("check") ==
      "ledger_ids_registered"), s"$sqlFsck1")
    // maintenance_report: the takedown makes stores due through SQL
    val sqlRep = rows(spark.sql(
      s"SELECT * FROM maintenance_report($full) ORDER BY store"))
    assert(sqlRep == rows(Curation.maintenanceReport(spark, stores)
      .orderBy("store")), "maintenance_report diverges from the Scala API")
    assert(sqlRep.exists(r => r.getAs[Long]("tombstones_pending") > 0 &&
      r.getAs[Boolean]("due")), s"pending takedown not due via SQL: $sqlRep")
    // verify_release: pins intact, recut honestly diverges post-takedown
    val sqlVr = rows(spark.sql(s"SELECT * FROM verify_release('$led', 0)"))
    assert(sqlVr == rows(Curation.verifyRelease(spark, stores, 0L)),
      "verify_release diverges from the Scala API")
    assert(sqlVr.head.getAs[Boolean]("artifact_intact") &&
      !sqlVr.head.getAs[Boolean]("recut_matches"), s"$sqlVr")
    // verify_snapshot: intact through SQL, then planted rot surfaces
    val sqlVs = rows(spark.sql(
      s"SELECT * FROM verify_snapshot('$dest') ORDER BY role"))
    assert(sqlVs == rows(Curation.verifySnapshot(spark, dest)
      .orderBy("role")), "verify_snapshot diverges from the Scala API")
    assert(sqlVs.forall(_.getAs[Boolean]("intact")), s"$sqlVs")
    val victim = spark.read.parquet(s"$dest/_files")
      .filter(col("role") === "ledger" &&
        col("relpath").endsWith(".parquet"))
      .select("relpath").limit(1).collect()(0).getString(0)
    def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fsOf(dest).delete(
      new org.apache.hadoop.fs.Path(s"$dest/ledger/$victim"), false)
    assert(rows(spark.sql(s"SELECT * FROM verify_snapshot('$dest')"))
      .exists(r => r.getAs[String]("role") == "ledger" &&
        !r.getAs[Boolean]("intact")),
      "planted rot invisible through SQL")
    // a LOST release artifact is a violation, named identically in SQL
    fsOf(led).delete(
      new org.apache.hadoop.fs.Path(s"$led.releases/cutoff=0"), true)
    val viol = rows(spark.sql(s"SELECT * FROM curation_fsck('$led') " +
      "WHERE check = 'releases_publish'"))
    assert(viol == rows(Curation.fsck(spark,
      Curation.Stores("", "", "", "", "", led))
      .filter(col("check") === "releases_publish")),
      "violation row diverges between SQL and Scala")
    assert(viol.head.getAs[String]("status") == "violation" &&
      viol.head.getAs[String]("detail").contains("restore from backup"),
      s"lost artifact not a violation through SQL: $viol")
  }

  test("extension functions enforce arity and literal parameters") {
    val wrongArity = intercept[Exception] {
      spark.sql("SELECT md5_prefix64('a')").collect()
    }
    assert(wrongArity.getMessage.contains("2 argument"))
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT md5_prefix64('a', length('xy'))").collect()
    }
    assert(nonLiteral.getMessage.contains("integer literal"))
  }
}
