package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for pipeline curation — unlike `df.sample`
  * (seeded RNG over partition iteration order, unstable under
  * repartition/retry), these sample on a *content hash* of a key: the
  * decision for a row is a pure function of the row, so re-runs, retried
  * tasks, and both engines of the oracle agree exactly, and the sample is
  * stable as the corpus grows (a kept id stays kept).
  *
  * Rates are basis points (1/10000) against a 32-bit md5-prefix hash —
  * uniform enough for sampling, engine-portable (see [[Hashing]]). The
  * salt decorrelates independent samples of the same keys.
  */
object Sampling {

  private def bucket(key: Column, salt: String): Column =
    Hashing.h32(concat(key.cast("string"), lit(salt))) % 10000

  /** Keep rows whose hash bucket falls under `rateBp` basis points. */
  def hashSample(df: DataFrame, key: Column, rateBp: Int, salt: String = ""): DataFrame =
    df.filter(bucket(key, salt) < rateBp)

  /** Weighted sampling without replacement (sequential Poisson /
    * priority sampling, Ohlsson '98): each row gets priority
    * `u div w` where `u` is its uniform content-hash draw and `w` its
    * weight; the k smallest priorities are the sample, so heavy rows
    * (large `w` → small priority) are proportionally more likely. All
    * arithmetic is INTEGER (u scaled by 10^9 before the division) so
    * both engines of the oracle agree bit-for-bit — no float `pow`/`ln`
    * whose last ulp could flip the selection boundary.
    *
    * Scale shape: the top-k runs as `TakeOrderedAndProject` —
    * per-partition bounded heaps merged on the driver, k rows total —
    * never a global sort.
    */
  def priorityWeighted(df: DataFrame, key: Column, weight: Column, k: Int,
                       salt: String = ""): DataFrame = {
    val u = Hashing.h32(concat(key.cast("string"), lit(salt))) % 1000000L
    df.withColumn("_u_scaled", u * 1000000000L)
      .withColumn("_w", weight.cast("long"))
      // zero/negative/null weight = "never sampled" (and keeps the ANSI
      // integer division from throwing on w = 0)
      .filter(col("_w") > 0)
      .withColumn("priority", expr("_u_scaled div _w"))
      .drop("_u_scaled", "_w")
      .orderBy(col("priority").asc, key.asc)
      .limit(k)
  }

  /** Deterministic train/valid/test split assignment: `cuts` are
    * (name, cumulative basis points) with the last at 10000; a row's
    * split is the first cut whose bound exceeds its hash bucket. Pure
    * function of the key — a doc keeps its split across reruns, retries,
    * and corpus growth, and the same doc can never leak from train into
    * eval by a repartition.
    */
  def assignSplits(df: DataFrame, key: Column, cuts: Seq[(String, Int)],
                   salt: String = ""): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 10000 &&
      cuts.map(_._2) == cuts.map(_._2).sorted,
      "assignSplits: cuts must be ascending cumulative basis points ending at 10000")
    val b = bucket(key, salt)
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, bound), rest) => when(b < bound, lit(name)).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Per-stratum rates (basis points) with a default for unlisted strata —
    * deterministic replacement for `sampleBy`.
    */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       ratesBp: Map[String, Int], defaultBp: Int,
                       salt: String = ""): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (s, r)) =>
      when(strata === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket(key, salt) < rate)
  }

  /** Token-budget corpus selection — the data-mixing primitive: walk the
    * corpus in quality order (descending, `idCol` ascending as the
    * tie-break) and keep the maximal prefix whose cumulative token count
    * stays ≤ `budget`. Once one document overflows, every later (lower-
    * quality) document has a larger cumulative sum, so the kept set is
    * exactly a prefix — deterministic and engine-replayable with one
    * window cumsum.
    *
    * Scale shape: the cumulative sum is the two-phase distributed prefix
    * sum (the [[Packing]] pattern) — range-partition by the selection
    * order, per-partition PARTITIONED-window cumsum, driver-side fold of
    * #partitions totals into start offsets — never a single-partition
    * global window. `qualityCol` and `nCol` must be non-null; `nCol`
    * ≥ 0.
    *
    * Returns the kept rows with `cum_tokens` (inclusive) appended.
    */
  def budgetSelect(df: DataFrame, qualityCol: String, idCol: String,
                   nCol: String, budget: Long,
                   numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, "budgetSelect: budget must be >= 0")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else try spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
      catch { case _: NumberFormatException => math.max(df.rdd.getNumPartitions, 1) }
    // identical ranged layout for the totals job and the final job
    val ranged = df.repartitionByRange(n, col(qualityCol).desc, col(idCol).asc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy("_pid")
      .agg(coalesce(sum(col(nCol)), lit(0L)).as("tot"),
        count(when(col(nCol).isNull || col(qualityCol).isNull, 1)).as("bad"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    require(totals.map(_._3).sum == 0,
      s"budgetSelect: NULLs in $qualityCol/$nCol — selection order undefined")
    var acc = 0L
    val offsets = totals.sortBy(_._1).map { case (p, tot, _) =>
      val o = (p, acc); acc += tot; o
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(col(qualityCol).desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranged.join(broadcast(offDf), "_pid")
      .withColumn("cum_tokens",
        (sum(col(nCol)).over(w) + col("_off")).cast("long"))
      .filter(col("cum_tokens") <= budget)
      .drop("_pid", "_off")
  }

  /** Keep rows whose ppm-precision hash draw falls under `ratePpm` —
    * the parts-per-million twin of [[hashSample]], for rates computed
    * by integer normalization (mixture reweighting) where basis points
    * are too coarse. Same determinism contract: the decision is a pure
    * function of (key, salt), stable under retries and corpus growth.
    */
  def rateResamplePpm(df: DataFrame, key: Column, ratePpm: Column,
                      salt: String = ""): DataFrame =
    df.filter(Hashing.h32(concat(key.cast("string"), lit(salt))) % 1000000L < ratePpm)

  /** Curriculum interleave: rank rows by score (desc, id tie-break),
    * cut the ranking into `nBuckets` equal difficulty tiers, and expose
    * each row's `(bucket, pos)` coordinate — ordering by `(pos, bucket)`
    * yields the curriculum: one row from every tier, then the next row
    * from every tier, so a training run sees a difficulty-balanced
    * stream from step one instead of an easy-first (or shuffled) corpus.
    *
    * Scale shape: the global rank is [[Ranking.denseRankDesc]]'s
    * two-phase form over the UNIQUE composite key (score, −id) — rank
    * equals row_number with no single-partition window; the bucket cut
    * is pure arithmetic on (rank, n); per-bucket start offsets are an
    * `nBuckets`-row broadcast. Nothing here sorts globally except the
    * caller's final presentation ORDER BY.
    */
  def curriculumInterleave(df: DataFrame, idCol: String, scoreCol: String,
                           nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "curriculumInterleave: nBuckets must be >= 1")
    val keyed = df.withColumn("_ck",
      struct(col(scoreCol), (-col(idCol)).as("nid")))
    val ranked = Ranking.denseRankDesc(keyed, "_ck", "rank").drop("_ck")
    // row count as a driver literal (one job over the already-
    // checkpointed ranked layout — O(partitions) like the rank offsets
    // themselves). Both the bucket cut and each tier's start rank are
    // then CLOSED-FORM: bucket b spans ranks ceil(b·n/B)+1 .. , so pos
    // needs no per-bucket min — keeping the plan free of the scalar-
    // count SinglePartition exchange and the extra join a dynamic
    // total would drag in.
    val n = ranked.count()
    ranked
      .withColumn("bucket", expr(s"((rank - 1) * $nBuckets) div ${n}L"))
      .withColumn("pos",
        expr(s"rank - 1 - ((bucket * ${n}L + ${nBuckets - 1}) div $nBuckets)"))
  }
}
