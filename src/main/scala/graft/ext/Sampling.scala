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
}
