package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora — the training-data
  * pipeline extensions mandated by the north star (BASELINE.json), all
  * declarative DataFrame transforms so Catalyst plans them.
  *
  * Scale design (100 TB):
  *  - exact dedup is a hash-groupBy: one shuffle on a 128-bit content
  *    hash, map-side partial aggregation, no skew (hashes are uniform);
  *  - MinHash-LSH replaces the quadratic all-pairs comparison with an
  *    equi-join on band keys: candidates ∝ actual near-dups, and the
  *    band join shuffles on uniformly distributed keys;
  *  - SimHash gives a per-doc 64-bit sketch joinable on rotated prefixes;
  *  - verification (exact Jaccard) runs only on LSH candidates.
  */
object Dedup {

  /** Whitespace tokens; mirrors DuckDB `string_split(c, ' ')`. */
  def tokens(c: Column): Column = split(c, " ")

  /** Distinct k-word shingles of a token array. */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(toks) - lit(k - 1)),
      i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** 16-element MinHash signature over a 32-bit shingle-hash array,
    * universal-hash family ((2j+1)·x + 7919j) mod 4294967311 (prime >
    * 2^32) for j = 0..15 — coefficients stay below 64-bit overflow.
    */
  def minhashSignature(shingleHashes: Column): Column =
    transform(sequence(lit(0), lit(15)), j =>
      array_min(transform(shingleHashes, x =>
        ((lit(2) * j + 1) * x + lit(7919) * j) % lit(4294967311L))))

  /** LSH band keys: `bands` groups of `rows` consecutive signature slots
    * rendered `b:v1-v2-…`; docs sharing any key are candidates.
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat(b.cast("string"), lit(":"),
        array_join(transform(slice(sig, b * lit(rows) + 1, lit(rows)),
          v => v.cast("string")), "-")))

  /** Exact duplicate groups by full-content hash: one row per distinct
    * content, with the kept (minimum) id and the duplicate count.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Per-doc distinct shingle sets: (id, shingles). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = tokens(col(textCol))
    df.filter(size(toks) >= k)
      .select(col(idCol).as("id"), shingles(toks, k).as("shingles"))
  }

  /** MinHash+LSH near-duplicate candidates with exact-Jaccard
    * verification: (a_id, b_id, jaccard), totally ordered.
    *
    * Pipeline: shingle → hash → 16-slot signature → 8×2 band keys →
    * explode + self-equi-join on band key (the scalable step) →
    * distinct pairs → exact Jaccard on the candidates only.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 2, bands: Int = 8, rows: Int = 2): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, k)
    val hashed = sets.select(col("id"), col("shingles"),
      transform(col("shingles"), s => Hashing.h32(s)).as("hs"))
    val banded = hashed
      .select(col("id"),
        explode(lshBandKeys(minhashSignature(col("hs")), bands, rows)).as("bk"))
    val pairs = banded.as("a")
      .join(banded.as("b"), col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    val withSets = pairs
      .join(sets.select(col("id"), col("shingles").as("sa")), col("a_id") === col("id")).drop("id")
      .join(sets.select(col("id"), col("shingles").as("sb")), col("b_id") === col("id")).drop("id")
    withSets.select(col("a_id"), col("b_id"),
      jaccard(col("sa"), col("sb")).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Exact Jaccard of two distinct-element arrays, rounded to 6 dp (the
    * rounding absorbs engine-order float differences; the division itself
    * is exact small-int / small-int).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(filter(a, x => array_contains(b, x)))
    round(inter.cast("double") / (size(a) + size(b) - inter), 6)
  }

  /** 60-bit SimHash of a token array, rendered as a '0'/'1' string
    * (msb-last; bit b of the hash at position b). Uses an `expr` because
    * the shift amount is a lambda variable (DSL `shiftright` only takes
    * literal shifts).
    */
  def simhash60(tokenHashesCol: String): Column =
    expr(
      s"""array_join(transform(sequence(0, 59), b ->
         |  case when aggregate($tokenHashesCol, 0L, (acc, x) ->
         |    acc + (case when shiftright(x, b) % 2 = 1 then 1 else -1 end)) > 0
         |  then '1' else '0' end), '')""".stripMargin)

  /** Per-doc SimHash sketch: (id, simhash). */
  def simhashSketch(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      transform(tokens(col(textCol)), t => Hashing.h60(t)).as("th"))
      .select(col("id"), simhash60("th").as("simhash"))

  /** N-gram Jaccard over blocked candidate pairs: same `blockCol`, id
    * within `window` ahead — a deterministic, bounded candidate set that
    * exercises the verification kernel without the quadratic blowup.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, k: Int = 3, window: Int = 10): DataFrame = {
    val sets = {
      val toks = tokens(col(textCol))
      df.filter(size(toks) >= k)
        .select(col(idCol).as("id"), col(blockCol).as("blk"), shingles(toks, k).as("sh"))
    }
    sets.as("a").join(sets.as("b"),
        col("a.blk") === col("b.blk") &&
          col("b.id") > col("a.id") && col("b.id") <= col("a.id") + window)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        jaccard(col("a.sh"), col("b.sh")).as("jaccard"))
      .orderBy("a_id", "b_id")
  }
}
