package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual VIDEO near-duplicate detection — the temporal member of
  * the dedup family, completing the modality grid (text MinHash x2,
  * image dHash x92, audio energy-hash x98): a video is a SEQUENCE of
  * frames, and re-encodes/trims of the same footage keep long runs of
  * perceptually-identical frames even when single-frame hashes alone
  * would also match unrelated stills. The public shape (frame
  * fingerprint + temporal shingling, cf. shot-boundary/sequence
  * fingerprinting literature): per-frame perceptual hash
  * ([[ImageHash.dHash]] through the real BMP codec), then order-
  * preserving 2-frame shingles (fh_i, fh_i+1) — two videos are
  * near-duplicates when the shared distinct shingle count covers at
  * least half of the shorter video's shingle set (containment, so a
  * trimmed prefix/suffix copy still matches its source).
  *
  * Scale shape (100 TB): frames decode once (map-side, fault-isolated
  * like every MediaDecoder path); shingles join through an inverted
  * index keyed by the 2-hash shingle — never an all-pairs comparison —
  * with hot shingle buckets beyond `maxBucket` distinct videos dropped
  * and reported ([[droppedShingleBuckets]]), the same boilerplate
  * guard as the text LSH (a black/static frame run shared by half the
  * corpus would otherwise quadratically explode the index).
  */
object VideoHash {

  /** Per-frame perceptual hashes of each document's synthetic video:
    * the text is cut into `frameChars`-byte frames, each rendered as a
    * real `width`-wide 24-bpp BMP and dHash'd through the codec:
    * (doc_id, frame_no, fh). Documents shorter than one byte yield no
    * frames.
    */
  def frameHashes(docs: DataFrame, idCol: String, textCol: String,
                  frameChars: Int = 64, width: Int = 16): DataFrame = {
    require(frameChars >= 1, s"frameChars must be >= 1, got $frameChars")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col(textCol)) >= 1)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        t.getBytes("US-ASCII").grouped(frameChars).zipWithIndex.map {
          case (chunk, i) =>
            (id, i.toLong, ImageHash.dHash(Bmp.parse(Bmp.write(width, chunk))))
        }
      }.toDF("doc_id", "frame_no", "fh")
  }

  /** Order-preserving 2-frame shingles, distinct per video:
    * (doc_id, k) with k = "fh_i:fh_i+1". Videos with a single frame
    * have no shingles and cannot pair.
    *
    * One doc-keyed `lead()` window, not a self-join (VERDICT r8 #2):
    * the join shape shuffled the frame table TWICE and paid a join;
    * the window pays ONE exchange on doc_id and reads each frame row
    * once — at 100× the frame volume that is the difference between
    * one partition-local sort and a two-sided shuffle join. The
    * `frame_no + 1` guard keeps the self-join semantics exactly: only
    * CONSECUTIVE frame numbers shingle, so a frames input with gaps
    * (e.g. after a sampling filter) pairs identically under both
    * shapes (VideoHashSpec asserts the plan is join-free).
    */
  def shingles(frames: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_no")
    frames
      .select(col("doc_id"), col("frame_no"), col("fh"),
        lead(col("frame_no"), 1).over(w).as("next_no"),
        lead(col("fh"), 1).over(w).as("next_fh"))
      .filter(col("next_no") === col("frame_no") + 1)
      .select(col("doc_id"),
        concat(col("fh").cast("string"), lit(":"),
          col("next_fh").cast("string")).as("k"))
      .distinct()
  }

  /** Near-duplicate video pairs: (a_id, b_id, shared, na, nb) with
    * 2·shared >= min(na, nb) (≥ half the shorter video's shingles in
    * common). Shingle buckets with more than `maxBucket` distinct
    * videos are dropped from candidate generation (reported by
    * [[droppedShingleBuckets]]) — pairs supported ONLY by such
    * corpus-wide runs are noise, not footage reuse.
    */
  def sequenceNearDups(frames: DataFrame, maxBucket: Int = 4096): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val sh = shingles(frames)
    val nsh = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val oversized = sh.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select("k")
    val capped = sh.join(broadcast(oversized), Seq("k"), "left_anti")
    capped.as("a").join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .join(nsh.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(nsh.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .filter(col("shared") * 2 >= least(col("na"), col("nb")))
      .select("a_id", "b_id", "shared", "na", "nb")
  }

  /** Probe a standing frame corpus with an arriving tranche of videos:
    * the only containment pairs a growing corpus can add — those
    * touching at least one tranche video — the x87/x115 incremental
    * contract at the SHINGLE layer (the one modality whose pair
    * criterion is set containment, not hash equality). Tranche
    * shingles join the standing shingle index (cross) and themselves
    * (within); standing shingle buckets beyond `maxBucket` distinct
    * videos are dropped (censused over the standing side, the same
    * discipline as [[graft.ext.Dedup.probeNearDupIndex]]); the
    * standing corpus is touched only at matching shingle keys — never
    * re-paired against itself. Returns (a_id, b_id, shared, na, nb,
    * src), a_id < b_id, src ∈ {cross, within}; union with the
    * standing-only [[sequenceNearDups]] to maintain the full relation
    * (ExtSpec asserts the three-way union equals the monolithic run).
    */
  def sequenceProbe(standingFrames: DataFrame, incomingFrames: DataFrame,
                    maxBucket: Int = 4096): DataFrame = {
    val shS = shingles(standingFrames)
    val shN = shingles(incomingFrames)
    sequenceProbeFrom(
      shS.join(shS.groupBy("doc_id").agg(count(lit(1)).as("n")), "doc_id"),
      shN, maxBucket)
  }

  /** [[sequenceProbe]] from a DENORMALIZED standing shingle relation
    * (doc_id, k, n) — `n` is the video's TOTAL shingle count carried on
    * every row, which is what lets the persisted index serve the
    * containment denominator from a partition-pruned slice: the probe
    * reads only colliding shingle buckets, yet every matched row knows
    * its video's full length. The per-key census stays exact on a
    * pruned slice because a key's whole bucket lives in one partition.
    */
  private def sequenceProbeFrom(shS: DataFrame, shN: DataFrame,
                                maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val nN = shN.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val oversized = shS.groupBy("k").agg(count(lit(1)).as("nb"))
      .filter(col("nb") > maxBucket).select("k")
    val sCap = shS.join(broadcast(oversized), Seq("k"), "left_anti")
    val cross = shN.as("a").join(sCap.as("b"), col("a.k") === col("b.k"))
      .groupBy(col("a.doc_id").as("n_id"), col("b.doc_id").as("s_id"))
      .agg(count(lit(1)).as("shared"), max(col("b.n")).as("ns"))
      .join(nN.select(col("doc_id").as("n_id"), col("n").as("nn")), "n_id")
      .filter(col("shared") * 2 >= least(col("nn"), col("ns")))
      .select(least(col("n_id"), col("s_id")).as("a_id"),
        greatest(col("n_id"), col("s_id")).as("b_id"), col("shared"),
        when(col("n_id") < col("s_id"), col("nn")).otherwise(col("ns")).as("na"),
        when(col("n_id") < col("s_id"), col("ns")).otherwise(col("nn")).as("nb"),
        lit("cross").as("src"))
    val within = shN.as("a")
      .join(shN.as("b"), col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .join(nN.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(nN.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .filter(col("shared") * 2 >= least(col("na"), col("nb")))
      .select(col("a_id"), col("b_id"), col("shared"), col("na"), col("nb"),
        lit("within").as("src"))
    cross.unionByName(within)
  }

  /** Per-video sequence identity: (doc_id, sq) with sq = md5 over the
    * ORDERED frame-hash list — two videos are exact duplicates iff
    * their full frame sequences match. The video analogue of the text
    * content hash / image hash membership frames.
    */
  def sequenceIds(frames: DataFrame): DataFrame = frames
    .groupBy("doc_id")
    .agg(md5(concat_ws(",",
      transform(array_sort(collect_list(struct(col("frame_no"), col("fh")))),
        s => s.getField("fh").cast("string"))).cast("binary")).as("sq"))

  /** First-occurrence curation verdicts for an arriving tranche of
    * videos — [[graft.ext.Dedup.ledgerProbe]]'s exact semantics at the
    * temporal-shingle layer, completing the multimodal verdict grid
    * (text x116, perceptual x117, video here): exact_dup when the
    * IDENTICAL frame sequence is already standing (or a smaller-id
    * copy shares the tranche), near_dup on a containment pair
    * ([[sequenceProbe]] semantics) against any standing video or an
    * earlier-first tranche video, kept otherwise. Verdicts are final
    * at arrival (first-seen precedence) and judged at the
    * DISTINCT-SEQUENCE level: exact duplication comes from sequence-id
    * membership alone (immune to the shingle bucket cap, never m²
    * member pairs), and only each distinct sequence's first occurrence
    * enters the containment probe. Docs with no frames (empty text)
    * are outside the video dedup domain and kept; single-frame videos
    * have no shingles — they can only be exact_dup or kept.
    */
  def ledgerProbe(standingFrames: DataFrame, incomingFrames: DataFrame,
                  incoming: DataFrame, idCol: String,
                  maxBucket: Int = 4096): DataFrame = {
    val sqN = sequenceIds(incomingFrames)
    val firstOcc = sqN.groupBy("sq").agg(min(col("doc_id")).as("fid"))
    val probeN = incomingFrames.join(
      firstOcc.select(col("fid").as("doc_id")), Seq("doc_id"), "left_semi")
    val shS = shingles(standingFrames)
    ledgerVerdicts(
      sequenceIds(standingFrames).select("sq").distinct(),
      sequenceProbeFrom(
        shS.join(shS.groupBy("doc_id").agg(count(lit(1)).as("n")), "doc_id"),
        shingles(probeN), maxBucket),
      sqN, firstOcc, incoming, idCol)
  }

  /** The verdict core shared by [[ledgerProbe]] (standing side derived
    * from raw frames) and [[ledgerProbeIndexed]] (standing side read
    * partition-pruned from the persisted index): `standingSq` the
    * distinct standing sequence ids reachable by this probe, `pairs`
    * the [[sequenceProbeFrom]] containment pairs for the tranche's
    * first-occurrence videos.
    */
  private def ledgerVerdicts(standingSq: DataFrame, pairs: DataFrame,
                             sqN: DataFrame, firstOcc: DataFrame,
                             incoming: DataFrame, idCol: String): DataFrame = {
    val exact = sqN.join(standingSq, Seq("sq"), "left_semi").select("doc_id")
      .unionByName(sqN.join(firstOcc, "sq")
        .filter(col("doc_id") =!= col("fid")).select("doc_id"))
      .distinct().withColumn("ex", lit(1))
    // containment pairs cover first occurrences only — every later copy
    // of the same sequence is exact_dup by membership, so the probe
    // never re-pairs duplicate footage
    val near = pairs.filter(col("src") === "cross")
      .select(explode(array(col("a_id"), col("b_id"))).as("fid"))
      .join(firstOcc.select("fid").distinct(), "fid")
      .unionByName(pairs.filter(col("src") === "within")
        .select(col("b_id").as("fid")))
      .distinct()
      .join(firstOcc, "fid").select(col("sq"))
    val nearDocs = sqN.join(near, Seq("sq"), "left_semi")
      .select("doc_id").distinct().withColumn("nd", lit(1))
    incoming.select(col(idCol).as("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(nearDocs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex") === 1, lit("exact_dup"))
          .when(col("nd") === 1, lit("near_dup"))
          .otherwise(lit("kept")).as("decision"))
  }

  /** The shingle buckets `maxBucket` would drop: (k, n_videos). */
  def droppedShingleBuckets(frames: DataFrame,
                            maxBucket: Int = 4096): DataFrame =
    shingles(frames).groupBy("k").agg(count(lit(1)).as("n_videos"))
      .filter(col("n_videos") > maxBucket)

  // ------------------------------------------------------------------
  // Persisted sequence index (VERDICT r10 #2): the video analogue of
  // [[graft.ext.Dedup.writeNearDupIndex]]. Layout under `dir`:
  //  - `shingles` (doc_id, k, n) PARTITIONED BY kp = StoreLayout
  //    .part(k) — the video's TOTAL shingle count `n` rides every row
  //    (denormalized) so a partition-pruned slice still serves the
  //    containment denominator;
  //  - `seqs` (doc_id, sq) PARTITIONED BY sqp = StoreLayout.part(sq) —
  //    exact-duplicate lookups prune to the tranche's sequence buckets.
  // Re-appended videos leave idempotent duplicate rows; probes
  // re-collapse with dropDuplicates, [[compactSeqIndex]] collapses the
  // store.
  // ------------------------------------------------------------------

  /** Append one tranche's videos (as [[frameHashes]] output) to the
    * persisted index under `dir` (bootstraps on first call).
    */
  def appendSeqIndex(frames: DataFrame, dir: String): Unit = {
    val sh = shingles(frames)
    StoreSwap.concurrently(
      () => sh.join(sh.groupBy("doc_id").agg(count(lit(1)).as("n")), "doc_id")
        .withColumn("kp", StoreLayout.part(col("k")))
        .repartition(col("kp"))
        .write.mode("append").partitionBy("kp").parquet(s"$dir/shingles"),
      () => sequenceIds(frames)
        .withColumn("sqp", StoreLayout.part(col("sq")))
        .repartition(col("sqp"))
        .write.mode("append").partitionBy("sqp").parquet(s"$dir/seqs"))
  }

  /** [[ledgerProbe]] against the PERSISTED index — the commit-time
    * access path of [[Curation.commitTranche]]: standing sequence ids
    * are read through literal partition filters on the tranche's
    * sequence buckets (exact for the equality lookup), standing
    * shingles through filters on the tranche's shingle-key buckets
    * (exact for the containment equi-join — an untouched bucket cannot
    * share a shingle with the tranche). Touched-bucket sets are ≤
    * [[StoreLayout.Parts]] by construction.
    *
    * `exclude`: standing doc ids a re-run of a failed commit already
    * appended — their rows (all in tranche-touched buckets by
    * construction) are anti-joined out, so the re-run reproduces the
    * first attempt, census included.
    */
  def ledgerProbeIndexed(spark: SparkSession, dir: String,
                         incomingFrames: DataFrame, incoming: DataFrame,
                         idCol: String, maxBucket: Int = 4096,
                         exclude: Option[DataFrame] = None,
                         materialize: Boolean = true): DataFrame = {
    def excl(df: DataFrame): DataFrame = exclude.fold(df)(ids =>
      df.join(ids.select(col(ids.columns.head).as("doc_id")),
        Seq("doc_id"), "left_anti"))
    // lazy checkpoints on the multiply-referenced frames (tranche
    // sequence ids ×3, tranche shingles ×3, pruned standing slice ×2);
    // materialize = false keeps the raw plans for partition-filter
    // assertions — Dedup.probeView has the full rationale
    def ckpt(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(false) else df
    // the tranche frames are checkpointed FIRST: frame fingerprints are
    // expensive to derive (decode + hash per frame), and the probe's
    // bounded collects plus the verdict plan would otherwise recompute
    // them once per job
    val inFrames = ckpt(incomingFrames)
    val sqN = ckpt(sequenceIds(inFrames))
    val firstOcc = ckpt(sqN.groupBy("sq").agg(min(col("doc_id")).as("fid")))
    val sqps = StoreLayout.partsOf(sqN, col("sq"))
    val standingSq = excl(spark.read.parquet(s"$dir/seqs")
        .filter(col("sqp").isin(sqps: _*)).drop("sqp"))
      .select("sq").distinct()
    val probeN = inFrames.join(
      firstOcc.select(col("fid").as("doc_id")), Seq("doc_id"), "left_semi")
    val shN = ckpt(shingles(probeN))
    val kps = StoreLayout.partsOf(shN, col("k"))
    val shS = ckpt(excl(spark.read.parquet(s"$dir/shingles")
        .filter(col("kp").isin(kps: _*)).drop("kp")
        .dropDuplicates("doc_id", "k")))
    ledgerVerdicts(standingSq, sequenceProbeFrom(shS, shN, maxBucket),
      sqN, firstOcc, incoming, idCol)
  }

  /** One-time upgrade of a pre-index FLAT frame store — raw
    * [[frameHashes]] rows (doc_id, frame_no, fh) at the directory root,
    * the layout older deployments appended per tranche — into the
    * persisted sequence index ([[appendSeqIndex]]'s layout).
    * [[Curation.commitTranche]] REFUSES a flat store (no probe-prunable
    * structure; its videos would otherwise be silently stranded next to
    * a bootstrap index) and names this as the upgrade path. The flat
    * rows are retained under `<dir>.old`.
    */
  def migrateFlatFrames(spark: SparkSession, dir: String): Unit = {
    require(!graft.ext.Dedup.storeExists(spark, s"$dir/shingles"),
      s"$dir already carries an index layout (shingles present) — nothing to migrate")
    // sever lineage from the files about to be renamed away
    val flat = spark.read.parquet(dir).localCheckpoint()
    val tmp = StoreSwap.prepareTmp(spark, s"$dir.migrate")
    appendSeqIndex(flat, tmp)
    StoreSwap.swap(spark, dir, tmp)
  }

  /** Bucket-local compaction (VERDICT r11 #1): collapse duplicate rows
    * and per-append small files in ONLY the named leaf partition
    * directories (`<dir>/shingles/kp=N`, `<dir>/seqs/sqp=N`) — write
    * work bounded by the drifted buckets. Correct bucket-locally
    * because each partition value is a function of the collapse key
    * (k → kp, sq → sqp); erasure stays with the store-wide
    * [[compactSeqIndex]] (a retracted video's shingles spread across
    * shingle-key buckets).
    */
  def compactSeqIndexBuckets(spark: SparkSession, dir: String,
                             leafDirs: Seq[String]): Unit =
    leafDirs.groupBy { d =>
      if (d.startsWith(s"$dir/shingles/")) Seq("doc_id", "k")
      else if (d.startsWith(s"$dir/seqs/")) Seq("doc_id", "sq")
      else throw new IllegalArgumentException(
        s"$d is not a leaf bucket of the sequence index at $dir")
    }.foreach { case (keys, ds) =>
      StoreSwap.rewriteLeafDirsShared(spark, ds,
        (df: org.apache.spark.sql.DataFrame) => df.dropDuplicates(keys))
    }

  /** Physically erase retracted videos from the persisted index by
    * rewriting ONLY the partitions their rows live in
    * ([[graft.ext.Curation.maintainDue]]'s surgical erasure hook;
    * store-wide [[compactSeqIndex]] remains the deep pass). Both
    * tables are doc-keyed, so discovery is one column-pruned
    * (doc_id, partition) scan per table and the scrub is a direct
    * anti-join — no two-level liveness like the text/hash stores.
    * A crash mid-pass leaves the remaining rows physically present
    * but still tombstone-excluded at probe time (the watermark only
    * advances after this returns), and the re-run completes the
    * erasure — the [[graft.ext.IvfIndex.removeIds]] contract.
    */
  def removeIdsSeqIndex(spark: SparkSession, dir: String,
                        ids: DataFrame): Unit = {
    val idf = ids.select(col(ids.columns.head).as("doc_id"))
      .localCheckpoint()
    val fs = graft.ext.StoreSwap.fsOf(spark, dir)
    // the ids' touched partitions: a column-pruned (doc_id, partition)
    // scan per table, collected as ≤ Parts literals
    def touched(table: String, part: String): Seq[String] =
      spark.read.parquet(s"$dir/$table")
        .join(broadcast(idf), Seq("doc_id"), "left_semi")
        .select(part).distinct()
        .limit(graft.ext.StoreLayout.Parts + 1).collect()
        // partition values come back via partition-column inference
        // (int for small values) — stringify, never assume the width
        .map(r => s"$dir/$table/$part=${r.get(0)}")
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
        .toSeq
    StoreSwap.rewriteLeafDirsShared(spark,
      touched("shingles", "kp") ++ touched("seqs", "sqp"),
      (df: org.apache.spark.sql.DataFrame) =>
        df.join(broadcast(idf), Seq("doc_id"), "left_anti"))
  }

  /** Collapse re-appended duplicate rows and small files; same swap
    * discipline as [[graft.ext.Dedup.compactNearDupIndex]].
    */
  def compactSeqIndex(spark: SparkSession, dir: String,
                      removeIds: Option[DataFrame] = None): Unit = {
    // both tables are doc-keyed, so physical erasure of retracted docs
    // ([[Curation.retract]] applies tombstones here) is one anti-join
    def excl(df: DataFrame): DataFrame = removeIds.fold(df)(ids =>
      df.join(ids.select(col(ids.columns.head).as("doc_id")),
        Seq("doc_id"), "left_anti"))
    val tmp = StoreSwap.prepareTmp(spark, s"$dir.compact")
    excl(spark.read.parquet(s"$dir/shingles").dropDuplicates("doc_id", "k"))
      .repartition(col("kp"))
      .write.partitionBy("kp").parquet(s"$tmp/shingles")
    excl(spark.read.parquet(s"$dir/seqs").dropDuplicates("doc_id", "sq"))
      .repartition(col("sqp"))
      .write.partitionBy("sqp").parquet(s"$tmp/seqs")
    StoreSwap.swap(spark, dir, tmp)
  }
}
