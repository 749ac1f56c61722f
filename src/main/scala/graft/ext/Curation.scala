package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The one-call-per-tranche ingestion API: everything the streaming
  * multimodal test wires by hand — probe every modality's PERSISTED
  * standing store for first-seen verdicts, append the verdicts to the
  * persisted [[Ledger]], then append the tranche to every store — as a
  * single library entry point a `foreachBatch` body (or a batch
  * backfill loop) calls directly.
  *
  * Contracts inherited from the pieces:
  *  - verdicts are FINAL at arrival (ledgerProbe first-seen): the
  *    accumulated ledger over tranches 0..n equals the batch multimodal
  *    ledger over the union corpus under arrival order;
  *  - a re-run of a failed tranche must re-run the WHOLE commit with
  *    the same `trancheId` BEFORE any later tranche commits: the ledger
  *    write is idempotent (dynamic partition overwrite), and the store
  *    appends are re-collapsed by the readers' dropDuplicates
  *    ([[Dedup.readNearDupIndex]]) or are verdict-neutral re-entries
  *    (identical hash/vector rows judge exactly as their first copy);
  *  - store growth is append-only between maintenance passes
  *    ([[Dedup.compactNearDupIndex]], [[Ledger.compact]],
  *    [[IvfIndex.rewrite]]).
  *
  * Modalities are optional: a text-only pipeline passes only `docs`.
  * Perceptual layers take PRE-COMPUTED fingerprints ((doc_id, hash) for
  * image/audio, [[VideoHash.frameHashes]] output for video) — decode
  * lives with the caller ([[Multimodal]]), the index never sees pixels.
  */
object Curation {

  /** On-disk layout of one curation deployment: per-modality standing
    * stores plus the verdict ledger, all under caller-owned paths.
    */
  final case class Stores(textIndex: String, image: String, audio: String,
                          video: String, embedding: String, ledger: String)

  // store-FS existence (java.io.File would report every hdfs://-style
  // store absent and silently bootstrap empty standing sides forever)
  private def exists(spark: SparkSession, dir: String): Boolean =
    Dedup.storeExists(spark, dir)

  /** Commit one tranche: probe → ledger append → store appends.
    * Returns the multimodal verdict frame that was appended, one row
    * per (doc_id, modality) with `decision` ∈ exact_dup / near_dup /
    * kept. First call against empty store paths bootstraps every
    * standing side as empty (all verdicts `kept` modulo within-tranche
    * duplication).
    *
    * Ids must be unique across tranches (the ledgerProbe first-seen
    * contract). That makes a FAILED commit's re-run safe: every
    * standing side is probed with the tranche's own ids excluded, so
    * half-appended rows from the failed attempt can never make the
    * tranche judge itself duplicate — the re-run reproduces the first
    * attempt's verdicts and its ledger write replaces the same
    * partitions (CurationSpec pins re-run == first run).
    */
  def commitTranche(docs: DataFrame, trancheId: Long, stores: Stores,
                    imgHashes: Option[DataFrame] = None,
                    audHashes: Option[DataFrame] = None,
                    vidFrames: Option[DataFrame] = None,
                    embeddings: Option[DataFrame] = None,
                    jThresh: Double = 0.6,
                    cosThresh: Double = 0.35,
                    k: Int = 2, bands: Int = 8, rows: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    // geometry guard FIRST: a standing index built under different
    // shingle/band params must refuse the commit before any verdict is
    // derived, not after a silently-wrong ledger partition is committed
    Dedup.ensureNearDupIndexParams(spark, stores.textIndex, k, bands, rows)
    val ids = docs.select(col("doc_id")).localCheckpoint()
    // materialize the probe's inputs ONCE: the verdict plan references
    // the tranche's MinHash pipeline and the standing frames several
    // times, and the tranche index is ALSO what gets appended — without
    // checkpoints each reference recomputes the signature pass / the
    // standing dropDuplicates collapse (measured 3-4x the committed
    // cost at sf0.1)
    def ckpt(i: Dedup.NearDupIndexFrames) = Dedup.NearDupIndexFrames(
      i.bands.localCheckpoint(), i.sets.localCheckpoint(),
      i.members.localCheckpoint())
    // self-exclusion: drop the tranche's own ids from every standing
    // side (a re-run of a failed commit probes a store that may already
    // carry this tranche's append)
    val textIdx0 =
      if (exists(spark, s"${stores.textIndex}/bands"))
        Dedup.readNearDupIndex(spark, stores.textIndex)
      else Dedup.nearDupIndex(docs.filter(lit(false)), "doc_id", "text",
        k, bands, rows)
    val textIdx = ckpt(textIdx0.copy(members = textIdx0.members
      .join(ids.withColumnRenamed("doc_id", "id"), Seq("id"), "left_anti")))
    val trancheIdx = ckpt(
      Dedup.nearDupIndex(docs, "doc_id", "text", k, bands, rows))
    def standing(dir: String, fallback: DataFrame, idCol: String) =
      (if (exists(spark, dir)) spark.read.parquet(dir)
       else fallback.filter(lit(false)))
        .join(ids.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti")
    var verdicts = Map[String, DataFrame](
      "text" -> Dedup.ledgerProbeFrom(textIdx, trancheIdx, docs,
        "doc_id", jThresh))
    val img = imgHashes.map(_.localCheckpoint())
    img.foreach { h =>
      verdicts += "image" -> ImageHash.ledgerProbe(
        standing(stores.image, h, "doc_id"), h, "doc_id", "hash")
    }
    val aud = audHashes.map(_.localCheckpoint())
    aud.foreach { h =>
      verdicts += "audio" -> ImageHash.ledgerProbe(
        standing(stores.audio, h, "doc_id"), h, "doc_id", "hash")
    }
    val vid = vidFrames.map(_.localCheckpoint())
    vid.foreach { f =>
      verdicts += "video" -> VideoHash.ledgerProbe(
        standing(stores.video, f, "doc_id"), f, docs, "doc_id")
    }
    // the semantic layer has two store shapes: a flat parquet of
    // (vec_id, embedding, label) — exhaustive label-blocked cosine,
    // right up to ~10^6 standing vectors — or a persisted [[IvfIndex]]
    // (pre-train it with IvfIndex.write on the initial corpus; detected
    // by its centroids table). The IVF path is THE 100 TB shape: probes
    // scan only the routed cells' partitions, identity stays exact, and
    // near-dup recall is bounded by `probes` (the documented IVF
    // bargain). Maintenance stays with [[IvfIndex.rewrite]]'s
    // census-driven cadence.
    val embIvf = exists(spark, s"${stores.embedding}/centroids")
    val emb = embeddings.map(_.localCheckpoint())
    emb.foreach { e =>
      verdicts += "embedding" -> (
        if (embIvf) IvfIndex.ledgerProbe(spark, stores.embedding, e,
          "vec_id", "embedding", cosThresh, exclude = Some(ids))
        else Similarity.ledgerProbe(
          standing(stores.embedding, e, "vec_id"), e,
          "vec_id", "embedding", "label", cosThresh))
    }
    Ledger.appendTranche(verdicts, trancheId, stores.ledger)
    // append the SAME checkpointed frames the probes used
    Dedup.writeNearDupIndexFrames(trancheIdx, stores.textIndex)
    img.foreach(_.write.mode("append").parquet(stores.image))
    aud.foreach(_.write.mode("append").parquet(stores.audio))
    vid.foreach(_.write.mode("append").parquet(stores.video))
    emb.foreach { e =>
      if (embIvf) IvfIndex.append(e.drop("label"), stores.embedding)
      else e.write.mode("append").parquet(stores.embedding)
    }
    verdicts.map { case (m, v) =>
      v.select(col("doc_id"), lit(m).as("modality"), col("decision"))
    }.reduce(_ unionByName _)
  }

  /** Run every due maintenance pass over a deployment's stores: compact
    * the text index and the ledger (always safe — pure rewrites), and
    * collapse the flat fingerprint/embedding stores' duplicate rows (a
    * failed commit's re-run appends its tranche twice; probe-time
    * self-exclusion keeps verdicts correct, and THIS is where the
    * redundant rows go away — the flat-store analogue of
    * [[Dedup.compactNearDupIndex]]'s collapse and [[IvfIndex.rewrite]]'s
    * dropDuplicates). An IVF embedding store is left to
    * [[IvfIndex.rewrite]]'s census-driven cadence. Callers schedule
    * this between tranches at whatever cadence write amplification
    * warrants.
    */
  def maintain(spark: SparkSession, stores: Stores): Unit = {
    if (exists(spark, s"${stores.textIndex}/bands"))
      Dedup.compactNearDupIndex(spark, stores.textIndex)
    if (exists(spark, stores.ledger)) Ledger.compact(spark, stores.ledger)
    val flat = Seq(stores.image, stores.audio, stores.video) ++
      (if (exists(spark, s"${stores.embedding}/centroids")) Nil
       else Seq(stores.embedding))
    flat.filter(exists(spark, _)).foreach(compactFlat(spark, _))
  }

  /** Full-row duplicate collapse + small-file compaction of one flat
    * fingerprint store, through the shared [[StoreSwap]] discipline.
    */
  private def compactFlat(spark: SparkSession, dir: String): Unit = {
    val tmp = StoreSwap.prepareTmp(spark, s"$dir.compact")
    spark.read.parquet(dir).dropDuplicates().write.parquet(tmp)
    StoreSwap.swap(spark, dir, tmp)
  }
}
