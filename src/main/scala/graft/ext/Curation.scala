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

  private def exists(dir: String): Boolean =
    new java.io.File(dir).isDirectory

  /** Commit one tranche: probe → ledger append → store appends.
    * Returns the multimodal verdict frame that was appended, one row
    * per (doc_id, modality) with `decision` ∈ exact_dup / near_dup /
    * kept. First call against empty store paths bootstraps every
    * standing side as empty (all verdicts `kept` modulo within-tranche
    * duplication).
    */
  def commitTranche(docs: DataFrame, trancheId: Long, stores: Stores,
                    imgHashes: Option[DataFrame] = None,
                    audHashes: Option[DataFrame] = None,
                    vidFrames: Option[DataFrame] = None,
                    embeddings: Option[DataFrame] = None,
                    jThresh: Double = 0.6,
                    cosThresh: Double = 0.35): DataFrame = {
    val spark = docs.sparkSession
    // materialize the probe's inputs ONCE: the verdict plan references
    // the tranche's MinHash pipeline and the standing frames several
    // times, and the tranche index is ALSO what gets appended — without
    // checkpoints each reference recomputes the signature pass / the
    // standing dropDuplicates collapse (measured 3-4x the committed
    // cost at sf0.1)
    def ckpt(i: Dedup.NearDupIndexFrames) = Dedup.NearDupIndexFrames(
      i.bands.localCheckpoint(), i.sets.localCheckpoint(),
      i.members.localCheckpoint())
    val textIdx = ckpt(
      if (exists(s"${stores.textIndex}/bands"))
        Dedup.readNearDupIndex(spark, stores.textIndex)
      else Dedup.nearDupIndex(docs.filter(lit(false)), "doc_id", "text"))
    val trancheIdx = ckpt(Dedup.nearDupIndex(docs, "doc_id", "text"))
    var verdicts = Map[String, DataFrame](
      "text" -> Dedup.ledgerProbeFrom(textIdx, trancheIdx, docs,
        "doc_id", jThresh))
    imgHashes.foreach { h =>
      val std = if (exists(stores.image)) spark.read.parquet(stores.image)
        else h.filter(lit(false))
      verdicts += "image" -> ImageHash.ledgerProbe(std, h, "doc_id", "hash")
    }
    audHashes.foreach { h =>
      val std = if (exists(stores.audio)) spark.read.parquet(stores.audio)
        else h.filter(lit(false))
      verdicts += "audio" -> ImageHash.ledgerProbe(std, h, "doc_id", "hash")
    }
    vidFrames.foreach { f =>
      val std = if (exists(stores.video)) spark.read.parquet(stores.video)
        else f.filter(lit(false))
      verdicts += "video" -> VideoHash.ledgerProbe(std, f, docs, "doc_id")
    }
    embeddings.foreach { e =>
      val std = if (exists(stores.embedding))
        spark.read.parquet(stores.embedding)
      else e.filter(lit(false))
      verdicts += "embedding" -> Similarity.ledgerProbe(std, e,
        "vec_id", "embedding", "label", cosThresh)
    }
    Ledger.appendTranche(verdicts, trancheId, stores.ledger)
    // append the SAME checkpointed tranche index the probe used
    Dedup.ensureNearDupIndexParams(spark, stores.textIndex, 2, 8, 2)
    Dedup.writeNearDupIndexFrames(trancheIdx, stores.textIndex)
    imgHashes.foreach(_.write.mode("append").parquet(stores.image))
    audHashes.foreach(_.write.mode("append").parquet(stores.audio))
    vidFrames.foreach(_.write.mode("append").parquet(stores.video))
    embeddings.foreach(_.write.mode("append").parquet(stores.embedding))
    verdicts.map { case (m, v) =>
      v.select(col("doc_id"), lit(m).as("modality"), col("decision"))
    }.reduce(_ unionByName _)
  }

  /** Run every due maintenance pass over a deployment's stores: compact
    * the text index and the ledger (always safe — pure rewrites), and
    * leave the embedding store to [[IvfIndex.rewrite]]'s census-driven
    * cadence where one is deployed. Callers schedule this between
    * tranches at whatever cadence write amplification warrants.
    */
  def maintain(spark: SparkSession, stores: Stores): Unit = {
    if (exists(s"${stores.textIndex}/bands"))
      Dedup.compactNearDupIndex(spark, stores.textIndex)
    if (exists(stores.ledger)) Ledger.compact(spark, stores.ledger)
  }
}
