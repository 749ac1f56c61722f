package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the CCNet/Dolma curation
  * move the dedup family does not cover: a fixed-width aligned token
  * segment ("paragraph") that recurs across MANY documents (nav bars,
  * cookie banners, license footers) is stripped from EVERY document,
  * including its first occurrence. That is the semantic difference
  * from chunk dedup (x56 keeps the first occurrence — dedup preserves
  * one copy; boilerplate removal keeps none: the segment is noise, not
  * content).
  *
  * Scale shape (100 TB): one segmentation pass; segments are reduced
  * to a 60-bit fingerprint BEFORE any shuffle so the document-
  * frequency aggregation and the boilerplate join move (doc_id,
  * seg_no, h) triples, never segment text; the df relation is grouped
  * by fingerprint (bounded by distinct-segment count, not corpus
  * rows); reassembly is one per-doc aggregation. No broadcast of the
  * boilerplate set is assumed — adversarial corpora can have
  * arbitrarily many hot segments, so the flag join is a plain
  * equi-join on the fingerprint.
  */
object Boilerplate {

  /** Aligned `width`-token segments of each document:
    * (doc_id, seg_no, seg, h) with h = md5-prefix fingerprint of the
    * segment text ([[Hashing.h60]] — DuckDB replays it byte-identically).
    * The final segment may be shorter than `width` (document tail).
    */
  def segments(docs: DataFrame, idCol: String, textCol: String,
               width: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val tk = split(col(textCol), " ")
    docs.select(col(idCol).as("doc_id"), tk.as("t"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ((size(col("t")) - 1) / width).cast("int")),
          i => array_join(slice(col("t"), i * width + 1, lit(width)), " "))))
      .select(col("doc_id"), col("pos").cast("long").as("seg_no"),
        col("col").as("seg"))
      .withColumn("h", Hashing.h60(col("seg")))
  }

  /** Within-document segment dedup — RefinedWeb-style intra-document
    * repetition removal, the third member of the segment-granularity
    * family: x56 keeps each segment's FIRST CORPUS occurrence, x99
    * removes corpus-frequent segments everywhere, and this keeps each
    * segment's first occurrence WITHIN ITS OWN DOCUMENT only — the
    * filter that strips degenerate repetition loops (a model- or
    * scraper-generated doc repeating its own opening paragraph) without
    * any cross-document coordination.
    *
    * Output: (doc_id, n_segs, n_removed, clean_text), survivors
    * reassembled in original order.
    *
    * Scale shape: unlike x56/x99 there is NO corpus-wide relation at
    * all — both aggregations key on the document, so the operator is
    * embarrassingly partitionable: (doc_id, h) collapse, then per-doc
    * reassembly; a 100 TB corpus needs exactly two doc-keyed local
    * shuffles and nothing global.
    */
  def dedupWithinDocuments(docs: DataFrame, idCol: String, textCol: String,
                           width: Int = 4): DataFrame =
    segments(docs, idCol, textCol, width)
      .groupBy("doc_id", "h")
      .agg(min("seg_no").as("seg_no"), min("seg").as("seg"),
        count(lit(1)).as("occ"))
      .groupBy("doc_id")
      .agg(sum("occ").as("n_segs"),
        sum(col("occ") - 1).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_no"), col("seg")))),
          s => s.getField("seg")), " ").as("clean_text"))

  /** Strip every occurrence of segments whose document frequency is
    * >= `minDocs`, reassemble the survivors in order:
    * (doc_id, n_segs, n_removed, clean_text). A fully-boilerplate
    * document survives with clean_text = '' (downstream length filters
    * decide its fate — silent row loss here would break doc counts).
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        width: Int = 8, minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val segs = segments(docs, idCol, textCol, width)
    val boiler = segs.select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("h"), lit(true).as("is_boiler"))
    segs.join(boiler, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(not(coalesce(col("is_boiler"), lit(false))),
            struct(col("seg_no"), col("seg"))))),
          s => s.getField("seg")), " ").as("clean_text"))
  }
}
