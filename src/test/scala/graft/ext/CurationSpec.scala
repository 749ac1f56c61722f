package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** The one-call-per-tranche API's failure-recovery contracts: a re-run
  * of a failed commit must reproduce the first attempt bit-for-bit
  * (standing stores already carry the failed attempt's appends — the
  * tranche must never judge itself duplicate), and a geometry-
  * mismatched standing store must refuse the commit BEFORE any verdict
  * lands in the ledger.
  */
class CurationSpec extends SparkSpec {

  private def freshStores(): Curation.Stores = {
    val root = Files.createTempDirectory("curspec").toString
    Curation.Stores(s"$root/text", s"$root/img", s"$root/aud",
      s"$root/vid", s"$root/emb", s"$root/led")
  }

  test("a failed commit's re-run reproduces the first attempt exactly") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val emb = Tables.embeddings(spark, sf())
    val stores = freshStores()
    val t0 = docs.filter(col("doc_id") % 2 === 0)
    // tranche 1 carries a byte-identical copy of a tranche-0 doc under
    // a fresh id — its verdict must be exact_dup against STANDING in
    // both the first run and the re-run
    val copySrc = t0.orderBy("doc_id").limit(1)
    val t1 = docs.filter(col("doc_id") % 2 === 1)
      .unionAll(copySrc.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text")))
    def embOf(b: org.apache.spark.sql.DataFrame) = emb.join(
      b.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    def imgOf(b: org.apache.spark.sql.DataFrame) =
      b.select(col("doc_id"), xxhash64(col("text")).as("hash"))
    Curation.commitTranche(t0, 0L, stores, embeddings = Some(embOf(t0)),
      imgHashes = Some(imgOf(t0)))
    def run(): Seq[(Long, String, String)] =
      Curation.commitTranche(t1, 1L, stores, embeddings = Some(embOf(t1)),
          imgHashes = Some(imgOf(t1)))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
    def ledger(): Seq[(Long, String, Long, String)] =
      Ledger.read(spark, stores.ledger).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3))).sorted.toSeq
    val first = run()
    val ledFirst = ledger()
    val copyId = copySrc.collect()(0).getLong(0) + 1000000L
    assert(first.contains((copyId, "text", "exact_dup")),
      "planted cross-tranche copy not judged exact_dup on first run")
    // the crash-recovery path the scaladoc names: the whole commit
    // re-runs with the same trancheId, standing stores ALREADY carrying
    // tranche 1's text index + embedding appends from the first attempt
    val rerun = run()
    assert(rerun == first,
      "re-run verdicts diverged from the first attempt")
    assert(ledger() == ledFirst,
      "re-run changed the on-disk ledger")
    // and tranche 0's partitions were never touched
    assert(ledger().count(_._3 == 0L) > 0)
    // the re-run double-appended the hash index; maintenance is where
    // that redundancy collapses — and a post-maintenance commit still
    // reproduces the same verdicts
    val t1n = t1.count()
    val imgRows = () =>
      spark.read.parquet(s"${stores.image}/members").count()
    assert(imgRows() == t0.count() + 2 * t1n,
      "premise: the re-run should have double-appended tranche 1")
    Curation.maintain(spark, stores)
    assert(imgRows() == t0.count() + t1n,
      "maintenance did not collapse the re-run's duplicate rows")
    assert(run() == first, "post-maintenance re-run diverged")
    assert(ledger() == ledFirst)
  }

  test("a re-used doc_id across tranches is refused before any write") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val stores = freshStores()
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 0), 0L, stores)
    val ledBefore = Ledger.read(spark, stores.ledger).count()
    // tranche 1 re-uses one committed even id among fresh odd ids
    val bad = docs.filter(col("doc_id") % 2 === 1)
      .unionAll(docs.filter(col("doc_id") % 2 === 0).limit(1))
    val e = intercept[IllegalArgumentException] {
      Curation.commitTranche(bad, 1L, stores)
    }
    assert(e.getMessage.contains("re-uses doc_id") &&
      e.getMessage.contains("tranche 0"),
      s"collision error not actionable: ${e.getMessage}")
    assert(Ledger.read(spark, stores.ledger).count() == ledBefore,
      "a refused commit left ledger rows behind")
    assert(Ledger.read(spark, stores.ledger)
      .filter(col("tranche") === 1L).count() == 0)
    // the same tranche's ids re-arriving under the SAME trancheId (the
    // failed-commit re-run path) must still pass the guard
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 1), 1L, stores)
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 1), 1L, stores)
  }

  test("an initialized standing store gone missing refuses the commit") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val stores = freshStores()
    Curation.commitTranche(docs.filter(col("doc_id") % 2 === 0), 0L, stores)
    // simulate a mid-swap window / store loss: the index directory is
    // gone but its init marker (a sibling, untouched by swaps) remains
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(stores.textIndex))
    val e = intercept[IllegalStateException] {
      Curation.commitTranche(docs.filter(col("doc_id") % 2 === 1), 1L, stores)
    }
    assert(e.getMessage.contains("refusing to bootstrap"),
      s"missing-store error not actionable: ${e.getMessage}")
    assert(Ledger.read(spark, stores.ledger)
      .filter(col("tranche") === 1L).count() == 0,
      "a refused commit left tranche-1 ledger rows behind")
  }

  test("a modality frame with ids outside the tranche is refused") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val stores = freshStores()
    val t0 = docs.filter(col("doc_id") % 2 === 0)
    val foreign = t0.select((col("doc_id") + 1L).as("doc_id"),
      xxhash64(col("text")).as("hash"))
    val e = intercept[IllegalArgumentException] {
      Curation.commitTranche(t0, 0L, stores, imgHashes = Some(foreign))
    }
    assert(e.getMessage.contains("absent from this tranche"),
      s"subset error not actionable: ${e.getMessage}")
    assert(!new java.io.File(stores.ledger).exists())
  }

  test("an IVF embedding store routes the semantic layer through the index, re-run safe") {
    // the 100 TB semantic shape: the caller pre-trains the IVF store on
    // the initial corpus; commitTranche detects it (centroids table),
    // probes through cell pruning and appends through the frozen
    // integer codebook — and a failed commit's re-run still reproduces
    // the first attempt (probe-time self-exclusion inside the index)
    import spark.implicits._
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val emb = Tables.embeddings(spark, sf())
    val stores = freshStores()
    val standingEmb = emb.filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding")
    IvfIndex.write(standingEmb, stores.embedding, k = 4, iters = 2)
    // tranche: odd ids + a byte-identical copy of a standing vector
    val copySrc = standingEmb.orderBy("vec_id").limit(1)
    val t1docs = docs.filter(col("doc_id") % 2 === 1)
    val t1emb = emb.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding")
      .unionAll(copySrc.select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding")))
    val t1 = t1docs.unionAll(copySrc
      .select((col("vec_id") + 1000000L).as("doc_id"), lit("copy doc text")))
    def run(): Seq[(Long, String, String)] =
      Curation.commitTranche(t1, 0L, stores, embeddings = Some(t1emb))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
    val first = run()
    val copyId = copySrc.collect()(0).getLong(0) + 1000000L
    assert(first.contains((copyId, "embedding", "exact_dup")),
      "identical vector not judged exact_dup through the IVF store")
    // the store grew through the codebook: appended rows are immediately
    // searchable and carry cells
    assert(spark.read.parquet(s"${stores.embedding}/vectors")
      .filter(col("vec_id") >= 1000000L).count() == 1)
    // recovery re-run: standing already carries the tranche's append
    assert(run() == first, "IVF-backed re-run diverged from first attempt")
  }

  test("mismatched standing geometry is refused before any ledger write") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val stores = freshStores()
    Dedup.writeNearDupIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", stores.textIndex, k = 3)
    intercept[IllegalArgumentException] {
      Curation.commitTranche(docs.filter(col("doc_id") % 2 === 1),
        0L, stores)
    }
    assert(!new java.io.File(stores.ledger).exists(),
      "a geometry-mismatched commit left ledger rows behind")
  }
}
