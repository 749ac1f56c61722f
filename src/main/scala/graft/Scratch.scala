package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness for optimization work (not part of the driver
  * contract): times each named query a few times at the given SF dir.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (names.contains("__commit_steps")) {
      // the NEW commit path's phases in isolation at this SF
      import org.apache.spark.sql.functions._
      import graft.ext.{Curation, Dedup, Ledger}
      val docs0 = graft.model.Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"SCRATCH step $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val root = java.nio.file.Files.createTempDirectory("scrcur").toString
      val idxDir = s"$root/text"
      val ledDir = s"$root/led"
      def ckpt(i: Dedup.NearDupIndexFrames) = Dedup.NearDupIndexFrames(
        i.bands.localCheckpoint(), i.sets.localCheckpoint(),
        i.members.localCheckpoint())
      Seq(0L -> (col("doc_id") % 4 === 0),
          1L -> (col("doc_id") % 20 === 1)).foreach { case (tr, pred) =>
        val b = docs0.filter(pred)
        val ids = t(s"t$tr ids_ckpt") {
          b.select(col("doc_id")).localCheckpoint()
        }
        val trIdx = t(s"t$tr tranche_idx_ckpt") {
          ckpt(Dedup.nearDupIndex(b, "doc_id", "text"))
        }
        if (new java.io.File(s"$idxDir/bands").isDirectory) {
          t(s"t$tr pv_trancheParts") {
            trIdx.bands.select(lit(0).as("t"),
              expr("pmod(xxhash64(bk), 64)").as("p"))
              .unionByName(trIdx.sets.select(lit(1).as("t"),
                expr("pmod(xxhash64(ch), 64)").as("p")))
              .distinct().collect().length
          }
          t(s"t$tr pv_bands_read") {
            spark.read.parquet(s"$idxDir/bands").drop("bkp")
              .dropDuplicates("ch", "bk").localCheckpoint(false)
              .select(expr("pmod(xxhash64(ch), 64)").as("p"))
              .distinct().collect().length
          }
        }
        val standing = t(s"t$tr probe_view") {
          if (new java.io.File(s"$idxDir/bands").isDirectory)
            Dedup.probeView(spark, idxDir, trIdx, Some(ids))
          else Dedup.nearDupIndex(b.filter(lit(false)), "doc_id", "text")
        }
        val v = Dedup.ledgerProbeFrom(standing, trIdx, b, "doc_id")
        t(s"t$tr probe+ledger_append") {
          Ledger.append(v, tr, "text", ledDir)
        }
        t(s"t$tr index_append") {
          Dedup.writeNearDupIndexFrames(trIdx, idxDir)
        }
        t(s"t$tr registry_append") {
          ids.withColumn("tranche", lit(tr))
            .withColumn("idp", expr("pmod(xxhash64(doc_id), 64)"))
            .repartition(col("idp"))
            .write.mode("append").partitionBy("idp").parquet(s"$ledDir.ids")
        }
      }
      spark.stop(); return
    }
    if (names.contains("__curation_steps")) {
      import org.apache.spark.sql.functions._
      val docs0 = graft.model.Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"SCRATCH step $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val root = java.nio.file.Files.createTempDirectory("scrcur").toString
      val idxDir = s"$root/text"
      val ledDir = s"$root/led"
      def ckpt(i: graft.ext.Dedup.NearDupIndexFrames) =
        graft.ext.Dedup.NearDupIndexFrames(
          i.bands.localCheckpoint(), i.sets.localCheckpoint(),
          i.members.localCheckpoint())
      Seq(0L -> (col("doc_id") % 4 === 0),
          1L -> (col("doc_id") % 20 === 1)).foreach { case (tr, pred) =>
        val b = docs0.filter(pred)
        val standing = t(s"t$tr standing_read_ckpt") {
          ckpt(if (new java.io.File(s"$idxDir/bands").isDirectory)
            graft.ext.Dedup.readNearDupIndex(spark, idxDir)
          else graft.ext.Dedup.nearDupIndex(
            b.filter(lit(false)), "doc_id", "text"))
        }
        val trIdx = t(s"t$tr tranche_idx_ckpt") {
          ckpt(graft.ext.Dedup.nearDupIndex(b, "doc_id", "text"))
        }
        val v = graft.ext.Dedup.ledgerProbeFrom(standing, trIdx, b, "doc_id")
        t(s"t$tr probe+ledger_append") {
          graft.ext.Ledger.append(v, tr, "text", ledDir)
        }
        t(s"t$tr index_append") {
          graft.ext.Dedup.writeNearDupIndexFrames(trIdx, idxDir)
        }
      }
      spark.stop(); return
    }
    if (names.contains("__curation")) {
      import org.apache.spark.sql.functions._
      val docs = graft.model.Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      val emb = graft.model.Tables.embeddings(spark, sfDir)
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"SCRATCH __curation $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      Seq("t", "tv", "te", "tve").foreach { mods =>
        val root = java.nio.file.Files.createTempDirectory("scrcur").toString
        val stores = graft.ext.Curation.Stores(s"$root/text", s"$root/img",
          s"$root/aud", s"$root/vid", s"$root/emb", s"$root/led")
        t(mods) {
          Seq(0L -> (col("doc_id") % 4 === 0),
              1L -> (col("doc_id") % 20 === 1)).foreach { case (tr, pred) =>
            val b = docs.filter(pred)
            graft.ext.Curation.commitTranche(b, tr, stores,
              vidFrames = if (mods.contains('v')) Some(
                graft.ext.VideoHash.frameHashes(b, "doc_id", "text")) else None,
              embeddings = if (mods.contains('e')) Some(emb.join(
                b.select(col("doc_id").as("vec_id")), Seq("vec_id"),
                "left_semi")) else None)
          }
        }
      }
      spark.stop(); return
    }
    if (names.contains("__pairs")) {
      import org.apache.spark.sql.functions._
      val docs = graft.model.Tables.documents(spark, sfDir)
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"SCRATCH __pairs $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      (1 to 3).foreach { i =>
        // two-scan variant (no base sharing)
        t(s"two_scan_$i") {
          val m = graft.ext.Dedup.contentMembers(docs, "doc_id", "text").persist()
          val s = graft.ext.Dedup.contentSignatures(docs, "doc_id", "text").persist()
          graft.ext.Dedup.minhashLshPairsFrom(m, s).count()
          m.unpersist(true); s.unpersist(true)
        }
        // fused one-scan variant
        t(s"one_scan_$i") {
          val b = graft.ext.Dedup.contentBase(docs, "doc_id", "text").persist()
          val m = graft.ext.Dedup.contentMembersFrom(b)
          val s = graft.ext.Dedup.contentSignaturesFrom(b).persist()
          graft.ext.Dedup.minhashLshPairsFrom(m, s).count()
          b.unpersist(true); s.unpersist(true)
        }
        // fully lazy variant (round-7 shape)
        t(s"lazy_$i") {
          graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text").count()
        }
      }
      spark.stop(); return
    }
    if (names.contains("__ledgerbuild")) {
      // the Bench ledger_kernels_build line item in isolation: standing
      // artifacts pre-warmed untimed (as Bench does), then the kernel
      // build timed
      graft.queries.ExtQueries.warmPairs(spark, sfDir)
      graft.queries.ExtQueries.warmNearDupIndex(spark, sfDir)
      val t0 = System.nanoTime()
      graft.queries.ExtQueries.ledgerKernelTimings(spark, sfDir).foreach {
        case (n, s) => println(f"SCRATCH ledger_frame $n $s%.2f s")
      }
      println(f"SCRATCH ledger_kernels_build ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop(); return
    }
    if (names.contains("__ledger")) {
      // per-kernel timing of the x112 ledger build at this SF
      import org.apache.spark.sql.functions._
      import graft.ext.{Bmp, Dedup, Wav}
      import spark.implicits._
      val docs = graft.model.Tables.documents(spark, sfDir)
      val rep8 = array_join(slice(split(col("text"), " "), 1, 8), " ")
      val base = docs.select(col("doc_id"),
        when(col("doc_id") % 10 === 7, concat_ws(" ", col("text"), rep8, rep8))
          .otherwise(col("text")).as("text"))
      val corpus = base.unionAll(
        base.filter(col("doc_id") % 97 === 13)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .persist()
      corpus.count()
      def t(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"SCRATCH __ledger $label ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      t("lsh_pairs+cc") {
        Dedup.dedupClusters(Dedup.minhashLshPairs(corpus, "doc_id", "text")
          .filter(col("jaccard") >= 0.6)).count()
      }
      t("inc_pairsA") {
        Dedup.minhashLshPairs(docs, "doc_id", "text")
          .filter(col("jaccard") >= 0.6 &&
            col("a_id") % 10 =!= 7 && col("b_id") % 10 =!= 7).count()
      }
      t("inc_gapidx") {
        val g = Dedup.nearDupIndex(
          docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 4 === 0),
          "doc_id", "text")
        g.bands.count() + g.sets.count() + g.members.count()
      }
      t("inc_probeB") {
        val std = Dedup.nearDupIndex(
          docs.filter(col("doc_id") % 4 =!= 0), "doc_id", "text")
        val keepMem = std.members.filter(col("id") % 10 =!= 7)
        val keepCh = keepMem.select("ch").distinct()
        val gapIdx = Dedup.nearDupIndex(
          docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 4 === 0),
          "doc_id", "text")
        val idxU = Dedup.NearDupIndexFrames(
          std.bands.join(keepCh, Seq("ch"), "left_semi")
            .unionByName(gapIdx.bands).dropDuplicates("ch", "bk").persist(),
          std.sets.join(keepCh, Seq("ch"), "left_semi")
            .unionByName(gapIdx.sets).dropDuplicates("ch").persist(),
          keepMem.unionByName(gapIdx.members).persist())
        val n = Dedup.probeNearDupIndex(idxU,
            base.filter(col("doc_id") % 10 === 7), "doc_id", "text")
          .filter(col("jaccard") >= 0.6).count()
        Seq(idxU.bands, idxU.sets, idxU.members).foreach(_.unpersist(false))
        n
      }
      t("inc_probe_onepass") {
        Dedup.incrementalNearDupPairs(
          docs.filter(col("doc_id") % 10 =!= 7),
          base.filter(col("doc_id") % 10 === 7), "doc_id", "text")
          .filter(col("jaccard") >= 0.6).count()
      }
      t("embedding+cc") {
        val emb = graft.model.Tables.embeddings(spark, sfDir)
        val corpusEmb = emb.unionAll(emb.filter(col("vec_id") % 97 === 13)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            col("embedding"), col("label")))
        Dedup.dedupClusters(
          graft.ext.Similarity.embeddingNearDups(corpusEmb, "label", 0.35)
            .select("a_id", "b_id")).count()
      }
      t("contamination") {
        Dedup.contamination(corpus, corpus.filter(col("doc_id") % 8 === 0),
          "doc_id", "text").count()
      }
      t("boiler+intra") {
        graft.ext.Boilerplate.removeBoilerplate(corpus, "doc_id", "text", 8, 3)
          .join(graft.ext.Boilerplate.dedupWithinDocuments(corpus, "doc_id", "text", 4),
            Seq("doc_id")).count()
      }
      t("image_hash+cc") {
        val h = corpus.filter(length(col("text")) >= 1)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, tx) => (id, graft.ext.ImageHash.dHash(
            Bmp.parse(Bmp.write(16, tx.getBytes("US-ASCII"))))) }
          .toDF("doc_id", "hash")
        Dedup.dedupClusters(graft.ext.ImageHash.hammingNearDups(h, "doc_id", "hash")).count()
      }
      t("audio_hash+cc") {
        val h = corpus.filter(length(col("text")) >= 1)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, tx) => (id, graft.ext.AudioHash.eHash(
            Wav.parse(Wav.write(tx.getBytes("US-ASCII"))))) }
          .toDF("doc_id", "hash")
        Dedup.dedupClusters(graft.ext.ImageHash.hammingNearDups(h, "doc_id", "hash")).count()
      }
      t("video_hash+cc") {
        Dedup.dedupClusters(graft.ext.VideoHash.sequenceNearDups(
          graft.ext.VideoHash.frameHashes(corpus, "doc_id", "text"))).count()
      }
      spark.stop(); return
    }
    if (names.contains("__bpe")) {
      // x86 sub-step timing: trigram wf aggregation+collect, the local
      // training loop, the final segmentation join+rollup
      import org.apache.spark.sql.functions._
      import spark.implicits._
      (1 to 2).foreach { run =>
        val docs = graft.model.Tables.documents(spark, sfDir)
        val trigramsCol = org.apache.spark.sql.GraftColumnBridge.column(
          graft.expr.WordShingles(
            org.apache.spark.sql.GraftColumnBridge.expression(
              col("text").cast("string")), 3))
        val units = docs.select(col("doc_id"), explode(trigramsCol).as("tg"))
          .select(col("doc_id"),
            replace(col("tg"), lit(" "), lit("+")).as("word"))
        val wf = units.groupBy("word").agg(count(lit(1)).as("n"))
        var t0 = System.nanoTime()
        val nwf = wf.count()
        println(f"SCRATCH __bpe run$run wf_count ${(System.nanoTime() - t0) / 1e9}%.2f s ($nwf words)")
        t0 = System.nanoTime()
        val (_, vocab) = graft.ext.TextAnalytics.bpeTrainLocalFast(wf, rounds = 1024)
        println(f"SCRATCH __bpe run$run train(collect+loop) ${(System.nanoTime() - t0) / 1e9}%.2f s (${vocab.size} vocab)")
        t0 = System.nanoTime()
        val seg = vocab.map { case (w, _, rep) => (w, rep.count(_ == ' ') + 1L) }
          .toDF("word", "n_sub")
        val n = units.join(broadcast(seg), Seq("word"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_units"), sum("n_sub").as("n_bpe_tokens"))
          .count()
        println(f"SCRATCH __bpe run$run segment+rollup ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      spark.stop(); return
    }
    if (names.contains("__qconv")) {
      // quality-perceptron convergence curve at this SF: accuracy on the
      // labeled training split and on the full corpus per round budget
      import org.apache.spark.sql.functions._
      val docs = graft.model.Tables.documents(spark, sfDir)
      val tk = split(col("text"), " ")
      val labels = docs.select(col("doc_id"),
        when(size(filter(tk, x => x === "the" || x === "a")) * 16 > size(tk),
          lit(1L)).otherwise(lit(-1L)).as("y"))
      Seq(4, 8, 12, 16, 20, 24).foreach { r =>
        val t0 = System.nanoTime()
        val w = graft.ext.QualityModel.trainPerceptron(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
          labels, 4096, rounds = r)
        val scored = graft.ext.QualityModel
          .scoreDocuments(docs, "doc_id", "text", w, 4096)
          .join(labels, "doc_id")
          .withColumn("train", col("doc_id") % 10 === 0)
          .withColumn("ok",
            when((col("keep") === 1) === (col("y") === 1L), 1L).otherwise(0L))
        val agg = scored.groupBy("train")
          .agg(count(lit(1)).as("n"), sum("ok").as("ok")).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        agg.foreach { row =>
          println(f"SCRATCH __qconv rounds=$r ${if (row.getBoolean(0)) "train" else "rest "} acc=${row.getLong(2).toDouble / row.getLong(1)}%.4f (n=${row.getLong(1)}) ${sec}%.2f s")
        }
      }
      spark.stop(); return
    }
    val qs =
      if (names.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => names.contains(n) }
    qs.foreach { case (name, fn) =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"SCRATCH $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
