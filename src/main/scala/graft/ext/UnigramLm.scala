package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
  * "Subword Regularization") — the OTHER public subword algorithm next
  * to the BPE family (x54/x62/x86): instead of greedily merging pairs,
  * hold a candidate piece vocabulary, Viterbi-segment the corpus under
  * the current piece likelihoods (the hard-EM E-step), re-estimate
  * piece frequencies from the segmentations (M-step), and prune to the
  * best pieces — single characters are never pruned so every word stays
  * segmentable.
  *
  * Trains on the [[TextAnalytics.wordFreq]] relation — ONE corpus pass
  * upstream, then every EM round touches only vocabulary-sized data
  * (the x54 discipline): the E-step is a distributed map over DISTINCT
  * words with the (tiny, alphabet+K-bounded) piece-cost table broadcast,
  * the M-step a partial-agg groupBy over emitted pieces. Nothing
  * corpus-sized moves after the frequency table exists.
  *
  * Integer-exact across engines BY CONSTRUCTION: piece log-likelihoods
  * are fixed-point `floor`-style −log₂(freq/total) computed with ONLY
  * IEEE-754 ops (divide, multiply-by-2, square — each bit-exactly
  * specified, identical in the JVM and DuckDB), never a transcendental
  * (`ln`/`log2` library calls may differ in the last ulp between
  * engines and a flipped ulp can flip a Viterbi argmin discretely).
  * Viterbi ties break toward the LATEST split point (shortest final
  * piece), mirrored in the oracle's backtrace.
  */
object UnigramLm {

  /** Fixed-point −log₂(num/den) scaled by 2¹⁶, via binary
    * normalization + 16 squaring steps — IEEE-only arithmetic, so any
    * engine replays it bit-for-bit (the oracle unrolls the same 16
    * squarings as CTEs). Requires 1 <= num <= den.
    */
  def neglog2fp(num: Long, den: Long): Long = {
    require(num >= 1 && num <= den, s"neglog2fp: need 1 <= $num <= $den")
    var y = num.toDouble / den.toDouble
    var e = 0L
    while (y < 1.0) { y *= 2.0; e += 1 }
    var f = 0L
    var i = 0
    while (i < 16) {
      y = y * y
      f <<= 1
      if (y >= 2.0) { f |= 1L; y /= 2.0 }
      i += 1
    }
    e * 65536L - f
  }

  /** Viterbi segmentation of one word under a piece-cost table:
    * dp(i) = min over piece lengths q with word[i−q,i) in the vocab of
    * dp(i−q) + cost(piece). Ties keep the SMALLEST q (latest split —
    * the first candidate examined), matching the oracle's
    * `list_min`-of-equal-cost backtrace. The cost table must contain
    * every single character of the word (the trainer guarantees it).
    */
  def segment(word: String, cost: collection.Map[String, Long],
              maxPiece: Int): Array[String] = {
    val L = word.length
    val dp = Array.fill(L + 1)(Long.MaxValue)
    val back = Array.fill(L + 1)(0)
    dp(0) = 0L
    var i = 1
    while (i <= L) {
      var q = 1
      while (q <= maxPiece && q <= i) {
        if (dp(i - q) != Long.MaxValue) {
          cost.get(word.substring(i - q, i)) match {
            case Some(c) =>
              val v = dp(i - q) + c
              if (v < dp(i)) { dp(i) = v; back(i) = q }
            case None =>
          }
        }
        q += 1
      }
      require(dp(i) != Long.MaxValue,
        s"unigram segment: position $i of '$word' unreachable — a single " +
          "character is missing from the vocabulary")
      i += 1
    }
    val out = List.newBuilder[String]
    val rev = List.newBuilder[Int]
    var p = L
    while (p > 0) { rev += back(p); p -= back(p) }
    val qs = rev.result().reverse
    var s = 0
    qs.foreach { q => out += word.substring(s, s + q); s += q }
    out.result().toArray
  }

  /** The trained model: final piece table (piece, cnt, cost_fp) — cnt
    * is the piece's frequency-weighted usage in the last E-step — and
    * the cost map for segmenting with it.
    */
  final case class Model(pieces: Seq[(String, Long, Long)],
                         cost: Map[String, Long])

  /** Hard-EM unigram training over a (word, n) frequency table.
    *
    *  - seed: every substring of length 1..`maxPiece` of every word,
    *    frequency-weighted by occurrence; vocabulary = ALL single
    *    characters (never pruned) ∪ top-`multiK` longer pieces by
    *    (count desc, piece asc);
    *  - per round: Viterbi-segment every distinct word under the
    *    current costs (distributed map, broadcast cost table),
    *    re-count piece usage weighted by word frequency, re-prune the
    *    multi-piece set to `multiK`, re-estimate costs from add-one
    *    smoothed counts (zero-usage singles stay finite);
    *  - costs: `neglog2fp(freq, total)` — seed uses raw counts, EM
    *    rounds use cnt+1.
    *
    * Every per-round collect is vocabulary-sized and guarded by
    * `maxVocab` (alphabet + multiK entries — broadcast-sized at any
    * corpus scale); the corpus itself is only ever touched by the
    * upstream [[TextAnalytics.wordFreq]] pass.
    */
  def trainModel(wf: DataFrame, multiK: Int = 48, rounds: Int = 2,
                 maxPiece: Int = 4, maxVocab: Int = 4096): Model = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(multiK >= 0 && maxPiece >= 1)
    val spark = wf.sparkSession
    import spark.implicits._
    val words = wf.select(col("word").cast("string"), col("n").cast("long"))
      .as[(String, Long)]
    val mp = maxPiece
    val cand = words.flatMap { case (w, n) =>
      for {
        s <- 0 until w.length
        l <- 1 to math.min(mp, w.length - s)
      } yield (w.substring(s, s + l), n)
    }.toDF("piece", "n").groupBy("piece").agg(sum("n").as("cnt"))
    def collectGuarded(df: DataFrame, what: String): Array[(String, Long)] = {
      val rows = df.limit(maxVocab + 1).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      require(rows.length <= maxVocab,
        s"unigram $what exceeds maxVocab=$maxVocab")
      rows
    }
    val singles = collectGuarded(
      cand.filter(length(col("piece")) === 1).orderBy("piece"), "alphabet")
    val multis0 = collectGuarded(
      cand.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(multiK), "seed vocab")
    val singleSet = singles.map(_._1)
    def costs(freqs: Array[(String, Long)]): Map[String, Long] = {
      val total = freqs.map(_._2).sum
      freqs.map { case (p, c) => p -> neglog2fp(c, total) }.toMap
    }
    var cost = costs(singles ++ multis0) // seed: raw counts
    var vocab: Array[(String, Long)] = singles ++ multis0
    for (_ <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(cost)
      val counts = words.flatMap { case (w, n) =>
        segment(w, bc.value, mp).map(p => (p, n))
      }.toDF("piece", "n").groupBy("piece").agg(sum("n").as("cnt"))
      val cntMap = collectGuarded(counts, "piece usage").toMap
      val multis = cntMap.toArray
        .filter { case (p, c) => p.length > 1 && c > 0 }
        .sortBy { case (p, c) => (-c, p) }.take(multiK)
      vocab = singleSet.map(s => (s, cntMap.getOrElse(s, 0L))) ++ multis
      cost = costs(vocab.map { case (p, c) => (p, c + 1) }) // add-one
    }
    Model(vocab.sortBy(_._1).toSeq
      .map { case (p, c) => (p, c, cost(p)) }, cost)
  }

  /** The trained piece table as a DataFrame: (piece, cnt, cost_fp). */
  def train(wf: DataFrame, multiK: Int = 48, rounds: Int = 2,
            maxPiece: Int = 4, maxVocab: Int = 4096): DataFrame = {
    val spark = wf.sparkSession
    import spark.implicits._
    trainModel(wf, multiK, rounds, maxPiece, maxVocab)
      .pieces.toDF("piece", "cnt", "cost_fp")
  }

  /** Per-distinct-word subword counts under a trained model:
    * (word, n_sub) — the join side for corpus tokenization (the x86
    * `u JOIN seg USING (word)` shape: segment the VOCABULARY once,
    * tokenize the corpus with one equi-join).
    */
  def segmentLengths(wf: DataFrame, model: Model,
                     maxPiece: Int = 4): DataFrame = {
    val spark = wf.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.cost)
    val mp = maxPiece
    wf.select(col("word").cast("string")).as[String]
      .map(w => (w, segment(w, bc.value, mp).length.toLong))
      .toDF("word", "n_sub")
  }
}
