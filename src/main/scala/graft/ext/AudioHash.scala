package graft.ext

/** Audio perceptual near-duplicate hashing — the audio member of the
  * dedup family, completing the modality symmetry (text MinHash, image
  * dHash, audio energy hash). The hash is the dHash idea on the time
  * axis (a simplified Haitsma–Kalker robust audio hash): split the PCM
  * stream into 65 hop-sized windows and emit bit j = 1 iff window j's
  * total absolute amplitude is below window j+1's — re-encodes, gain
  * riding and local noise flip few bits, so near-duplicate audio sits
  * within a small Hamming distance.
  *
  * Candidate generation reuses [[ImageHash.hammingNearDups]] verbatim
  * (it is modality-agnostic over any (id, 64-bit hash) relation): the
  * band-sliced Hamming equi-join, exact by pigeonhole, with identical
  * hashes collapsed before the join and oversized buckets dropped with
  * a report.
  */
object AudioHash {

  /** 64-bit energy-difference hash of a decoded 8-bit PCM stream:
    * `w + 1` windows of `hop = max(1, n / (w+1))` samples (windows past
    * the stream count as silence), bit j = 1 iff
    * energy(j) < energy(j+1), energy = Σ |sample − 128|. Deterministic
    * and exactly replayable from the source bytes in any engine.
    */
  def eHash(pcm: Wav.Pcm, w: Int = 64): Long = {
    require(w >= 1 && w <= 64, s"eHash: bad width $w")
    val s = pcm.samples
    require(s.length >= 1, "eHash: empty audio")
    val hop = math.max(1, s.length / (w + 1))
    def energy(j: Int): Long = {
      var i = j * hop
      val end = math.min((j + 1) * hop, s.length)
      var e = 0L
      while (i < end) { e += math.abs((s(i) & 0xff) - 128); i += 1 }
      e
    }
    var hash = 0L
    var prev = energy(0)
    var j = 0
    while (j < w) {
      val nxt = energy(j + 1)
      if (prev < nxt) hash |= 1L << j
      prev = nxt
      j += 1
    }
    hash
  }
}
