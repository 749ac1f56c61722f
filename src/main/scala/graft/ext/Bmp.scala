package graft.ext

/** Pure-JVM BMP (BITMAPINFOHEADER, 24-bpp uncompressed) codec — the
  * second REAL byte format behind the [[Multimodal.MediaDecoder]]
  * boundary, exercising the IMAGE side of the multimodal path the way
  * [[Wav]] exercises audio: genuine magic-number, header-field, and
  * truncation failures over real bytes, with no external libraries
  * (BMP headers are 54 bytes of little-endian fields). A production
  * deployment swaps in an ImageIO/JNI decoder per executor; the
  * Spark-side plumbing is identical.
  *
  * Supported profile: "BM" magic, 40-byte BITMAPINFOHEADER, 1 plane,
  * 24 bpp, BI_RGB (no compression), non-negative bottom-up height —
  * the profile [[write]] emits. Anything else raises `unsupported`.
  * The expected pixel-array size is computed in Long arithmetic and
  * checked against the payload BEFORE any allocation, so a
  * header-bomb (absurd declared dimensions) classifies as `truncated`
  * instead of attempting a giant allocation.
  */
object Bmp {

  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt

  /** Row stride: pixel rows are padded to 4-byte boundaries. */
  def stride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Serialize grayscale bytes as a `width`-pixel-wide 24-bpp BMP
    * (bottom-up rows, as the format stores them); the final partial row
    * is zero-padded. `gray.length == 0` yields a legal zero-height file.
    */
  def write(width: Int, gray: Array[Byte]): Array[Byte] = {
    require(width >= 1, s"bmp: width must be >= 1, got $width")
    val h = (gray.length + width - 1) / width
    val st = stride(width)
    val dataSize = st * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, 54 + dataSize)
    le32(out, 10, 54) // pixel-array offset
    le32(out, 14, 40) // BITMAPINFOHEADER
    le32(out, 18, width)
    le32(out, 22, h)
    le16(out, 26, 1)  // planes
    le16(out, 28, 24) // bpp
    le32(out, 30, 0)  // BI_RGB
    le32(out, 34, dataSize)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < width) {
        val idx = r * width + c
        val v: Byte = if (idx < gray.length) gray(idx) else 0
        val off = 54 + (h - 1 - r) * st + c * 3
        out(off) = v; out(off + 1) = v; out(off + 2) = v
        c += 1
      }
      r += 1
    }
    out
  }

  /** Decoded image: top-down per-pixel mean channel value (0–255). */
  case class Img(width: Int, height: Int, gray: Array[Int])

  /** Parse a BMP payload, validating as a real codec does. Failure
    * precedence (mirrored by the x59 oracle):
    *
    *  1. zero bytes → `empty`;
    *  2. < 2 bytes (magic unreadable) → `truncated`;
    *  3. bytes 0–1 ≠ "BM" → `bad_magic`;
    *  4. < 54 bytes (headers unreadable) → `truncated`;
    *  5. DIB ≠ 40 / planes ≠ 1 / bpp ≠ 24 / compression ≠ 0 /
    *     width < 1 / height < 0 → `unsupported`;
    *  6. declared pixel array runs past the buffer → `truncated`.
    */
  def parse(payload: Array[Byte]): Img = {
    def fail(kind: String, msg: String) =
      throw new Multimodal.MediaFormatException(kind, msg)
    if (payload.length == 0) fail("empty", "empty payload")
    if (payload.length < 2) fail("truncated", s"${payload.length} bytes: no magic")
    if (payload(0) != 'B' || payload(1) != 'M') fail("bad_magic", "not a BM file")
    if (payload.length < 54) fail("truncated", s"${payload.length} bytes: no headers")
    val dataOff = u32(payload, 10)
    val dib = u32(payload, 14)
    val w = i32(payload, 18)
    val h = i32(payload, 22)
    val planes = u16(payload, 26)
    val bpp = u16(payload, 28)
    val comp = u32(payload, 30)
    if (dib != 40L || planes != 1 || bpp != 24 || comp != 0L || w < 1 || h < 0)
      fail("unsupported",
        s"dib=$dib planes=$planes bpp=$bpp comp=$comp w=$w h=$h " +
          "(need BITMAPINFOHEADER, 1 plane, 24bpp, BI_RGB, w>=1, h>=0)")
    // Long arithmetic throughout: Int stride()/w*h would overflow for
    // absurd declared widths (e.g. 0x55555556 -> stride 4) and let a
    // header bomb slip past this check into a giant or negative-sized
    // allocation — the guard must run on the EXACT geometry in Long.
    val st = ((w.toLong * 3 + 3) / 4) * 4
    val need = dataOff + st * h
    if (need > payload.length)
      fail("truncated", s"pixel array needs $need bytes, have ${payload.length}")
    val gray = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val off = (dataOff + (h - 1 - r).toLong * st + c * 3).toInt // fits: need <= length
        gray(r * w + c) = ((payload(off) & 0xff) + (payload(off + 1) & 0xff) +
          (payload(off + 2) & 0xff)) / 3
        c += 1
      }
      r += 1
    }
    Img(w, h, gray)
  }
}

object BmpOps {

  /** REAL nearest-neighbor resize kernel over a decoded [[Bmp.Img]]
    * (the multimodal resize stage with actual pixel semantics, vs the
    * byte-stride stand-in `Multimodal.resizePayload`): output pixel
    * (r, c) samples input pixel (r·sy, c·sx) with integer scale
    * factors — deterministic, allocation-bounded by the OUTPUT size,
    * and exactly replayable from the source pixels in any engine.
    */
  def resizeNearest(img: Bmp.Img, outW: Int, outH: Int,
                    sx: Int, sy: Int): Bmp.Img = {
    require(outW >= 0 && outH >= 0 && sx >= 1 && sy >= 1,
      s"resizeNearest: bad geometry outW=$outW outH=$outH sx=$sx sy=$sy")
    val gray = new Array[Int](outW * outH)
    var r = 0
    while (r < outH) {
      var c = 0
      while (c < outW) {
        val srcR = math.min(r * sy, math.max(img.height - 1, 0))
        val srcC = math.min(c * sx, math.max(img.width - 1, 0))
        gray(r * outW + c) = img.gray(srcR * img.width + srcC)
        c += 1
      }
      r += 1
    }
    Bmp.Img(outW, outH, gray)
  }
}

/** [[Multimodal.MediaDecoder]] over real BMP bytes: frames are bands of
  * `every` pixel rows (top-down); `nBytes` is the band's stored size
  * (rows × stride) and the feature its mean gray level in [0, 1] — a
  * genuine, deterministic image statistic (black → 0, white → 1).
  */
class BmpDecoder extends Multimodal.MediaDecoder {
  override def frames(docId: Long, payload: Array[Byte],
                      every: Int): Iterator[Multimodal.Frame] = {
    val img = Bmp.parse(payload)
    val st = Bmp.stride(img.width)
    (0 until img.height).grouped(every).zipWithIndex.map { case (rows, i) =>
      val px = rows.flatMap(r => (0 until img.width).map(c => img.gray(r * img.width + c)))
      // sum in Long: an Int sum wraps negative past ~8.4M high-gray
      // pixels per band, which real 100 MB-class images can reach
      Multimodal.Frame(docId, i, rows.length.toLong * st,
        px.foldLeft(0L)(_ + _).toDouble / (255.0 * px.length))
    }
  }
}
