package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support (north-star extension): media payloads as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partition-parallel batch
  * decode via `mapPartitions`, deterministic output shape — while the
  * actual codec work is stubbed behind [[MediaDecoder]] (no image/audio
  * libraries exist in this container; a production deployment swaps in
  * a JNI/ffmpeg-backed decoder per executor without touching the plan).
  */
object Multimodal {

  /** Typed metadata carried alongside each binary payload. */
  case class MediaMeta(docId: Long, mime: String, nBytes: Long, width: Int, height: Int)

  /** One sampled "frame": (docId, frameIdx, payload slice, feature). */
  case class Frame(docId: Long, frameIdx: Int, nBytes: Long, feature: Double)

  /** Decoder contract: one instance per partition (amortizes native
    * library setup, mirroring how a real ffmpeg/libav handle is reused).
    */
  trait MediaDecoder extends Serializable {
    def frames(docId: Long, payload: Array[Byte], every: Int): Iterator[Frame]
  }

  /** Deterministic fake decoder: "frames" are fixed-size byte windows,
    * the "feature" a normalized byte sum — stands in for
    * decode→resize→embed until a real codec is plugged in.
    */
  class StubDecoder extends MediaDecoder {
    override def frames(docId: Long, payload: Array[Byte], every: Int): Iterator[Frame] =
      payload.grouped(every).zipWithIndex.map { case (win, i) =>
        Frame(docId, i, win.length.toLong, win.map(_ & 0xff).sum.toDouble / (255.0 * win.length))
      }
  }

  /** Stub resize: deterministic stride-downsample of a payload to at
    * most `targetBytes` — the stand-in for an image/video resize kernel
    * (a real deployment swaps the kernel; the Spark-side shape — a
    * narrow per-row binary transform, no shuffle — is what matters).
    */
  def resizePayload(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else {
      val stride = math.ceil(payload.length.toDouble / targetBytes).toInt
      payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray
    }

  /** Resize stage over an asset table: one narrow partition-parallel
    * pass that rewrites `payload` in place and adds the resized byte
    * count — metadata columns ride along, no second scan, no join.
    */
  def resizeAssets(spark: SparkSession, assets: DataFrame, targetBytes: Int): DataFrame = {
    import spark.implicits._
    assets
      .select(col("doc_id"), col("payload"), col("mime"), col("n_bytes"),
        col("width"), col("height"))
      .as[(Long, Array[Byte], String, Long, Int, Int)]
      .mapPartitions(_.map { case (id, p, mime, n, w, h) =>
        val r = resizePayload(p, targetBytes)
        (id, r, mime, n, w, h, r.length.toLong)
      })
      .toDF("doc_id", "payload", "mime", "n_bytes", "width", "height",
        "n_bytes_resized")
  }

  /** Attach a binary payload + metadata columns to a text table —
    * the ingestion shape a real media table would have (payload column
    * stays opaque; metadata is columnar and prunable).
    */
  def asAssets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol).as("doc_id"),
      payload.as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(payload).cast("long").as("n_bytes"),
      (Hashing.h32(col(textCol)) % 1280).cast("int").as("width"),
      (Hashing.h32(col(textCol)) % 720).cast("int").as("height"))
  }

  /** Frame-sampling stage: partition-parallel decode of every asset,
    * one decoder per partition. Output is a flat typed Dataset — the
    * shape a downstream embedding/training stage consumes.
    */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
                   decoder: MediaDecoder = new StubDecoder, every: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) => decoder.frames(id, payload, every) }
      }
  }

  /** A decode attempt: either a frame (`error` null) or one error row
    * per failed asset (`frameIdx` -1, `error` = class keyword).
    */
  case class DecodeResult(docId: Long, frameIdx: Int, nBytes: Long,
                          feature: Double, error: String)

  /** Raised by decoders on malformed payloads; `kind` is the stable
    * error class routed downstream (mirrors the reference's error-class
    * routing, `video_processor.py` D5).
    */
  final class MediaFormatException(val kind: String, msg: String)
    extends RuntimeException(msg)

  /** Wraps a decoder with payload validation: empty payloads are
    * `empty`, payloads shorter than `minBytes` are `truncated`, and a
    * non-zero first byte requirement stands in for a magic-number check
    * (`bad_magic`). A real codec already fails on these — the wrapper
    * gives the STUB the same failure surface so the error path is
    * testable before a real codec exists.
    */
  class ValidatingDecoder(inner: MediaDecoder, minBytes: Int = 4)
    extends MediaDecoder {
    override def frames(docId: Long, payload: Array[Byte], every: Int): Iterator[Frame] = {
      if (payload.length == 0)
        throw new MediaFormatException("empty", s"doc $docId: empty payload")
      if (payload.length < minBytes)
        throw new MediaFormatException("truncated",
          s"doc $docId: ${payload.length} bytes < $minBytes")
      if (payload(0) == 0)
        throw new MediaFormatException("bad_magic", s"doc $docId: zero magic byte")
      inner.frames(docId, payload, every)
    }
  }

  /** Fault-isolated decode: one corrupt asset becomes ONE error row —
    * it cannot kill its partition (and with it thousands of co-located
    * good assets, the failure mode of a naive mapPartitions at 100 TB).
    * Unknown exceptions still propagate: only classified media errors
    * are data, everything else is a bug.
    */
  def sampleFramesWithErrors(spark: SparkSession, assets: DataFrame,
                             decoder: MediaDecoder = new ValidatingDecoder(new StubDecoder),
                             every: Int = 64): Dataset[DecodeResult] = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          try decoder.frames(id, payload, every)
            .map(f => DecodeResult(f.docId, f.frameIdx, f.nBytes, f.feature, null))
          catch {
            case e: MediaFormatException =>
              Iterator.single(DecodeResult(id, -1, payload.length.toLong, 0.0, e.kind))
          }
        }
      }
  }

  /** Declarative (oracle-checkable) metadata/feature projection over the
    * stub decode: byte length, lowercase hex header, frame count at a
    * 64-byte window — a projection over [[asAssets]] so the metadata
    * formulas live in exactly one place.
    */
  def assetSummary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    asAssets(df, idCol, textCol).select(
      col("doc_id").as(idCol),
      col("n_bytes"),
      lower(substring(hex(col("payload")), 1, 16)).as("header_hex"),
      (col("n_bytes") / lit(64)).cast("long").as("n_full_frames"),
      col("width"),
      col("height"))
      .orderBy(idCol)
}
