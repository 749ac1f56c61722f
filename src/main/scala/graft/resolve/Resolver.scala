package graft.resolve

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.VideoInfo

/** S3 — the external enrichment source (`video_processor.py:39-136`).
  *
  * The reference calls yt-dlp per URL, sequentially, with retries and
  * rate limiting. On Spark the same stage is a `mapPartitions` over the
  * deduped link set: one client per partition, per-partition rate
  * limiting (C3), retry-with-backoff inside the partition function (C1),
  * and Spark task retries for infra failures. Network extraction itself
  * is out of scope (zero-egress environment; SURVEY.md §7.4 risk 6) — the
  * trait isolates it, and the deterministic mock is the shipped impl.
  */
trait Resolver extends Serializable {

  /** Resolve one URL to its VideoInfo, or None on failure
    * (`video_processor.py:261-264` null path).
    */
  def resolve(url: String): Option[VideoInfo]

  /** Distributed resolution stage. Partition-level iteration keeps
    * per-client setup cost amortized, the way a real HTTP/yt-dlp client
    * would be reused across a partition.
    */
  def stage(spark: SparkSession)(links: DataFrame): DataFrame = {
    import spark.implicits._
    val urls: Dataset[String] = links.select(col("url")).as[String]
    urls.mapPartitions { it =>
      it.map { url =>
        resolve(url).getOrElse(
          VideoInfo(url, null, null, null, null, 0L, null, 0L))
      }
    }.toDF()
  }
}

/** C1 — retry with linear backoff around another resolver
  * (`video_processor.py:41-42,130-136`): `attempts` tries, sleeping
  * `baseDelayMs·(attempt+1)` between failures. Infra-level failures are
  * additionally covered by Spark task retries (`spark.task.maxFailures`);
  * this wrapper is for per-record, retryable resolution errors.
  *
  * A resolver signals "retryable failure" by throwing; `None` means a
  * definitive no-result (the reference's error-classified fast-exit,
  * D5/`video_processor.py:115-128`, which is deliberately NOT retried).
  */
class RetryingResolver(inner: Resolver, attempts: Int = 2,
                       baseDelayMs: Long = 0L) extends Resolver {
  override def resolve(url: String): Option[VideoInfo] = {
    var attempt = 0
    while (true) {
      try return inner.resolve(url)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= attempts) return None
          if (baseDelayMs > 0) Thread.sleep(baseDelayMs * attempt)
      }
    }
    None
  }
}

/** C2 — fallback extraction chain (`video_processor.py:138-180`): try the
  * primary strategy, fall back to the secondary when it yields nothing —
  * the flat-extraction → ios-client chain of the reference.
  */
class FallbackResolver(primary: Resolver, secondary: Resolver) extends Resolver {
  override def resolve(url: String): Option[VideoInfo] =
    primary.resolve(url).orElse(secondary.resolve(url))
}

/** C3 — per-partition rate limiter (`video_processor.py:377-381,51,58-59`).
  * The reference sleeps uniform(3,8)s between records on one thread; the
  * Spark analog is a minimum inter-call interval per partition (each
  * partition owns one "client"), NOT row-level sleeps on the driver.
  * Token-bucket-of-one: enough to bound the aggregate request rate at
  * `partitions / minIntervalMs` without coordinating executors.
  */
class RateLimitedResolver(inner: Resolver, minIntervalMs: Long) extends Resolver {
  @transient private var lastCall = 0L
  override def resolve(url: String): Option[VideoInfo] = {
    val now = System.nanoTime() / 1000000L
    val wait = lastCall + minIntervalMs - now
    if (wait > 0) Thread.sleep(wait)
    lastCall = System.nanoTime() / 1000000L
    inner.resolve(url)
  }
}

/** Deterministic mock resolver: derives a stable VideoInfo from the URL
  * alone, covering every downstream branch — HLS and non-HLS extensions,
  * extension-less paths, language indicators, stopword-heavy titles,
  * unresolvable watch pages (D3) and outright failures (D4).
  *
  * The mapping is pure (hash of the URL), so the same input always
  * produces the same stations — this is what makes the golden fixture
  * and oracle comparisons stable.
  */
class MockResolver extends Resolver {
  private val exts = Vector("m4a", "mp3", "webm", "m3u8", "ogg", "aac", "")
  private val titleWords = Vector(
    "tamil melody hits", "hindi dance number", "english classics",
    "telugu folk song", "malayalam hit", "kannada beats",
    "nursery rhymes collection", "the official video song hd")

  private def bucket(url: String, mod: Int): Int = {
    val h = url.hashCode % mod
    if (h < 0) h + mod else h
  }

  override def resolve(url: String): Option[VideoInfo] = {
    val fail = bucket(url, 37)
    if (fail == 0) None // extraction failed (`video_processor.py:261-264`)
    else if (fail == 1)
      // resolved but still a watch page → D3 filter (`video_processor.py:270-273`)
      Some(VideoInfo(url, "stuck video", "", s"$url/thumb.jpg", url, 0L, "mock", 0L))
    else {
      val ext = exts(bucket(url, exts.size))
      val title = titleWords(bucket(url, titleWords.size)) + " #" + bucket(url, 1000)
      val path = "media/" + bucket(url, 100000) + (if (ext.isEmpty) "" else "." + ext)
      Some(VideoInfo(
        url = url,
        title = title,
        description = "mock description",
        thumbnail = s"https://i.example.org/$path/thumb.jpg",
        stream_url = s"https://cdn.example.org/$path?expire=86400",
        duration = bucket(url, 3600).toLong,
        uploader = "mock-channel",
        view_count = bucket(url, 1000000).toLong))
    }
  }
}
