package graft.resolve

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.model.VideoInfo
import graft.sources.Sources

/** C1/C2/C3 control-flow semantics (`SURVEY.md §2.6`) + the S2
  * pre-flight guard.
  */
class ResolverSpec extends SparkSpec {

  private def info(url: String) =
    VideoInfo(url, "t", "d", "th", s"$url/stream.m4a", 1L, "u", 1L)

  test("C1: retry succeeds after transient failures, gives up after attempts") {
    val calls = new AtomicInteger(0)
    val flaky = new Resolver {
      override def resolve(url: String): Option[VideoInfo] = {
        if (calls.incrementAndGet() < 2) throw new RuntimeException("transient")
        Some(info(url))
      }
    }
    assert(new RetryingResolver(flaky, attempts = 2).resolve("u").isDefined)

    val alwaysFails = new Resolver {
      override def resolve(url: String): Option[VideoInfo] =
        throw new RuntimeException("down")
    }
    assert(new RetryingResolver(alwaysFails, attempts = 2).resolve("u").isEmpty)
  }

  test("C1: definitive None is not retried (error-class fast exit, D5)") {
    val calls = new AtomicInteger(0)
    val definitive = new Resolver {
      override def resolve(url: String): Option[VideoInfo] = {
        calls.incrementAndGet(); None
      }
    }
    assert(new RetryingResolver(definitive, attempts = 3).resolve("u").isEmpty)
    assert(calls.get() == 1)
  }

  test("C2: fallback chain consults secondary only when primary is empty") {
    val primaryHit = new Resolver {
      override def resolve(url: String): Option[VideoInfo] = Some(info("primary"))
    }
    val secondary = new Resolver {
      override def resolve(url: String): Option[VideoInfo] = Some(info("secondary"))
    }
    val none = new Resolver {
      override def resolve(url: String): Option[VideoInfo] = None
    }
    assert(new FallbackResolver(primaryHit, secondary).resolve("u").get.url == "primary")
    assert(new FallbackResolver(none, secondary).resolve("u").get.url == "secondary")
  }

  test("C3: rate limiter enforces a minimum inter-call interval") {
    val fast = new Resolver {
      override def resolve(url: String): Option[VideoInfo] = Some(info(url))
    }
    val limited = new RateLimitedResolver(fast, minIntervalMs = 30)
    val t0 = System.nanoTime()
    (1 to 4).foreach(i => limited.resolve(s"u$i"))
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    // 3 waits x 30ms = 90ms nominal, but Thread.sleep may return up to
    // ~a ms early per wait (ms truncation + timer granularity) — assert
    // with that slack so the bound can't flake at the exact boundary
    // (observed once under full-suite load)
    assert(elapsedMs >= 85, s"4 calls at 30ms spacing took ${elapsedMs}ms")
  }

  test("S2: missing input file fails fast") {
    intercept[IllegalArgumentException] {
      Sources.linkFile(spark, "/nonexistent/links.txt")
    }
  }

  test("S6: in-flight observe metrics count rows/resolved/failed without a second scan") {
    import spark.implicits._
    val df = Seq(("a", Some("s1")), ("b", None), ("c", Some("s3")))
      .toDF("url", "stream_url")
    val (instrumented, obs) = Sources.withSinkMetrics(df, "stream_url")
    assert(instrumented.count() == 3)
    val m = obs.get
    assert(m("rows") == 3L)
    assert(m("resolved") == 2L)
    assert(m("failed") == 1L)
  }

  test("resolver stage maps partitions without collecting (distributed shape)") {
    import spark.implicits._
    val links = (0 until 100).map(i => s"https://www.youtube.com/watch?v=$i").toDF("url")
    val resolved = new MockResolver().stage(spark)(links)
    assert(resolved.columns.contains("stream_url"))
    assert(resolved.count() == 100)
    assert(resolved.rdd.getNumPartitions >= 1)
  }
}
