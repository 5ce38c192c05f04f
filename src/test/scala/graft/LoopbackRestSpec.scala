package graft

import java.time.LocalDate

import scala.collection.mutable

import graft.sources.{HttpRetry, HttpTransport}
import graft.sources.v2.ChunkedRestSource

/** The DSv2 REST source over a REAL socket: an in-process loopback HTTP
  * server serves the gas-quality JSON fixture with scripted 429/503
  * sequences, so connect / read / parse / retry / throttle execute over
  * an actual connection (the reference behavior that was previously
  * exercised only through an injected transport function). No egress:
  * the server binds 127.0.0.1:ephemeral.
  */
class LoopbackRestSpec extends SparkSpec {

  // fixture server shared with QueryServerSpec — see GasFixture.scala
  private def withServer[A](body: GasFixtureServer => A): A = {
    val fx = new GasFixtureServer
    try body(fx) finally fx.stop()
  }

  private def liveRead(fx: GasFixtureServer, from: String, to: String) =
    spark.read.format("graft.sources.v2.ChunkedRestSource")
      .option("from", from).option("to", to).option("chunkDays", "3")
      .option("url", fx.url)
      .option("retryBaseMs", "1").option("retryRateLimitExtraMs", "2")
      .load()

  // collect unsorted and sort driver-side: a global orderBy plans a
  // range partitioner whose SAMPLING pass reads every partition a
  // second time — two HTTP requests per chunk — which would break the
  // one-request-per-chunk accounting below (and is itself a real
  // lesson for a paid-API deployment: sort after landing, not on the
  // live scan)
  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq
      .map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getString(2), r.getDouble(3)))
      .sorted

  test("live loopback read equals the deterministic generator, one request per chunk") {
    withServer { fx =>
      val live = sortedRows(liveRead(fx, "2024-01-01", "2024-01-10"))
      val stub = sortedRows(spark.read
        .format("graft.sources.v2.ChunkedRestSource")
        .option("from", "2024-01-01").option("to", "2024-01-10")
        .option("chunkDays", "3")
        .load())
      assert(live === stub)
      assert(live.size === 10 * 3 * 3)
      // 10 days at chunkDays=3 → 4 planned partitions → 4 requests
      assert(fx.calls.values.sum === 4, s"calls=${fx.calls}")
      assert(fx.calls.keySet ===
        Set("2024-01-01", "2024-01-04", "2024-01-07", "2024-01-10"))
    }
  }

  test("scripted 429/503 storm: reader retries over the socket and recovers") {
    withServer { fx =>
      fx.synchronized {
        fx.script("2024-01-01") = mutable.Queue(429, 503)
        fx.script("2024-01-04") = mutable.Queue(500)
      }
      val live = sortedRows(liveRead(fx, "2024-01-01", "2024-01-06"))
      assert(live.size === 6 * 3 * 3)
      // chunk 1 failed twice then succeeded; chunk 2 failed once
      assert(fx.calls("2024-01-01") === 3)
      assert(fx.calls("2024-01-04") === 2)
    }
  }

  test("429 over the socket takes the rate-limit penalty path with an injected clock") {
    withServer { fx =>
      fx.synchronized { fx.script("2024-02-01") = mutable.Queue(429, 503) }
      val sleeps = mutable.Buffer.empty[Long]
      val rows = ChunkedRestSource.fetchChunkWithRetry(
        LocalDate.parse("2024-02-01"), LocalDate.parse("2024-02-03"),
        url = Some(fx.url),
        policy = ChunkedRestSource.policyFromOptions(Map.empty),
        sleep = sleeps += _).toSeq
      assert(rows.size === 2 * 3 * 3)
      // reference schedule, real socket: 1000*2^0 + 15000 penalty for
      // the 429, then plain 1000*2^1 for the 503 — recorded, not slept
      assert(sleeps.toSeq === Seq(1000L + 15000L, 2000L))
      assert(fx.calls("2024-02-01") === 3)
    }
  }

  test("retry exhaustion surfaces the terminal status from the socket") {
    withServer { fx =>
      fx.synchronized {
        fx.script("2024-03-01") = mutable.Queue(503, 503, 503, 503, 503, 503)
      }
      val e = intercept[Exception] {
        liveRead(fx, "2024-03-01", "2024-03-02").collect()
      }
      val failure = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).take(10)
        .collectFirst { case f: HttpRetry.HttpFailure => f }
      assert(failure.nonEmpty, s"no HttpFailure in cause chain of $e")
      assert(failure.get.code === 503 && failure.get.attempts === 6)
    }
  }

  test("connection refused is retried like a 5xx, then surfaces the synthetic status") {
    // a closed server: every attempt is a transport-level failure
    val fx = new GasFixtureServer
    val deadUrl = fx.url
    fx.stop()
    val sleeps = mutable.Buffer.empty[Long]
    val e = intercept[HttpRetry.HttpFailure] {
      ChunkedRestSource.fetchChunkWithRetry(
        LocalDate.parse("2024-01-01"), LocalDate.parse("2024-01-02"),
        url = Some(deadUrl),
        policy = ChunkedRestSource.policyFromOptions(Map.empty),
        sleep = sleeps += _).toSeq
    }
    assert(e.code === HttpTransport.IoFailureStatus && e.attempts === 6)
    assert(sleeps.size === 5, "all five backoffs taken before giving up")
  }

  test("column pruning reaches the live reader: site-only scan over the socket") {
    withServer { fx =>
      val sites = liveRead(fx, "2024-01-01", "2024-01-03")
        .select("site").distinct().collect().map(_.getString(0)).sorted
      assert(sites.toSeq === ChunkedRestSource.Sites.sorted)
      val scan = liveRead(fx, "2024-01-01", "2024-01-03").select("site")
        .queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("site") && !scan.contains("obs_time"),
        s"scan should read only `site`: $scan")
    }
  }
}
