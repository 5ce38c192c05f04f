package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpRetry
import graft.sources.HttpRetry.{HttpFailure, Policy}

/** The reference's HTTP resilience schedule, pinned exactly: 5 retries,
  * ×2 exponential backoff on 429/5xx, +15 s on 429, 1.5 s inter-request
  * throttle (`national_gas_client.py:23-34,97-118`). Pure logic — no
  * network, no wall clock: a recording `sleep` observes the schedule.
  */
class HttpRetrySpec extends AnyFunSuite {

  private class Recorder {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    def sleep(ms: Long): Unit = sleeps += ms
  }

  test("two 503s then success: backoff doubles per retry") {
    val rec = new Recorder
    val got = HttpRetry.withRetries(Policy(), rec.sleep) { n =>
      if (n < 2) Left(503) else Right(s"ok-$n")
    }
    assert(got === "ok-2")
    assert(rec.sleeps.toSeq === Seq(1000L, 2000L))
  }

  test("429 adds the 15 s rate-limit penalty on top of backoff") {
    val rec = new Recorder
    val got = HttpRetry.withRetries(Policy(), rec.sleep) { n =>
      if (n == 0) Left(429) else Right("ok")
    }
    assert(got === "ok")
    assert(rec.sleeps.toSeq === Seq(1000L + 15000L))
  }

  test("a non-retryable status fails immediately with no sleep") {
    val rec = new Recorder
    val e = intercept[HttpFailure] {
      HttpRetry.withRetries(Policy(), rec.sleep)(_ => Left(404): Either[Int, String])
    }
    assert(e.code === 404 && e.attempts === 1)
    assert(rec.sleeps.isEmpty)
  }

  test("retries exhaust after 5 attempts with the full doubling schedule") {
    val rec = new Recorder
    val e = intercept[HttpFailure] {
      HttpRetry.withRetries(Policy(), rec.sleep)(_ => Left(502): Either[Int, String])
    }
    assert(e.code === 502 && e.attempts === 6) // 1 initial + 5 retries
    assert(rec.sleeps.toSeq === Seq(1000L, 2000L, 4000L, 8000L, 16000L))
  }

  test("throttle sleeps between consecutive requests, not before the first") {
    val rec = new Recorder
    val out = HttpRetry.throttled(Policy(), rec.sleep)(
      Iterator(() => "a", () => "b", () => "c")).toSeq
    assert(out === Seq("a", "b", "c"))
    assert(rec.sleeps.toSeq === Seq(1500L, 1500L))
  }

  test("the DSv2 reader path goes through the retry wrapper unchanged") {
    import java.time.LocalDate
    val s = LocalDate.parse("2024-01-01"); val e = LocalDate.parse("2024-01-03")
    val direct = graft.sources.v2.ChunkedRestSource.fetchChunk(s, e).toSeq
    val retried = graft.sources.v2.ChunkedRestSource.fetchChunkWithRetry(s, e).toSeq
    assert(retried === direct && direct.nonEmpty)
  }
}
