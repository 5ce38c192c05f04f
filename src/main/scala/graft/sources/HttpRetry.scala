package graft.sources

import scala.annotation.tailrec

/** The reference's HTTP resilience policy as pure, transport-agnostic
  * logic — the part of "live ingestion" that is NOT environment-blocked
  * and therefore fully implementable and testable here:
  *
  *  - 5 retries with ×2 exponential backoff on 429/500/502/503/504
  *    (`national_gas_client.py:23-34`, mirrored in `gie/client.py:16-21`)
  *  - an extra 15 s penalty sleep when the status was 429
  *    (`national_gas_client.py:97-101`)
  *  - a 1.5 s throttle between consecutive chunk requests
  *    (`national_gas_client.py:118`)
  *
  * The transport is a function returning `Either[status, A]` and the
  * clock is an injectable `sleep`, so specs drive failing transports
  * through the exact backoff schedule without wall-clock time. On a
  * cluster this runs INSIDE each `InputPartition`'s reader — per-chunk
  * retry is executor-local (like the reference's per-request retry),
  * while whole-task retry remains Spark's own layer above it.
  */
object HttpRetry {

  final case class Policy(
      maxRetries: Int = 5,
      baseDelayMs: Long = 1000L,
      backoffFactor: Long = 2L,
      retryOn: Set[Int] = Set(429, 500, 502, 503, 504),
      rateLimitExtraMs: Long = 15000L,
      throttleMs: Long = 1500L)

  /** Terminal failure: a non-retryable status, or retries exhausted. */
  final case class HttpFailure(code: Int, attempts: Int)
    extends RuntimeException(s"HTTP $code after $attempts attempt(s)")

  /** Run `attempt` (0-based attempt index in) under `policy`. Delay
    * before retry n+1 is baseDelayMs * factor^n, plus the 429 penalty
    * when rate-limited — the reference's schedule exactly. */
  def withRetries[A](policy: Policy = Policy(), sleep: Long => Unit = Thread.sleep)
                    (attempt: Int => Either[Int, A]): A = {
    @tailrec def loop(n: Int): A =
      attempt(n) match {
        case Right(a) => a
        case Left(code) if policy.retryOn(code) && n < policy.maxRetries =>
          val backoff = policy.baseDelayMs *
            Iterator.iterate(1L)(_ * policy.backoffFactor).drop(n).next()
          sleep(backoff + (if (code == 429) policy.rateLimitExtraMs else 0L))
          loop(n + 1)
        case Left(code) => throw HttpFailure(code, n + 1)
      }
    loop(0)
  }

  /** The reference's inter-request throttle: evaluate `fetches` lazily
    * with `policy.throttleMs` of sleep BETWEEN consecutive requests
    * (none before the first) — for readers whose partition spans
    * multiple chunks, or a driver-side serial backfill. */
  def throttled[A](policy: Policy = Policy(), sleep: Long => Unit = Thread.sleep)
                  (fetches: Iterator[() => A]): Iterator[A] =
    fetches.zipWithIndex.map { case (f, i) =>
      if (i > 0) sleep(policy.throttleMs)
      f()
    }
}
