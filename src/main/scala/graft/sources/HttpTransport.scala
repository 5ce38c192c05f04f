package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Minimal JDK-only HTTP GET used by the chunked REST reader when a
  * live endpoint is configured (`national_gas_client.py:97-118` issues
  * the request per chunk; this is that call, transport-agnostic of the
  * retry policy that wraps it). Returns Right(body) on 200, Left(status)
  * on any HTTP error status, and Left([[IoFailureStatus]]) when the
  * connection itself fails (refused / reset / timeout) — connection
  * failures are retryable exactly like a 5xx, which is how the
  * reference's requests stack treats them, but they keep a synthetic
  * code so a terminal failure still says what happened.
  */
object HttpTransport {

  /** Synthetic status for transport-level failures (no HTTP response at
    * all). Callers that want the reference's behavior add this to the
    * retry policy's `retryOn` set. */
  val IoFailureStatus = 599

  def get(url: String,
          connectTimeoutMs: Int = 5000,
          readTimeoutMs: Int = 15000): Either[Int, String] =
    try {
      val conn = new URI(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("GET")
      try {
        val code = conn.getResponseCode
        if (code == 200) {
          val in = conn.getInputStream
          try Right(new String(in.readAllBytes(), StandardCharsets.UTF_8))
          finally in.close()
        } else {
          // drain the error stream so keep-alive connections recycle
          Option(conn.getErrorStream).foreach { es =>
            try es.readAllBytes() finally es.close()
          }
          Left(code)
        }
      } finally conn.disconnect()
    } catch {
      case _: IOException => Left(IoFailureStatus)
    }
}
