package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.LocalDate

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.sources.v2.ChunkedRestSource

/** Shared in-process loopback gas-quality API fixture:
  * GET /gas?from=YYYY-MM-DD&toExclusive=YYYY-MM-DD. Pops the next
  * scripted status for the chunk (default 200); 200 serves the SAME
  * deterministic rows as the no-url stub, so live-path results are
  * comparable row-for-row against the generator. Used by
  * LoopbackRestSpec (transport/retry semantics) and QueryServerSpec
  * (the serving edge's background ingest composed over the live
  * socket). No egress: binds 127.0.0.1:ephemeral.
  */
final class GasFixtureServer {
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  val script = mutable.Map.empty[String, mutable.Queue[Int]]
  val calls = mutable.Map.empty[String, Int].withDefaultValue(0)

  server.createContext("/gas", new HttpHandler {
    override def handle(x: HttpExchange): Unit = GasFixtureServer.this.synchronized {
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      val key = params("from")
      calls(key) = calls(key) + 1
      val status = script.get(key).filter(_.nonEmpty)
        .map(_.dequeue()).getOrElse(200)
      if (status != 200) {
        x.sendResponseHeaders(status, -1)
        x.close()
      } else {
        val rows = ChunkedRestSource.fetchChunk(
          LocalDate.parse(params("from")),
          LocalDate.parse(params("toExclusive")))
        val items = rows.map { case (us, site, metric, v) =>
          val inst = java.time.Instant.EPOCH.plusNanos(us * 1000L)
          s"""{"applicableAt":"$inst","site":"$site","metric":"$metric","value":$v}"""
        }.mkString(",")
        val body = s"""{"data":[$items]}""".getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.add("Content-Type", "application/json")
        x.sendResponseHeaders(200, body.length.toLong)
        val os = x.getResponseBody
        try os.write(body) finally os.close()
      }
    }
  })
  server.start()
  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}/gas"
  def stop(): Unit = server.stop(0)
}
