package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

import graft.warehouse.{Gie, Ingest, NationalGas}

/** The `run_ingestion.py` CLI analog end-to-end: the one-shot backfill
  * must land exactly the [as-of − lookback, as-of] window through the
  * verified five-stage ingest DAG, and mirror run_all.py's loud
  * failure on an unsupported dataset id. */
class IngestCliSpec extends SparkSpec {

  test("one-shot GAS_QUALITY backfill lands exactly the lookback window") {
    val root = Files.createTempDirectory("cli").toString
    val wh = Ingest.Warehouse(s"$root/wh")
    IngestCli.run(Seq(wh.root, "GAS_QUALITY",
      "--lookback-days", "3", "--as-of", "2024-01-10"), spark)
    val obs = spark.read.parquet(wh.observations)
    // [2024-01-07, 2024-01-10] inclusive: 4 days x 3 sites x 3 metrics
    assert(obs.count() === 4L * 9)
    val (lo, hi) = {
      val r = obs.agg(min(to_date(col("observation_time"))).cast("string"),
        max(to_date(col("observation_time"))).cast("string")).head()
      (r.getString(0), r.getString(1))
    }
    assert(lo === "2024-01-07", s"window start $lo")
    assert(hi === "2024-01-10", s"window end $hi")
    // series auto-registered once per (site, metric)
    assert(spark.read.parquet(wh.metaSeries).count() === 9)
    // re-running the same backfill is a no-op (upsert idempotence —
    // the crash-recovery contract a one-shot CLI rerun leans on)
    IngestCli.run(Seq(wh.root, "GAS_QUALITY",
      "--lookback-days", "3", "--as-of", "2024-01-10"), spark)
    assert(spark.read.parquet(wh.observations).count() === 4L * 9)
  }

  test("site filter restricts the backfill like the HTTP edge's site_ids") {
    val root = Files.createTempDirectory("cli").toString
    val wh = Ingest.Warehouse(s"$root/wh")
    IngestCli.run(Seq(wh.root, "GAS_QUALITY", "--lookback-days", "1",
      "--as-of", "2024-02-02", "--site-ids", "BACTON"), spark)
    val series = spark.read.parquet(wh.metaSeries).collect()
    assert(series.length === 3) // one per metric, single site
    assert(series.forall(_.getAs[String]("series_id").contains("BACTON")))
  }

  /** One-shot loopback JSON endpoint: serves `body` for every request
    * (query string ignored — GIE appends dataset/country params) and
    * counts calls, so a spec can pin that a CLI arm went over the REAL
    * socket exactly once. */
  private def serveJson(body: String): (String, HttpServer, () => Int) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        calls.incrementAndGet()
        val b = body.getBytes("UTF-8")
        x.getResponseHeaders.add("Content-Type", "application/json")
        x.sendResponseHeaders(200, b.length.toLong)
        val os = x.getResponseBody
        try os.write(b) finally os.close()
      }
    })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}/api", server, () => calls.get())
  }

  test("ENTSOG arm lands the re-applied window and registers the key series") {
    val root = Files.createTempDirectory("cli").toString
    val wh = Ingest.Warehouse(s"$root/wh")
    IngestCli.run(Seq(wh.root, "ENTSOG", "--lookback-days", "2",
      "--as-of", "2024-03-05", "--indicators", "Physical Flow"), spark)
    // series key is (indicator, pointKey, directionKey) — operators
    // collapse into it: 1 indicator x 2 points x 2 directions
    val series = spark.read.parquet(wh.metaSeries).collect()
    assert(series.length === 4)
    assert(series.forall(_.getAs[String]("dataset_id") === "ENTSOG"))
    val obs = spark.read.parquet(wh.observations)
    // 4 series x 3 days minus the 2 unparseable "n/a" keys the stub
    // plants on day index 1 for point ITP-00091 (both operators serve
    // "n/a", so the key never lands) = 10
    assert(obs.count() === 10)
    val (lo, hi) = {
      val r = obs.agg(min(to_date(col("observation_time"))).cast("string"),
        max(to_date(col("observation_time"))).cast("string")).head()
      (r.getString(0), r.getString(1))
    }
    assert(lo === "2024-03-03", s"window start $lo")
    assert(hi === "2024-03-05", s"window end $hi")
  }

  test("ENTSOG arm over the loopback socket equals the stub ingest") {
    val root = Files.createTempDirectory("cli").toString
    // single operator so every (series, time) key has ONE candidate:
    // with two operators the within-batch LWW tie-break hashes content
    // INCLUDING ingestion_time, so the winner is stable within a run
    // (the retry/idempotence contract) but legitimately differs across
    // runs — row-for-row equality is only a valid assertion key-unique
    val payload = NationalGas.fetchEntsog("2024-03-03", "2024-03-05",
      operatorKeys = Seq("UK-TSO-0001"), indicators = Seq("Physical Flow"))
    val (url, server, calls) = serveJson(payload)
    try {
      val whLive = Ingest.Warehouse(s"$root/live")
      IngestCli.run(Seq(whLive.root, "ENTSOG", "--lookback-days", "2",
        "--as-of", "2024-03-05", "--indicators", "Physical Flow",
        "--url", url), spark)
      val whStub = Ingest.Warehouse(s"$root/stub")
      IngestCli.run(Seq(whStub.root, "ENTSOG", "--lookback-days", "2",
        "--as-of", "2024-03-05", "--operator-keys", "UK-TSO-0001",
        "--indicators", "Physical Flow"), spark)
      assert(calls() === 1, "one fetch over the socket")
      def landed(wh: Ingest.Warehouse) =
        spark.read.parquet(wh.observations).drop("ingestion_time")
      assert(landed(whLive).count() > 0)
      assert(landed(whLive).exceptAll(landed(whStub)).isEmpty &&
        landed(whStub).exceptAll(landed(whLive)).isEmpty,
        "live-socket landing must equal the stub landing row-for-row")
    } finally server.stop(0)
  }

  test("GIE AGSI arm over the loopback socket: window, series, delete-reload") {
    val root = Files.createTempDirectory("cli").toString
    val (url, server, calls) = serveJson(Gie.stubPayload(Gie.DatasetAgsi, None))
    try {
      val wh = Ingest.Warehouse(s"$root/wh")
      IngestCli.run(Seq(wh.root, "AGSI", "--url", url), spark)
      assert(calls() === 1, "one fetch over the socket")
      val daily = spark.read.parquet(Gie.dailyPath(wh))
      val (lo, hi) = {
        val r = daily.agg(min(col("value_date")).cast("string"),
          max(col("value_date")).cast("string")).head()
        (r.getString(0), r.getString(1))
      }
      assert(lo === "2024-02-01", s"window start $lo")
      assert(hi === "2024-02-03", s"window end $hi")
      val series = spark.read.parquet(Gie.seriesPath(wh))
      assert(series.count() > 0)
      assert(series.collect().forall(_.getAs[String]("source") === Gie.SourceAgsi))
      // the live landing equals a stub-mode CLI run bit-for-bit
      val nDaily = daily.count()
      val whStub = Ingest.Warehouse(s"$root/stub")
      IngestCli.run(Seq(whStub.root, "AGSI"), spark)
      val stubDaily = spark.read.parquet(Gie.dailyPath(whStub))
      assert(daily.exceptAll(stubDaily).isEmpty &&
        stubDaily.exceptAll(daily).isEmpty)
      // re-run is the reference's delete-then-reload: same rows, not 2x
      // (re-read after the swap — the pre-rerun frame's files are gone)
      IngestCli.run(Seq(wh.root, "AGSI", "--url", url), spark)
      assert(spark.read.parquet(Gie.dailyPath(wh)).count() === nDaily)
    } finally server.stop(0)
  }

  test("GAS_PUBLICATIONS arm: window, per-publication series, blank skip") {
    val root = Files.createTempDirectory("cli").toString
    val wh = Ingest.Warehouse(s"$root/wh")
    IngestCli.run(Seq(wh.root, "GAS_PUBLICATIONS", "--lookback-days", "2",
      "--as-of", "2024-05-03", "--publication-ids", "PUBOB37,PUBOB40"), spark)
    val series = spark.read.parquet(wh.metaSeries).collect()
    assert(series.length === 2) // one per publication id
    assert(series.forall(_.getAs[String]("dataset_id") === "GAS_PUBLICATIONS"))
    val obs = spark.read.parquet(wh.observations)
    // 2 pubs x 3 days minus the blank-like value the stub plants on the
    // first pub's first day (transformer blank -> skip)
    assert(obs.count() === 5)
    val (lo, hi) = {
      val r = obs.agg(min(to_date(col("observation_time"))).cast("string"),
        max(to_date(col("observation_time"))).cast("string")).head()
      (r.getString(0), r.getString(1))
    }
    assert(lo === "2024-05-01" && hi === "2024-05-03", s"window [$lo, $hi]")
    // missing publication_ids fails loudly like run_all's client contract
    val e = intercept[IllegalArgumentException] {
      IngestCli.run(Seq(s"$root/wh2", "GAS_PUBLICATIONS"), spark)
    }
    assert(e.getMessage.contains("publication_ids is required"))
  }

  test("INSTANTANEOUS_FLOW arm: per-site FLOWRATE series, null flow kept") {
    val root = Files.createTempDirectory("cli").toString
    val wh = Ingest.Warehouse(s"$root/wh")
    IngestCli.run(Seq(wh.root, "INSTANTANEOUS_FLOW"), spark)
    val series = spark.read.parquet(wh.metaSeries).collect()
    assert(series.length === 3) // one FLOWRATE series per site
    assert(series.forall(_.getAs[String]("series_id").endsWith("_FLOWRATE")))
    val obs = spark.read.parquet(wh.observations)
    // 3 sites x 2 times = 6 keys; the stub's one null flowRate row
    // (block 1, Easington, 05:00) is dropped by the normalize value
    // filter but the KEY survives via block 0's valid reading, and the
    // two stub blocks collapse by LWW on (series, time)
    assert(obs.count() === 6)
  }

  test("unsupported dataset id and bad flags fail loudly, run_all.py-style") {
    val root = Files.createTempDirectory("cli").toString
    val e1 = intercept[IllegalArgumentException] {
      IngestCli.run(Seq(s"$root/wh", "NOT_A_DATASET"), spark)
    }
    assert(e1.getMessage.contains("Unsupported dataset_id"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IngestCli.run(Seq(s"$root/wh", "ENTSOG",
        "--as-of", "2024-01-10"), spark)
    }
    assert(e2.getMessage.contains("pointKey + directionKey"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      IngestCli.run(Seq(s"$root/wh", "GAS_QUALITY", "--bogus", "1"), spark)
    }
    assert(e3.getMessage.contains("unrecognized arguments"), e3.getMessage)
    // an omitted value must fail loudly, never bind the next flag as a
    // value (--site-ids would otherwise filter on the literal "--url"
    // and silently land 0 rows)
    val e4 = intercept[IllegalArgumentException] {
      IngestCli.run(Seq(s"$root/wh", "GAS_QUALITY",
        "--site-ids", "--url", "http://127.0.0.1:1/x"), spark)
    }
    assert(e4.getMessage.contains("unrecognized arguments"), e4.getMessage)
  }
}
