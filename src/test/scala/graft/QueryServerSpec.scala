package graft

import java.io.ByteArrayOutputStream
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.serving.QueryServer
import graft.warehouse.Ingest.Warehouse

/** End-to-end drive of the serving edge over a real loopback socket:
  * POST /v2/ingest/gas → 202 → background REST fetch through the DSv2
  * chunked source → five-stage warehouse ingest → GET /v2/data pages the
  * result, discovery endpoints read the catalogs, validation 400s fire,
  * and the CSV export round-trips. The REST hop uses the stub generator
  * (no url) — LoopbackRestSpec already proves the live-socket transport;
  * this spec proves the API process wiring around it.
  */
class QueryServerSpec extends SparkSpec {

  private def http(method: String, url: String): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000)
    val status = conn.getResponseCode
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val out = new ByteArrayOutputStream()
    if (is != null) {
      val buf = new Array[Byte](8192)
      var n = is.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
      is.close()
    }
    (status, new String(out.toByteArray, StandardCharsets.UTF_8))
  }

  /** Like [[http]] but also returns the response headers (for the
    * chunked-transfer and attachment-disposition assertions). */
  private def httpFull(method: String, url: String): (Int, String, Map[String, String]) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000)
    val status = conn.getResponseCode
    import scala.jdk.CollectionConverters._
    // header-name case varies by JDK response path: normalize to lower
    val headers = conn.getHeaderFields.asScala.collect {
      case (k, vs) if k != null => k.toLowerCase -> vs.asScala.mkString(",")
    }.toMap
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val out = new ByteArrayOutputStream()
    if (is != null) {
      val buf = new Array[Byte](8192)
      var n = is.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
      is.close()
    }
    (status, new String(out.toByteArray, StandardCharsets.UTF_8), headers)
  }

  private def await(cond: => Boolean, ms: Long = 120000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    cond
  }

  private def withServer[A](body: (QueryServer, Warehouse) => A): A = {
    val root = Files.createTempDirectory("graft-serve").toString
    val wh = Warehouse(root)
    val srv = new QueryServer(spark, wh).start()
    try body(srv, wh) finally srv.stop()
  }

  test("serving edge: 202 ingest → background drain → data/discovery/export round-trip") {
    withServer { (srv, wh) =>
      // -- health (health.py)
      val (hs, hb) = http("GET", s"${srv.url}/health")
      assert(hs === 200 && hb.contains("ok"))

      // -- validation 400s BEFORE any ingest (ingestion.py:23-31)
      val (bad1, body1) = http("POST",
        s"${srv.url}/v2/ingest/gas?from_date=2024-13-77&to_date=2024-01-02")
      assert(bad1 === 400 && body1.contains("Invalid date format"))
      val (bad2, body2) = http("POST",
        s"${srv.url}/v2/ingest/gas?from_date=2024-01-05&to_date=2024-01-02")
      assert(bad2 === 400 && body2.contains("to_date must be >= from_date"))
      // GET on the ingest route is not an accepted verb
      val (badVerb, _) = http("GET",
        s"${srv.url}/v2/ingest/gas?from_date=2024-01-01&to_date=2024-01-02")
      assert(badVerb === 405)

      // -- 202 accepted, then poll the job to its terminal state
      val (st, body) = http("POST",
        s"${srv.url}/v2/ingest/gas?from_date=2024-01-01&to_date=2024-01-04")
      assert(st === 202, body)
      assert(body.contains("\"status\":\"accepted\"") && body.contains("GAS_QUALITY"))
      val jobId = "\"job_id\":(\\d+)".r.findFirstMatchIn(body).get.group(1)
      assert(await {
        http("GET", s"${srv.url}/v2/ingest/jobs/$jobId")._2.contains("done")
      }, "ingest job did not finish")

      // -- the warehouse now serves: 4 days × 3 sites × 3 metrics
      val obs = spark.read.parquet(wh.observations)
      assert(obs.count() === 4L * 3 * 3)

      // -- /v2/data full page, grouped per series
      val (ds0, all) = http("GET", s"${srv.url}/v2/data?limit=1000")
      assert(ds0 === 200)
      // 9 series (3 sites × 3 metrics), each with 4 points
      assert("\"series_id\"".r.findAllIn(all).length === 9)
      assert("\"timestamp\"".r.findAllIn(all).length === 36)

      // -- single-series filter + value band + paging
      val sid = "\"series_id\":\"([^\"]+)\"".r.findFirstMatchIn(all).get.group(1)
      val (_, one) = http("GET", s"${srv.url}/v2/data?series_id=$sid")
      assert("\"series_id\"".r.findAllIn(one).length === 1)
      assert("\"timestamp\"".r.findAllIn(one).length === 4)
      val (_, paged) = http("GET", s"${srv.url}/v2/data?series_id=$sid&limit=2&offset=2")
      assert("\"timestamp\"".r.findAllIn(paged).length === 2)
      // paged points are the LAST two of the ordered four — disjoint page
      val tsOf = (s: String) => "\"timestamp\":\"([^\"]+)\"".r
        .findAllMatchIn(s).map(_.group(1)).toSeq
      assert(tsOf(paged) === tsOf(one).drop(2))
      // stub values sit in [40, 50): the band filter keeps everything,
      // an impossible band keeps nothing
      val (_, banded) = http("GET", s"${srv.url}/v2/data?min_value=40&max_value=50")
      assert("\"timestamp\"".r.findAllIn(banded).length === 36)
      val (_, none) = http("GET", s"${srv.url}/v2/data?min_value=99")
      assert(none === "[]")
      // limit over the reference cap → 400
      assert(http("GET", s"${srv.url}/v2/data?limit=6000")._1 === 400)

      // -- discovery (discovery.py)
      val (_, dsets) = http("GET", s"${srv.url}/v2/discovery/datasets")
      assert(dsets === "[\"GAS_QUALITY\"]")
      val (_, flds) = http("GET",
        s"${srv.url}/v2/discovery/fields?dataset_id=GAS_QUALITY")
      for (f <- Seq("ts", "site", "WOBBE", "CV", "SG"))
        assert(flds.contains(s"""\"field\":\"$f\""""), s"missing field $f")
      assert(http("GET", s"${srv.url}/v2/discovery/fields")._1 === 400)
      val (_, smp) = http("GET",
        s"${srv.url}/v2/discovery/sample?dataset_id=GAS_QUALITY&limit=3")
      assert("\\\\\"site\\\\\"".r.findAllIn(smp).length === 3)

      // -- CSV export (export.py): header + capped rows, STREAMED —
      // chunked transfer encoding, bytes identical to the buffered form
      val (csvSt, csv, csvHdr) = httpFull("GET",
        s"${srv.url}/v2/export/data.csv?series_id=$sid&limit=2")
      assert(csvSt === 200)
      assert(csvHdr.get("transfer-encoding").exists(_.contains("chunked")),
        s"export must stream chunked: $csvHdr")
      val lines = csv.split("\n")
      assert(lines.head === "series_id,observation_time,value,quality_flag")
      assert(lines.length === 3)
      assert(lines(1).startsWith(s"$sid,"))

      // -- ingest is idempotent end-to-end: replaying the same window
      // changes nothing (the reference's crash-recovery contract)
      val (st2, body2b) = http("POST",
        s"${srv.url}/v2/ingest/gas?from_date=2024-01-01&to_date=2024-01-04")
      assert(st2 === 202)
      val jobId2 = "\"job_id\":(\\d+)".r.findFirstMatchIn(body2b).get.group(1)
      assert(await {
        http("GET", s"${srv.url}/v2/ingest/jobs/$jobId2")._2.contains("done")
      })
      assert(spark.read.parquet(wh.observations).count() === 4L * 3 * 3)
    }
  }

  test("full reference loop over real sockets: 202 ingest fetches the live REST API with retries") {
    // the serving edge AND the chunked REST transport composed: the
    // background job fetches over an actual loopback connection with a
    // scripted 429 storm on the first chunk — the complete
    // POST /v2/ingest/gas → NationalGas API → warehouse → GET /v2/data
    // reference loop, every hop a real socket
    val fx = new GasFixtureServer
    try {
      fx.synchronized {
        fx.script("2024-03-01") = scala.collection.mutable.Queue(429, 503)
      }
      val root = Files.createTempDirectory("graft-serve-live").toString
      val wh = Warehouse(root)
      val srv = new QueryServer(spark, wh, restUrl = Some(fx.url)).start()
      try {
        val (st, body) = http("POST",
          s"${srv.url}/v2/ingest/gas?from_date=2024-03-01&to_date=2024-03-04")
        assert(st === 202)
        val jobId = "\"job_id\":(\\d+)".r.findFirstMatchIn(body).get.group(1)
        assert(await {
          http("GET", s"${srv.url}/v2/ingest/jobs/$jobId")._2.contains("done")
        }, "live-socket ingest did not finish")
        // the scripted storm forced two retries on chunk 1; chunk 2 clean
        assert(fx.calls("2024-03-01") === 3, s"calls=${fx.calls}")
        assert(fx.calls("2024-03-03") === 1)
        // 4 days × 3 sites × 3 metrics through the live transport
        assert(spark.read.parquet(wh.observations).count() === 4L * 3 * 3)
        val (ds, all) = http("GET", s"${srv.url}/v2/data?limit=1000")
        assert(ds === 200)
        assert("\"timestamp\"".r.findAllIn(all).length === 36)
      } finally srv.stop()
    } finally fx.stop()
  }

  test("GIE routes: synchronous delete+reload ingest → star-join read with dynamic WHERE") {
    withServer { (srv, wh) =>
      import graft.warehouse.Gie
      // source is required; an un-ingested star serves the empty page
      assert(http("GET", s"${srv.url}/v2/gie/data")._1 === 400)
      assert(http("GET", s"${srv.url}/v2/gie/data?source=GIE_AGSI")._2 === "[]")
      assert(http("GET", s"${srv.url}/v2/gie/agsi")._1 === 405)

      // -- synchronous ingest (gie.py:10-13): response IS completion
      val (s1, b1) = http("POST", s"${srv.url}/v2/gie/agsi")
      assert(s1 === 200, b1)
      assert(b1.contains("\"status\":\"completed\"") && b1.contains("\"AGSI\""))
      assert(b1.contains("\"country\":null"))

      // get-or-create registered the full dimension set: 3 countries ×
      // 6 variables; the fact holds 54 rows minus the one unparseable
      // ('n/a' consumption) the transformer skips, with the NULL-like
      // trend kept as value null
      assert(spark.read.parquet(Gie.assetsPath(wh)).count() === 3)
      assert(spark.read.parquet(Gie.seriesPath(wh)).count() === 18)
      assert(spark.read.parquet(Gie.dailyPath(wh)).count() === 53)

      val (ds, all) = http("GET", s"${srv.url}/v2/gie/data?source=GIE_AGSI&limit=5000")
      assert(ds === 200)
      assert("\"date\"".r.findAllIn(all).length === 53)
      assert(all.contains("\"value\":null"), "NULL-like trend must surface as null")
      assert(!all.contains("\"variable\":\"info\""), "excluded keys must not become series")

      // dynamic WHERE: country + variable + date range pins one row
      val (_, one) = http("GET", s"${srv.url}/v2/gie/data?source=GIE_AGSI" +
        "&country=Austria&variable=gasInStorage&start_date=2024-02-02&end_date=2024-02-02")
      assert("\"date\"".r.findAllIn(one).length === 1)
      assert(one.contains("\"value\":101.5") && one.contains("\"country\":\"Austria\""), one)

      // newest-first page: a limit-5 page is all from the last gas day
      val (_, top) = http("GET", s"${srv.url}/v2/gie/data?source=GIE_AGSI&limit=5")
      assert("\"date\":\"2024-02-03\"".r.findAllIn(top).length === 5)
      assert(http("GET", s"${srv.url}/v2/gie/data?source=GIE_AGSI&limit=6000")._1 === 400)

      // -- replaying the ingest is idempotent (delete-then-reload)
      assert(http("POST", s"${srv.url}/v2/gie/agsi")._1 === 200)
      assert(spark.read.parquet(Gie.dailyPath(wh)).count() === 53)

      // -- a country-scoped re-ingest REPLACES the whole source slice
      // (service.py deletes by source, not by country): only Austria
      // remains — 3 days × 6 variables
      assert(http("POST", s"${srv.url}/v2/gie/agsi?country=Austria")._1 === 200)
      val (_, scoped) = http("GET", s"${srv.url}/v2/gie/data?source=GIE_AGSI&limit=5000")
      assert("\"date\"".r.findAllIn(scoped).length === 18)
      assert(!scoped.contains("Belgium") && !scoped.contains("Germany"))

      // -- ALSI coexists: its nested transmission dict flattens to
      // key_subkey variables, its unparseable 'note' never becomes a
      // series, and its delete-reload leaves the AGSI slice untouched
      assert(http("POST", s"${srv.url}/v2/gie/alsi")._1 === 200)
      val (_, alsi) = http("GET", s"${srv.url}/v2/gie/data?source=GIE_ALSI&limit=5000")
      assert("\"date\"".r.findAllIn(alsi).length === 36) // 3 countries × 3 days × 4 vars
      assert(alsi.contains("\"variable\":\"transmission_entry\""))
      assert(alsi.contains("\"variable\":\"transmission_exit\""))
      assert(!alsi.contains("transmission_note"))
      val (_, agsiAfter) = http("GET", s"${srv.url}/v2/gie/data?source=GIE_AGSI&limit=5000")
      assert("\"date\"".r.findAllIn(agsiAfter).length === 18, "ALSI reload must not touch AGSI")
    }
  }

  test("raw exports: verbatim JSON array; json_normalize CSV attachment, both validated") {
    withServer { (srv, wh) =>
      // validation (export.py Query bounds)
      assert(http("GET", s"${srv.url}/v2/export/raw/json")._1 === 400)
      assert(http("GET", s"${srv.url}/v2/export/raw/json?dataset_id=AGSI&limit=0")._1 === 400)
      assert(http("GET", s"${srv.url}/v2/export/raw/json?dataset_id=AGSI&limit=60000")._1 === 400)

      // two raw landings, second country-scoped (the newer one)
      assert(http("POST", s"${srv.url}/v2/gie/agsi")._1 === 200)
      assert(http("POST", s"${srv.url}/v2/gie/agsi?country=Austria")._1 === 200)

      val (js, jb) = http("GET", s"${srv.url}/v2/export/raw/json?dataset_id=AGSI")
      assert(js === 200)
      assert(jb.startsWith("[{\"data\":["), "payloads must splice verbatim")
      assert("\\{\"data\":".r.findAllIn(jb).length === 2)
      // newest-first: limit=1 returns the Austria-scoped payload
      val (_, newest) = http("GET", s"${srv.url}/v2/export/raw/json?dataset_id=AGSI&limit=1")
      assert(newest.contains("Austria") && !newest.contains("Belgium"))

      // nested payloads land directly for the CSV flatten proof
      import ss.implicits._
      Seq(
        ("e1", "NESTED", """{"a":"1","b":{"c":"x,y","d":"2"}}"""),
        ("e2", "NESTED", """{"a":"3","b":{"c":"z","d":""}}"""))
        .toDF("event_id", "dataset_id", "raw_payload")
        .withColumn("series_hint", org.apache.spark.sql.functions.lit(null).cast("string"))
        .withColumn("ingested_at", org.apache.spark.sql.functions.current_timestamp())
        .select("event_id", "dataset_id", "series_hint", "raw_payload", "ingested_at")
        .write.mode("append").parquet(wh.rawEvents)

      val (cs, cb, ch) = httpFull("GET",
        s"${srv.url}/v2/export/raw/csv?dataset_id=NESTED")
      assert(cs === 200)
      assert(ch.get("transfer-encoding").exists(_.contains("chunked")),
        s"raw CSV must stream chunked: $ch")
      assert(ch.get("content-disposition")
        .exists(_ == "attachment; filename=NESTED_raw.csv"), ch.toString)
      val lines = cb.split("\n")
      // json_normalize shape: nested keys dot-joined, union header
      assert(lines.head === "a,b.c,b.d", lines.head)
      assert(lines.toSet.contains("1,\"x,y\",2"), cb) // comma value quoted
      assert(lines.toSet.contains("3,z,"), cb) // empty string renders empty
      assert(lines.length === 3)
    }
  }

  test("site-filtered ingest registers only the requested site's series") {
    withServer { (srv, wh) =>
      val (st, body) = http("POST",
        s"${srv.url}/v2/ingest/gas?from_date=2024-02-01&to_date=2024-02-02&site_ids=BACTON")
      assert(st === 202)
      assert(body.contains("\"site_ids\":[\"BACTON\"]"))
      val jobId = "\"job_id\":(\\d+)".r.findFirstMatchIn(body).get.group(1)
      assert(await {
        http("GET", s"${srv.url}/v2/ingest/jobs/$jobId")._2.contains("done")
      })
      val series = spark.read.parquet(wh.metaSeries).collect()
      assert(series.length === 3) // one per metric, single site
      assert(series.forall(_.getAs[String]("series_id").contains("BACTON")))
      assert(http("GET", s"${srv.url}/v2/ingest/jobs/999")._1 === 404)
    }
  }
}
