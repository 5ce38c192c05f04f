package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.warehouse.{Gie, Ingest, NationalGas}

/** `scripts/run_ingestion.py` analog — the one-shot command-line
  * backfill for a single dataset (reference:
  * `scripts/run_ingestion.py:1-11`: argparse `dataset_id` +
  * `--lookback-days`, default 14, calling `run_all.ingest_dataset`).
  * The window is [as-of − lookback, as-of], both ends inclusive — the
  * lookback semantics the reference's client exposes. (The reference
  * CLI itself crashes on use: it passes `lookback_days` to
  * `ingest_dataset`, which has no such parameter — like the scheduler
  * import bug, this is parity with INTENT, verified by IngestCliSpec.)
  *
  * Dataset dispatch mirrors `run_all.py:35-72`, including the loud
  * failure on an unknown id, plus the two GIE arms the reference keeps
  * scheduler-only (`gie/service.py:ingest_gie`); each arm runs the
  * SAME verified ingest path the HTTP edge uses — the CLI adds no
  * third pipeline.
  *
  * usage: IngestCli <warehouseRoot> <dataset_id>
  *          [--lookback-days N] [--as-of YYYY-MM-DD] [--url URL]
  *          [--site-ids a,b] [--operator-keys o] [--point-keys p]
  *          [--direction-keys d] [--indicators i]
  *          [--publication-ids PUBOB37,...] [--country NAME]
  * (`--as-of` pins the window end for reproducible backfills and
  * specs; production omits it and gets today, like the reference.)
  */
object IngestCli {

  def main(args: Array[String]): Unit = {
    val s = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-ingest-cli")
    try run(args.toSeq, s) finally s.stop()
  }

  private val Known = Set("lookback-days", "as-of", "url", "site-ids",
    "operator-keys", "point-keys", "direction-keys", "indicators",
    "publication-ids", "country")

  private def parseFlags(rest: Seq[String]): Map[String, String] =
    rest.grouped(2).map {
      // a value may never look like a flag: grouped(2) pairs tokens
      // positionally, so `--site-ids --url ...` would otherwise bind
      // the literal "--url" as the site filter (silently landing 0
      // rows) instead of failing loudly like every other malformed arg
      case Seq(k, v) if k.startsWith("--") && Known(k.drop(2)) &&
          !v.startsWith("--") =>
        k.drop(2) -> v
      case bad => throw new IllegalArgumentException(
        s"unrecognized arguments: ${bad.mkString(" ")}")
    }.toMap

  /** Core, session-injected for specs. */
  private[graft] def run(args: Seq[String], s: SparkSession): Unit = {
    require(args.length >= 2,
      "usage: IngestCli <warehouseRoot> <dataset_id> [--lookback-days N] " +
        "[--as-of YYYY-MM-DD] [--url URL] ...")
    val wh = Ingest.Warehouse(args(0))
    val dataset = args(1)
    val opts = parseFlags(args.drop(2))
    val lookback = opts.get("lookback-days").map(_.toInt).getOrElse(14)
    require(lookback >= 0, s"--lookback-days must be >= 0, got $lookback")
    val asOf = opts.get("as-of").map(LocalDate.parse).getOrElse(LocalDate.now())
    val from = asOf.minusDays(lookback.toLong).toString
    val to = asOf.toString
    val url = opts.get("url")
    def list(k: String): Seq[String] = opts.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

    dataset match {
      case "GAS_QUALITY" =>
        var reader = s.read.format("graft.sources.v2.ChunkedRestSource")
          .option("from", from).option("to", to).option("chunkDays", "2")
        url.foreach(u => reader = reader.option("url", u))
        val long = reader.load()
        val sites = list("site-ids")
        val sited =
          if (sites.isEmpty) long else long.filter(col("site").isin(sites: _*))
        Ingest.ingestWide(s, wh, Ingest.gasWide(sited),
          "GAS_QUALITY", "ts", Seq("site"))
      case "ENTSOG" =>
        val (pts, dirs, inds) =
          (list("point-keys"), list("direction-keys"), list("indicators"))
        // client.py:139-144's hard validation, surfaced before any fetch
        require(inds.nonEmpty || (pts.nonEmpty && dirs.nonEmpty),
          "ENTSOG requires at least one of: 1) indicator 2) pointKey + directionKey")
        NationalGas.ingestEntsog(s, wh, from, to,
          list("operator-keys"), pts, dirs, inds, url)
      case "INSTANTANEOUS_FLOW" =>
        NationalGas.ingestInstantaneous(s, wh, url)
      case "GAS_PUBLICATIONS" =>
        val pubs = list("publication-ids")
        require(pubs.nonEmpty, "publication_ids is required")
        NationalGas.ingestPublications(s, wh, from, to, pubs, url)
      // The GIE arms are NOT in run_all.py's dispatch — the reference
      // triggers them through `gie/service.py:ingest_gie(dataset,
      // source, country)` from the scheduler only. The CLI exposes the
      // same call (same Gie.ingest path the HTTP edge and scheduler
      // use) so a one-shot GIE backfill doesn't need a running
      // scheduler; dataset ids match the reference's AGSI/ALSI and the
      // source tag is fixed per dataset exactly as `run_all`'s
      // scheduler wiring fixes it.
      case "AGSI" =>
        Gie.ingest(s, wh, Gie.DatasetAgsi, Gie.SourceAgsi,
          opts.get("country"), url)
      case "ALSI" =>
        Gie.ingest(s, wh, Gie.DatasetAlsi, Gie.SourceAlsi,
          opts.get("country"), url)
      case other => // run_all.py:72's ValueError, verbatim contract
        throw new IllegalArgumentException(
          s"Unsupported dataset_id for API ingestion: $other")
    }
  }
}
