package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.warehouse.Ingest

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
  }
}
