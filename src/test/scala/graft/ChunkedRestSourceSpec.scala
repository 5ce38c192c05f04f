package graft

import org.apache.spark.sql.functions._

/** The DSv2 chunked-REST source: partition-per-chunk planning, schema,
  * determinism, and column-pruning pushdown. */
class ChunkedRestSourceSpec extends SparkSpec {

  private def read(from: String, to: String, chunkDays: Int = 2) =
    spark.read.format("graft.sources.v2.ChunkedRestSource")
      .option("from", from).option("to", to)
      .option("chunkDays", chunkDays.toString)
      .load()

  test("plans one input partition per date chunk") {
    val df = read("2024-01-01", "2024-01-30", chunkDays = 2)
    assert(df.rdd.getNumPartitions === 15) // 30 days / 2-day chunks
    // 30 days × 3 sites × 3 metrics
    assert(df.count() === 30L * 3 * 3)
  }

  test("last short chunk is clipped, rows deterministic across reads") {
    val df = read("2024-01-01", "2024-01-05", chunkDays = 3) // 3+2 days
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 5L * 3 * 3)
    val a = df.orderBy("obs_time", "site", "metric").collect()
    val b = read("2024-01-01", "2024-01-05", chunkDays = 3)
      .orderBy("obs_time", "site", "metric").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("column pruning reaches the reader (pruned scan schema)") {
    val df = read("2024-01-01", "2024-01-04").select("site").distinct()
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("site") && !scan.contains("obs_time"),
      s"scan should read only `site`: $scan")
    assert(df.count() === 3)
  }

  test("downstream relational ops compose (unpivoted ingest shape)") {
    val wide = read("2024-01-01", "2024-01-10")
      .groupBy("obs_time", "site").pivot("metric",
        graft.sources.v2.ChunkedRestSource.Metrics).agg(first("value"))
    assert(wide.count() === 10L * 3)
    assert(wide.columns.toSet === Set("obs_time", "site", "WOBBE", "CV", "SG"))
  }
}
