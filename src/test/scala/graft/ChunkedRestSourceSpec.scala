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

  test("date-range filter prunes chunks at planning time, same result") {
    // configured window: 30 days in 2-day chunks = 15 partitions; the
    // query asks for a 4-day slice → only the chunks intersecting it
    // are planned (no task, no request for the rest)
    val slice = read("2024-01-01", "2024-01-30")
      .filter(col("obs_time") >= "2024-01-11 00:00:00" &&
        col("obs_time") < "2024-01-15 00:00:00")
    val parts = slice.rdd.getNumPartitions
    assert(parts >= 2 && parts <= 3, // 4 days / 2-day chunks (+1 edge)
      s"expected ~2 pruned partitions, got $parts of 15")
    // pruning is planning-side only — results must equal a source whose
    // configured window IS the slice (same generator, same days)
    val direct = read("2024-01-11", "2024-01-14")
      .orderBy("obs_time", "site", "metric").collect()
    assert(slice.orderBy("obs_time", "site", "metric").collect().toSeq ===
      direct.toSeq)
    assert(slice.count() === 4L * 3 * 3)
  }

  test("a no-intersection date slice plans zero partitions, empty result") {
    val none = read("2024-01-01", "2024-01-30")
      .filter(col("obs_time") >= "2025-06-01 00:00:00")
    assert(none.rdd.getNumPartitions === 0)
    assert(none.count() === 0L)
  }

  test("limit pushes to the reader as a partial limit (preview path)") {
    // partial push: every reader caps its own fetch at the limit (for a
    // live transport that is a page cap per chunk), Spark's global
    // limit does the cross-partition cut — the preview stays 5 rows
    val df = read("2024-01-01", "2024-01-30").limit(5)
    assert(df.count() === 5L)
    // and composes with chunk pruning: a sliced preview plans only the
    // slice's chunks and still returns the capped count
    val sliced = read("2024-01-01", "2024-01-30")
      .filter(col("obs_time") >= "2024-01-11 00:00:00" &&
        col("obs_time") < "2024-01-15 00:00:00")
      .limit(5)
    assert(sliced.count() === 5L)
  }

  test("downstream relational ops compose (unpivoted ingest shape)") {
    val wide = read("2024-01-01", "2024-01-10")
      .groupBy("obs_time", "site").pivot("metric",
        graft.sources.v2.ChunkedRestSource.Metrics).agg(first("value"))
    assert(wide.count() === 10L * 3)
    assert(wide.columns.toSet === Set("obs_time", "site", "WOBBE", "CV", "SG"))
  }
}
