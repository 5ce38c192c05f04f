package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** The streaming half of the chunked-REST connector: epoch-day offsets,
  * admission-controlled micro-batches, and checkpoint-restart resume
  * mid-chunk-range — the Spark-native form of the reference's hourly
  * scheduler loop (`app/scheduler/scheduler.py:10-18`). */
class RestPollStreamSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def readStreamed(from: String, to: String,
                           maxDaysPerBatch: Int = 0) =
    spark.readStream.format("graft.sources.v2.ChunkedRestSource")
      .option("from", from).option("to", to)
      .option("chunkDays", "2")
      .option("maxDaysPerBatch", maxDaysPerBatch.toString)
      .load()

  test("AvailableNow drain lands exactly the batch scan's rows") {
    val out = tmp("rp_out"); val cp = tmp("rp_cp")
    val q = readStreamed("2024-01-01", "2024-01-10")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
      .orderBy("obs_time", "site", "metric").collect()
    val batch = spark.read.format("graft.sources.v2.ChunkedRestSource")
      .option("from", "2024-01-01").option("to", "2024-01-10")
      .option("chunkDays", "2").load()
      .orderBy("obs_time", "site", "metric").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.length === 10 * 3 * 3)
  }

  test("admission control bounds each micro-batch to maxDaysPerBatch") {
    val out = tmp("rp_out"); val cp = tmp("rp_cp")
    val q = readStreamed("2024-01-01", "2024-01-20", maxDaysPerBatch = 6)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 20 days at <= 6/batch: 4 data batches, each <= 6*9 rows
    val offsets = Paths.get(cp, "offsets")
    val nBatches = Files.list(offsets).count()
    assert(nBatches >= 4, s"expected a multi-batch drain, got $nBatches offsets")
    assert(spark.read.parquet(out).count() === 20L * 3 * 3)
    // no day double-landed across batch boundaries
    assert(spark.read.parquet(out)
      .select("obs_time", "site", "metric").distinct().count() === 20L * 3 * 3)
  }

  test("checkpoint restart resumes mid-chunk-range without replay or gap") {
    val out = tmp("rp_out"); val cp = tmp("rp_cp")
    // tick 1: only the first 9 days are available (mid-window, mid-chunk
    // grid); the offset checkpoint ends at day 10 exclusive
    val q1 = readStreamed("2024-01-01", "2024-01-09", maxDaysPerBatch = 4)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() === 9L * 3 * 3)
    // tick 2 (the scheduler's next interval / coalesced catch-up): the
    // window has grown; SAME checkpoint + sink resumes from the stored
    // day offset — January 1-9 must NOT be re-fetched
    val q2 = readStreamed("2024-01-01", "2024-01-31", maxDaysPerBatch = 4)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val landed = spark.read.parquet(out)
    assert(landed.count() === 31L * 3 * 3)
    assert(landed.select("obs_time", "site", "metric").distinct().count()
      === 31L * 3 * 3, "a replayed chunk would duplicate (day, site, metric)")
    // and the union equals the one-shot batch read of the full window
    val batch = spark.read.format("graft.sources.v2.ChunkedRestSource")
      .option("from", "2024-01-01").option("to", "2024-01-31")
      .option("chunkDays", "2").load()
    assert(landed.orderBy("obs_time", "site", "metric").collect().toSeq
      === batch.orderBy("obs_time", "site", "metric").collect().toSeq)
  }

  test("streaming column pruning reaches the chunk reader") {
    val out = tmp("rp_out"); val cp = tmp("rp_cp")
    val q = readStreamed("2024-01-01", "2024-01-03")
      .select("site", "metric")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val df = spark.read.parquet(out)
    assert(df.columns.toSeq.sorted === Seq("metric", "site"))
    assert(df.count() === 3L * 3 * 3)
  }

  test("streaming drain over a REAL socket: retry storm per chunk, no replay across ticks") {
    val fx = new GasFixtureServer
    try {
      // every chunk answers 503 then 429 then 200: the reader-path
      // retry schedule must absorb the storm inside each micro-batch
      for (d <- 1 to 9 by 2)
        fx.script(f"2024-01-$d%02d") = scala.collection.mutable.Queue(503, 429)
      val out = Files.createTempDirectory("rp_live_out").toString
      val cp = Files.createTempDirectory("rp_live_cp").toString
      def drain(to: String): Unit = {
        val q = spark.readStream.format("graft.sources.v2.ChunkedRestSource")
          .option("from", "2024-01-01").option("to", to)
          .option("chunkDays", "2").option("maxDaysPerBatch", "4")
          .option("url", fx.url)
          .option("retryBaseMs", "1").option("retryRateLimitExtraMs", "2")
          .option("throttleMs", "0")
          .load()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain("2024-01-06")
      assert(spark.read.parquet(out).count() === 6L * 9)
      // second tick resumes mid-range over the live socket; chunks
      // already landed are NOT re-fetched (call accounting proves it)
      val callsAfterT1 = fx.calls.toMap
      drain("2024-01-10")
      assert(spark.read.parquet(out).count() === 10L * 9)
      assert(spark.read.parquet(out)
        .select("obs_time", "site", "metric").distinct().count() === 10L * 9)
      for ((k, n) <- callsAfterT1)
        assert(fx.calls(k) === n, s"chunk $k re-fetched after the checkpoint")
      // streamed rows equal the batch read of the same window
      val streamed = spark.read.parquet(out)
        .orderBy("obs_time", "site", "metric").collect()
      val batch = spark.read.format("graft.sources.v2.ChunkedRestSource")
        .option("from", "2024-01-01").option("to", "2024-01-10")
        .option("chunkDays", "2").load()
        .orderBy("obs_time", "site", "metric").collect()
      assert(streamed.toSeq === batch.toSeq)
    } finally fx.stop()
  }
}
