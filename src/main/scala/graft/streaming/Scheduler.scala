package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.warehouse.Ingest

/** The reference's scheduler process (`scripts/start_scheduler.py` +
  * `app/scheduler/scheduler.py:10-18`) as ONE Structured Streaming
  * query — the Spark-native driver binary for the hourly ingest loop:
  *
  *  - `IntervalTrigger(hours=1)`  → `Trigger.ProcessingTime("1 hour")`
  *  - `max_instances=1`           → micro-batch execution is serialized
  *                                  by the engine; a slow tick delays
  *                                  the next, never overlaps it
  *  - `coalesce=True`             → missed ticks merge: the next batch
  *                                  reads from the CHECKPOINTED day
  *                                  offset to the current high-water
  *                                  mark (Trigger.AvailableNow is the
  *                                  run-once catch-up form)
  *
  * Each tick's new date chunks flow through the SAME verified
  * five-stage ingest DAG the HTTP edge runs ([[Ingest.ingestWide]]:
  * raw landing → field discovery → series registration → normalize →
  * LWW upsert) via `foreachBatch` — upserts are idempotent on
  * (series_id, observation_time), so a replayed batch after a crash
  * cannot double-write, which is exactly the delivery contract the
  * reference's `coalesce`d scheduler assumes but cannot enforce.
  *
  * (The reference's own scheduled path crashes on import —
  * `scheduler.py:3` imports a symbol `run_all.py` never defines — so
  * this is parity with intent, verified here by RestPollStreamSpec /
  * SchedulerSpec and the q_st_rest_ingest oracle row.)
  */
object Scheduler {

  /** Build and start the polling ingest stream. `to` is the configured
    * window end (the stub's publication clock); a live deployment
    * passes `url` and a far-future `to`. */
  def gasIngestStream(s: SparkSession, wh: Ingest.Warehouse,
                      from: String, to: String, checkpoint: String,
                      trigger: Trigger = Trigger.ProcessingTime("1 hour"),
                      maxDaysPerBatch: Int = 7,
                      url: Option[String] = None): StreamingQuery = {
    var reader = s.readStream.format("graft.sources.v2.ChunkedRestSource")
      .option("from", from).option("to", to).option("chunkDays", "2")
      .option("maxDaysPerBatch", maxDaysPerBatch.toString)
    url.foreach(u => reader = reader.option("url", u))
    reader.load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // long (site, metric) rows → the wide API batch shape the
          // verified ingest DAG takes (QueryServer.runGasIngest's pivot)
          Ingest.ingestWide(batch.sparkSession, wh, Ingest.gasWide(batch),
            "GAS_QUALITY", "ts", Seq("site"))
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** `start_scheduler.py` analog: run the hourly loop until killed.
    * args: warehouseRoot from to checkpointDir [intervalSeconds] */
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Scheduler <warehouseRoot> <from> <to> <checkpointDir> [intervalSeconds]")
    val interval = if (args.length > 4) s"${args(4)} seconds" else "1 hour"
    val s = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-scheduler")
    val q = gasIngestStream(s, Ingest.Warehouse(args(0)), args(1), args(2),
      args(3), Trigger.ProcessingTime(interval))
    q.awaitTermination()
  }
}
