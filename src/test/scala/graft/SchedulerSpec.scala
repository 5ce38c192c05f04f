package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Scheduler
import graft.warehouse.Ingest

/** The scheduler driver loop end-to-end: growing-window catch-up ticks
  * through the full five-stage ingest DAG with warehouse-level
  * idempotence (the coalesce=True + at-least-once contract the
  * reference's scheduler assumes). */
class SchedulerSpec extends SparkSpec {

  test("catch-up ticks land exactly-once into the warehouse; replay is a no-op") {
    val root = Files.createTempDirectory("sched").toString
    val wh = Ingest.Warehouse(s"$root/wh")
    def tick(to: String): Unit = {
      val q = Scheduler.gasIngestStream(spark, wh, "2024-01-01", to,
        s"$root/cp", trigger = Trigger.AvailableNow(), maxDaysPerBatch = 4)
      q.awaitTermination()
    }
    // tick 1: 9 available days -> 9 days x 3 sites x 3 metrics
    tick("2024-01-09")
    val obs1 = spark.read.parquet(wh.observations)
    assert(obs1.count() === 9L * 9)
    // tick 2 (the scheduler's next interval, window grown): resumes
    // from the checkpointed day offset - January 1-9 NOT re-ingested
    tick("2024-01-31")
    val obs2 = spark.read.parquet(wh.observations)
    assert(obs2.count() === 31L * 9)
    assert(obs2.select("series_id", "observation_time").distinct().count()
      === 31L * 9, "a replayed chunk would duplicate the logical PK")
    // series registered once per (site, metric), with the autoregister
    // unit/frequency defaults
    val meta = spark.read.parquet(wh.metaSeries)
    assert(meta.count() === 9)
    assert(meta.select("unit").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("UNKNOWN"))
    // tick 3: no new days -> warehouse unchanged (idempotent replay)
    tick("2024-01-31")
    assert(spark.read.parquet(wh.observations).count() === 31L * 9)
    assert(spark.read.parquet(wh.metaSeries).count() === 9)
  }
}
