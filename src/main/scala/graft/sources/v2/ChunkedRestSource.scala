package graft.sources.v2

import java.time.LocalDate
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's chunked REST scan
  * (`national_gas_client.py:61-120`: POST per 2-day window, serial Python
  * loop with throttle/retry). As a Spark source the chunk loop becomes
  * PARTITION PLANNING: one `InputPartition` per date chunk, so a
  * 1000-executor cluster fetches 1000 chunks concurrently and a failed
  * chunk retries alone (task retry = the reference's per-request retry,
  * but free and partition-scoped).
  *
  * The transport has two modes: with the `url` option set, each chunk
  * is fetched over a REAL socket (JDK HttpURLConnection) and the
  * gas-quality JSON envelope flattened — LoopbackRestSpec drives this
  * end to end against an in-process localhost fixture server including
  * scripted 429/503 retry storms; without `url` a deterministic
  * generator stands in (this container has no egress to the real
  * endpoints). Retry delays are option-overridable (`retryBaseMs`,
  * `retryRateLimitExtraMs`, `throttleMs`) so tests traverse the full
  * backoff schedule without wall-clock cost; live deployments keep the
  * reference defaults. Everything else — schema declaration, chunk
  * partitioning, column pruning pushdown
  * (`SupportsPushDownRequiredColumns`) — is the same Spark surface in
  * both modes and is spec-tested.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.ChunkedRestSource")
  *   .option("from", "2024-01-01").option("to", "2024-01-31")
  *   .option("chunkDays", "2")
  *   .load()
  * }}}
  */
class ChunkedRestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkedRestSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChunkedRestTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object ChunkedRestSource {
  /** Wide gas-quality-like record: one row per (day, site, metric). */
  val schema: StructType = StructType(Seq(
    StructField("obs_time", TimestampType, nullable = false),
    StructField("site", StringType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val Sites: Seq[String] = Seq("STFERGUS", "BACTON", "EASINGTON")
  val Metrics: Seq[String] = Seq("WOBBE", "CV", "SG")

  /** The per-chunk transport: returns Left(httpStatus) on a failed
    * request, Right(rows) on success. With no `url` option the
    * deterministic generator stands in (this container has no egress to
    * the real endpoints); with `url` set — a live deployment, or the
    * spec's loopback fixture server — the chunk is fetched over a REAL
    * socket ([[graft.sources.HttpTransport]]) and the gas-quality JSON
    * envelope is flattened, returning Left(status) on 4xx/5xx and on
    * connection failure. Either way the retry/backoff policy around it
    * ([[graft.sources.HttpRetry]], the reference's 5×-backoff/429
    * schedule) is the same code in the reader path. */
  def fetchTransport(start: LocalDate, endExclusive: LocalDate,
                     url: Option[String] = None)
  : Either[Int, Iterator[(Long, String, String, Double)]] =
    url match {
      case None => Right(fetchChunk(start, endExclusive))
      case Some(u) =>
        graft.sources.HttpTransport
          .get(s"$u?from=$start&toExclusive=$endExclusive")
          .map(parseGasQuality)
    }

  /** Flatten the gas-quality JSON envelope `{"data": [{applicableAt,
    * site, metric, value}, …]}` (the reference's json_normalize input
    * shape, `national_gas_client.py:103-116`). Jackson rides Spark's
    * own classpath. A malformed payload THROWS — a 200 with garbage is
    * a contract violation, not a retryable transient. */
  def parseGasQuality(body: String): Iterator[(Long, String, String, Double)] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val root = mapper.readTree(body)
    val data = root.get("data")
    require(data != null && data.isArray, s"gas-quality envelope missing data[]")
    val out = Vector.newBuilder[(Long, String, String, Double)]
    data.forEach { item =>
      val inst = java.time.Instant.parse(item.get("applicableAt").asText)
      out += ((inst.getEpochSecond * 1000000L + inst.getNano / 1000,
        item.get("site").asText, item.get("metric").asText,
        item.get("value").asDouble))
    }
    out.result().iterator
  }

  /** Reader-path retry policy: the reference's schedule, with delays
    * overridable through reader options (specs shrink them to drive the
    * full 429/503 schedule over a loopback socket without wall-clock
    * cost) and transport-level failures retried like a 5xx. */
  def policyFromOptions(opts: Map[String, String]): graft.sources.HttpRetry.Policy = {
    val base = graft.sources.HttpRetry.Policy()
    base.copy(
      baseDelayMs = opts.get("retryBaseMs").map(_.toLong)
        .getOrElse(base.baseDelayMs),
      rateLimitExtraMs = opts.get("retryRateLimitExtraMs").map(_.toLong)
        .getOrElse(base.rateLimitExtraMs),
      throttleMs = opts.get("throttleMs").map(_.toLong)
        .getOrElse(base.throttleMs),
      retryOn = base.retryOn + graft.sources.HttpTransport.IoFailureStatus)
  }

  /** [[fetchTransport]] under the retry policy — what the partition
    * reader actually calls. */
  def fetchChunkWithRetry(start: LocalDate, endExclusive: LocalDate,
                          url: Option[String] = None,
                          policy: graft.sources.HttpRetry.Policy =
                            graft.sources.HttpRetry.Policy(),
                          sleep: Long => Unit = Thread.sleep)
  : Iterator[(Long, String, String, Double)] =
    graft.sources.HttpRetry.withRetries(policy, sleep)(
      _ => fetchTransport(start, endExclusive, url))

  /** Deterministic generator standing in for the remote payload: rows
    * for every (day in chunk, site, metric). */
  def fetchChunk(start: LocalDate, endExclusive: LocalDate): Iterator[(Long, String, String, Double)] = {
    Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(_.isBefore(endExclusive))
      .flatMap { day =>
        val midnightMicros = day.toEpochDay * 86400L * 1000000L
        for (site <- Sites.iterator; metric <- Metrics.iterator) yield {
          // deterministic pseudo-measurement derived from (day, site, metric)
          val h = (day.toEpochDay * 31 + site.hashCode.toLong) * 31 + metric.hashCode
          val v = 40.0 + (Math.floorMod(h, 1000) / 100.0)
          (midnightMicros, site, metric, v)
        }
      }
  }
}

private class ChunkedRestTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String = "chunked_rest"
  override def schema(): StructType = ChunkedRestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ChunkedRestScanBuilder(options)
}

private class ChunkedRestScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  import org.apache.spark.sql.sources._

  private var required: StructType = ChunkedRestSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var minDay: Option[Long] = None // inclusive epoch-day bounds
  private var maxDay: Option[Long] = None
  private var limit: Option[Int] = None

  // Column pruning pushdown: a `select(site)` never materializes the
  // other fields — the reader emits only what the scan asked for.
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Chunk pruning pushdown: a date-range predicate on obs_time prunes
  // whole chunks AT PLANNING TIME — the reference's from_date/to_date
  // params (`national_gas_client.py:69-79`) applied before any request
  // is issued, so a one-week slice of a year-long configured window
  // launches 4 tasks, not 183. Pruning is chunk-grain and conservative
  // (day-resolution bounds), so EVERY filter stays residual — Spark
  // re-applies the exact predicate to the fetched rows; a bound that
  // can't be converted simply prunes nothing.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach(collectBound)
    pushed = filters.filter(informsPruning)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  // Limit pushdown for the preview path: each partition reader stops
  // fetching after `limit` rows (a REST page cap, not just a row drop).
  // Returns false = PARTIAL push: row counts per chunk aren't known at
  // plan time, so Spark keeps its own global limit on top.
  override def pushLimit(n: Int): Boolean = { limit = Some(n); false }

  private def toMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000) / 1000)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case _ => None
  }
  private def dayOf(v: Any): Option[Long] =
    toMicros(v).map(us => Math.floorDiv(us, 86400L * 1000000L))

  private def collectBound(f: Filter): Unit = f match {
    case GreaterThan("obs_time", v) =>
      dayOf(v).foreach(d => minDay = Some(minDay.fold(d)(math.max(_, d))))
    case GreaterThanOrEqual("obs_time", v) =>
      dayOf(v).foreach(d => minDay = Some(minDay.fold(d)(math.max(_, d))))
    case LessThan("obs_time", v) =>
      dayOf(v).foreach(d => maxDay = Some(maxDay.fold(d)(math.min(_, d))))
    case LessThanOrEqual("obs_time", v) =>
      dayOf(v).foreach(d => maxDay = Some(maxDay.fold(d)(math.min(_, d))))
    case EqualTo("obs_time", v) =>
      collectBound(GreaterThanOrEqual("obs_time", v))
      collectBound(LessThanOrEqual("obs_time", v))
    case And(l, r) => collectBound(l); collectBound(r)
    case _ => ()
  }
  private def informsPruning(f: Filter): Boolean = f match {
    case GreaterThan("obs_time", v) => dayOf(v).isDefined
    case GreaterThanOrEqual("obs_time", v) => dayOf(v).isDefined
    case LessThan("obs_time", v) => dayOf(v).isDefined
    case LessThanOrEqual("obs_time", v) => dayOf(v).isDefined
    case EqualTo("obs_time", v) => dayOf(v).isDefined
    case And(l, r) => informsPruning(l) || informsPruning(r)
    case _ => false
  }

  override def build(): Scan = {
    import scala.jdk.CollectionConverters._
    val optMap = options.asScala.toMap
    new ChunkedRestScan(
      LocalDate.parse(options.get("from")),
      LocalDate.parse(options.get("to")),
      math.max(1, options.getInt("chunkDays", 2)),
      required, minDay, maxDay, limit,
      Option(options.get("url")),
      ChunkedRestSource.policyFromOptions(optMap),
      options.getInt("maxDaysPerBatch", 0))
  }
}

private class ChunkedRestScan(from: LocalDate, to: LocalDate, chunkDays: Int,
                              required: StructType,
                              minDay: Option[Long], maxDay: Option[Long],
                              limit: Option[Int],
                              url: Option[String],
                              policy: graft.sources.HttpRetry.Policy,
                              maxDaysPerBatch: Int = 0)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** §2.9: the reference's hourly scheduler loop
    * (`app/scheduler/scheduler.py:10-18` — `IntervalTrigger(hours=1)`,
    * `max_instances=1`, `coalesce=True`) re-expressed as a Structured
    * Streaming source: offsets are epoch-day high-water marks over the
    * SAME date-chunk partition planning the batch scan uses, so each
    * micro-batch lands exactly the chunks that became available since
    * the last committed tick. `max_instances=1` is the engine's own
    * serialized micro-batch execution; `coalesce=True` (missed ticks
    * merge into one run) is precisely Trigger.AvailableNow catch-up
    * from the checkpointed offset. `maxDaysPerBatch` bounds one batch's
    * admission (SupportsAdmissionControl), so a long outage drains as
    * several bounded batches instead of one giant catch-up job. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChunkedRestMicroBatchStream(from, to, chunkDays, required, url,
      policy, maxDaysPerBatch)

  /** One InputPartition per date chunk — the reference's serial loop,
    * parallelized. [from, to] inclusive like the reference's API params.
    * Chunks wholly outside the pushed day bounds are dropped HERE, at
    * planning time: no task, no request. */
  override def planInputPartitions(): Array[InputPartition] = {
    val endExclusive = to.plusDays(1)
    Iterator.iterate(from)(_.plusDays(chunkDays.toLong))
      .takeWhile(_.isBefore(endExclusive))
      .map { s =>
        val e = if (s.plusDays(chunkDays.toLong).isAfter(endExclusive)) endExclusive
                else s.plusDays(chunkDays.toLong)
        ChunkPartition(s.toEpochDay, e.toEpochDay)
      }
      .filter(c => minDay.forall(c.endDay - 1 >= _) &&
        maxDay.forall(c.startDay <= _))
      .map(c => c: InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChunkReaderFactory(required, limit, url, policy)
}

private case class ChunkPartition(startDay: Long, endDay: Long) extends InputPartition

private class ChunkReaderFactory(required: StructType, limit: Option[Int],
                                 url: Option[String],
                                 policy: graft.sources.HttpRetry.Policy)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[ChunkPartition]
    new ChunkReader(cp, required, limit, url, policy)
  }
}

private class ChunkReader(p: ChunkPartition, required: StructType,
                          limit: Option[Int], url: Option[String],
                          policy: graft.sources.HttpRetry.Policy)
  extends PartitionReader[InternalRow] {
  // partial limit push: `limit` rows suffice from ANY one partition, so
  // each reader stops fetching there; Spark's own global limit does the
  // cross-partition cut
  private val it = {
    val base = ChunkedRestSource.fetchChunkWithRetry(
      LocalDate.ofEpochDay(p.startDay), LocalDate.ofEpochDay(p.endDay),
      url, policy)
    limit.fold(base)(base.take)
  }
  // precompute projection indices once per partition, not per row
  private val fieldOrds: Array[Int] =
    required.fields.map(f => ChunkedRestSource.schema.fieldIndex(f.name))
  private var current: (Long, String, String, Double) = _

  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }

  override def get(): InternalRow = {
    val row = new Array[Any](fieldOrds.length)
    var i = 0
    while (i < fieldOrds.length) {
      row(i) = fieldOrds(i) match {
        case 0 => current._1
        case 1 => UTF8String.fromString(current._2)
        case 2 => UTF8String.fromString(current._3)
        case 3 => current._4
      }
      i += 1
    }
    InternalRow.fromSeq(row.toIndexedSeq)
  }

  override def close(): Unit = ()
}

/** Streaming offset: the EXCLUSIVE epoch-day high-water mark already
  * landed. Restart-safe by construction — the day grid is absolute, so
  * a checkpointed offset resumes mid-window without re-fetching or
  * skipping a chunk. */
private case class DayOffset(day: Long) extends Offset {
  override def json(): String = day.toString
}

/** The chunked REST scan as a micro-batch source (see
  * [[ChunkedRestScan.toMicroBatchStream]] for the scheduler mapping).
  * Admission control is day-grain: `latestOffset(start, _)` returns
  * `min(start + maxDaysPerBatch, available)`, and AvailableNow pins the
  * available end at `prepareForTriggerAvailableNow` so the drain is
  * bounded even while new days keep arriving. Each planned batch reuses
  * the batch scan's [[ChunkReaderFactory]] — transport, retry schedule
  * and column pruning are literally the same code path in both modes. */
private class ChunkedRestMicroBatchStream(
    from: LocalDate, to: LocalDate, chunkDays: Int,
    required: StructType, url: Option[String],
    policy: graft.sources.HttpRetry.Policy,
    maxDaysPerBatch: Int)
  extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val endExclusiveDay: Long = to.plusDays(1).toEpochDay
  // In stub/live terms "available" is the configured window's end; a
  // live deployment would probe the remote publication clock here.
  private def currentAvailableEnd: Long = endExclusiveDay
  @volatile private var availableNowEnd: Option[Long] = None

  override def initialOffset(): Offset = DayOffset(from.toEpochDay)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(currentAvailableEnd)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DayOffset].day
    val avail = availableNowEnd.getOrElse(currentAvailableEnd)
    val capped =
      if (maxDaysPerBatch > 0) math.min(s + maxDaysPerBatch.toLong, avail)
      else avail
    DayOffset(math.max(s, capped))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")

  override def reportLatestOffset(): Offset = DayOffset(currentAvailableEnd)

  /** Same chunk-grain planning as the batch scan, over [start, end)
    * epoch days — one InputPartition per chunkDays slice, so a
    * catch-up batch spanning many days still fans out across the
    * cluster. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DayOffset].day
    val e = end.asInstanceOf[DayOffset].day
    Iterator.iterate(s)(_ + chunkDays.toLong)
      .takeWhile(_ < e)
      .map(cs => ChunkPartition(cs, math.min(cs + chunkDays.toLong, e)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChunkReaderFactory(required, None, url, policy)

  override def deserializeOffset(json: String): Offset =
    DayOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
