package graft.serving

import java.net.URLEncoder
import java.time.{Duration, Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType, TimestampType}

/** The reference's client library (`gas_client/client.py:7-48`:
  * `GasClient.get_history`) as a thin Scala shim over the serving edge.
  *
  * Semantics preserved exactly:
  *   - provide either `lastDays` or both `start` & `end`
  *     (`client.py:16-17` raises the same message otherwise);
  *   - `lastDays` resolves the window as [now − days, now]
  *     (`client.py:19-21`); explicit bounds parse as ISO date(-time)
  *     at UTC (`client.py:23-24`'s fromisoformat + UTC);
  *   - the result is the (observation_time, value) frame sorted by
  *     observation_time (`client.py:26-48`).
  *
  * The reference client queries the database directly; this shim rides
  * `GET /v2/data` instead, so a consumer needs only the HTTP edge — and
  * the page inherits the route's 5000-row serving cap (the reference
  * client is unbounded, which is exactly what a 100 TB serving tier
  * can't offer; history beyond a page belongs to the export routes).
  * `now` is injectable so the `lastDays` window is spec-testable.
  */
final class GasClient(spark: SparkSession, baseUrl: String,
                      now: () => Instant = () => Instant.now()) {

  private val schema = StructType(Seq(
    StructField("observation_time", TimestampType),
    StructField("value", DoubleType)))

  def getHistory(seriesId: String,
                 lastDays: Option[Int] = None,
                 start: Option[String] = None,
                 end: Option[String] = None): DataFrame = {
    require(lastDays.isDefined || (start.isDefined && end.isDefined),
      "Provide either last_days or start & end") // client.py:16-17
    val (startDt, endDt) = lastDays match {
      case Some(days) =>
        val endI = now()
        (endI.minus(Duration.ofDays(days.toLong)), endI)
      case None => (parseUtc(start.get), parseUtc(end.get))
    }
    def enc(s: String) = URLEncoder.encode(s, "UTF-8")
    val url = s"$baseUrl/v2/data?series_id=${enc(seriesId)}" +
      s"&start=${enc(startDt.toString)}&end=${enc(endDt.toString)}&limit=5000"
    val body = graft.sources.HttpTransport.get(url) match {
      case Right(b) => b
      case Left(status) =>
        throw new java.io.IOException(s"GET /v2/data failed: HTTP $status")
    }
    import spark.implicits._
    val parsed = spark.read.json(Seq(body).toDS())
    if (!parsed.columns.contains("points")) // empty page → empty frame
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    parsed
      .select(explode(col("points")).as("p"))
      .select(to_timestamp(col("p.timestamp")).as("observation_time"),
        col("p.value").cast("double").as("value"))
      .orderBy("observation_time")
  }

  /** `datetime.fromisoformat(...).replace(tzinfo=UTC)`: a bare date is
    * midnight; a date-time is taken as UTC wall time. */
  private def parseUtc(s: String): Instant =
    try Instant.parse(s)
    catch {
      case _: java.time.format.DateTimeParseException =>
        try LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
        catch {
          case _: java.time.format.DateTimeParseException =>
            LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant
        }
    }
}
