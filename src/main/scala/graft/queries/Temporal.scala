package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series operators beyond the reference's own surface (SURVEY §2.4
  * note: the reference has no as-of/range join — a time-series serving
  * engine should): as-of join, bucketed range join, gap-fill/resample
  * with forward fill, sessionization, and ordered moving aggregates.
  *
  * Scale design (100 TB):
  *  - The as-of join is the union+ordered-window formulation: one shuffle
  *    on the join key, one local sort — never a per-probe lookup or a
  *    range cross product. This is the standard formulation that survives
  *    arbitrarily large build/probe sides (both stream through a sort).
  *  - The range join bins time into fixed buckets and equi-joins on
  *    (key, bucket) — candidate pairs are bounded by bucket width, the
  *    classic interval-bin trick; the exact predicate filters after.
  *  - Gap-fill generates per-key grids with `sequence` (scan-side, no
  *    driver loop) and forward-fills with an ordered window.
  *  - Sessionization is lag + prefix-sum — two window passes over one
  *    shuffle on the session key.
  *  - All event-time comparisons are integer micros (`unix_micros`) so
  *    the DuckDB oracles (`epoch_us`) are bit-identical.
  */
object Temporal {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  // --- q_t1_asof_join -----------------------------------------------------
  // For each click, the most recent error of the same user at-or-before
  // the click (ties on error ts broken by highest event_id). Implemented
  // as union + last(ignoreNulls) over an ordered window — no range
  // explosion; the only shuffle is on user_id.
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val probe = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        lit(1).as("is_probe"),
        lit(null).cast("timestamp").as("b_ts"),
        lit(null).cast("long").as("b_id"),
        lit(null).cast("double").as("b_value"))
    val build = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"), lit(0).as("is_probe"),
        col("ts").as("b_ts"), col("event_id").as("b_id"), col("value").as("b_value"))
    // Build rows sort before probes at equal ts (inclusive <=); among
    // equal-ts builds, higher event_id sorts later so last() picks it.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_probe"), col("b_id"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe.unionByName(build)
      .withColumn("err_ts", last(col("b_ts"), ignoreNulls = true).over(w))
      .withColumn("err_value", last(col("b_value"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select("event_id", "user_id", "ts", "value", "err_ts", "err_value")
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """SELECT p.event_id, p.user_id, p.ts, p.value, l.err_ts, l.err_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') p
      |LEFT JOIN LATERAL (
      |  SELECT b.ts AS err_ts, b.value AS err_value
      |  FROM events b
      |  WHERE b.event_type = 'error' AND b.user_id = p.user_id AND b.ts <= p.ts
      |  ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) l ON true
      |ORDER BY event_id""".stripMargin

  // --- q_t2_range_join ----------------------------------------------------
  // For each error, how many clicks the same user made in the preceding
  // 10 minutes. Time is binned into 10-minute buckets; each click lands
  // in its bucket and the next, errors equi-join on (user_id, bucket) and
  // the exact range predicate filters — every candidate pair shares a
  // bucket, so the O(n·m) interval cross product never materializes.
  private val RangeSecs = 600L

  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(unix_micros(col("ts")) / (RangeSecs * 1000000L)).as("bucket"))
    val clk = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        floor(unix_micros(col("ts")) / (RangeSecs * 1000000L)).as("b0"))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
    err.join(clk, Seq("user_id", "bucket"), "left")
      .withColumn("hit",
        when(col("c_ts").isNotNull &&
          unix_micros(col("c_ts")) >= unix_micros(col("ts")) - RangeSecs * 1000000L &&
          col("c_ts") < col("ts"), 1L).otherwise(0L))
      .groupBy("event_id", "user_id", "ts")
      .agg(sum(col("hit")).as("n_recent_clicks"))
      .orderBy("event_id")
  }

  val rangeJoinSql: String =
    s"""SELECT e.event_id, e.user_id, e.ts,
       |  (SELECT count(*) FROM events c
       |   WHERE c.event_type = 'click' AND c.user_id = e.user_id
       |     AND epoch_us(c.ts) >= epoch_us(e.ts) - ${RangeSecs * 1000000L}
       |     AND c.ts < e.ts) AS n_recent_clicks
       |FROM events e WHERE e.event_type = 'error'
       |ORDER BY e.event_id""".stripMargin

  // --- q_t3_gapfill -------------------------------------------------------
  // Resample each user's stream to an hourly grid (min..max hour of that
  // user) and forward-fill the per-hour max value — the reference's
  // lookback/refresh reads served gap-free series this way. The grid is
  // sequence+explode per key (scan-side); the fill is one ordered window.
  def gapfill(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val bounds = e.groupBy("user_id").agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = bounds.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val hourly = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(max(col("value")).as("v")) // max: summation-order-free
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("v_fill", last(col("v"), ignoreNulls = true).over(w))
      .select("user_id", "hour", "v_fill")
      .orderBy("user_id", "hour")
  }

  val gapfillSql: String =
    """WITH bounds AS (
      |  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
      |         date_trunc('hour', max(ts)) AS h1
      |  FROM events GROUP BY user_id),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM bounds),
      |hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour, max(value) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT g.user_id, g.hour,
      |  last_value(h.v IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
      |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
      |ORDER BY g.user_id, g.hour""".stripMargin

  // --- q_t4_sessionize ----------------------------------------------------
  // Split each user's stream into sessions separated by >30 min of
  // silence; emit per-session start/end/size. lag + prefix-sum over one
  // user_id shuffle (the batch formulation of the streaming
  // session-window operator in streaming/MicroBatch).
  private val GapMicros = 30L * 60 * 1000000L

  def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = ev(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapMicros, 1L).otherwise(0L))
    flagged
      .withColumn("session_n", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_n")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_n")
  }

  val sessionizeSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $GapMicros
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts,
       |    -- BIGINT cast: DuckDB's windowed sum returns HUGEINT, which
       |    -- materializes as float64 in the driver compare while Spark
       |    -- emits BIGINT — equal values, mismatched hash (round-2 red row)
       |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_n
       |  FROM flagged)
       |SELECT user_id, session_n, min(ts) AS session_start,
       |  max(ts) AS session_end, count(*) AS n_events
       |FROM sess GROUP BY user_id, session_n
       |ORDER BY user_id, session_n""".stripMargin

  // --- q_t5_moving --------------------------------------------------------
  // Ordered lag/lead + explicit 3-point moving sum per user. The sum is
  // written as v + lag1 + lag2 (not a frame aggregate) so both engines
  // add in the same order and the doubles match bit-for-bit.
  def moving(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev(s, d)
      .withColumn("prev1", lag(col("value"), 1).over(w))
      .withColumn("prev2", lag(col("value"), 2).over(w))
      .withColumn("next1", lead(col("value"), 1).over(w))
      .withColumn("sum3",
        col("value") + coalesce(col("prev1"), lit(0.0)) + coalesce(col("prev2"), lit(0.0)))
      .select("event_id", "user_id", "ts", "value", "prev1", "prev2", "next1", "sum3")
      .orderBy("event_id")
  }

  val movingSql: String =
    """SELECT event_id, user_id, ts, value,
      |  lag(value, 1) OVER w AS prev1,
      |  lag(value, 2) OVER w AS prev2,
      |  lead(value, 1) OVER w AS next1,
      |  value + coalesce(lag(value, 1) OVER w, 0.0)
      |        + coalesce(lag(value, 2) OVER w, 0.0) AS sum3
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // --- q_t6_session_window ------------------------------------------------
  // The same sessionization through Spark's NATIVE session_window
  // aggregation (the streaming-capable operator — identical code under
  // readStream). Semantics differ from q_t4 only at the exact-gap
  // boundary: session_window is half-open, so a gap of exactly 30:00
  // starts a NEW session (diff >= gap), and session_end = last ts + gap.
  // The oracle replicates that rule precisely.
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))
      .select(col("user_id"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_events"), col("max_value"))
      .orderBy("user_id", "session_start")

  val sessionWindowSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, value, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= $GapMicros
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_n
       |  FROM flagged)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL 30 MINUTE AS session_end,
       |  count(*) AS n_events, max(value) AS max_value
       |FROM sess GROUP BY user_id, session_n
       |ORDER BY user_id, session_start""".stripMargin

  // --- q_t7_resample ------------------------------------------------------
  // Time-series resampling to 5-minute OHLC bars per event_type — the
  // downsampling operator behind every metrics/market rollup. Open and
  // close are min/max over the struct (ts, event_id, value): (ts,
  // event_id) is a unique composite, so lexicographic struct ordering
  // picks a deterministic first/last row in BOTH engines — never
  // first()/last(), whose result depends on partition arrival order.
  // One map-side-combinable aggregation; the bar arithmetic is exact
  // integer epoch math (micros div/mul), no interval rounding.
  def resample(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(
        expr("timestamp_micros(unix_micros(ts) div 300000000 * 300000000)")
          .as("bar_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        min(col("value")).as("low"),
        max(col("value")).as("high"))
      .orderBy("bar_start", "event_type")

  val resampleSql: String =
    """SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS bar_start,
      |  event_type, count(*) AS n,
      |  min({'t': ts, 'e': event_id, 'v': value}).v AS open,
      |  max({'t': ts, 'e': event_id, 'v': value}).v AS close,
      |  min(value) AS low, max(value) AS high
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY bar_start, event_type""".stripMargin

  // --- q_t23_mase -------------------------------------------------------------
  // FORECAST-BASELINE EVALUATION by MASE (Hyndman & Koehler 2006, the
  // scale-free forecast error the M-competitions standardized on) —
  // the ops question behind every volume forecast: "is my model better
  // than seasonal-naive?" answered with the metric that makes the
  // comparison fair. Per event type's daily-count series (ordered
  // observed days): hold out the last H=7 days, forecast each with
  // the seasonal-naive lag-7 value, and scale the test MAE by the
  // in-sample seasonal-naive MAE over the training rows. Counts are
  // integers, so both MAE sums are exact BIGINTs and
  // mase = (Σ|e_test| · (T_train − 7)) / (H · Σ|e_train|) is ONE
  // division of exact DECIMAL(38,0) products. mase < 1 ⇔ the
  // "model" (here: the baseline itself, = 1.0 only in expectation)
  // beats naive — the row carries both raw sums so any other model's
  // errors can be rescaled against the same denominator. Scale:
  // day-grain digest after one corpus aggregation; windows ordered by
  // (day) within type — never a global sort.
  private val MaseH = 7
  private val MaseSeason = 7

  def mase(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val wAsc = Window.partitionBy("event_type").orderBy("day")
    val wDesc = Window.partitionBy("event_type").orderBy(col("day").desc)
    val rows = daily
      .withColumn("lag7", lag(col("x"), MaseSeason).over(wAsc))
      .withColumn("from_end", row_number().over(wDesc))
      .withColumn("err", abs(col("x") - col("lag7")))
    rows.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum(when(col("from_end") <= MaseH, col("err"))).as("test_abs_err"),
        sum(when(col("from_end") > MaseH && col("lag7").isNotNull, col("err")))
          .as("train_abs_err"),
        sum(when(col("from_end") > MaseH && col("lag7").isNotNull, 1L)
          .otherwise(0L)).as("n_train_terms"))
      .select(col("event_type"), col("n_days"),
        col("test_abs_err"), col("train_abs_err"), col("n_train_terms"),
        ((col("test_abs_err").cast("decimal(38,0)") * col("n_train_terms"))
          .cast("double") /
          (col("train_abs_err").cast("decimal(38,0)") * MaseH).cast("double"))
          .as("mase"))
      .orderBy("event_type")
  }

  val maseSql: String =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |r AS MATERIALIZED (
       |  SELECT event_type, x,
       |    lag(x, $MaseSeason) OVER (PARTITION BY event_type ORDER BY day)
       |      AS lag7,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day DESC)
       |      AS from_end
       |  FROM daily)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |  CAST(sum(CASE WHEN from_end <= $MaseH THEN abs(x - lag7) END)
       |    AS BIGINT) AS test_abs_err,
       |  CAST(sum(CASE WHEN from_end > $MaseH AND lag7 IS NOT NULL
       |    THEN abs(x - lag7) END) AS BIGINT) AS train_abs_err,
       |  CAST(sum(CASE WHEN from_end > $MaseH AND lag7 IS NOT NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_train_terms,
       |  CAST(CAST(sum(CASE WHEN from_end <= $MaseH THEN abs(x - lag7) END)
       |      AS DECIMAL(38,0))
       |    * CAST(sum(CASE WHEN from_end > $MaseH AND lag7 IS NOT NULL
       |        THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |  / CAST(CAST(sum(CASE WHEN from_end > $MaseH AND lag7 IS NOT NULL
       |        THEN abs(x - lag7) END) AS DECIMAL(38,0)) * $MaseH AS DOUBLE)
       |    AS mase
       |FROM r
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // --- q_t24_conformal --------------------------------------------------------
  // SPLIT-CONFORMAL PREDICTION INTERVALS for the q_t23 baseline — the
  // distribution-free way to put an honest band around ANY point
  // forecast (Vovk's conformal framework; the split variant is the one
  // production systems run because it needs no refitting): calibrate
  // q̂ = the ⌈(n_cal + 1)(1 − α)⌉-th smallest absolute residual of the
  // seasonal-naive forecast on the calibration rows (all in-sample
  // lag-7 residuals outside the 7-day holdout), then the interval
  // f_t ± q̂ is guaranteed ≥ (1 − α) coverage on exchangeable data.
  // The row reports q̂ (an EXACT integer — residuals are count
  // differences; rank selection, never an interpolated quantile) and
  // the realized holdout coverage (exact count ratio). α = 0.2.
  // Scale: residuals are day-grain digests per type; the rank pick is
  // a within-type window over that digest, not a corpus sort.
  private val ConfAlphaNum = 2 // α = 2/10
  private val ConfAlphaDen = 10

  def conformal(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val wAsc = Window.partitionBy("event_type").orderBy("day")
    val wDesc = Window.partitionBy("event_type").orderBy(col("day").desc)
    val rows = daily
      .withColumn("lag7", lag(col("x"), MaseSeason).over(wAsc))
      .withColumn("from_end", row_number().over(wDesc))
      .filter(col("lag7").isNotNull)
      .withColumn("err", abs(col("x") - col("lag7")))
      .localCheckpoint() // calibration ranks + holdout coverage read it
    val cal = rows.filter(col("from_end") > MaseH)
    // rank k = ceil((n_cal + 1) * (1 - α)); tie-break the residual
    // order by day for a deterministic rank pick
    val wErr = Window.partitionBy("event_type").orderBy(col("err"), col("day"))
    val ranked = cal.withColumn("rk", row_number().over(wErr))
    val nCal = cal.groupBy("event_type").agg(count(lit(1)).as("n_cal"))
      .withColumn("k",
        ceil(((col("n_cal") + 1) * (ConfAlphaDen - ConfAlphaNum))
          .cast("double") / ConfAlphaDen).cast("long"))
    val qhat = ranked.join(nCal, "event_type")
      // k can exceed n_cal at tiny n (q̂ = +∞); clamp to the max
      // residual and flag — deterministic in both engines
      .filter(col("rk") === least(col("k"), col("n_cal")))
      .select(col("event_type"), col("n_cal"), col("k"),
        col("err").as("qhat"))
    rows.filter(col("from_end") <= MaseH)
      .join(qhat, "event_type")
      .groupBy(col("event_type"), col("n_cal"), col("k"), col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("err") <= col("qhat"), 1L).otherwise(0L)).as("n_covered"))
      .select(col("event_type"), col("n_cal"), col("k"), col("qhat"),
        col("n_test"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
      .orderBy("event_type")
  }

  val conformalSql: String =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |r AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT event_type, day, x,
       |      lag(x, $MaseSeason) OVER (PARTITION BY event_type ORDER BY day)
       |        AS lag7,
       |      row_number() OVER (PARTITION BY event_type ORDER BY day DESC)
       |        AS from_end
       |    FROM daily)
       |  WHERE lag7 IS NOT NULL),
       |e AS MATERIALIZED (
       |  SELECT event_type, day, from_end, abs(x - lag7) AS err FROM r),
       |cal AS MATERIALIZED (
       |  SELECT event_type, err,
       |    row_number() OVER (PARTITION BY event_type ORDER BY err, day)
       |      AS rk
       |  FROM e WHERE from_end > $MaseH),
       |nc AS MATERIALIZED (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
       |    CAST(ceil(CAST((count(*) + 1)
       |      * (${ConfAlphaDen - ConfAlphaNum}) AS DOUBLE)
       |      / $ConfAlphaDen) AS BIGINT) AS k
       |  FROM cal GROUP BY 1),
       |qhat AS MATERIALIZED (
       |  SELECT cal.event_type, nc.n_cal, nc.k, cal.err AS qhat
       |  FROM cal JOIN nc ON cal.event_type = nc.event_type
       |  WHERE cal.rk = least(nc.k, nc.n_cal))
       |SELECT e.event_type, q.n_cal, q.k, q.qhat,
       |  CAST(count(*) AS BIGINT) AS n_test,
       |  CAST(sum(CASE WHEN e.err <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_covered,
       |  CAST(sum(CASE WHEN e.err <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
       |    ::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE AS coverage
       |FROM e JOIN qhat q ON e.event_type = q.event_type
       |WHERE e.from_end <= $MaseH
       |GROUP BY 1, 2, 3, 4
       |ORDER BY e.event_type""".stripMargin

  // --- q_t22_seasonal_strength --------------------------------------------------
  // DAY-OF-WEEK SEASONALITY STRENGTH per event type — the scalar that
  // says HOW seasonal a series is, not just what its profile looks
  // like (q_t8 scores residuals against the profile; this scores the
  // profile itself): η² = SS_between/SS_total of daily counts grouped
  // by dow — the share of daily variance the weekly cycle explains,
  // the STL "seasonal strength" in its exact-arithmetic ANOVA form.
  // All sums are exact (daily counts are integers; T_g², T², n·Q ride
  // DECIMAL(38,0)); the only non-integer piece, Σ_g T_g²/n_g, is ONE
  // division per dow cell quantized at 1e-6 (the zipf discipline), so
  // both engines build identical doubles. The peak dow is a
  // struct-max over the quantized per-dow means — total order, no
  // first(). Scale: day-grain digest (the value-domain discipline);
  // everything after the daily aggregation is ≤ 7 cells per type.
  def seasonalStrength(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      // epoch-days mod 7, the q_t16 discipline — never dayofweek(),
      // which the engines anchor differently
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01")), lit(7)).cast("long"))
    val cells = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("tg"))
      .withColumn("s6",
        round((col("tg").cast("decimal(38,0)") * col("tg")).cast("double")
          / col("ng").cast("double") * 1e6).cast("long"))
      .withColumn("m6",
        round(col("tg").cast("double") / col("ng").cast("double") * 1e6)
          .cast("long"))
    val tot = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("q"))
    cells.groupBy("event_type")
      .agg(sum(col("s6")).as("ss6"),
        max(struct(col("m6"), col("dow"))).getField("dow").as("peak_dow"))
      .join(tot, "event_type")
      .select(col("event_type"), col("n").as("n_days"), col("peak_dow"),
        {
          val num = col("n").cast("double") *
            (col("ss6").cast("double") / 1e6) -
            (col("t").cast("decimal(38,0)") * col("t")).cast("double")
          val den = (col("n").cast("decimal(38,0)") * col("q") -
            col("t").cast("decimal(38,0)") * col("t")).cast("double")
          when(den > 0.0, num / den).otherwise(lit(0.0))
            .as("seasonal_strength")
        })
      .orderBy("event_type")
  }

  val seasonalStrengthSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |dd AS MATERIALIZED (
      |  SELECT event_type, day, x,
      |    CAST((day::DATE - DATE '1970-01-01') % 7 AS BIGINT) AS dow
      |  FROM daily),
      |cells AS MATERIALIZED (
      |  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(x) AS BIGINT) AS tg
      |  FROM dd GROUP BY 1, 2),
      |c2 AS MATERIALIZED (
      |  SELECT event_type, dow, ng, tg,
      |    CAST(round(CAST(CAST(tg AS DECIMAL(38,0)) * tg AS DOUBLE)
      |      / CAST(ng AS DOUBLE) * 1e6) AS BIGINT) AS s6,
      |    CAST(round(CAST(tg AS DOUBLE) / CAST(ng AS DOUBLE) * 1e6)
      |      AS BIGINT) AS m6
      |  FROM cells),
      |agg AS MATERIALIZED (
      |  SELECT event_type, CAST(sum(s6) AS BIGINT) AS ss6,
      |    max({'m6': m6, 'dow': dow}).dow AS peak_dow
      |  FROM c2 GROUP BY 1),
      |tot AS MATERIALIZED (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS t,
      |    sum(CAST(x * x AS DECIMAL(38,0))) AS q
      |  FROM dd GROUP BY 1)
      |SELECT a.event_type, tot.n AS n_days, a.peak_dow,
      |  CASE WHEN CAST(CAST(tot.n AS DECIMAL(38,0)) * tot.q
      |      - CAST(tot.t AS DECIMAL(38,0)) * tot.t AS DOUBLE) > 0.0
      |    THEN (CAST(tot.n AS DOUBLE) * (CAST(a.ss6 AS DOUBLE) / 1e6)
      |        - CAST(CAST(tot.t AS DECIMAL(38,0)) * tot.t AS DOUBLE))
      |      / CAST(CAST(tot.n AS DECIMAL(38,0)) * tot.q
      |        - CAST(tot.t AS DECIMAL(38,0)) * tot.t AS DOUBLE)
      |    ELSE 0.0 END AS seasonal_strength
      |FROM agg a JOIN tot USING (event_type)
      |ORDER BY event_type""".stripMargin

  // --- q_t8_seasonal ------------------------------------------------------
  // Seasonal-profile residual outliers — the time-series screen the
  // family lacked: each event compares against its (event_type,
  // hour-of-day) seasonal mean and standard deviation, and |z| > 3
  // flags it. The seasonal model is one map-side-combinable
  // aggregation of exact integer moments (cent sums and squared-cent
  // sums — DECIMAL(38,0) so no engine can overflow or drift), the
  // mean/variance divisions happen once per (type, hour) cell in one
  // operand order, and the z-score's sqrt is IEEE-correctly-rounded
  // in both engines (the one transcendental that IS portable).
  // Degenerate cells (variance ≤ 0) flag nothing by contract. At
  // 100 TB the model is 5×24 cells broadcast back into a scan-side
  // projection — the same train-broadcast-score shape as the LM rows.
  def seasonal(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"),
        hour(col("ts")).as("hod"),
        round(col("value") * 100).cast("long").as("cents"))
    val model = ev.groupBy("event_type", "hod")
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("sc"),
        sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("sc2"))
      .select(col("event_type"), col("hod"),
        (col("sc").cast("double") / 100.0 / col("n").cast("double")).as("mu"),
        (col("sc2").cast("double") / 10000.0 / col("n").cast("double")).as("ex2"))
      .select(col("event_type"), col("hod"), col("mu"),
        (col("ex2") - col("mu") * col("mu")).as("variance"))
    ev.join(broadcast(model), Seq("event_type", "hod"))
      .filter(col("variance") > 0.0)
      .select(col("event_id"), col("ts"), col("event_type"), col("hod"),
        col("value"), col("mu").as("seasonal_mean"),
        ((col("value") - col("mu")) / sqrt(col("variance"))).as("z"))
      .filter(abs(col("z")) > 3.0)
      .orderBy("event_id")
  }

  val seasonalSql: String =
    """WITH ev AS (
      |  SELECT event_id, ts, event_type, value,
      |    CAST(EXTRACT(HOUR FROM ts) AS INT) AS hod,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |model AS (
      |  SELECT event_type, hod,
      |    CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) / 100.0
      |      / CAST(count(*) AS DOUBLE) AS mu,
      |    CAST(SUM(CAST(cents * cents AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
      |      / CAST(count(*) AS DOUBLE) AS ex2
      |  FROM ev GROUP BY event_type, hod)
      |SELECT event_id, ts, ev.event_type, ev.hod, value,
      |  mu AS seasonal_mean,
      |  (value - mu) / sqrt(ex2 - mu * mu) AS z
      |FROM ev JOIN model ON ev.event_type = model.event_type AND ev.hod = model.hod
      |WHERE (ex2 - mu * mu) > 0.0 AND abs((value - mu) / sqrt(ex2 - mu * mu)) > 3.0
      |ORDER BY event_id""".stripMargin

  // --- q_t9_concurrency ---------------------------------------------------
  // Peak concurrent sessions per day — the sweep-line interval
  // aggregate (how many sessions were simultaneously open at the
  // busiest instant). Sessions come from the same 30-min-gap rule as
  // q_t4; each session is clipped to every day it spans (explode over
  // a `sequence` of day starts — scan-side, no driver loop), then the
  // sweep materializes +1 at clipped start / −1 at clipped end and a
  // running sum ordered by (instant, delta DESC) — +1 before −1 at
  // the same instant, so two sessions touching at a boundary count as
  // concurrent, and permutations within an equal-(instant, delta)
  // group leave the prefix-sum multiset (hence the max) unchanged.
  // The day clip is what makes the sweep PARTITIONABLE: each day's
  // running sum is an independent window, so at 100 TB the sweep
  // shuffles once on the day key and never needs a global sort; a
  // session crossing a boundary re-enters the next day as a clipped
  // segment (the carry-in is exact, not approximated). All event-time
  // comparisons are integer micros.
  def concurrency(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = ev(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapMicros, 1L).otherwise(0L))
      .withColumn("session_n", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_n")
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    val clipped = sessions
      .select(col("s"), col("e"),
        explode(sequence(date_trunc("DAY", col("s")), date_trunc("DAY", col("e")),
          expr("interval 1 day"))).as("day"))
      .select(col("day"),
        greatest(unix_micros(col("s")), unix_micros(col("day"))).as("cs"),
        least(unix_micros(col("e")),
          unix_micros(col("day")) + lit(86399999999L)).as("ce"))
    val pts = clipped.select(col("day"), col("cs").as("us"), lit(1L).as("delta"))
      .union(clipped.select(col("day"), col("ce").as("us"), lit(-1L).as("delta")))
    val sw = Window.partitionBy("day").orderBy(col("us"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("conc", sum(col("delta")).over(sw))
      .groupBy("day")
      .agg(max(col("conc")).as("max_concurrent"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_sessions"))
      .orderBy("day")
  }

  val concurrencySql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $GapMicros
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id,
       |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_n,
       |    ts
       |  FROM flagged),
       |iv AS (
       |  SELECT min(ts) AS s, max(ts) AS e FROM sess GROUP BY user_id, session_n),
       |clipped AS (
       |  SELECT day,
       |    greatest(epoch_us(s), epoch_us(day)) AS cs,
       |    least(epoch_us(e), epoch_us(day) + 86399999999) AS ce
       |  FROM (SELECT s, e,
       |          unnest(generate_series(date_trunc('day', s), date_trunc('day', e),
       |            INTERVAL 1 DAY)) AS day
       |        FROM iv)),
       |pts AS (
       |  SELECT day, cs AS us, 1 AS delta FROM clipped
       |  UNION ALL
       |  SELECT day, ce AS us, -1 AS delta FROM clipped),
       |swept AS (
       |  SELECT day, delta,
       |    CAST(sum(delta) OVER (PARTITION BY day ORDER BY us, delta DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
       |  FROM pts)
       |SELECT day, max(conc) AS max_concurrent,
       |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
       |FROM swept
       |GROUP BY day
       |ORDER BY day""".stripMargin

  // --- q_t10_m4 -----------------------------------------------------------
  // M4 time-series downsampling (Jugel et al., VLDB 2014 — public
  // literature): per (series, pixel-bucket), keep the FIRST, LAST, MIN
  // and MAX points — the four rows that make a width-w line chart
  // pixel-exact, which is why it's the visualization-serving operator
  // every dashboard backend runs. Unlike LTTB (whose point selection
  // chains on the previously selected point — inherently sequential),
  // M4 is ONE map-side-combinable aggregation: at 100 TB it reduces a
  // series to 4·buckets rows in a single scan, shuffling only
  // (series, bucket, 4 structs) digests. Deterministic point identity
  // via lexicographic struct extremes: time extremes by (ts, event_id),
  // value extremes by (value, ts, event_id) — engine-exact, no
  // first()/last() arrival-order hazards. Bucket = 6-hour windows of
  // exact integer micros.
  private val M4BucketUs = 6L * 3600 * 1000000L

  def m4(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(
        col("event_type"),
        expr(s"timestamp_micros(unix_micros(ts) div $M4BucketUs * $M4BucketUs)")
          .as("bucket"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("v_first"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("v_last"),
        min(struct(col("value"), col("ts"), col("event_id")))
          .getField("value").as("v_min"),
        max(struct(col("value"), col("ts"), col("event_id")))
          .getField("value").as("v_max"),
        count(lit(1)).as("n"))
      .orderBy("event_type", "bucket")

  val m4Sql: String =
    s"""SELECT event_type,
       |  make_timestamp((epoch_us(ts) // $M4BucketUs) * $M4BucketUs) AS bucket,
       |  min({'t': ts, 'e': event_id, 'v': value}).v AS v_first,
       |  max({'t': ts, 'e': event_id, 'v': value}).v AS v_last,
       |  min({'v': value, 't': ts, 'e': event_id}).v AS v_min,
       |  max({'v': value, 't': ts, 'e': event_id}).v AS v_max,
       |  count(*) AS n
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY event_type, bucket""".stripMargin

  // --- q_t11_debounce -------------------------------------------------------
  // Per-key DEBOUNCE — keep an event only if ≥60s have passed since the
  // last KEPT event of the same user (the dedup rule for retry storms,
  // double-clicks, and chatty sensors). Debounce is inherently CHAINED
  // (whether an event survives depends on which earlier events
  // survived), so no window function expresses it; it is the per-key
  // ordered-fold shape (the q_tx_cdc_chunks accumulator pattern): sort
  // each user's (ts, id) stream, fold left keeping (last_kept_us,
  // kept_ids), explode the kept set. The fold runs ONCE per key with
  // O(events-per-key) working set — events shuffle once on user_id and
  // text/payloads never move. At 100 TB an unbounded key's history
  // doesn't fold in one task: the streaming form is the same rule as
  // keyed state (last_kept_us in a ValueState — the AnomalyProcessor
  // machinery), and the batch form slices per (key, day) with the
  // previous day's tail as carry-in. The DuckDB twin replays the
  // identical fold (acc type == element type per the list_reduce
  // contract: elements wrap as {'us', 'kept': [id]}).
  private val DebounceUs = 60L * 1000000L

  def debounce(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id").as("id")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        explode(aggregate(
          col("es"),
          struct(lit(-1000000000000000L).as("us"),
            array().cast("array<bigint>").as("kept")),
          (acc, e) => when(e.getField("us") - acc.getField("us") >= DebounceUs,
            struct(e.getField("us").as("us"),
              concat(acc.getField("kept"), array(e.getField("id"))).as("kept")))
            .otherwise(acc),
          acc => acc.getField("kept"))).as("event_id"))
      .orderBy("event_id")

  val debounceSql: String =
    s"""WITH RECURSIVE ordered AS (
       |  SELECT user_id, epoch_us(ts) AS us, event_id,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events),
       |walk AS (
       |  SELECT user_id, us, event_id, rn, us AS last_kept, TRUE AS kept
       |  FROM ordered WHERE rn = 1
       |  UNION ALL
       |  SELECT o.user_id, o.us, o.event_id, o.rn,
       |    CASE WHEN o.us - w.last_kept >= $DebounceUs
       |         THEN o.us ELSE w.last_kept END,
       |    o.us - w.last_kept >= $DebounceUs
       |  FROM ordered o JOIN walk w
       |    ON o.user_id = w.user_id AND o.rn = w.rn + 1)
       |SELECT user_id, event_id FROM walk WHERE kept
       |ORDER BY event_id""".stripMargin
  // (A list_reduce replay would be the natural twin, but DuckDB 1.0's
  // list_reduce silently DROPS list- and varchar-concat accumulator
  // fields — only scalar accumulator arithmetic folds correctly — so
  // the recursive-CTE walk is the deliberately different replay: all
  // users advance one step per iteration.)

  // --- q_t12_band_join ----------------------------------------------------
  // The NAIVE global band join — every error paired with every click
  // within ±2 minutes, NO key equality — written exactly the way a user
  // writes it (`between(t - w, t + w)`). Without help Spark can only
  // plan this as BroadcastNestedLoopJoin: an O(|L|·|R|) row-pair scan,
  // the planner trap q_t2_range_join hand-bucketed around. The injected
  // BandJoinRewrite rule (graft.plans) vectorizes the naive form
  // itself: bucket size w1+w2+1, three probe buckets generated on the
  // left, the join re-planned as an EQUI join on the bucket with the
  // band as residual — PlanSpec asserts nested-loop without the rule,
  // hash/sort-merge with it, identical results both ways, and this row
  // hash-verifies the rewritten plan's output.
  private val BandW = 120L * 1000000L // ±2 minutes, in epoch micros

  def bandJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("err_us"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("clk_id"), unix_micros(col("ts")).as("clk_us"))
    err.join(clk,
        col("err_us").between(col("clk_us") - BandW, col("clk_us") + BandW))
      .select(col("err_id"), col("clk_id"),
        (col("err_us") - col("clk_us")).as("delta_us"))
      .orderBy("err_id", "clk_id")
  }

  val bandJoinSql: String =
    s"""SELECT e.event_id AS err_id, c.event_id AS clk_id,
       |  epoch_us(e.ts) - epoch_us(c.ts) AS delta_us
       |FROM events e JOIN events c
       |  ON e.event_type = 'error' AND c.event_type = 'click'
       |  AND epoch_us(e.ts) BETWEEN epoch_us(c.ts) - $BandW
       |                         AND epoch_us(c.ts) + $BandW
       |ORDER BY err_id, clk_id""".stripMargin

  // --- q_t13_cusum ----------------------------------------------------------
  // Page's CUSUM changepoint detector (Page 1954, public) over daily
  // event-type counts — the drift alarm a pipeline runs on its own
  // ingest volumes. The textbook recursion C_t = max(0, C_{t-1} + x_t −
  // k) looks iterative, but with k = the series mean it unrolls into
  // pure window algebra: C_t = S_t − min(0, min_{i≤t} S_i) where S_t is
  // the prefix sum of (x_i − mean) — prefix-sum minus running-min, one
  // partition-local sort per series. Everything stays INTEGER via
  // cross-multiplication: S'_t = n·prefix_t − t·T (n days, T total
  // count) scales S by n, and the alarm C'_t > 4·n·mean ⇔ C'_t > 4·T
  // flags a cumulative excess of four daily means. No division, no
  // float, bit-exact in both engines at any scale.
  def cusum(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val wtot = Window.partitionBy("event_type")
    val word = Window.partitionBy("event_type").orderBy("day")
    val wrun = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(wtot))
      .withColumn("t_total", sum("x").over(wtot))
      .withColumn("t_idx", row_number().over(word).cast("bigint"))
      .withColumn("sp",
        col("n") * sum("x").over(wrun) - col("t_idx") * col("t_total"))
      // S_0 = 0 is a legal reset point: include it in the running min
      .withColumn("c", col("sp") - least(min("sp").over(wrun), lit(0L)))
      .select(col("event_type"), col("day"), col("x"),
        col("c").as("cusum_scaled"),
        when(col("c") > lit(4L) * col("t_total"), 1L).otherwise(0L)
          .as("alarm"))
      .orderBy("event_type", "day")
  }

  val cusumSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS MATERIALIZED (
      |  SELECT event_type, day, x,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS t_total,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
      |      AS BIGINT) AS t_idx,
      |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS prefix
      |  FROM daily),
      |sp AS MATERIALIZED (
      |  SELECT event_type, day, x, t_total,
      |    n * prefix - t_idx * t_total AS sp
      |  FROM st),
      |cs AS MATERIALIZED (
      |  SELECT event_type, day, x, t_total,
      |    sp - least(CAST(min(sp) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
      |      0) AS c
      |  FROM sp)
      |SELECT event_type, day, x, c AS cusum_scaled,
      |  CAST(CASE WHEN c > 4 * t_total THEN 1 ELSE 0 END AS BIGINT) AS alarm
      |FROM cs
      |ORDER BY event_type, day""".stripMargin

  // --- q_t14_mad ------------------------------------------------------------
  // ROBUST outlier detection via the Median Absolute Deviation — the
  // q_t8_seasonal screen's robust sibling: means/stddevs move with the
  // outliers they're hunting, medians don't. Composes the exact
  // selection machinery (Analytics.exactMedianOf) twice per series —
  // median of the daily counts, then median of |x − med| — so the
  // whole screen inherits the sort-free two-phase histogram plan, and
  // every comparison is INTEGER (dev > 3·mad; mad = 0 degenerates to
  // dev > 0 under the same formula). The oracle replays both medians
  // as full ranked sorts.
  //
  // Two selections stay SEPARATE deliberately (the "reuse pass 1's
  // histogram for pass 2" fusion was examined and rejected): the
  // deviation selection's value domain is |x − med|, and a bucket of
  // the x-histogram maps to a distance INTERVAL [dmin, dmax] around
  // med — left- and right-of-median buckets interleave on distance, so
  // no digest-only prefix locates the k-th deviation exactly. The
  // exact fallbacks both lose: widening pass C to every bucket
  // intersecting [med−T, med+T] makes the residual scan O(n/2) rows
  // (the standard walk's residual is O(n/4096) — that trade is a
  // scale-killer), and anything narrower forfeits exactness. What DOES
  // pay is pinning the daily digest as one partition (below): this
  // query moves ~13 KB of shuffle at sf0.1, so its cost is stage
  // latency × stage count, and one-task stages on the value-bounded
  // digest are the honest lever (measured 1.61 → 1.50 s best,
  // 2.0 → 1.5 s mean at sf0.1).
  def madOutliers(s: SparkSession, d: String): DataFrame = {
    // The daily digest is value-domain-bounded (|event types| × days —
    // ~300 rows at sf0.1, ~10^5-10^6 at any horizon), so it pins as ONE
    // partition: every downstream selection stage then runs one task
    // instead of 32, and this query's cost is pure stage latency (its
    // shuffle volume is ~13 KB). The events-grain aggregation BEFORE
    // the repartition keeps its full scan parallelism.
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .repartition(1)
      .localCheckpoint() // two selection passes + the final join read it
    val med = Analytics.exactMedianOfPinned(
        daily.select(col("event_type").as("g"), col("x").as("v")))
      .select(col("g").as("event_type"), col("median_cents").as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("x") - col("med")))
      .localCheckpoint()
    val mad = Analytics.exactMedianOfPinned(
        dev.select(col("event_type").as("g"), col("dev").as("v")))
      .select(col("g").as("event_type"), col("median_cents").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("x"), col("med"),
        col("mad"),
        when(col("dev") > col("mad") * 3, 1L).otherwise(0L)
          .as("is_outlier"))
      .orderBy("event_type", "day")
  }

  val madOutliersSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |med AS MATERIALIZED (
      |  SELECT event_type, v AS med FROM (
      |    SELECT event_type, x AS v,
      |      row_number() OVER (PARTITION BY event_type ORDER BY x) AS rk,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM daily) WHERE rk = (n + 1) // 2),
      |dev AS MATERIALIZED (
      |  SELECT d.event_type, d.day, d.x, m.med, abs(d.x - m.med) AS dev
      |  FROM daily d JOIN med m USING (event_type)),
      |mad AS MATERIALIZED (
      |  SELECT event_type, v AS mad FROM (
      |    SELECT event_type, dev AS v,
      |      row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rk,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM dev) WHERE rk = (n + 1) // 2)
      |SELECT d.event_type, d.day, d.x, d.med, m.mad,
      |  CAST(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_outlier
      |FROM dev d JOIN mad m USING (event_type)
      |ORDER BY event_type, day""".stripMargin

  // --- q_t15_ewma -----------------------------------------------------------
  // EXPONENTIALLY WEIGHTED MOVING AVERAGE smoothing + surge alarm — the
  // classic monitoring recursion E_t = α·x_t + (1−α)·E_{t−1} (seed
  // E_1 = x_1, α = 0.25 — an exact binary fraction, so every step is
  // one correctly-rounded multiply-add in BOTH engines). Unlike CUSUM
  // the recursion is linear but its closed form needs (1−α)^{-t}
  // weights that overflow doubles past ~10³ points, so the recursion
  // is kept AS a recursion — evaluated as a per-series sequential fold
  // (sort_array + aggregate-HOF with a struct-array accumulator) on
  // the Spark side and a WITH RECURSIVE day-walk in DuckDB: identical
  // operand order ⇒ identical bits, the same fold-parity discipline as
  // the vector ops. A point alarms when it exceeds 1.5× the PREVIOUS
  // smoothed level (lag — alarming against a level the point itself
  // already moved would mute every spike). Scale: the fold is
  // per-series (shard-parallel, series length = daily grain ⇒
  // thousands of points, bounded); the streaming twin of this screen
  // is the q_st_anomaly family's stateful form.
  def ewma(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val folded = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("pts"))
      .select(col("event_type"), expr(
        """aggregate(pts,
          |  cast(array() as array<struct<day:timestamp,x:bigint,ewma:double>>),
          |  (acc, p) -> array_append(acc, named_struct(
          |    'day', p.day, 'x', p.x,
          |    'ewma', CASE WHEN size(acc) = 0 THEN cast(p.x as double)
          |         ELSE 0.25D * p.x + 0.75D * element_at(acc, -1).ewma
          |    END)))""".stripMargin).as("walk"))
    folded
      .select(col("event_type"), explode(col("walk")).as("p"))
      .select(col("event_type"), col("p.day").as("day"),
        col("p.x").as("x"), col("p.ewma").as("ewma"))
      .withColumn("alarm",
        when(col("x") > lit(1.5) * lag("ewma", 1).over(
          Window.partitionBy("event_type").orderBy("day")), 1L)
          .otherwise(0L))
      .orderBy("event_type", "day")
  }

  val ewmaSql: String =
    """WITH RECURSIVE daily AS MATERIALIZED (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |numbered AS MATERIALIZED (
      |  SELECT event_type, day, x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM daily),
      |walk AS (
      |  SELECT event_type, day, x, rn, CAST(x AS DOUBLE) AS ewma
      |  FROM numbered WHERE rn = 1
      |  UNION ALL
      |  SELECT n.event_type, n.day, n.x, n.rn,
      |    CAST(0.25 AS DOUBLE) * n.x + CAST(0.75 AS DOUBLE) * w.ewma
      |  FROM numbered n JOIN walk w
      |    ON n.event_type = w.event_type AND n.rn = w.rn + 1)
      |SELECT event_type, day, x, ewma,
      |  CAST(CASE WHEN x > CAST(1.5 AS DOUBLE) *
      |      lag(ewma) OVER (PARTITION BY event_type ORDER BY day)
      |    THEN 1 ELSE 0 END AS BIGINT) AS alarm
      |FROM walk ORDER BY event_type, day""".stripMargin

  // --- q_t17_holt -----------------------------------------------------------
  // HOLT DOUBLE-EXPONENTIAL SMOOTHING — the forecasting step up from the
  // EWMA level tracker: a per-series (level, trend) pair
  //   L_t = α·x_t + (1−α)·(L_{t−1} + T_{t−1})
  //   T_t = β·(L_t − L_{t−1}) + (1−β)·T_{t−1}
  // (seeds L₁ = x₁, T₁ = 0; α = 0.5, β = 0.25 — both exact binary
  // fractions, so every step is correctly-rounded double arithmetic in
  // BOTH engines) plus the one-step-ahead forecast f = L + T that a
  // trending series' capacity alarm actually wants (EWMA lags a ramp by
  // construction; Holt's trend term closes that gap). Like EWMA the
  // recursion stays A RECURSION — per-series sequential fold
  // (sort_array + aggregate HOF carrying a (level, trend) accumulator)
  // on the Spark side, WITH RECURSIVE day-walk in DuckDB; identical
  // operand order ⇒ identical bits. The residual alarm flags
  // |x_t − f_{t−1}| > 0.5·f_{t−1} (50% forecast miss — scale-free, so
  // one threshold serves every series). Scale: per-series fold over
  // day-grain digests (bounded length), shard-parallel across series;
  // nothing data-proportional leaves its partition.
  def holt(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val folded = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("pts"))
      .select(col("event_type"), expr(
        """aggregate(pts,
          |  cast(array() as array<struct<day:timestamp,x:bigint,level:double,trend:double>>),
          |  (acc, p) -> array_append(acc, named_struct(
          |    'day', p.day, 'x', p.x,
          |    'level', CASE WHEN size(acc) = 0 THEN cast(p.x as double)
          |      ELSE 0.5D * p.x + 0.5D *
          |        (element_at(acc, -1).level + element_at(acc, -1).trend) END,
          |    'trend', CASE WHEN size(acc) = 0 THEN 0.0D
          |      ELSE 0.25D * ((0.5D * p.x + 0.5D *
          |          (element_at(acc, -1).level + element_at(acc, -1).trend))
          |            - element_at(acc, -1).level)
          |        + 0.75D * element_at(acc, -1).trend END)))""".stripMargin).as("walk"))
    val w = Window.partitionBy("event_type").orderBy("day")
    folded
      .select(col("event_type"), explode(col("walk")).as("p"))
      .select(col("event_type"), col("p.day").as("day"),
        col("p.x").as("x"), col("p.level").as("level"), col("p.trend").as("trend"))
      .withColumn("forecast", col("level") + col("trend"))
      .withColumn("prev_forecast", lag("forecast", 1).over(w))
      .withColumn("alarm",
        when(col("prev_forecast").isNotNull &&
          abs(col("x") - col("prev_forecast")) > lit(0.5) * col("prev_forecast"), 1L)
          .otherwise(0L))
      .drop("prev_forecast")
      .orderBy("event_type", "day")
  }

  val holtSql: String =
    """WITH RECURSIVE daily AS MATERIALIZED (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |numbered AS MATERIALIZED (
      |  SELECT event_type, day, x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM daily),
      |walk AS (
      |  SELECT event_type, day, x, rn,
      |    CAST(x AS DOUBLE) AS level, CAST(0.0 AS DOUBLE) AS trend
      |  FROM numbered WHERE rn = 1
      |  UNION ALL
      |  SELECT n.event_type, n.day, n.x, n.rn,
      |    CAST(0.5 AS DOUBLE) * n.x + CAST(0.5 AS DOUBLE) * (w.level + w.trend),
      |    CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * n.x
      |        + CAST(0.5 AS DOUBLE) * (w.level + w.trend)) - w.level)
      |      + CAST(0.75 AS DOUBLE) * w.trend
      |  FROM numbered n JOIN walk w
      |    ON n.event_type = w.event_type AND n.rn = w.rn + 1)
      |SELECT event_type, day, x, level, trend, level + trend AS forecast,
      |  CAST(CASE WHEN lag(level + trend) OVER
      |      (PARTITION BY event_type ORDER BY day) IS NOT NULL
      |    AND abs(x - lag(level + trend) OVER
      |      (PARTITION BY event_type ORDER BY day)) >
      |      CAST(0.5 AS DOUBLE) * lag(level + trend) OVER
      |      (PARTITION BY event_type ORDER BY day)
      |    THEN 1 ELSE 0 END AS BIGINT) AS alarm
      |FROM walk ORDER BY event_type, day""".stripMargin

  // --- q_t16_dow_volume -----------------------------------------------------
  // WEEKDAY-SEASONAL BASELINE + exact-integer z-score anomaly: the
  // screen that catches "this Tuesday is wild FOR A TUESDAY" where the
  // global MAD/CUSUM screens see only the overall level. Per
  // (event_type, weekday) the daily counts give n, S=Σx, Q=Σx² — all
  // BIGINT, so μ = S/n and z = (n·x − S)/√(n·Q − S²) are one exact
  // integer expression cast to double at the last step: identical
  // operands in both engines ⇒ identical bits, no variance-of-doubles
  // parity risk. The weekday index is pure date arithmetic
  // (days-since-epoch mod 7, 0 = Thursday) rather than each engine's
  // differently-anchored dayofweek(). Degenerate cells (constant
  // weekday history, n·Q = S²) define z = 0, never NaN. Scale: two
  // scan-shaped aggregations (day grain, then 7×types cells joined
  // back broadcast) — nothing holds more than the day-grain digest.
  private val SeasonalZ = 2.0

  def dowVolume(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("wd", pmod(datediff(col("day"), lit("1970-01-01")), lit(7)).cast("bigint"))
    val cells = daily.groupBy("event_type", "wd")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
    daily.join(broadcast(cells), Seq("event_type", "wd"))
      .select(col("event_type"), col("day"), col("x"), col("wd"),
        (col("s").cast("double") / col("n").cast("double")).as("seasonal_avg"),
        when(col("n") * col("q") > col("s") * col("s"),
          (col("n") * col("x") - col("s")).cast("double") /
            sqrt((col("n") * col("q") - col("s") * col("s")).cast("double")))
          .otherwise(lit(0.0)).as("z"))
      .withColumn("alarm",
        when(col("z") > lit(SeasonalZ), 1L).otherwise(0L))
      .orderBy("event_type", "day")
  }

  val dowVolumeSql: String =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    CAST(count(*) AS BIGINT) AS x,
       |    CAST((date_trunc('day', ts)::DATE - DATE '1970-01-01') % 7 AS BIGINT) AS wd
       |  FROM events GROUP BY 1, 2),
       |cells AS MATERIALIZED (
       |  SELECT event_type, wd, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS q
       |  FROM daily GROUP BY 1, 2)
       |SELECT d.event_type, d.day, d.x, d.wd,
       |  s::DOUBLE / n::DOUBLE AS seasonal_avg,
       |  CASE WHEN n * q > s * s
       |    THEN (n * d.x - s)::DOUBLE / sqrt((n * q - s * s)::DOUBLE)
       |    ELSE 0.0 END AS z,
       |  CAST(CASE WHEN (CASE WHEN n * q > s * s
       |      THEN (n * d.x - s)::DOUBLE / sqrt((n * q - s * s)::DOUBLE)
       |      ELSE 0.0 END) > $SeasonalZ THEN 1 ELSE 0 END AS BIGINT) AS alarm
       |FROM daily d JOIN cells c USING (event_type, wd)
       |ORDER BY event_type, day""".stripMargin

  // --- q_t18_changepoint ------------------------------------------------------
  // SINGLE CHANGEPOINT DETECTION per series (the first step of binary
  // segmentation / PELT): the split k of the daily-count series that
  // maximizes the between-segment SSE reduction gain(k) = S₁²/n₁ +
  // S₂²/n₂ − S²/n — the level-shift locator behind "when did this
  // event type's volume regime change". Candidate gains come from ONE
  // prefix-sum window over the per-(type, day) digest (day-grain, so
  // the window partition is bounded by the calendar, not the event
  // count); every S is an exact BIGINT, each candidate's gain is a
  // fixed-order double over decimal-cast squares, and the argmax is a
  // struct max over (1e-6-fixed gain, −k) — deterministic tie-break to
  // the EARLIEST split, no second pass, no collect. Output recomputes
  // the segment means from the exact integers the struct carries.
  def changepoint(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val wtot = Window.partitionBy("event_type")
    val word = Window.partitionBy("event_type").orderBy("day")
    val cand = daily
      .withColumn("dn", count(lit(1)).over(wtot))
      .withColumn("st", sum("x").over(wtot))
      .withColumn("k", row_number().over(word).cast("bigint"))
      .withColumn("s1", sum("x").over(
        word.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("k") < col("dn")) // split AFTER day k needs a right segment
      .withColumn("s2", col("st") - col("s1"))
      .withColumn("n2", col("dn") - col("k"))
      .withColumn("gain",
        (col("s1").cast("decimal(38,0)") * col("s1")).cast("double") /
          col("k").cast("double") +
          (col("s2").cast("decimal(38,0)") * col("s2")).cast("double") /
            col("n2").cast("double") -
          (col("st").cast("decimal(38,0)") * col("st")).cast("double") /
            col("dn").cast("double"))
    cand
      .groupBy("event_type")
      .agg(max(struct(
        round(col("gain") * 1e6).cast("long").as("gf"),
        (-col("k")).as("nk"), col("day").as("day"),
        col("s1").as("s1"), col("s2").as("s2"),
        col("n2").as("n2"), col("dn").as("dn"))).as("m"))
      .select(col("event_type"), col("m.dn").as("n_days"),
        (-col("m.nk")).as("split_k"), col("m.day").as("split_day"),
        (col("m.gf").cast("double") / 1e6).as("gain"),
        (col("m.s1").cast("double") / (-col("m.nk")).cast("double"))
          .as("mean_left"),
        (col("m.s2").cast("double") / col("m.n2").cast("double"))
          .as("mean_right"))
      .orderBy("event_type")
  }

  val changepointSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |pre AS MATERIALIZED (
      |  SELECT event_type, day, x,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS dn,
      |    CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS st,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
      |      AS BIGINT) AS k,
      |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS s1
      |  FROM daily),
      |cand AS MATERIALIZED (
      |  SELECT event_type, day, k, s1, st - s1 AS s2, dn - k AS n2, dn,
      |    CAST(CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE) / k::DOUBLE
      |      + CAST(CAST(st - s1 AS DECIMAL(38,0)) * (st - s1) AS DOUBLE)
      |        / (dn - k)::DOUBLE
      |      - CAST(CAST(st AS DECIMAL(38,0)) * st AS DOUBLE) / dn::DOUBLE
      |      AS gain
      |  FROM pre WHERE k < dn),
      |best AS MATERIALIZED (
      |  SELECT event_type,
      |    max({'gf': CAST(round(gain * 1e6) AS BIGINT), 'nk': -k,
      |         'day': day, 's1': s1, 's2': s2, 'n2': n2, 'dn': dn}) AS m
      |  FROM cand GROUP BY 1)
      |SELECT event_type, m.dn AS n_days,
      |  -m.nk AS split_k, m.day AS split_day,
      |  m.gf::DOUBLE / 1e6 AS gain,
      |  m.s1::DOUBLE / (-m.nk)::DOUBLE AS mean_left,
      |  m.s2::DOUBLE / m.n2::DOUBLE AS mean_right
      |FROM best ORDER BY event_type""".stripMargin

  // --- q_t19_rolling_corr -----------------------------------------------------
  // 7-DAY ROLLING PEARSON between the click and purchase daily series —
  // the co-movement monitor behind "did the conversion relationship
  // break this week". The two series pivot out of ONE day-grain
  // conditional aggregation; all five correlation moments are exact
  // BIGINT window sums over the 7-row frame, and r is the fixed-order
  // double tree with the linreg-style degenerate guards (a flat window
  // on either side → 0.0, not NaN). The frame windows run over the
  // calendar-bounded day digest; first 6 days emit with their partial
  // frames (n < 7 rides the same formula).
  def rollingCorr(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("cxx", (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double"))
      .withColumn("cyy", (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double"))
      .select(col("day"), col("n"), col("x").as("clicks"),
        col("y").as("purchases"),
        when(col("cxx") > 0.0 && col("cyy") > 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(col("cxx") * col("cyy"))).otherwise(lit(0.0)).as("corr"))
      .orderBy("day")
  }

  val rollingCorrSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT date_trunc('day', ts) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |win AS MATERIALIZED (
      |  SELECT day, x, y,
      |    CAST(count(*) OVER w AS BIGINT) AS n,
      |    CAST(sum(x) OVER w AS BIGINT) AS sx,
      |    CAST(sum(y) OVER w AS BIGINT) AS sy,
      |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
      |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
      |    CAST(sum(y * y) OVER w AS BIGINT) AS syy
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |calc AS MATERIALIZED (
      |  SELECT day, n, x, y, sxy, sx, sy,
      |    (n * sxx - sx * sx)::DOUBLE AS cxx,
      |    (n * syy - sy * sy)::DOUBLE AS cyy
      |  FROM win)
      |SELECT day, n, x AS clicks, y AS purchases,
      |  CASE WHEN cxx > 0.0 AND cyy > 0.0
      |    THEN (n * sxy - sx * sy)::DOUBLE / sqrt(cxx * cyy)
      |    ELSE 0.0 END AS corr
      |FROM calc ORDER BY day""".stripMargin

  // --- q_t20_acf --------------------------------------------------------------
  // AUTOCORRELATION FUNCTION (lags 1–7) of each event type's daily
  // series — the seasonality detector feeding the q_t8 day-of-week
  // screen (a weekly cycle shows as an ACF spike at lag 7). Lagged
  // pairs come from seven LEADs over one series-key window pass (never
  // a self-join on day arithmetic); the per-type moments (n, S, Q)
  // broadcast back, each pair's centered product is a fixed-order
  // double over exact integers re-rounded at 1e-9, and r_k divides by
  // the full-series centered sum of squares (the standard ACF
  // denominator). Day-grain digest throughout.
  def acf(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val wd = Window.partitionBy("event_type").orderBy("day")
    val lagged = daily.select(
      col("event_type") +: col("x").as("x0") +:
        (1 to 7).map(k => lead("x", k).over(wd).as(s"x$k")): _*)
      .localCheckpoint() // one pass feeds all 7 lag aggregates + moments
    val m = lagged.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x0")).as("ssum"),
        sum((col("x0") * col("x0")).cast("decimal(38,0)")).as("q"))
      .withColumn("xbar", col("ssum").cast("double") / col("n").cast("double"))
      .withColumn("den",
        col("q").cast("double") - col("n").cast("double") *
          col("xbar") * col("xbar"))
    val perLag = (1 to 7).map { k =>
      lagged.join(broadcast(m), "event_type")
        .filter(col(s"x$k").isNotNull)
        .groupBy(col("event_type"), lit(k.toLong).as("lag"))
        .agg(sum(round(((col("x0").cast("double") - col("xbar")) *
          (col(s"x$k").cast("double") - col("xbar"))) * 1e9).cast("long"))
          .as("num9"), max(col("den")).as("den"))
        .select(col("event_type"), col("lag"),
          when(col("den") > 0.0,
            col("num9").cast("double") / 1e9 / col("den"))
            .otherwise(lit(0.0)).as("acf"))
    }
    perLag.reduce(_ unionByName _).orderBy("event_type", "lag")
  }

  val acfSql: String = {
    val leadCols = (1 to 7).map(k => s"lead(x, $k) OVER wd AS x$k")
      .mkString(",\n      |    ")
    val lagSelects = (1 to 7).map { k =>
      s"""SELECT l.event_type, CAST($k AS BIGINT) AS lag,
         |  CASE WHEN m.den > 0.0 THEN
         |    CAST(sum(CAST(round((l.x0::DOUBLE - m.xbar)
         |      * (l.x$k::DOUBLE - m.xbar) * 1e9) AS BIGINT)) AS BIGINT)::DOUBLE
         |      / 1e9 / m.den
         |    ELSE 0.0 END AS acf
         |FROM lagged l JOIN m ON l.event_type = m.event_type
         |WHERE l.x$k IS NOT NULL
         |GROUP BY l.event_type, m.den""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH daily AS MATERIALIZED (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |lagged AS MATERIALIZED (
       |  SELECT event_type, x AS x0,
       |    $leadCols
       |  FROM daily
       |  WINDOW wd AS (PARTITION BY event_type ORDER BY day)),
       |m AS MATERIALIZED (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x0) AS BIGINT) AS ssum,
       |    sum(CAST(x0 * x0 AS DECIMAL(38,0))) AS q,
       |    CAST(sum(x0) AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE
       |      AS xbar,
       |    CAST(sum(CAST(x0 * x0 AS DECIMAL(38,0))) AS DOUBLE)
       |      - CAST(count(*) AS BIGINT)::DOUBLE
       |        * (CAST(sum(x0) AS BIGINT)::DOUBLE
       |           / CAST(count(*) AS BIGINT)::DOUBLE)
       |        * (CAST(sum(x0) AS BIGINT)::DOUBLE
       |           / CAST(count(*) AS BIGINT)::DOUBLE) AS den
       |  FROM lagged GROUP BY 1)
       |$lagSelects
       |ORDER BY event_type, lag""".stripMargin
  }

  // --- q_t21_theil_sen --------------------------------------------------------
  // THEIL–SEN ROBUST TREND per series — the median of all pairwise
  // slopes of the daily-count series, the estimator that shrugs off
  // the outliers OLS (q_ag_linreg) chases. Pairs live at DAY-DIGEST
  // grain (the calendar bounds them at any corpus size): the digest
  // self-joins on i < j, each slope is ONE correctly-rounded divide of
  // exact integers (bit-identical cross-engine) quantized at 1e-9 into
  // the value domain, and the median is the SAME distributed selection
  // core as q_ag_exact_median (Analytics.selectAtRanks — the two-phase
  // histogram walk, no sort, no collect), composing at a third grain
  // after prices and deviations. Lower-median convention throughout.
  def theilSen(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val idx = daily
      .withColumn("i", row_number()
        .over(Window.partitionBy("event_type").orderBy("day")).cast("long"))
      .select("event_type", "i", "x")
      .localCheckpoint() // both sides of the pair join read it
    val pairs = idx.as("a").join(idx.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.i") < col("b.i"))
      .select(col("a.event_type").as("g"),
        round((col("b.x") - col("a.x")).cast("double") /
          (col("b.i") - col("a.i")).cast("double") * 1e9).cast("long")
          .as("v"))
      // PIN before the selection walk: selectAtRanks reads its input in
      // three self-referencing passes, and an UNPINNED self-join-derived
      // frame trips Spark's self-join attribute dedup into mis-bound
      // branch columns (observed as a runtime v DIV gw=0) — the same
      // contract exactMedianOf enforces by checkpointing its input.
      .localCheckpoint()
    Analytics.selectAtRanks(pairs, Seq(("m", 1L, 2L)))
      .select(col("g").as("event_type"), col("n").as("n_pairs"),
        (col("value_cents").cast("double") / 1e9).as("slope"))
      .orderBy("event_type")
  }

  val theilSenSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |idx AS MATERIALIZED (
      |  SELECT event_type,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
      |      AS BIGINT) AS i, x
      |  FROM daily),
      |pairs AS MATERIALIZED (
      |  SELECT a.event_type AS g,
      |    CAST(round((b.x - a.x)::DOUBLE / (b.i - a.i)::DOUBLE * 1e9)
      |      AS BIGINT) AS v
      |  FROM idx a JOIN idx b
      |    ON a.event_type = b.event_type AND a.i < b.i),
      |med AS MATERIALIZED (
      |  SELECT g, n, v FROM (
      |    SELECT g, v,
      |      row_number() OVER (PARTITION BY g ORDER BY v) AS rk,
      |      CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
      |    FROM pairs) WHERE rk = (n + 1) // 2)
      |SELECT g AS event_type, n AS n_pairs, v::DOUBLE / 1e9 AS slope
      |FROM med ORDER BY event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_t21_theil_sen" -> (theilSen _),
    "q_t22_seasonal_strength" -> (seasonalStrength _),
    "q_t23_mase" -> (mase _),
    "q_t24_conformal" -> (conformal _),
    "q_t19_rolling_corr" -> (rollingCorr _),
    "q_t20_acf" -> (acf _),
    "q_t18_changepoint" -> (changepoint _),
    "q_t14_mad" -> (madOutliers _),
    "q_t15_ewma" -> (ewma _),
    "q_t17_holt" -> (holt _),
    "q_t16_dow_volume" -> (dowVolume _),
    "q_t13_cusum" -> (cusum _),
    "q_t12_band_join" -> (bandJoin _),
    "q_t11_debounce" -> (debounce _),
    "q_t10_m4" -> (m4 _),
    "q_t9_concurrency" -> (concurrency _),
    "q_t8_seasonal" -> (seasonal _),
    "q_t1_asof_join" -> (asofJoin _),
    "q_t2_range_join" -> (rangeJoin _),
    "q_t3_gapfill" -> (gapfill _),
    "q_t4_sessionize" -> (sessionize _),
    "q_t5_moving" -> (moving _),
    "q_t6_session_window" -> (sessionWindow _),
    "q_t7_resample" -> (resample _))

  val oracles: Map[String, String] = Map(
    "q_t21_theil_sen" -> theilSenSql,
    "q_t22_seasonal_strength" -> seasonalStrengthSql,
    "q_t23_mase" -> maseSql,
    "q_t24_conformal" -> conformalSql,
    "q_t19_rolling_corr" -> rollingCorrSql,
    "q_t20_acf" -> acfSql,
    "q_t18_changepoint" -> changepointSql,
    "q_t14_mad" -> madOutliersSql,
    "q_t15_ewma" -> ewmaSql,
    "q_t17_holt" -> holtSql,
    "q_t16_dow_volume" -> dowVolumeSql,
    "q_t13_cusum" -> cusumSql,
    "q_t12_band_join" -> bandJoinSql,
    "q_t11_debounce" -> debounceSql,
    "q_t10_m4" -> m4Sql,
    "q_t9_concurrency" -> concurrencySql,
    "q_t8_seasonal" -> seasonalSql,
    "q_t1_asof_join" -> asofJoinSql,
    "q_t2_range_join" -> rangeJoinSql,
    "q_t3_gapfill" -> gapfillSql,
    "q_t4_sessionize" -> sessionizeSql,
    "q_t5_moving" -> movingSql,
    "q_t6_session_window" -> sessionWindowSql,
    "q_t7_resample" -> resampleSql)
}
