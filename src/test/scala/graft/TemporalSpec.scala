package graft

import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Temporal}

/** Golden-case specs for the temporal/analytics operator families (the
  * DuckDB oracle at sf0.01 is the primary gate; these pin the semantics
  * on readable micro-cases so a refactor can't silently change meaning).
  */
class TemporalSpec extends SparkSpec {

  test("asof join picks latest error at-or-before each click, ties by event_id") {
    val df = Temporal.asofJoin(spark, sf)
    // every err_ts must be <= its click ts
    assert(df.filter(col("err_ts") > col("ts")).count() === 0)
    // clicks with no prior error have null err_ts and err_value together
    assert(df.filter(col("err_ts").isNull =!= col("err_value").isNull).count() === 0)
    assert(df.count() > 0)
  }

  test("range join counts are never negative and bounded by user click totals") {
    val rj = Temporal.rangeJoin(spark, sf)
    assert(rj.filter(col("n_recent_clicks") < 0).count() === 0)
    val maxClicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy("user_id").count().agg(max("count")).head.getLong(0)
    assert(rj.agg(max("n_recent_clicks")).head.getLong(0) <= maxClicks)
  }

  test("gapfill grid is dense per user (one row per hour, no gaps)") {
    val gf = Temporal.gapfill(spark, sf).cache()
    try {
      val perUser = gf.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          ((unix_micros(max(col("hour"))) - unix_micros(min(col("hour")))) /
            3600000000L + 1).as("expect"))
      assert(perUser.filter(col("n") =!= col("expect")).count() === 0)
    } finally gf.unpersist()
  }

  test("sessionize: session bounds ordered, counts sum to event total") {
    val ss = Temporal.sessionize(spark, sf).cache()
    try {
      assert(ss.filter(col("session_end") < col("session_start")).count() === 0)
      val total = ss.agg(sum("n_events")).head.getLong(0)
      assert(total === Tables.events(spark, sf).count())
    } finally ss.unpersist()
  }

  test("concurrency sweep matches a brute-force instant scan of the sessions") {
    val days = Temporal.concurrency(spark, sf).collect()
    assert(days.nonEmpty)
    // brute force: collect the (small at sf0.001) session intervals and,
    // for every day, evaluate concurrency at each session start instant
    // within the day plus the day start — the max over those probe
    // points equals the sweep max (counts only change at starts)
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val sess = Temporal.sessionize(spark, sf).collect().map { r =>
      (us(r.getAs[java.sql.Timestamp]("session_start")),
        us(r.getAs[java.sql.Timestamp]("session_end")))
    }
    val dayUs = 86400000000L
    for (row <- days) {
      val d0 = us(row.getAs[java.sql.Timestamp]("day"))
      val d1 = d0 + dayUs - 1
      val touching = sess.filter { case (s, e) => s <= d1 && e >= d0 }
      assert(row.getAs[Long]("n_sessions") === touching.length.toLong)
      val probes = (touching.map(_._1.max(d0)) :+ d0).distinct
      val brute = probes.map(p =>
        touching.count { case (s, e) => s <= p && e >= p }).max
      assert(row.getAs[Long]("max_concurrent") === brute.toLong,
        s"sweep max diverges from brute force on day $d0")
    }
  }

  test("M4 buckets keep exactly the first/last/min/max points per series bucket") {
    val got = Temporal.m4(spark, sf).collect()
    assert(got.nonEmpty)
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val bucketUs = 6L * 3600 * 1000000L
    val rows = Tables.events(spark, sf)
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), us(r.getTimestamp(1)), r.getLong(2), r.getDouble(3)))
    val grouped = rows.groupBy(r => (r._1, r._2 / bucketUs * bucketUs))
    assert(got.length === grouped.size)
    for (g <- got) {
      val pts = grouped((g.getAs[String]("event_type"),
        us(g.getAs[java.sql.Timestamp]("bucket"))))
      assert(g.getAs[Double]("v_first") === pts.minBy(p => (p._2, p._3))._4)
      assert(g.getAs[Double]("v_last") === pts.maxBy(p => (p._2, p._3))._4)
      assert(g.getAs[Double]("v_min") === pts.map(_._4).min)
      assert(g.getAs[Double]("v_max") === pts.map(_._4).max)
      assert(g.getAs[Long]("n") === pts.length.toLong)
    }
  }

  test("transition probabilities normalize per state and count every adjacent pair") {
    val rows = Analytics.transitions(spark, sf).collect()
    assert(rows.nonEmpty)
    for ((_, rs) <- rows.groupBy(_.getAs[String]("from_type"))) {
      val mass = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"row mass drifted: $mass")
    }
    // exactly one pair per event except each user's last
    val totalPairs = rows.map(_.getAs[Long]("n")).sum
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(totalPairs === nEvents - nUsers)
  }

  test("CUSUM alarms on a planted level shift, stays quiet on the flat prefix") {
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum").toString
    // 'shift': 20 days at 10 events/day then 10 days at 30/day (mean
    // 500/30 ≈ 16.7; each post-shift day adds ~13.3 excess, so the
    // 4-mean threshold ≈ 66.7 excess trips on the 5th-6th shifted day).
    // 'flat': 30 days at 10/day — zero excess, never alarms.
    def t(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    var id = 0L
    val rows = (0 until 30).flatMap { day =>
      val nShift = if (day < 20) 10 else 30
      (0 until nShift).map { i => id += 1; (id, t(day, i), 1L, "shift", 1.0, "{}") } ++
        (0 until 10).map { i => id += 1; (id, t(day, i), 1L, "flat", 1.0, "{}") }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Temporal.cusum(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("day"), r.getAs[Long]("alarm")))
    val flat = out.filter(_._1 == "flat")
    assert(flat.length === 30 && flat.forall(_._3 == 0L), "flat series must not alarm")
    val shift = out.filter(_._1 == "shift").sortBy(_._2.getTime)
    assert(shift.take(20).forall(_._3 == 0L), "no alarm before the shift")
    val firstAlarm = shift.indexWhere(_._3 == 1L)
    assert(firstAlarm >= 20 && firstAlarm <= 26,
      s"alarm should fire within days of the shift, got index $firstAlarm")
    assert(shift.drop(firstAlarm.max(0)).forall(_._3 == 1L),
      "a sustained shift keeps the alarm latched")
  }

  test("MAD outliers: a planted spike flags, ordinary noise stays quiet, constant series degenerate") {
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    def t(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    var id = 0L
    // 'spiky': counts 10,11,12 cycling (med 11, mad 1) with one day at
    // 40 — dev 29 > 3 → outlier; the cycling days never exceed 3.
    // 'const': identical counts → mad = 0, dev = 0 → no outlier under
    // the same dev > 3·mad formula.
    val rows = (0 until 15).flatMap { day =>
      val n = if (day == 7) 40 else 10 + day % 3
      (0 until n).map { i => id += 1; (id, t(day, i), 1L, "spiky", 1.0, "{}") } ++
        (0 until 10).map { i => id += 1; (id, t(day, i), 1L, "const", 1.0, "{}") }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Temporal.madOutliers(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("x"),
        r.getAs[Long]("med"), r.getAs[Long]("mad"), r.getAs[Long]("is_outlier")))
    val spiky = out.filter(_._1 == "spiky")
    assert(spiky.count(_._5 == 1L) === 1, s"exactly the spike flags: $spiky")
    assert(spiky.find(_._5 == 1L).get._2 === 40L)
    val const = out.filter(_._1 == "const")
    assert(const.forall(t => t._4 == 0L && t._5 == 0L),
      "constant series: mad 0, nothing flagged")
  }

  test("debounce chains on KEPT events, not on raw predecessors") {
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-db").toString
    def t(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    // user 7: 0s kept; 30s dropped (<60 after 0); 89s KEPT — 89s is only
    // 59s after the raw predecessor (a lag-based rule would drop it) but
    // 89s after the last KEPT event, which is the debounce contract
    Seq(
      (1L, t(0), 7L, "view", 1.0, "{}"),
      (2L, t(30), 7L, "view", 1.0, "{}"),
      (3L, t(89), 7L, "view", 1.0, "{}"),
      (4L, t(10), 8L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val kept = Temporal.debounce(spark, dir).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(kept === Set(1L, 3L, 4L))
  }

  test("snapshot diff assigns all four fates on a constructed pair") {
    import ss.implicits._
    val a = Seq((1L, "view", 100L), (2L, "view", 200L), (3L, "view", 300L))
      .toDF("user_id", "event_type", "cents")
    val b = Seq((1L, "view", 100L), (2L, "view", 250L), (4L, "view", 400L))
      .toDF("user_id", "event_type", "cents")
    val got = Analytics.diffOf(a, b).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("fate"))).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // and the driver query exercises sparsity for real: multiple fates
    val fates = Analytics.snapshotDiff(spark, sf).collect()
      .map(_.getAs[String]("fate")).toSet
    assert(fates.contains("added") || fates.contains("removed"),
      s"day-narrow snapshots must produce presence changes, got $fates")
  }

  test("rollup adds per-flag subtotals and a grand total") {
    val r = Analytics.rollup(spark, sf).cache()
    try {
      val grand = r.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      assert(grand.count() === 1)
      assert(grand.head.getAs[Long]("n_rows") ===
        Tables.lineitem(spark, sf).count())
      // per-flag subtotal rows exist (status null, flag not)
      assert(r.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNull).count() > 0)
    } finally r.unpersist()
  }

  test("pivot counts match groupBy totals") {
    val p = Analytics.pivotCounts(spark, sf)
    val totals = p.agg(
      sum(col("n_click") + col("n_error") + col("n_purchase") +
        col("n_signup") + col("n_view"))).head.getLong(0)
    assert(totals === Tables.events(spark, sf).count())
  }

  test("approx distinct: the in-plan 3σ bound holds on every group") {
    val a = Analytics.approxDistinct(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Boolean]("within_3rsd")),
      a.filterNot(_.getAs[Boolean]("within_3rsd")).mkString(", "))
  }

  test("approx percentile: the in-plan rank-ε bound holds on every group") {
    val a = Analytics.approxPercentile(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Boolean]("within_rank_eps")),
      a.filterNot(_.getAs[Boolean]("within_rank_eps")).mkString(", "))
  }

  test("mase: test/train seasonal-naive error sums replay a brute per-type recompute") {
    val rows = Temporal.mase(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        date_trunc("day", col("ts")).as("day")).collect()
      .map(x => (x.getString(0), x.getTimestamp(1)))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .toSeq
    val byType = daily.groupBy(_._1)
    assert(rows.length === byType.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = byType(t).sortBy(_._2.getTime).map(_._3).toIndexedSeq
      val n = xs.length
      assert(r.getAs[Long]("n_days") === n.toLong)
      val errs = xs.indices.map(i => if (i >= 7) Some(math.abs(xs(i) - xs(i - 7))) else None)
      val test = errs.drop(n - 7).flatten.sum
      val train = errs.take(n - 7).flatten.sum
      val terms = errs.take(n - 7).count(_.isDefined).toLong
      assert(r.getAs[Long]("test_abs_err") === test, s"$t test")
      assert(r.getAs[Long]("train_abs_err") === train, s"$t train")
      assert(r.getAs[Long]("n_train_terms") === terms, s"$t terms")
      val mase = (BigInt(test) * terms).toDouble / (BigInt(train) * 7).toDouble
      assert(math.abs(r.getAs[Double]("mase") - mase) < 1e-12, s"$t mase")
      assert(r.getAs[Double]("mase") >= 0.0)
    }
  }

  test("conformal: the rank pick and holdout coverage replay a brute recompute") {
    val rows = Temporal.conformal(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        date_trunc("day", col("ts")).as("day")).collect()
      .map(x => (x.getString(0), x.getTimestamp(1)))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .toSeq
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val series = daily.filter(_._1 == t).sortBy(_._2.getTime)
      val xs = series.map(_._3).toIndexedSeq
      val days = series.map(_._2).toIndexedSeq
      val n = xs.length
      // (err, day) for every lag-7 row, calibration = all but last 7
      val errs = (7 until n).map(i => (math.abs(xs(i) - xs(i - 7)), days(i), i))
      val cal = errs.filter { case (_, _, i) => i < n - 7 }
        .sortBy { case (e, d, _) => (e, d.getTime) }
      val k = math.ceil((cal.length + 1) * 8.0 / 10.0).toLong
      val qhat = cal(math.min(k, cal.length.toLong).toInt - 1)._1
      assert(r.getAs[Long]("n_cal") === cal.length.toLong)
      assert(r.getAs[Long]("k") === k)
      assert(r.getAs[Long]("qhat") === qhat, s"$t qhat")
      val test = errs.filter { case (_, _, i) => i >= n - 7 }
      val covered = test.count(_._1 <= qhat).toLong
      assert(r.getAs[Long]("n_test") === test.length.toLong)
      assert(r.getAs[Long]("n_covered") === covered)
      assert(math.abs(r.getAs[Double]("coverage") -
        covered.toDouble / test.length) < 1e-12)
      // split-conformal's point: realized coverage should sit at or
      // above (1 − α) up to the ±1/n_test discretization of 7 test days
      assert(r.getAs[Double]("coverage") >= 0.8 - 1.0 / test.length - 1e-9,
        s"$t coverage ${r.getAs[Double]("coverage")}")
    }
  }

  test("weekday volume: z-scores sum to zero per cell, alarms match the threshold, constants are quiet") {
    val rows = Temporal.dowVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getAs[Long]("alarm") === 1L) === (r.getAs[Double]("z") > 2.0))
      assert(r.getAs[Long]("wd") >= 0L && r.getAs[Long]("wd") <= 6L)
    }
    rows.groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("wd")))
      .foreach { case ((et, wd), rs) =>
        val xs = rs.map(_.getAs[Long]("x"))
        val mu = xs.sum.toDouble / xs.length
        assert(math.abs(rs.head.getAs[Double]("seasonal_avg") - mu) < 1e-9,
          s"$et/$wd seasonal mean off")
        // z numerators are n·x − S: they sum to exactly zero per cell
        if (xs.distinct.length == 1)
          assert(rs.forall(_.getAs[Double]("z") === 0.0),
            s"$et/$wd constant cell must be quiet")
        else
          assert(math.abs(rs.map(_.getAs[Double]("z")).sum) < 1e-9,
            s"$et/$wd z-scores don't center")
      }
  }

  test("Holt: exact sequential recompute, trend seeds at zero, forecast = level + trend") {
    val rows = Temporal.holt(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val seq = rs.sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
      // exact scalar replay of the recursion — same operand order
      var level = 0.0; var trend = 0.0; var first = true
      var prevForecast = Double.NaN
      seq.foreach { r =>
        val x = r.getAs[Long]("x").toDouble
        if (first) { level = x; trend = 0.0; first = false }
        else {
          val nl = 0.5 * x + 0.5 * (level + trend)
          trend = 0.25 * (nl - level) + 0.75 * trend
          level = nl
        }
        assert(r.getAs[Double]("level") === level, s"$et: level bits moved")
        assert(r.getAs[Double]("trend") === trend, s"$et: trend bits moved")
        assert(r.getAs[Double]("forecast") ===
          r.getAs[Double]("level") + r.getAs[Double]("trend"), s"$et: forecast")
        val alarm = r.getAs[Long]("alarm")
        if (prevForecast.isNaN) assert(alarm === 0L, s"$et: no alarm at seed")
        else assert((alarm === 1L) ===
          (math.abs(x - prevForecast) > 0.5 * prevForecast), s"$et: alarm rule")
        prevForecast = level + trend
      }
    }
  }

  test("EWMA: seeds at the first point, stays inside the running hull, alarms only on 1.5x surges") {
    val rows = Temporal.ewma(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val seq = rs.sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
      assert(seq.head.getAs[Double]("ewma") ===
        seq.head.getAs[Long]("x").toDouble, s"$et: seed must equal x_1")
      assert(seq.head.getAs[Long]("alarm") === 0L, s"$et: no alarm at seed")
      // convexity: each smoothed value lies between the running min and
      // max of the series so far (a weighted average cannot escape)
      var lo = Double.MaxValue; var hi = Double.MinValue
      var prev = Double.NaN
      seq.foreach { r =>
        val x = r.getAs[Long]("x").toDouble
        lo = math.min(lo, x); hi = math.max(hi, x)
        val e = r.getAs[Double]("ewma")
        assert(e >= lo - 1e-9 && e <= hi + 1e-9, s"$et: ewma escaped hull")
        val alarm = r.getAs[Long]("alarm")
        if (!prev.isNaN)
          assert((alarm === 1L) === (x > 1.5 * prev), s"$et: alarm rule")
        prev = e
      }
    }
  }

  test("changepoint: split equals the brute argmax of SSE gain per series") {
    val rows = Temporal.changepoint(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("day"),
        r.getAs[Long]("x")))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = daily.filter(_._1 == et).sortBy(_._2.getTime).map(_._3)
      val dn = xs.length
      assert(r.getAs[Long]("n_days") === dn.toLong, s"$et days")
      val st = xs.sum
      val tot = (BigInt(st) * BigInt(st)).toDouble / dn
      // brute: every split k, same 1e-6 fixed-point argmax as the engine
      val gains = (1 until dn).map { k =>
        val s1 = xs.take(k).sum
        val s2 = st - s1
        val g = (BigInt(s1) * BigInt(s1)).toDouble / k +
          (BigInt(s2) * BigInt(s2)).toDouble / (dn - k) - tot
        (math.round(g * 1e6), k)
      }
      val (bgf, bk) = gains.maxBy { case (gf, k) => (gf, -k) }
      assert(r.getAs[Long]("split_k") === bk.toLong, s"$et split")
      assert(math.abs(r.getAs[Double]("gain") - bgf / 1e6) < 1e-9, s"$et gain")
      val ml = xs.take(bk).sum.toDouble / bk
      val mr = (st - xs.take(bk).sum).toDouble / (dn - bk)
      assert(math.abs(r.getAs[Double]("mean_left") - ml) < 1e-9, s"$et ml")
      assert(math.abs(r.getAs[Double]("mean_right") - mr) < 1e-9, s"$et mr")
      assert(r.getAs[Double]("gain") >= -1e-6, s"$et gain nonneg")
    }
  }

  test("rolling corr: every frame equals a brute 7-day Pearson; bounded in [-1,1]") {
    val rows = Temporal.rollingCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = rows.map(r => (r.getAs[java.sql.Timestamp]("day").getTime,
      r.getAs[Long]("clicks"), r.getAs[Long]("purchases"))).sortBy(_._1)
    rows.foreach { r =>
      val t = r.getAs[java.sql.Timestamp]("day").getTime
      val idx = daily.indexWhere(_._1 == t)
      val frame = daily.slice(math.max(0, idx - 6), idx + 1)
      assert(r.getAs[Long]("n") === frame.length.toLong)
      val n = frame.length.toDouble
      val (sx, sy) = (frame.map(_._2).sum.toDouble, frame.map(_._3).sum.toDouble)
      val sxy = frame.map(p => p._2 * p._3).sum.toDouble
      val sxx = frame.map(p => p._2 * p._2).sum.toDouble
      val syy = frame.map(p => p._3 * p._3).sum.toDouble
      val (cxx, cyy) = (n * sxx - sx * sx, n * syy - sy * sy)
      val brute = if (cxx > 0 && cyy > 0)
        (n * sxy - sx * sy) / math.sqrt(cxx * cyy) else 0.0
      val got = r.getAs[Double]("corr")
      assert(math.abs(got - brute) < 1e-9, s"day $t: $got vs $brute")
      assert(got >= -1.0 - 1e-12 && got <= 1.0 + 1e-12)
    }
  }

  test("acf: lag-k autocorrelations equal a brute centered-product replay") {
    val rows = Temporal.acf(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("day").getTime,
        r.getAs[Long]("x")))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val k = r.getAs[Long]("lag").toInt
      val xs = daily.filter(_._1 == et).sortBy(_._2).map(_._3.toDouble)
      val xbar = xs.sum / xs.length
      val den = xs.map(x => x * x).sum - xs.length * xbar * xbar
      val num = (0 until xs.length - k)
        .map(i => math.round((xs(i) - xbar) * (xs(i + k) - xbar) * 1e9))
        .sum / 1e9
      val brute = if (den > 0) num / den else 0.0
      val got = r.getAs[Double]("acf")
      assert(math.abs(got - brute) < 1e-9, s"$et lag $k: $got vs $brute")
      assert(got >= -1.0 - 1e-9 && got <= 1.0 + 1e-9, s"$et lag $k range")
    }
    // every (type, lag 1..7) pair with enough days must be present
    assert(rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("lag"))).distinct.length === rows.length)
  }

  test("theil-sen: slope equals the brute median of quantized pairwise slopes") {
    val rows = Temporal.theilSen(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("day").getTime,
        r.getAs[Long]("x")))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      val slopes = (for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield math.round((xs(j) - xs(i)).toDouble / (j - i) * 1e9)).sorted
      assert(r.getAs[Long]("n_pairs") === slopes.length.toLong, s"$et pairs")
      val lower = slopes((slopes.length + 1) / 2 - 1) // lower median
      assert(math.abs(r.getAs[Double]("slope") - lower / 1e9) < 1e-12,
        s"$et slope")
    }
  }
}
