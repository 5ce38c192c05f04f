package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import graft.queries.Relational

  test("EVERY registered query has an oracle — no exemptions remain") {
    // The former sketch exemptions (approx_distinct / approx_percentile /
    // heavy_hitters) now oracle their documented error BOUNDS in-plan,
    // so the exempt set is gone: a query registered without an oracle
    // entry is a regression, full stop.
    SparkEntry.queries.keys.foreach { name =>
      assert(SparkEntry.oracleSql.contains(name),
        s"$name has no oracle entry")
    }
    // and no orphan oracles either (a typo'd key would verify nothing)
    SparkEntry.oracleSql.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name),
        s"oracle $name has no registered query")
    }
  }

  test("flagship page respects filters, ordering and pagination") {
    val df = Relational.flagshipPage(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("c_mktsegment") == "BUILDING"))
    // o_orderdate is TIMESTAMP_NTZ → LocalDateTime; compare as Comparable
    val dates = rows.map(_.getAs[java.time.LocalDateTime]("o_orderdate"))
    assert(dates.sliding(2).forall(p => !p(0).isAfter(p(1))), "sorted by date")
  }

  test("agg pricing groups are complete and exact") {
    val rows = Relational.aggPricing(spark, sf).collect()
    assert(rows.length >= 4) // R/A/N flag combos
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("star join aggregates by nation with positive revenue") {
    val rows = Relational.starJoin(spark, sf).collect()
    assert(rows.length == 25) // 25 nations in TPC-H
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("lww dedup keeps exactly one row per key") {
    val df = Relational.lwwDedup(spark, sf)
    val dups = df.groupBy("user_id", "event_type").count().filter(col("count") > 1)
    assert(dups.isEmpty)
  }

  test("window rank keeps at most 3 per customer") {
    val df = Relational.windowRank(spark, sf)
    assert(df.filter(col("rnk") > 3).isEmpty)
    val max = df.groupBy("o_custkey").count().agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(max <= 3)
  }

  test("unpivot produces 4 metric rows per input row") {
    val in = Tables.lineitem(spark, sf).filter(col("l_orderkey") < 200).count()
    val out = Relational.unpivotMeasures(spark, sf).count()
    assert(out == in * 4)
  }

  test("set ops partition early users exactly") {
    // intersect(early,late) ∪ except(early,late) ≡ early
    val early = Tables.events(spark, sf)
      .filter(col("ts") < java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      .select("user_id").distinct().count()
    assert(Relational.setOps(spark, sf).count() == early)
  }

  test("delete-refresh drops exactly the BUILDING customers' orders") {
    val o = Tables.orders(spark, sf)
    val kept = Relational.deleteRefresh(spark, sf).count()
    val dropped = o.join(
      Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING"),
      o("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(kept + dropped == o.count())
  }

  test("get_history returns rows at this SF and is time-ordered") {
    val rows = Relational.getHistory(spark, sf).collect()
    assert(rows.nonEmpty)
    val ts = rows.map(r => String.valueOf(r.getAs[Any]("ts")))
    assert(ts.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("blocked ER: every record links, winner never scores worse than its source") {
    val rows = Relational.erBlocked(spark, sf).collect()
    val names = Tables.customer(spark, sf).select("c_name").collect()
      .map(_.getString(0)).toSet
    // one output row per customer: the corruption is an involution, so
    // probes are unique and none is lost to the blocking stage
    assert(rows.length === names.size)
    rows.foreach { r =>
      val probe = r.getAs[String]("probe")
      val matched = r.getAs[String]("matched")
      val dist = r.getAs[Long]("distance")
      assert(names.contains(matched), "matched a real record")
      // the true source shares the block and sits at distance ≤ 2, so
      // the struct-min winner can never score worse
      assert(dist <= 2L, s"$probe linked at distance $dist")
      assert(r.getAs[Long]("n_candidates") >= 1L &&
        r.getAs[Long]("n_candidates") <= 1000L, "block bound")
      // the source is recoverable from the probe (the swap is an
      // involution); the winner must never score WORSE than it, and on
      // a distance tie the struct-min breaks toward the smaller name
      val src = probe.substring(0, 16) + probe(17) + probe(16)
      val selfDist = if (probe == src) 0L else 2L
      assert(dist <= selfDist, s"$probe: winner worse than its source")
      if (r.getAs[Long]("rematch") === 0L)
        assert(dist < selfDist || (dist === selfDist && matched < src),
          s"miss not justified by score or tie-break: $probe -> $matched")
    }
    // the swap fixes palindromic digit pairs: those must rematch at 0
    rows.filter(r => { val p = r.getAs[String]("probe")
      p(16) == p(17) }).foreach { r =>
      assert(r.getAs[Long]("rematch") === 1L && r.getAs[Long]("distance") === 0L)
    }
  }

  test("correlated EXISTS/NOT EXISTS: survivors verified by brute joins, counts positive") {
    import graft.queries.Subqueries
    val rows = Subqueries.all("q_sq_exists")(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val big = orders.filter(_._2 > 300000).groupBy(_._1).map { case (k, v) => (k, v.length.toLong) }
    val urgent = orders.filter(_._3 == "1-URGENT").map(_._1).toSet
    val expected = big.keySet -- urgent
    assert(rows.map(_.getAs[Long]("c_custkey")).toSet === expected)
    rows.foreach { r =>
      val k = r.getAs[Long]("c_custkey")
      assert(r.getAs[Long]("n_big") === big(k), s"customer $k n_big")
    }
  }
}
