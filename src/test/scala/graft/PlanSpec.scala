package graft

import graft.queries.{Dedup, Relational, Subqueries}

/** Physical-plan assertions for the headline queries — the properties
  * that make these plans survive 100 TB must hold structurally, not by
  * luck: filters reach the parquet scan, dimension joins broadcast,
  * top-k never global-sorts, and IN/NOT IN decorrelate to semi/anti
  * joins. A regression here is a scale regression even when results stay
  * correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("flagship page: predicates push into the parquet scans, dim join broadcasts") {
    val p = plan(Relational.flagshipPage(spark, sf))
    assert(p.contains("PushedFilters"), p.take(500))
    // the rendered PushedFilters list is truncated, so assert on the
    // filters that appear within the printed prefix
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"order filters not pushed:\n${p.take(2000)}")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"dim filter not pushed:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), "dim join should broadcast")
  }

  test("parameterized SQL binds fold into scan-level pushed filters") {
    // the point of q_f2_param_sql beyond injection safety: bound
    // parameters become ordinary literals BEFORE optimization, so the
    // date slice and price floor reach the parquet reader exactly like
    // the Column-API path — a param binding that blocked pushdown
    // would be a silent full-scan at 100 TB
    val p = plan(Relational.paramSql(spark, sf))
    assert(p.contains("PushedFilters"), p.take(1000))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"bound date param not pushed:\n${p.take(2000)}")
    // the rendered PushedFilters list truncates; the price bound is
    // visible as the folded literal in the scan's Filter condition
    assert(p.contains("o_totalprice") && p.contains("> 5000.0"),
      s"bound price param did not fold to a literal predicate:\n${p.take(2000)}")
  }

  test("UnwrapStringCast: naive optional-filter stack pushes down with the " +
      "rule, not without") {
    import graft.plans.UnwrapStringCast
    // WITH the injected rule (session default): the text-typed equality
    // CAST(c_nationkey AS STRING) = '3' unwraps to the typed predicate
    // and reaches the parquet scan
    val withRule = plan(Relational.orRewrite(spark, sf))
    assert(withRule.contains("EqualTo(c_nationkey,3)"),
      s"unwrapped filter not pushed:\n${withRule.take(2500)}")
    assert(withRule.contains("EqualTo(o_orderstatus,F)"),
      s"plain bound filter not pushed:\n${withRule.take(2500)}")
    // WITHOUT the rule: same query, pushdown of the cast equality is
    // absent — the cost the naive reference idiom pays in vanilla Spark
    spark.conf.set(UnwrapStringCast.EnabledKey, "false")
    try {
      val without = plan(Relational.orRewrite(spark, sf))
      assert(!without.contains("EqualTo(c_nationkey,3)"),
        s"rule disabled but filter still pushed:\n${without.take(2500)}")
      assert(without.contains("cast(c_nationkey"),
        s"expected residual string cast in the plan:\n${without.take(2500)}")
    } finally spark.conf.unset(UnwrapStringCast.EnabledKey)
  }

  test("UnwrapStringCast: non-round-trip literals are left untouched") {
    import org.apache.spark.sql.functions._
    val df = Tables.orders(spark, sf)
    // '05' never equals a canonical bigint rendering: the rewrite must
    // NOT fire (a naive typed rewrite would wrongly match custkey 5)
    assert(df.filter(col("o_custkey").cast("string") === "05").count() === 0L)
    val p = plan(df.filter(col("o_custkey").cast("string") === "05")
      .select("o_orderkey"))
    assert(!p.contains("EqualTo(o_custkey,5)"),
      s"non-canonical literal must not unwrap:\n${p.take(2000)}")
    // and the canonical form both unwraps and matches
    val canonical = df.filter(col("o_custkey").cast("string") === "5")
    assert(canonical.count() ===
      df.filter(col("o_custkey") === 5L).count())
  }

  test("UnwrapStringCast: zoned timestamps unwrap only under fixed-offset zones") {
    import org.apache.spark.sql.functions._
    import ss.implicits._
    // In a DST-observing zone the fall-back hour repeats: two distinct
    // instants render to the SAME wall-clock string (no offset suffix),
    // so str(ts) = 'p' is not injective and the literal round-trip
    // check cannot catch it — the rule must leave the cast in place.
    // 2024-11-03 01:30:00 in America/Los_Angeles is both 08:30Z (PDT)
    // and 09:30Z (PST).
    // parquet-backed so ConvertToLocalRelation can't fold the filter
    // away before the plan is inspectable
    val dir = java.nio.file.Files.createTempDirectory("graft-dstunwrap")
    Seq(
      java.time.Instant.parse("2024-11-03T08:30:00Z"),
      java.time.Instant.parse("2024-11-03T09:30:00Z")).toDF("ts")
      .write.mode("overwrite").parquet(dir.toString)
    val both = spark.read.parquet(dir.toString)
    val prevZone = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val q = both.filter(col("ts").cast("string") === "2024-11-03 01:30:00")
      assert(q.count() === 2L,
        "string semantics match BOTH fall-back instants — an unwrap here drops a row")
      assert(plan(q).contains("cast(ts"),
        s"DST-observing zone must not unwrap:\n${plan(q).take(1500)}")
    } finally spark.conf.set("spark.sql.session.timeZone", prevZone)
    // Under the (fixed-offset) UTC session zone the rendering is
    // injective again: the unwrap fires and matches exactly one instant.
    val q = both.filter(col("ts").cast("string") === "2024-11-03 08:30:00")
    assert(q.count() === 1L)
    assert(!plan(q).contains("cast(ts"),
      s"fixed-offset zone should unwrap:\n${plan(q).take(1500)}")
  }

  test("CBO: catalog column stats flip the broadcast decision, no hints") {
    import org.apache.spark.sql.functions.col
    // Every other join in the suite is shaped by thresholds or hints;
    // this is the remaining planner surface: Spark's cost-based
    // optimizer estimating a FILTERED dimension from ANALYZE stats.
    // Without stats the filter's size estimate equals the whole table
    // (the size-only visitor never shrinks a filter), so the dim stays
    // above the broadcast threshold → sort-merge. With rowCount + ndv
    // stats, equality selectivity 1/ndv(c_nationkey) shrinks the
    // estimate ~25x → under the threshold → broadcast. Same query,
    // same data, the STATS make the decision.
    spark.sql("DROP TABLE IF EXISTS graft_cbo_orders")
    spark.sql("DROP TABLE IF EXISTS graft_cbo_customer")
    Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
      .write.saveAsTable("graft_cbo_orders")
    Tables.customer(spark, sf).write.saveAsTable("graft_cbo_customer")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.sql("ANALYZE TABLE graft_cbo_orders COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE graft_cbo_customer COMPUTE STATISTICS " +
        "FOR COLUMNS c_custkey, c_nationkey")
      val dimBytes = spark.table("graft_cbo_customer")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      // threshold between the no-stats estimate (whole dim) and the
      // stats-based estimate (~1/25 of rows)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (dimBytes / 2).toString)
      def joined = spark.table("graft_cbo_orders")
        .join(spark.table("graft_cbo_customer")
          .filter(col("c_nationkey") === 3), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val without = joined.queryExecution.sparkPlan.toString
      assert(!without.contains("BroadcastHashJoin"),
        s"without CBO the filtered dim must not broadcast:\n${without.take(1500)}")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val withStats = joined.queryExecution.sparkPlan.toString
      assert(withStats.contains("BroadcastHashJoin"),
        s"CBO stats should shrink the filtered dim under the threshold:\n${withStats.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS graft_cbo_orders")
      spark.sql("DROP TABLE IF EXISTS graft_cbo_customer")
    }
  }

  test("BM25 and recall rankings plan partial WindowGroupLimit; query terms broadcast") {
    import graft.queries.{Similarity, TextAnalysis}
    // the per-key top-k must bound work BEFORE the exchange: Spark's
    // WindowGroupLimit in Partial mode keeps k rows per (partition,
    // key) heap, so the rank shuffle moves k·|keys| rows, not the
    // full candidate stream — the grouped analogue of
    // TakeOrderedAndProject, and what survives a 100x candidate blowup
    val bp = plan(TextAnalysis.bm25(spark, sf))
    assert(bp.contains("WindowGroupLimit") && bp.contains("Partial"),
      s"bm25 rank filter must plan a partial group limit:\n${bp.take(2000)}")
    // the query-term list is a dimension: it must broadcast, the
    // postings stream must not
    assert(bp.contains("BroadcastHashJoin"),
      s"query terms should broadcast into the postings join:\n${bp.take(2000)}")
    val rp = plan(Similarity.recallEval(spark, sf))
    assert(rp.contains("WindowGroupLimit") && rp.contains("Partial"),
      s"recall rankings must plan partial group limits:\n${rp.take(2000)}")
  }

  test("BandJoinRewrite: the naive band join trades nested-loop for an equi join") {
    import graft.plans.BandJoinRewrite
    import graft.queries.Temporal
    // WITH the injected rule (session default): the bucket equi-key
    // turns the only-band join into a hash/sort-merge join
    val withRule = plan(Temporal.bandJoin(spark, sf))
    assert(!withRule.contains("BroadcastNestedLoopJoin"),
      s"band join must not plan a nested loop with the rule:\n${withRule.take(2000)}")
    assert(withRule.contains("SortMergeJoin") ||
      withRule.contains("ShuffledHashJoin") ||
      withRule.contains("BroadcastHashJoin"),
      s"expected an equi join on the bucket:\n${withRule.take(2000)}")
    val got = Temporal.bandJoin(spark, sf).collect()
    // WITHOUT: same query, nested loop — and identical results, so the
    // rewrite is provably a pure plan transformation
    spark.conf.set(BandJoinRewrite.EnabledKey, "false")
    try {
      val without = plan(Temporal.bandJoin(spark, sf))
      assert(without.contains("BroadcastNestedLoopJoin"),
        s"without the rule this must be the nested-loop trap:\n${without.take(2000)}")
      assert(Temporal.bandJoin(spark, sf).collect().toSeq === got.toSeq)
    } finally spark.conf.unset(BandJoinRewrite.EnabledKey)
    assert(got.nonEmpty, "the band must produce pairs on the test corpus")
  }

  test("top-k by recency plans TakeOrderedAndProject, never a global sort") {
    val p = plan(Relational.topkRecent(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(1000))
  }

  test("get_history: composite key + time range push down to the scan") {
    val p = plan(Relational.getHistory(spark, sf))
    assert(p.contains("EqualTo(user_id,7)"), s"key filter not pushed:\n${p.take(1500)}")
  }

  test("ORC scans get the same pushdown + column pruning as parquet") {
    // the cross-format contract behind q_w9_orc_roundtrip: switching the
    // warehouse interchange format must not forfeit scan-level pruning
    val out = s"${sys.props("java.io.tmpdir")}/graft_planspec_orc"
    if (!new java.io.File(s"$out/_SUCCESS").exists())
      Tables.events(spark, sf)
        .select("event_id", "user_id", "ts", "event_type", "value")
        .write.mode("overwrite").orc(out)
    val q = spark.read.orc(out)
      .filter(org.apache.spark.sql.functions.col("user_id") === 7)
      .select("event_id", "ts")
    val p = plan(q)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(user_id,7)"),
      s"filter not pushed into the ORC scan:\n${p.take(1500)}")
    // user_id stays in the read schema (the exact filter re-evaluates
    // it); the pruning claim is that untouched columns never leave disk
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(sys.error(s"no ReadSchema in plan:\n${p.take(1500)}"))
    assert(!readSchema.contains("event_type") && !readSchema.contains("value"),
      s"projection not pruned at the ORC scan: $readSchema")
  }

  test("a selective dim filter injects a runtime bloom filter into the fact scan") {
    // Spark's InjectRuntimeFilter: when a shuffle join's small side is
    // selectively filtered, a bloom filter built from its join keys is
    // pushed in front of the big side's scan, cutting shuffle input by
    // the filter's selectivity. The size thresholds exist because this
    // only pays when the application side is huge — at 100 TB the
    // DEFAULTS (10 GB application side) trigger it unaided; at test SF
    // they are lowered to exercise the same plan shape. Broadcast is
    // disabled so the join is the shuffle join a fact⋈fact pair plans.
    val restore = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf)
      val ord = Tables.orders(spark, sf)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val p = plan(j)
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact side:\n${p.take(2000)}")
      // the filter is a pure pruning optimization — results are identical
      val expected = li.join(ord.hint("broadcast"),
        li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      assert(j.collect().toSeq === expected.collect().toSeq)
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** Every node of the physical plan, descending through AQE wrappers
    * (whose children list is empty until reoptimization). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
  : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val inner = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case _ => Nil
    }
    p +: (p.children ++ inner).flatMap(allNodes)
  }

  test("the shuffle-hash hint swaps sort-merge for ShuffledHashJoin, same result") {
    // the third join strategy a 100 TB planner leans on: when one side
    // is too big to broadcast but modest enough to hash per partition,
    // SHUFFLE_HASH avoids BOTH sort passes of the default sort-merge
    // join. The hint is the per-query lever; the test pins that it is
    // honored and result-preserving.
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val ord = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      def agg(j: org.apache.spark.sql.DataFrame) =
        j.groupBy("o_orderpriority")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
          .orderBy("o_orderpriority")
      val smj = agg(li.join(ord, li("l_orderkey") === ord("o_orderkey")))
      val shj = agg(li.join(ord.hint("shuffle_hash"),
        li("l_orderkey") === ord("o_orderkey")))
      assert(plan(smj).contains("SortMergeJoin"), plan(smj).take(800))
      assert(plan(shj).contains("ShuffledHashJoin"), plan(shj).take(800))
      assert(shj.collect().toSeq === smj.collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
  }

  test("TPC-H Q3: dims broadcast, filters push to every scan, top-k at the end") {
    val df = Subqueries.tpchQ3(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), "customer join should broadcast")
    // at this tiny SF the filtered orders side is below the broadcast
    // threshold, so Catalyst (rightly) broadcasts it too; what must NEVER
    // happen is broadcasting the lineitem fact side. Walk the tree: a
    // BroadcastExchange whose SUBTREE scans lineitem is the regression
    // (single rendered lines never carry the table name — a line match
    // here would be vacuously true).
    val broadcastSubtrees = allNodes(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }
    assert(broadcastSubtrees.nonEmpty, "expected at least one broadcast exchange")
    broadcastSubtrees.foreach(b =>
      assert(!b.toString.contains("lineitem"),
        s"the lineitem fact table must not be broadcast:\n${b.toString.take(1500)}"))
    assert(p.contains("GreaterThan(l_shipdate") && p.contains("LessThan(o_orderdate"),
      "date filters must push into both fact scans")
    assert(p.contains("TakeOrderedAndProject"), "final top-10 must be a top-k")
  }

  test("TPC-H Q5: region/nation/supplier broadcast, lineitem never does, dates push") {
    val df = Subqueries.tpchQ5(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), "dim joins should broadcast")
    val broadcastSubtrees = allNodes(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }
    assert(broadcastSubtrees.nonEmpty, "expected broadcast exchanges for the dims")
    broadcastSubtrees.foreach(b =>
      assert(!b.toString.contains("lineitem"),
        s"the lineitem fact table must not be broadcast:\n${b.toString.take(1500)}"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate") && p.contains("LessThan(o_orderdate"),
      "the order-date slice must push into the orders scan")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "the region filter must push into the region scan")
  }

  test("TPC-H Q21: EXISTS/NOT EXISTS plan semi+anti, no cartesian, lineitem never broadcast") {
    val df = Subqueries.all("q_tpch_q21")(spark, sf)
    val p = plan(df)
    assert(p.contains("LeftSemi"),
      s"the EXISTS must decorrelate to a semi join:\n${p.take(1500)}")
    assert(p.contains("LeftAnti"),
      s"the NOT EXISTS must decorrelate to an anti join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"Q21 must not plan an all-pairs join:\n${p.take(1500)}")
    // At test SF the whole lineitem table sits under the broadcast
    // threshold, so Catalyst broadcasting the subquery sides is correct
    // HERE but wrong at 100 TB. Disable the threshold to see the
    // at-scale plan: the semi/anti chain must survive as shuffled joins
    // with lineitem on no broadcast side.
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val scaled = Subqueries.all("q_tpch_q21")(spark, sf)
      val ps = plan(scaled)
      assert(ps.contains("LeftSemi") && ps.contains("LeftAnti"),
        s"semi+anti must survive without broadcasts:\n${ps.take(1500)}")
      assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
        s"no all-pairs fallback at scale:\n${ps.take(1500)}")
      val broadcastSubtrees = allNodes(scaled.queryExecution.executedPlan).collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      broadcastSubtrees.foreach(b =>
        assert(!b.toString.contains("lineitem"),
          s"the lineitem fact table must not be broadcast:\n${b.toString.take(1500)}"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
  }

  test("TPC-H Q20: nested decorrelation plans semi joins over the aggregated inner, no cartesian") {
    val df = Subqueries.all("q_tpch_q20")(spark, sf)
    val p = plan(df)
    // outer s_suppkey IN and nested p_partkey IN both decorrelate to
    // semi joins; the correlated scalar agg becomes a per-(partkey,
    // suppkey) aggregate joined back on the composite key
    assert(p.contains("LeftSemi"),
      s"the IN chain must decorrelate to semi joins:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"Q20 must not plan an all-pairs join:\n${p.take(1500)}")
    // the at-scale plan: no broadcast shortcut may hide a cartesian,
    // and lineitem must never be a broadcast side
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val scaled = Subqueries.all("q_tpch_q20")(spark, sf)
      val ps = plan(scaled)
      assert(ps.contains("LeftSemi"),
        s"semi joins must survive without broadcasts:\n${ps.take(1500)}")
      assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
        s"no all-pairs fallback at scale:\n${ps.take(1500)}")
      val broadcastSubtrees = allNodes(scaled.queryExecution.executedPlan).collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      broadcastSubtrees.foreach(b =>
        assert(!b.toString.contains("lineitem"),
          s"the lineitem fact table must not be broadcast:\n${b.toString.take(1500)}"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
  }

  test("TPC-H Q19: the OR-of-ANDs keeps the equi-join — no nested loop, no cartesian") {
    val df = Subqueries.all("q_tpch_q19")(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the disjunction must not demote the join:\n${p.take(1500)}")
    assert(p.contains("p_partkey"), "the equi-join key must survive")
    // at-scale shape: without the broadcast shortcut the join must
    // still be an equi hash/sort-merge join on partkey
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ps = plan(Subqueries.all("q_tpch_q19")(spark, sf))
      assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
        s"no all-pairs fallback at scale:\n${ps.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
  }

  test("TPC-H Q22: scalar-average gate + NOT EXISTS plan one anti join, no cartesian") {
    val df = Subqueries.all("q_tpch_q22")(spark, sf)
    val p = plan(df)
    assert(p.contains("LeftAnti"),
      s"the NOT EXISTS must decorrelate to an anti join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"Q22 must not plan an all-pairs join:\n${p.take(1500)}")
  }

  test("TPC-H Q2: correlated MIN with its own join tree decorrelates, no cartesian") {
    val df = Subqueries.all("q_tpch_q2")(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the correlated MIN must decorrelate, not re-execute per row:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"), "the LIMIT 100 must be a top-k")
    // at-scale shape: the derived ps aggregate and its region-filtered
    // twin must both survive as shuffled plans with lineitem never on a
    // broadcast side
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val scaled = Subqueries.all("q_tpch_q2")(spark, sf)
      val ps = plan(scaled)
      assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
        s"no all-pairs fallback at scale:\n${ps.take(1500)}")
      val broadcastSubtrees = allNodes(scaled.queryExecution.executedPlan).collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      broadcastSubtrees.foreach(b =>
        assert(!b.toString.contains("lineitem"),
          s"the lineitem fact table must not be broadcast:\n${b.toString.take(1500)}"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
  }

  test("TPC-H Q6: the no-join scan aggregate pushes the date slice to parquet") {
    val p = plan(Subqueries.all("q_tpch_q6")(spark, sf))
    // the rendered PushedFilters list truncates, so pin the lower bound
    // there and the upper bound in the Filter node's predicate text
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"the ship-date range must reach the lineitem scan:\n${p.take(1500)}")
    assert(p.contains("< 1997-01-01"),
      s"the upper date bound must survive in the scan filter:\n${p.take(1500)}")
    assert(!p.contains("Join"), s"Q6 must not plan any join:\n${p.take(1500)}")
  }

  test("TPC-H Q16: NOT IN plans an anti join; fact sweep: lineitem never broadcast") {
    val p16 = plan(Subqueries.all("q_tpch_q16")(spark, sf))
    assert(p16.contains("LeftAnti"),
      s"the complaint-supplier NOT IN must plan an anti join:\n${p16.take(1500)}")
    assert(!p16.contains("CartesianProduct") && !p16.contains("BroadcastNestedLoopJoin"),
      s"Q16 must not plan an all-pairs join:\n${p16.take(1500)}")
    // the multi-join rows added with Q16: none may degenerate to an
    // all-pairs join. At this tiny SF a FILTERED lineitem slice can
    // legitimately sit under the broadcast threshold (Q10's returned
    // lines), so the at-scale obligation — lineitem never on a
    // broadcast side — is checked with the threshold disabled, the
    // same way the Q20/Q21 tests do.
    val names = Seq("q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
      "q_tpch_q11", "q_tpch_q12", "q_tpch_q14", "q_tpch_q15")
    for (name <- names) {
      val p = plan(Subqueries.all(name)(spark, sf))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name must not plan an all-pairs join:\n${p.take(1500)}")
    }
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (name <- names) {
        val scaled = Subqueries.all(name)(spark, sf)
        val ps = plan(scaled)
        assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
          s"$name: no all-pairs fallback at scale:\n${ps.take(1500)}")
        allNodes(scaled.queryExecution.executedPlan).collect {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
        }.foreach(b =>
          assert(!b.toString.contains("lineitem"),
            s"$name: the lineitem fact table must not be broadcast:\n${b.toString.take(1500)}"))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
  }

  test("residual and fully-trained IVF-PQ: both cuts are top-k heaps, no global sort") {
    // the two-stage retrieve must never plan a global sort: the ADC
    // top-R and the exact-cosine top-K are both TakeOrderedAndProject
    // (per-partition heaps + driver merge), and the candidate scan may
    // not fall back to an all-pairs join
    for (name <- Seq("q_sim_ivfpq_residual", "q_sim_ivfpq_full")) {
      val p = plan(graft.queries.Similarity.all(name)(spark, sf))
      assert(p.contains("TakeOrderedAndProject"),
        s"$name must plan top-k heaps:\n${p.take(1200)}")
      // the one-row query vector rides a broadcast nested loop by
      // design (the sanctioned crossJoin(broadcast(q)) of every ANN
      // row); a CartesianProduct would mean a real all-pairs plan
      assert(!p.contains("CartesianProduct"),
        s"$name must not plan an all-pairs join:\n${p.take(1200)}")
      // "Sort" may appear only inside TakeOrderedAndProject's
      // description, never as a standalone global Sort node
      assert(!p.linesIterator.exists(l => l.trim.startsWith("+- Sort ")
        || l.trim.startsWith(":- Sort ") || l.trim.startsWith("Sort ")),
        s"$name must not plan a standalone global sort:\n${p.take(1200)}")
    }
  }

  test("IN / NOT IN subqueries decorrelate to semi / anti joins") {
    val pin = plan(spark.sql("SELECT 1").sparkSession.let(_ => Subqueries.all("q_sq_in")(spark, sf)))
    assert(pin.contains("LeftSemi"), s"IN should plan a semi join:\n${pin.take(1500)}")
    val pnotin = plan(Subqueries.all("q_sq_not_in")(spark, sf))
    assert(pnotin.contains("LeftAnti"), s"NOT IN should plan an anti join:\n${pnotin.take(1500)}")
  }

  test("no dedup/ANN query plans a cartesian or nested-loop join") {
    // q_dd_embed_neardup is the one documented exception: the bounded
    // (vec_id < 1000) exact baseline whose scale path is q_dd_embed_lsh.
    for ((name, fn) <- Dedup.all if name != "q_dd_embed_neardup") {
      val p = plan(fn(spark, sf))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name plans an all-pairs join — quadratic at scale:\n${p.take(1500)}")
    }
  }

  test("contamination probes eval membership via broadcast, never a shuffled join") {
    // The eval shingle universe must broadcast (benchmarks are MBs,
    // corpora TBs); a sort-merge/shuffled-hash join here would shuffle
    // the whole corpus' shingle stream at 100 TB.
    val p = plan(Dedup.contamination(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"eval probe should broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"contamination must not shuffle-join the corpus:\n${p.take(1500)}")
  }

  test("kmeans assignment is a zero-shuffle scan projection") {
    val p = plan(graft.queries.Similarity.kmeansAssign(spark, sf))
    // the only exchange allowed is the final presentation sort
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"E-step must not shuffle:\n${p.take(1500)}")
  }

  test("kmeans M-step is one aggregation pass fused with the E-step scan") {
    // E-step scoring + posexplode + partial aggregation must fuse into
    // the scan stage; the only exchanges are the 512-group final agg and
    // the presentation sort.
    val p = plan(graft.queries.Similarity.kmeansUpdate(spark, sf))
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"M-step should shuffle only 512 groups + sort:\n${p.take(1500)}")
    assert(p.contains("partial"), s"M-step must map-side combine:\n${p.take(1500)}")
  }

  test("bucketed fact join plans with no shuffle on either side") {
    // The write-time bucketing must carry through to the join: in the
    // rendered tree a node's INPUTS print below it, so no shuffle
    // Exchange may appear at or below the SortMergeJoin line (the range
    // exchange above it belongs to the presentation sort). Broadcast is
    // disabled so the tiny test SF exercises the SMJ path a real fact
    // pair would take.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lines = plan(graft.queries.LayoutQueries.bucketedJoin(spark, sf))
        .linesIterator.toList
      val joinIdx = lines.indexWhere(_.contains("SortMergeJoin"))
      assert(joinIdx >= 0, s"expected a SortMergeJoin:\n${lines.take(40).mkString("\n")}")
      assert(!lines.drop(joinIdx).exists(_.contains("Exchange")),
        s"bucketed join must not re-shuffle its inputs:\n${lines.drop(joinIdx).take(20).mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("json-path predicate still pushes scan-level filters") {
    // The get_json_object predicate itself can't reach parquet (it's an
    // expression over props, not an attribute), but the scan must still
    // carry a PushedFilters list with the derivable residue — a scan
    // that pushes nothing re-reads every row group at 100 TB.
    val p = plan(graft.queries.Discovery.jsonPred(spark, sf))
    assert(p.contains("PushedFilters: ["), s"scan lost its pushdown list:\n${p.take(1500)}")
    assert(p.contains("IsNotNull(props)"),
      s"null-rejection should push to the props scan:\n${p.take(1500)}")
  }

  test("salted aggregation's partial stage runs shuffle-free on (key, salt)") {
    // The whole point of the salt is that the FIRST aggregate fans a hot
    // key across (key, salt) sub-groups map-side, BEFORE any exchange —
    // a shuffle below it would re-concentrate the skew it exists to
    // spread. In the rendered tree inputs print below their parent, so
    // the deepest HashAggregate must mention the salt column and no
    // Exchange may appear below it.
    val lines = plan(graft.queries.LayoutQueries.saltedAgg(spark, sf))
      .linesIterator.toList
    val deepestAgg = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(deepestAgg >= 0, s"expected a HashAggregate:\n${lines.take(30).mkString("\n")}")
    assert(lines(deepestAgg).contains("__salt"),
      s"deepest aggregate must key on (key, salt):\n${lines(deepestAgg)}")
    assert(!lines.drop(deepestAgg + 1).exists(_.contains("Exchange")),
      s"no shuffle below the salted partial agg:\n${lines.drop(deepestAgg).take(15).mkString("\n")}")
  }

  private def shuffleOutputs(df: org.apache.spark.sql.DataFrame) =
    allNodes(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }

  test("pack and tfidf shuffle digests — the text column never moves") {
    // Token counting / term explosion must happen scan-side so the
    // window / aggregation shuffles carry (key, count) digests; a text
    // column in any exchange means the corpus itself crosses the wire.
    for (fn <- Seq(graft.queries.TrainPrep.pack _, graft.queries.TrainPrep.tfidf _,
      graft.queries.TextAnalysis.bigramCoherence _,
      graft.queries.TextAnalysis.bigramBroadcast _)) {
      val ex = shuffleOutputs(fn(spark, sf))
      assert(ex.nonEmpty, "expected at least one exchange")
      ex.foreach(e => assert(!e.output.exists(_.name == "text"),
        s"text must not shuffle: ${e.output.map(_.name).mkString(", ")}"))
    }
  }

  test("broadcast bigram scoring: the model broadcasts, no token-key shuffle join") {
    // The skew-hardened variant's contract: the vocabulary probe and
    // the probability lookup are BROADCAST joins (the model is
    // (K+1)^2-bounded by construction), so the bigram stream never
    // shuffle-joins on a stop-word-skewed token key. The only
    // exchanges left are doc-grain (window, final agg) and the
    // map-side-combined model build.
    val df = graft.queries.TextAnalysis.bigramBroadcast(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the model must broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no token-key shuffle join allowed in the broadcast variant:\n${p.take(2000)}")
  }

  test("trigram backoff scoring: all three model levels broadcast, text never shuffles") {
    // Same contract one level up: the trigram/bigram/unigram lookups
    // are all broadcast joins ((K+1)^3-bounded models), the scoring
    // stream never shuffle-joins on a token key, and no exchange
    // carries the text column.
    val df = graft.queries.TextAnalysis.trigramBackoff(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the models must broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no token-key shuffle join in backoff scoring:\n${p.take(2000)}")
    shuffleOutputs(df).foreach(e => assert(!e.output.exists(_.name == "text"),
      s"text must not shuffle: ${e.output.map(_.name).mkString(", ")}"))
  }

  test("mixture sampling broadcasts the rate table, never shuffle-joins the corpus") {
    val p = plan(graft.queries.Sampling.mixture(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"rates should broadcast:\n${p.take(1500)}")
    val ex = shuffleOutputs(graft.queries.Sampling.mixture(spark, sf))
    ex.foreach(e => assert(!e.output.exists(_.name == "text"),
      s"corpus must not shuffle: ${e.output.map(_.name).mkString(", ")}"))
  }

  test("quantize shuffles only dim-grain stats — the exploded vectors stay put") {
    // Both exchanges (the per-dim min/max partials and the final audit)
    // must be dim-grain: an exchange carrying v or vec_id means the
    // corpus×64 exploded stream crossed the wire, which is the plan that
    // dies first at 100 TB.
    val ex = shuffleOutputs(graft.queries.Similarity.quantize(spark, sf))
    assert(ex.nonEmpty, "expected the stats/audit exchanges")
    ex.foreach(e => assert(!e.output.exists(a => a.name == "v" || a.name == "vec_id"),
      s"exploded vectors must not shuffle: ${e.output.map(_.name).mkString(", ")}"))
  }

  test("data profile computes every column's stats in a single scan") {
    val p = plan(graft.queries.Discovery.profile(spark, sf))
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"profile must be one scan, found $scans:\n${p.take(1500)}")
  }

  test("minhash signature aggregation is map-side combined (partial min)") {
    val p = plan(Dedup.minhashLsh(spark, sf))
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      s"signature build should partial-aggregate:\n${p.take(1500)}")
  }

  test("whole-stage codegen covers the HOF-free text-analysis projections") {
    // langId is pure regexp/string arithmetic → must stay in codegen.
    // (tokenCount/fingerprint use `aggregate` HOFs, which are
    // CodegenFallback by design — bounded per-row cost, documented in
    // SCALE.md; they are intentionally NOT asserted here.)
    // AQE only materializes codegen stages at execution, so run first.
    val df = graft.queries.TextAnalysis.langId(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen stages render as "*(n)" in the final-plan toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(1000))
  }

  test("AQE splits the 5-key skewed sort-merge join (skew=true in the SMJ)") {
    // OptimizeSkewedJoin decides from RUNTIME shuffle stats, so the plan
    // must execute before the final adaptive plan can be inspected.
    val df = Relational.skewJoinAgg(spark, sf)
    Relational.withSkewTuning(spark) {
      // collect() (not count()) — count() builds a SEPARATE query, and
      // the final adaptive plan lives on the executed Dataset itself
      val n = df.collect().length
      assert(n == 5, s"expected the 5 event types, got $n")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"skew split did not fire:\n${p.take(3000)}")
      assert(p.contains("SortMergeJoin"), p.take(1500))
    }
  }

  test("TPC-H Q13: the outer join's partitioning is reused by the per-customer aggregate") {
    // At scale the join runs shuffled (broadcast disabled here to pin
    // that shape): both inputs exchange on c_custkey, and the
    // per-customer count reuses the join's partitioning — exactly two
    // c_custkey exchanges in the executed plan, none above the join.
    Relational.withScopedConfs(spark,
      Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val df = graft.queries.Subqueries.all("q_tpch_q13")(spark, sf)
      assert(df.collect().nonEmpty)
      val p = df.queryExecution.executedPlan.toString
      val n = "hashpartitioning\\(c_custkey".r.findAllIn(p).size
      assert(n == 2,
        s"expected exactly the two join-input exchanges on c_custkey, got $n:\n${p.take(2500)}")
    }
  }

  test("top-k per group runs as a bounded aggregate: no Window, no sort below the agg") {
    // the window formulation sorts every group in full; the top_k_by
    // aggregate keeps a bounded heap and combines map-side — the plan
    // must show an (Object)HashAggregate pair and no Window node (the
    // only Sort allowed is the presentation orderBy ABOVE the agg)
    val df = graft.queries.Analytics.topkGroupAgg(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      p.take(2000))
    assert(!p.contains("Window"), s"top_k_by plan must not window:\n${p.take(2000)}")
    assert(p.contains("partial_top_k_by") || p.contains("top_k_by"),
      p.take(2000))
  }

  test("AQE coalesces the post-shuffle partitions of a small aggregate") {
    // The static conf says 32 reducers; the runtime stats say a handful
    // of tiny partitions — AQE's coalesce rule merges them so reducer
    // count follows DATA size, not the conf. At 100 TB the same rule
    // keeps the last stage of a heavily-filtered query from scheduling
    // thousands of empty tasks. (Executed plan required: AQEShuffleRead
    // exists only after runtime stats are in.)
    import org.apache.spark.sql.functions.{count, lit}
    val df = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    assert(df.collect().length == 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("coalesced"),
      s"expected an AQEShuffleRead coalesced node:\n${p.take(2000)}")
  }

  test("runtime bloom filter prunes the lineitem side of the urgent-orders join") {
    // InjectRuntimeFilter decides at optimization time from the scoped
    // confs; execute inside the window and assert the filter landed on
    // the application (lineitem) side as a might_contain predicate over
    // a shuffled join — the shape a 100 TB fact⋈fact join relies on.
    val df = Relational.bloomJoinAgg(spark, sf)
    Relational.withBloomTuning(spark) {
      assert(df.collect().nonEmpty)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"bloom filter was not injected:\n${p.take(3000)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(1500))
    }
  }

  test("q_ds_shredded: typed predicate pushes to parquet, payload pruned from scan") {
    // the GIN-index analog: the SAME F3 predicate that q_ds_json_pred
    // answers by parsing every payload becomes, over the shredded
    // staging, an attribute filter the parquet reader can act on — and
    // the payload column must not leave disk at all
    val q = graft.queries.Discovery.shredded(spark, sf)
    val p = plan(q)
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(k_typed,90)"),
      s"typed predicate not pushed into the shredded scan:\n${p.take(1500)}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(sys.error(s"no ReadSchema in plan:\n${p.take(1500)}"))
    assert(!readSchema.contains("props"),
      s"payload not pruned from the shredded scan: $readSchema")
    // and the rows are identical to the parse-every-payload form
    val viaJson = graft.queries.Discovery.jsonPred(spark, sf)
      .collect().toSeq
    assert(q.collect().toSeq === viaJson)
  }

  test("CEP pattern is one window pass: a single user-key exchange, no join at all") {
    // The self-join formulation is O(views × purchases) per user; the
    // window formulation's only wide step is one shuffle on user_id.
    val df = graft.queries.Analytics.pattern(spark, sf)
    val p = plan(df)
    assert(!p.contains("Join"), s"pattern must not plan any join:\n${p.take(1500)}")
    val userShuffles = shuffleOutputs(df)
      .filter(_.output.exists(_.name == "user_id"))
    assert(userShuffles.nonEmpty, "expected the user-key window exchange")
  }

  test("EXISTS/NOT EXISTS decorrelate to one semi + one anti join") {
    val p = plan(Subqueries.all("q_sq_exists")(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS should plan a semi join:\n${p.take(1500)}")
    assert(p.contains("LeftAnti"), s"NOT EXISTS should plan an anti join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decorrelation must not fall back to nested loops:\n${p.take(1500)}")
  }

  test("RAKE: word scores broadcast back to members; no vocabulary shuffle join") {
    // The word-score table is vocabulary-sized by construction — a
    // shuffled join on the token key would re-partition the member
    // stream by a skewed word key for no reason.
    val p = plan(graft.queries.TextAnalysis.rake(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"word scores must broadcast:\n${p.take(1500)}")
  }

  test("blocked ER: candidates come from an equi-join on the block key, no cartesian") {
    val p = plan(Relational.erBlocked(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocked linkage must never go all-pairs:\n${p.take(1500)}")
  }

  test("Benford and the rank tests collapse to value-domain digests before any window") {
    // The raw scan must reduce in ONE map-side-combinable aggregation;
    // a window or join below the first aggregate would drag row-grain
    // data through an exchange.
    for ((name, fn) <- Seq(
      ("q_ag_benford", graft.queries.Analytics.benford _),
      ("q_ag_ks", graft.queries.Analytics.ks _),
      ("q_ag_mwu", graft.queries.Analytics.mwu _),
      ("q_ag_linreg", graft.queries.Analytics.linreg _))) {
      val df = fn(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"$name must not shuffle-join row-grain data:\n${p.take(1500)}")
    }
  }

  test("chi2/anova/gini collapse to digests before anything wide") {
    // Each reduces the raw scan in ONE map-side-combinable aggregation;
    // everything after runs at digest grain, so no row-grain data may
    // reach a shuffle join.
    for ((name, fn) <- Seq(
      ("q_ag_chi2", graft.queries.Analytics.chi2 _),
      ("q_ag_anova", graft.queries.Analytics.anova _),
      ("q_ev_gini", graft.queries.Analytics.gini _))) {
      val df = fn(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"$name must not shuffle-join row-grain data:\n${p.take(1500)}")
    }
  }

  test("kendall pairs the value-domain digest, never rows; no nested loop on rows") {
    // The concordant/discordant join must run over the bounded
    // (g, x, y) digest. A BroadcastNestedLoopJoin is acceptable ONLY
    // because both sides are digests; a cartesian or a row-grain SMJ
    // below the first aggregate is the O(n²) plan that dies at scale.
    val df = graft.queries.Analytics.kendall(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"kendall must not plan a cartesian:\n${p.take(1500)}")
    // Walk the TREE, not the plan string: every join input must be
    // digest-grain. Two legitimate shapes exist — an aggregate beneath
    // the input, or the checkpointed digest itself (an ExistingRDD
    // scan whose lineage was truncated AFTER the cell aggregation). A
    // row-grain regression would surface as a FILE scan reaching a
    // join input with no aggregate between them — which a scan-side
    // partial aggregate elsewhere in the plan string can't mask.
    val joins = allNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"expected the digest pair join:\n${p.take(1500)}")
    for (j <- joins; c <- j.children) {
      val sub = allNodes(c)
      val hasAgg = sub.exists {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case _ => false
      }
      val hasFileScan = sub.exists {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case _: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => true
        case _ => false
      }
      assert(hasAgg || !hasFileScan,
        s"row-grain file scan reaches a join input with no digest " +
          s"aggregate between them:\n${j.nodeName}\n${c.treeString.take(1200)}")
    }
    // belt-and-braces: the (g, x, y) digest is value-domain-bounded
    // (≤ ~cells per lang by bucket granularity), so EVERY join here is
    // broadcastable — a shuffle join of any kind means row-grain data
    // leaked into the pairing, even if a checkpoint hid its scan.
    val shuffleJoins = joins.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffleJoins.isEmpty,
      s"kendall must not plan a shuffle join over digests:\n" +
        s"${shuffleJoins.map(_.nodeName).mkString(", ")}")
  }

  test("labelprop rounds are exchange-free: the adjacency pre-partition is paid once") {
    // The cached adjacency carries hash(a) (an InMemoryRelation
    // preserves partitioning where a localCheckpoint's LogicalRDD
    // reports Unknown), the label side broadcasts, and both in-round
    // aggregations cluster on a subset of {a} — so a round's executed
    // plan must contain ZERO shuffle exchanges of its own (the one
    // REPARTITION_BY_COL lives inside the cached build, behind the
    // InMemoryTableScan leaf). This is the gate on the r13 change that
    // took q_gr_labelprop from one edge-grain exchange PER ROUND to
    // one total (68 MB → ~0 in-round shuffle at sf0.1).
    import org.apache.spark.sql.functions.col
    val und = graft.queries.Graph.coEdges(spark, sf)
    val e2 = graft.queries.Graph.lpAdjacency(und)
    try {
      val labels0 = e2.select(col("a").as("node")).distinct()
        .withColumn("label", col("node")).localCheckpoint()
      val round = graft.queries.Graph.lpRound(e2, labels0)
      round.collect()
      val exchanges = allNodes(round.queryExecution.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"labelprop round must plan no shuffle exchange:\n" +
          s"${round.queryExecution.executedPlan.toString.take(2000)}")
      // and the round really is digest-correct: one label per node
      assert(round.groupBy("node").count().filter(col("count") > 1).count() === 0L)
    } finally { e2.unpersist(blocking = false); () }
  }

  test("silhouette is one scan + one k-row aggregate: no join, no window") {
    val df = graft.queries.Similarity.silhouette(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"no join expected:\n${p.take(1500)}")
    assert(!p.contains("Window"), s"no window expected:\n${p.take(1500)}")
    // count scans in the FINAL plan only (the AQE string re-renders the
    // initial plan below a marker line)
    val scans = p.split("== Initial Plan ==")(0)
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"silhouette must be one scan, found $scans")
  }

  test("changepoint and assortativity windows/joins stay at digest grain") {
    // changepoint: both windows partition by event_type over the
    // day-grain digest — no empty-partition (single-node) window.
    val cp = graft.queries.Temporal.changepoint(spark, sf)
    cp.collect()
    val wins = allNodes(cp.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the prefix-sum windows")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      "changepoint windows must be partitioned"))
    // assortativity: degree joins are equi-joins, never cartesian
    val as = graft.queries.Graph.assortativity(spark, sf)
    as.collect()
    val ap = as.queryExecution.executedPlan.toString
    assert(!ap.contains("CartesianProduct") &&
      !ap.contains("BroadcastNestedLoopJoin"),
      s"assortativity joins must be equi-joins:\n${ap.take(1500)}")
  }

  test("ctfidf: corpus stats broadcast; the only window runs at vocabulary grain") {
    val df = graft.queries.TextAnalysis.ctfidf(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"cf/A must broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), "no cartesian")
    // the ranking window partitions by source (never a global sort)
    val wins = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "top-5 window must be partitioned by source")
  }

  test("graph scale-guard: fallback rounds plan ZERO broadcast of node-grain state") {
    // The thresholded dispatch's whole point: above the node cap, a
    // round must hold NO node-grain broadcast anywhere — the state
    // flows through keyed shuffle joins. Pin both shapes per engine
    // round (CC min-label, large/small-star, BFS expansion, HITS
    // matvec) with auto-broadcast off, so the only BroadcastExchange
    // a plan can contain is one WE hinted: ≥1 in broadcast mode, 0 in
    // fallback mode. (At real above-threshold scale the stats-based
    // auto-broadcast wouldn't fire either — sides are huge.)
    import ss.implicits._
    import org.apache.spark.sql.functions.col
    val autoBc = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val aqeBc = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def broadcasts(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        allNodes(df.queryExecution.executedPlan).collect {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
        }.size
      }
      val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
      val adj = und.select(col("a").as("u"), col("b").as("v"))
        .unionAll(und.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint()
      val labels = adj.select(col("u").as("node")).distinct()
        .withColumn("lab", col("node")).localCheckpoint()
      assert(broadcasts(graft.queries.Graph.ccRound(adj, labels, bc = true)) >= 1)
      assert(broadcasts(graft.queries.Graph.ccRound(adj, labels, bc = false)) === 0,
        "CC fallback round must not broadcast the label vector")

      val canon = und.select(col("a").as("lo"), col("b").as("hi")).localCheckpoint()
      assert(broadcasts(graft.queries.Graph.lssRound(canon, bc = true)) >= 1)
      assert(broadcasts(graft.queries.Graph.lssRound(canon, bc = false)) === 0,
        "LSS fallback round must not broadcast the min digests")

      val frontier = labels.select(col("node"), org.apache.spark.sql.functions
        .lit(0L).as("dist")).limit(1).localCheckpoint()
      assert(broadcasts(graft.queries.Graph.bfsRound(adj, frontier, frontier, 1, bc = true)) >= 1)
      assert(broadcasts(graft.queries.Graph.bfsRound(adj, frontier, frontier, 1, bc = false)) === 0,
        "BFS fallback round must not broadcast frontier/visited")

      val bip = Seq((1L, 10L), (2L, 10L), (3L, 11L)).toDF("cust", "supp")
        .localCheckpoint()
      val auth = bip.select("supp").distinct()
        .select(col("supp"), org.apache.spark.sql.functions.lit(1.0).as("a"))
        .localCheckpoint()
      assert(broadcasts(graft.queries.Graph.hitsMatvec(
        bip, auth, "supp", "cust", "a", bc = true)) >= 1)
      assert(broadcasts(graft.queries.Graph.hitsMatvec(
        bip, auth, "supp", "cust", "a", bc = false)) === 0,
        "HITS fallback matvec must not broadcast the score vector")
    } finally {
      def restore(key: String, v: Option[String]): Unit = v match {
        case Some(s) => spark.conf.set(key, s)
        case None => spark.conf.unset(key)
      }
      restore("spark.sql.autoBroadcastJoinThreshold", autoBc)
      restore("spark.sql.adaptive.autoBroadcastJoinThreshold", aqeBc)
    }
  }

  test("boilerplate: the boiler-set join broadcasts; the gram frame is paid once") {
    val df = graft.queries.TextAnalysis.boilerplate(spark, sf)
    df.collect()
    // AQE re-renders the initial plan below the marker — gate the FINAL
    // plan prefix only (the repo-wide AQE plan-string rule)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("""BroadcastHashJoin \[g#\d+\]""".r.findFirstIn(p).isDefined,
      s"the gram-key boiler join must broadcast, never shuffle the gram stream:\n${p.take(1500)}")
    assert(!"""SortMergeJoin \[g#\d+\]""".r.findFirstIn(p).isDefined,
      "no gram-grain shuffle join may appear in the per-doc aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("pca: the gram digest partial-aggregates map-side (one digest per partition)") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val df = e.agg(graft.functions.GramTriFunctions.gramTri(col("v"), 1e12).as("g"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // two aggregate operators (partial + final) around one exchange:
    // the digest combines map-side, so the exchange carries ONE
    // 2080-cell buffer per partition, never row-grain traffic
    assert("(?i)partial_gram_tri".r.findFirstIn(p).isDefined,
      s"gram_tri must plan a partial aggregate:\n${p.take(1500)}")
    assert(p.contains("ObjectHashAggregate"), p.take(800))
  }

  test("group split and span corruption stay scan-side: no join wider than the broadcast audit") {
    val gs = graft.queries.Sampling.groupSplit(spark, sf)
    gs.collect()
    val pgs = gs.queryExecution.executedPlan.toString
    assert(!pgs.contains("SortMergeJoin"),
      "group split is two digests + a broadcast scalar; row-grain shuffle joins are wrong")
    val sc = graft.queries.TrainPrep.spanCorruption(spark, sf)
    sc.collect()
    val psc = sc.queryExecution.executedPlan.toString
    assert(!psc.contains("Join"), "span corruption is a pure per-doc projection")
    assert(!psc.contains("Exchange hashpartitioning"),
      s"no shuffle belongs in a per-doc projection:\n${psc.take(1200)}")
  }

  test("bucketed staging: grain-aligned consumers plan zero exchanges on the bucket key") {
    // forward (doc-bucketed) twin: the contamination rollup aggregates
    // on doc_id straight off the bucketed scan — no exchange on doc_id
    // anywhere in the executed plan, at any SF
    val cont = Dedup.contamination(spark, sf)
    cont.collect()
    val pc = cont.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(pc.contains("Bucketed: true"),
      s"contamination should read the doc-bucketed forward twin:\n${pc.take(1500)}")
    assert(!"hashpartitioning\\(doc_id#".r.findFirstIn(pc).isDefined,
      s"doc-grain rollup must not re-shuffle the doc-bucketed table:\n${pc.take(2000)}")
    // inverted (s-bucketed) side: novelty's shingle-grain aggregation
    // reads co-located buckets — no exchange on s
    val nov = Dedup.novelty(spark, sf)
    nov.collect()
    val pn = nov.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(pn.contains("Bucketed: true"),
      s"novelty should read the s-bucketed shingle table:\n${pn.take(1500)}")
    assert(!"hashpartitioning\\(s#".r.findFirstIn(pn).isDefined,
      s"shingle-grain aggregation must not re-shuffle the s-bucketed table:\n${pn.take(2000)}")
  }

  private implicit class Let[A](a: A) {
    def let[B](f: A => B): B = f(a)
  }
}
