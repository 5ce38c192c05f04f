package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Subquery surface (correlated scalar, IN, NOT IN) plus a TPC-H-Q3-shaped
  * join-planning query. The subquery entries register the test tables as
  * temp views and execute the SAME SQL text Spark-side as the DuckDB
  * oracle — one source of truth, two engines.
  *
  * What Catalyst does with each (visible in explain, asserted in spec):
  *  - correlated scalar subquery → decorrelated left outer aggregate join
  *  - IN subquery → left semi join
  *  - NOT IN → null-aware anti join (the planner's hardest rewrite; keys
  *    here are non-null so it degenerates to a plain anti join at exec)
  * At 100 TB all three become ordinary shuffles on the correlation key —
  * no per-row re-execution, which is exactly why engines decorrelate.
  */
object Subqueries {

  private def withViews(s: SparkSession, d: String): Unit =
    Seq("customer", "orders", "lineitem", "supplier", "nation", "part",
      "region").foreach { t =>
      Tables.load(s, d, t).createOrReplaceTempView(t)
    }

  private def sqlBoth(sql: String): ((SparkSession, String) => DataFrame, String) =
    ((s: SparkSession, d: String) => { withViews(s, d); s.sql(sql) }, sql)

  // --- q_sq_scalar: correlated scalar subquery in the projection ----------
  private val (scalarFn, scalarSql) = sqlBoth(
    """SELECT o_orderkey, o_totalprice,
      |  (SELECT max(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_qty,
      |  (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_lines
      |FROM orders
      |WHERE o_orderkey < 1000
      |ORDER BY o_orderkey""".stripMargin)

  // --- q_sq_lateral: correlated LATERAL derived table ----------------------
  // The per-entity top-k as a LATERAL subquery — the SQL surface users
  // reach for before they learn window functions, and the shape ORMs
  // emit for "latest N per parent". Catalyst decorrelates the
  // correlated ORDER BY + LIMIT into a ranked window join (no per-row
  // re-execution — the same reason the other subquery forms decorrelate);
  // DuckDB runs the identical text natively. Ties in o_totalprice are
  // broken by o_orderkey INSIDE the lateral so the page is
  // deterministic, and the slice keeps the output bounded at any SF.
  private val (lateralFn, lateralSql) = sqlBoth(
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_custkey % 10 = 0
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)

  // --- q_sq_in: IN subquery → left semi join ------------------------------
  private val (inFn, inSql) = sqlBoth(
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin)

  // --- q_sq_not_in: NOT IN → null-aware anti join -------------------------
  // The subquery is filtered to urgent orders: every customer has SOME
  // order in the synthetic data, so the unfiltered form returned zero
  // rows at every SF — a trivially-matching (and thus worthless) oracle
  // row. Customers without an urgent order survive at all SFs (18 /
  // 203 / 1986), so the null-aware anti join's survivors are what the
  // hash actually pins.
  private val (notInFn, notInSql) = sqlBoth(
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin)

  // --- q_sq_exists: correlated EXISTS / NOT EXISTS ------------------------
  // The remaining quantified-subquery form: customers holding at least
  // one high-value order (correlated EXISTS) but no urgent one
  // (correlated NOT EXISTS), with a correlated scalar count alongside.
  // Catalyst decorrelates both predicates to one LEFT SEMI and one
  // LEFT ANTI hash join on c_custkey — set-oriented plans, no
  // per-row re-execution of the inner query (the decorrelation is the
  // whole point of declaring EXISTS instead of looping). Both engines
  // run the identical SQL, so decorrelation differences can't move
  // results.
  private val (existsFn, existsSql) = sqlBoth(
    """SELECT c_custkey, c_name, c_mktsegment,
      |  (SELECT count(*) FROM orders o2
      |   WHERE o2.o_custkey = c_custkey AND o2.o_totalprice > 300000) AS n_big
      |FROM customer
      |WHERE EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c_custkey AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders u
      |    WHERE u.o_custkey = c_custkey AND u.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin)

  // --- q_tpch_q3: shipping-priority join-planning query -------------------
  // customer(seg) ⋈ orders(early) ⋈ lineitem(late-ship): the dim filter
  // broadcasts, the fact-fact join shuffles on orderkey, then one
  // aggregation and a true top-k (TakeOrderedAndProject). The revenue sum
  // goes through DECIMAL(18,2) for bit-stable parallel aggregation.
  def tpchQ3(s: SparkSession, d: String): DataFrame = {
    val cutoff = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val tpchQ3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // --- q_tpch_q1: pricing-summary wide aggregate --------------------------
  // The canonical whole-stage-codegen benchmark: one scan, one hash
  // aggregate, 8 aggregate expressions over 4 tiny groups — pure map-side
  // combine (the shuffle moves 4 rows × 8 cells per partition). All money
  // sums run in integer cents (`round(x*100)` recovers the exact cent
  // value; products of cents are exact ints) summed as DECIMAL(38,0) so
  // neither engine can overflow or drift: SUM(BIGINT) is BIGINT in Spark
  // (overflowable at extreme SF) but HUGEINT in DuckDB — the DECIMAL(38,0)
  // accumulator gives ONE exact type on both. Averages divide exact ints
  // in double space with identical operand order (IEEE-deterministic).
  private val (tpchQ1Fn, tpchQ1SqlText) = sqlBoth(
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sum_qty,
      |  CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sum_base_price,
      |  CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |      * (100 + CAST(round(l_tax * 100) AS BIGINT)) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_charge,
      |  CAST(SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100 / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100 / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100 / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  // --- q_tpch_q18: large-volume-customer group-by-having ------------------
  // The group-by-HAVING over the largest join: the IN subquery is itself a
  // full lineitem aggregation (Catalyst: left semi join on orderkey), then
  // customer ⋈ orders ⋈ lineitem re-aggregates only the surviving orders.
  // At 100 TB the semi-join build side is the HAVING survivors (rare by
  // construction — threshold in the distribution tail), so the big join's
  // probe side is pruned before the expensive aggregation. Quantities are
  // integer-valued doubles; `round → BIGINT` makes the sums exact, and the
  // outer CAST pins the one result type both engines share.
  private val (tpchQ18Fn, tpchQ18SqlText) = sqlBoth(
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 250)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      |LIMIT 100""".stripMargin)

  // --- q_tpch_q13: customer order-count distribution ----------------------
  // The two-level aggregation shape none of the other TPC-H rows cover:
  // customers LEFT OUTER joined to (filtered) orders so zero-order
  // customers stay in with c_count = 0 — count(o_orderkey) counts only
  // non-null matches, the outer-join edge both engines must agree on —
  // then the per-customer counts re-aggregate into a histogram. The join
  // and the first group-by share c_custkey, so one shuffle partitioning
  // serves both (Catalyst reuses the join's hash partitioning; no extra
  // exchange before the first aggregate). The second aggregate's input
  // is customer-grain counts — tiny at any SF — so the heavy work is
  // exactly one shuffle of each input. ORDER BY (custdist, c_count) DESC
  // is total: c_count is unique per output row.
  private val (tpchQ13Fn, tpchQ13SqlText) = sqlBoth(
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin)

  // --- q_tpch_q5: local-supplier-volume 6-table join ----------------------
  // The canonical join-ORDER benchmark: region → nation → supplier are
  // broadcast dims pruning in sequence (ASIA cuts 4/5 of nations, which
  // cuts suppliers, which cuts the joined fact), the orders date slice
  // pushes to its scan, and the one true fact-fact shuffle is
  // lineitem ⋈ orders on orderkey; customer joins on custkey (shuffled —
  // it grows with SF). The c_nationkey = s_nationkey condition ("local"
  // suppliers) rides the supplier broadcast join. Revenue sums in
  // DECIMAL(18,2) products like Q3 — exact, order-stable; (revenue
  // DESC, n_name) is total.
  def tpchQ5(s: SparkSession, d: String): DataFrame = {
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    Tables.lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val tpchQ5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // --- q_tpch_q21: suppliers-who-kept-orders-waiting semi/anti chain ------
  // The canonical DECORRELATION stress (TPC-H Q21): a fact-table EXISTS
  // and NOT EXISTS, both correlated to the same lineitem self-join key.
  // Catalyst plans the EXISTS as a left SEMI join and the NOT EXISTS as
  // a left ANTI join, both shuffled on l_orderkey — three hash joins
  // over the same key, no per-row re-execution, no cartesian, and
  // lineitem itself is never broadcast (PlanSpec-asserted); only the
  // supplier/nation dims broadcast. The reference schema's
  // receipt-after-commit lateness columns don't exist in the synthetic
  // lineitem, so the per-line fault predicate is l_returnflag = 'R' —
  // same shape ("this supplier's line was the problem"), same
  // correlated structure: the semi requires another supplier on the
  // order, the anti requires NO other supplier's line to be at fault.
  // ORDER BY (numwait DESC, s_name) is total: s_name is unique.
  private val (tpchQ21Fn, tpchQ21SqlText) = sqlBoth(
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND n_name = 'NATION_3'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin)

  // --- q_tpch_q17: small-quantity-order revenue (correlated scalar agg) ----
  // The OTHER canonical decorrelation shape next to Q21's semi/anti: a
  // correlated SCALAR AGGREGATE in the WHERE — each line compares its
  // quantity against 20% of ITS part's average. Catalyst decorrelates
  // to a per-partkey aggregate joined back on the correlation key (one
  // shuffle each side, no per-row re-execution). Grouped by p_brand
  // (the classic filters one brand; the synthetic part table has no
  // container column, and the 25-row per-brand output is a stronger
  // hash than Q17's single scalar). The threshold average routes
  // through exact integers — quantities are integer-valued doubles, so
  // SUM(round(qty)) is exact and the one division is IEEE-deterministic;
  // a bare avg()'s parallel double summation would drift the threshold
  // bits between engines and flip boundary rows.
  private val (tpchQ17Fn, tpchQ17SqlText) = sqlBoth(
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_quantity < (
      |  SELECT 0.2 * (CAST(SUM(CAST(round(l2.l_quantity) AS BIGINT)) AS DOUBLE) / count(*))
      |  FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin)

  // --- q_tpch_q20: potential-part-promotion nested decorrelation ----------
  // The remaining canonical subquery shape after Q21 (semi/anti) and Q17
  // (correlated scalar agg): an IN whose SUBJECT is itself an aggregate
  // over the fact table, filtered by BOTH a nested IN and a correlated
  // scalar aggregate on the composite (partkey, suppkey) key — two
  // decorrelation levels deep. The synthetic schema has no partsupp, so
  // the inventory row is derived where it actually lives at 100 TB: the
  // per-(part, supplier) total shipped volume (an aggregate at key
  // grain), and "has slack" becomes total > 2 × the 1996 window volume
  // — same structure (availqty vs half-year demand), same plan
  // obligations. Catalyst: outer IN → left semi on s_suppkey; nested IN
  // → left semi of the aggregated inner on l_partkey; correlated scalar
  // agg → per-(partkey, suppkey) aggregate joined back on the composite
  // correlation key. Three shuffles at key grain, no per-row
  // re-execution, no cartesian (PlanSpec-gated). COALESCE pins the
  // empty-window threshold to 0 in both engines (a bare SUM would be
  // NULL and silently drop slack-rich pairs that shipped nothing in
  // window — the opposite of Q20's intent). ORDER BY s_name is total.
  private val (tpchQ20Fn, tpchQ20SqlText) = sqlBoth(
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      |  AND s_suppkey IN (
      |    SELECT ps.l_suppkey FROM (
      |      SELECT l_partkey, l_suppkey,
      |        SUM(CAST(round(l_quantity) AS BIGINT)) AS availqty
      |      FROM lineitem GROUP BY l_partkey, l_suppkey) ps
      |    WHERE ps.l_partkey IN (
      |      SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
      |    AND ps.availqty > (
      |      SELECT 2.0 * COALESCE(SUM(CAST(round(l2.l_quantity) AS BIGINT)), 0)
      |      FROM lineitem l2
      |      WHERE l2.l_partkey = ps.l_partkey AND l2.l_suppkey = ps.l_suppkey
      |        AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND l2.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
      |ORDER BY s_name""".stripMargin)

  // --- q_tpch_q19: discounted-revenue disjunctive-predicate join ----------
  // The OR-of-ANDs planner stress: three (brand, size-range,
  // quantity-range) predicate groups OR'd across a lineitem ⋈ part
  // join. The obligation is that the disjunction must NOT demote the
  // join to a nested loop: Catalyst keeps the p_partkey equi-join and
  // evaluates the residual disjunction as a post-join filter, while
  // the derivable conjuncts (each group implies a brand) stay
  // pushable. The classic aggregates to one scalar; grouping by
  // p_brand gives a 3-row output whose hash pins each group's
  // membership separately. Revenue sums in DECIMAL(18,2) like Q3/Q5.
  // The synthetic part has no container column; the size ranges play
  // that role (same shape: per-group part attribute + line attribute).
  private val (tpchQ19Fn, tpchQ19SqlText) = sqlBoth(
    """SELECT p_brand, count(*) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |         AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |         AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 45
      |         AND l_quantity BETWEEN 20 AND 40)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin)

  // --- q_tpch_q22: global-sales-opportunity anti join + scalar avg --------
  // The last canonical subquery pairing: an UNCORRELATED scalar
  // aggregate (the positive-balance average over the admitted
  // segments — one tiny broadcast value) gating a NOT EXISTS anti join
  // against the fact table, then a per-segment rollup. The classic
  // keys on phone country codes; the synthetic customer's segment
  // column plays that role. Unlike Q20's correlated threshold this one
  // is corpus-global, so the plan is: scalar subquery computed once →
  // filter pushed to the customer scan → anti join on custkey →
  // aggregate. "Has no orders at all" never fires here (every
  // synthetic customer ordered), so the anti side is the URGENT slice
  // — survivors exist at every SF, keeping the row load-bearing (the
  // q_sq_not_in lesson). The average routes through exact integer
  // cents: a bare avg()'s parallel double sum would drift the
  // threshold bits and flip boundary customers between engines.
  private val (tpchQ22Fn, tpchQ22SqlText) = sqlBoth(
    """SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
      |  AND c_acctbal > (
      |    SELECT CAST(SUM(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
      |        / count(*)
      |    FROM customer c2 WHERE c2.c_acctbal > 0.0
      |      AND c2.c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE'))
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin)

  // --- q_tpch_q4: order-priority checking (EXISTS with non-equi correlation)
  // The EXISTS variant the suite lacked: the correlated subquery carries
  // a NON-EQUI predicate on the outer column (l_shipdate > o_orderdate
  // + 30 days — the classic's commit/receipt lateness adapted to the
  // synthetic columns), so decorrelation must plan a left semi join
  // whose condition mixes the l_orderkey equi key with the inequality —
  // not a pure key semi like Q18's IN. One date-sliced orders scan, one
  // semi join, a 5-group aggregate.
  private val (tpchQ4Fn, tpchQ4SqlText) = sqlBoth(
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin)

  // --- q_tpch_q2: minimum-cost supplier (correlated MIN over derived ps) --
  // TPC-H Q2's structure with the partsupp row derived where it lives in
  // the synthetic schema: per-(part, supplier) minimum observed price (an
  // aggregate at key grain, like Q20's inventory). The correlated scalar
  // MIN subquery carries its OWN join tree (supplier → nation → region
  // inside the subquery) — the hardest decorrelation in the suite after
  // Q20: Catalyst rewrites it to a per-partkey aggregate of the
  // region-filtered ps rows joined back on the correlation key. The ps
  // aggregate appears twice (outer + subquery); both sides shuffle at
  // (partkey, suppkey) grain and exchange reuse dedups the physical scan
  // where plans align. Costs are integer cents end-to-end, so the
  // minimum and the equality gate are exact in both engines. s_suppkey
  // rides the output to keep the order total under duplicate balances.
  private val (tpchQ2Fn, tpchQ2SqlText) = sqlBoth(
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS supplycost_c
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey,
      |  CAST(ps.supplycost_c AS DOUBLE) / 100 AS supplycost
      |FROM part
      |JOIN ps ON p_partkey = ps.l_partkey
      |JOIN supplier ON s_suppkey = ps.l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size = 15 AND r_name = 'EUROPE'
      |  AND ps.supplycost_c = (
      |    SELECT MIN(ps2.supplycost_c)
      |    FROM ps ps2
      |    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin)

  // --- q_tpch_q6: forecasting-revenue-change scan aggregate ---------------
  // The pure pushdown benchmark: no join at all — one lineitem scan whose
  // date/discount/quantity conjunction must reach the parquet reader
  // (PushedFilters), one map-side-combined aggregate emitting a single
  // row. The discount band compares integer basis points (round → exact
  // int) rather than raw doubles so the band edges can't flip between
  // engines; revenue = price × discount in exact cent-products summed in
  // DECIMAL(38,0). n_lines rides along so the hash pins membership, not
  // just the sum.
  private val (tpchQ6Fn, tpchQ6SqlText) = sqlBoth(
    """SELECT CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin)

  // --- q_tpch_q7: volume-shipping nation-pair flow ------------------------
  // The symmetric nation-pair join: nation joins BOTH sides of the fact
  // chain (n1 via supplier, n2 via customer) with the pair disjunction
  // filtering to the two directed flows. Both nation joins broadcast; the
  // fact-fact chain shuffles on orderkey then custkey. The shipdate slice
  // pushes to the lineitem scan; the year extraction happens after the
  // joins (grain: line). Revenue in DECIMAL(18,2) products like Q3/Q5;
  // (supp_nation, cust_nation, l_year) is a total order.
  private val (tpchQ7Fn, tpchQ7SqlText) = sqlBoth(
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice, l_discount
      |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)

  // --- q_tpch_q8: national market share -----------------------------------
  // The 8-table join (nation twice) feeding a conditional-share
  // aggregate: one nation's volume as a fraction of the regional market
  // per year. Every dim broadcasts; the only big shuffles are the
  // fact-fact orderkey join and the custkey join. Volumes are exact
  // cent-products in DECIMAL(38,0); the share division happens once per
  // year-row in double space with identical operand order, so the ratio
  // is bit-stable. n_lines pins the market membership alongside the two
  // ratios.
  private val (tpchQ8Fn, tpchQ8SqlText) = sqlBoth(
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN nation = 'NATION_5' THEN vol
      |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)
      |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
      |  count(*) AS n_lines
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS DECIMAL(38,0)) AS vol,
      |    n2.n_name AS nation
      |  FROM part JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin)

  // --- q_tpch_q9: product-type profit -------------------------------------
  // Q9's profit = revenue − cost × quantity per line, rolled up by the
  // SUPPLIER's nation and order year. The synthetic schema has no
  // ps_supplycost; p_retailprice is the per-part cost surrogate (same
  // shape: a part-side attribute multiplying a line-side quantity, which
  // forces the part join to carry a non-key column through the fact
  // chain). The p_name LIKE filter prunes the part build side BEFORE the
  // join — at 100 TB that broadcast is what keeps the fact scan the only
  // big input. Profit is exact integer ten-thousandths-of-a-cent summed
  // in DECIMAL(38,0); amounts can be negative (cost > revenue) so the
  // sum exercises signed accumulation.
  private val (tpchQ9Fn, tpchQ9SqlText) = sqlBoth(
    """SELECT nation, o_year,
      |  CAST(SUM(amount) AS DOUBLE) / 10000.0 AS sum_profit,
      |  count(*) AS n_lines
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |        * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |      - CAST(round(p_retailprice * 100) AS BIGINT)
      |        * CAST(round(l_quantity) AS BIGINT) * 100 AS DECIMAL(38,0)) AS amount
      |  FROM part JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%blue%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year""".stripMargin)

  // --- q_tpch_q10: returned-item reporting --------------------------------
  // The classic top-20 "who returned the most" report: one quarter of
  // orders, only returned lines, customer ⋈ orders ⋈ lineitem ⋈ nation,
  // re-aggregated at customer grain and cut by TakeOrderedAndProject.
  // The returnflag filter pushes to the lineitem scan and the date slice
  // to orders, so the orderkey shuffle moves only the quarter's returned
  // lines. Revenue in DECIMAL(18,2) products; (revenue DESC, c_custkey)
  // is total.
  private val (tpchQ10Fn, tpchQ10SqlText) = sqlBoth(
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name, c_mktsegment
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin)

  // --- q_tpch_q11: important-stock identification -------------------------
  // Q11's group-HAVING-vs-global-scalar shape: per-part inventory value
  // for one nation's suppliers (derived at (part, supplier) grain from
  // shipped volume — no partsupp in the synthetic schema), kept only
  // where the part's value exceeds a fraction of the nation's total. The
  // scalar subquery re-aggregates the SAME derived table — the threshold
  // is one broadcast value, the comparison side stays at part grain. The
  // fraction gate multiplies instead of divides (value × 10000 > total)
  // so the comparison is exact DECIMAL(38,0) integer arithmetic in both
  // engines — no ratio bits to drift. ORDER BY (value DESC, ps_partkey)
  // is total.
  private val (tpchQ11Fn, tpchQ11SqlText) = sqlBoth(
    """WITH ps AS (
      |  SELECT l_partkey,
      |    SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round(l_quantity) AS BIGINT) AS DECIMAL(38,0))) AS value_c
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_7'
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS ps_partkey, CAST(value_c AS DOUBLE) / 100 AS value
      |FROM ps
      |WHERE value_c * 10000 > (SELECT SUM(value_c) FROM ps)
      |ORDER BY value DESC, ps_partkey""".stripMargin)

  // --- q_tpch_q12: shipping-lag priority counts ---------------------------
  // Q12's conditional-count pivot: lines grouped by a mode-like column
  // with urgent/non-urgent CASE sums from the joined order. The
  // synthetic lineitem has no shipmode or commit/receipt dates;
  // l_returnflag plays the mode and the lag window (ship 30–90 days
  // after order date) plays the late-delivery predicate — the same
  // cross-table non-equi residual the classic carries, evaluated as a
  // post-join filter on the orderkey equi-join. The CASE sums cast to
  // BIGINT (DuckDB's integer SUM is HUGEINT — the cast pins one shared
  // type).
  private val (tpchQ12Fn, tpchQ12SqlText) = sqlBoth(
    """SELECT l_returnflag AS l_shipmode,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
      |      OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
      |      AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_returnflag IN ('A', 'N')
      |  AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin)

  // --- q_tpch_q14: promotion effect ----------------------------------------
  // The conditional-share scalar: promo revenue as a percentage of one
  // month's total. One lineitem ⋈ part join (part broadcasts; the date
  // slice pushes to the fact scan), exact cent-product volumes, and ONE
  // double division at the end — the single-row output's hash pins both
  // the ratio bits and the month's line count.
  private val (tpchQ14Fn, tpchQ14SqlText) = sqlBoth(
    """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc_c
      |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) * 100
      |    / CAST(SUM(disc_c) AS DOUBLE) AS promo_revenue,
      |  count(*) AS n_lines
      |FROM (
      |  SELECT p_type,
      |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS DECIMAL(38,0)) AS disc_c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00') x""".stripMargin)

  // --- q_tpch_q15: top supplier (view reused against its own max) ---------
  // Q15's self-referential view: a quarter's per-supplier revenue,
  // selected where revenue equals the view's own MAX. The aggregate
  // appears twice (row side + scalar max side); revenues are exact
  // DECIMAL(38,0) cent-products so the equality can't miss by a bit —
  // the double formulation the classic uses is exactly where parallel
  // summation would drop the top supplier nondeterministically. The
  // scalar side reduces to one broadcast value; the row side joins
  // supplier by key.
  private val (tpchQ15Fn, tpchQ15SqlText) = sqlBoth(
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS DECIMAL(38,0))) AS total_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_c AS DOUBLE) / 10000.0 AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_c = (SELECT MAX(total_c) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin)

  // --- q_tpch_q16: parts/supplier relationship ----------------------------
  // Q16's COUNT-DISTINCT-suppliers rollup: the (part, supplier)
  // relationship table derived as DISTINCT pairs from lineitem (the
  // synthetic partsupp), part-attribute exclusions pushed to the part
  // scan, and the complaint-supplier NOT IN (negative balance plays the
  // complaint flag) planned as an anti join before the distinct
  // aggregation. count(DISTINCT l_suppkey) forces the two-phase
  // distinct-aggregate plan — partial distinct per partition, exchange
  // at group grain, final count. (supplier_cnt DESC, brand, type, size)
  // is total.
  private val (tpchQ16Fn, tpchQ16SqlText) = sqlBoth(
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_type NOT IN ('PROMO', 'ECONOMY')
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q2" -> tpchQ2Fn,
    "q_tpch_q6" -> tpchQ6Fn,
    "q_tpch_q7" -> tpchQ7Fn,
    "q_tpch_q8" -> tpchQ8Fn,
    "q_tpch_q9" -> tpchQ9Fn,
    "q_tpch_q10" -> tpchQ10Fn,
    "q_tpch_q11" -> tpchQ11Fn,
    "q_tpch_q12" -> tpchQ12Fn,
    "q_tpch_q14" -> tpchQ14Fn,
    "q_tpch_q15" -> tpchQ15Fn,
    "q_tpch_q16" -> tpchQ16Fn,
    "q_tpch_q4" -> tpchQ4Fn,
    "q_tpch_q19" -> tpchQ19Fn,
    "q_tpch_q22" -> tpchQ22Fn,
    "q_tpch_q20" -> tpchQ20Fn,
    "q_tpch_q17" -> tpchQ17Fn,
    "q_tpch_q21" -> tpchQ21Fn,
    "q_tpch_q5" -> (tpchQ5 _),
    "q_sq_scalar" -> scalarFn,
    "q_sq_lateral" -> lateralFn,
    "q_sq_in" -> inFn,
    "q_sq_not_in" -> notInFn,
    "q_sq_exists" -> existsFn,
    "q_tpch_q3" -> (tpchQ3 _),
    "q_tpch_q1" -> tpchQ1Fn,
    "q_tpch_q18" -> tpchQ18Fn,
    "q_tpch_q13" -> tpchQ13Fn)

  val oracles: Map[String, String] = Map(
    "q_tpch_q2" -> tpchQ2SqlText,
    "q_tpch_q6" -> tpchQ6SqlText,
    "q_tpch_q7" -> tpchQ7SqlText,
    "q_tpch_q8" -> tpchQ8SqlText,
    "q_tpch_q9" -> tpchQ9SqlText,
    "q_tpch_q10" -> tpchQ10SqlText,
    "q_tpch_q11" -> tpchQ11SqlText,
    "q_tpch_q12" -> tpchQ12SqlText,
    "q_tpch_q14" -> tpchQ14SqlText,
    "q_tpch_q15" -> tpchQ15SqlText,
    "q_tpch_q16" -> tpchQ16SqlText,
    "q_tpch_q4" -> tpchQ4SqlText,
    "q_tpch_q19" -> tpchQ19SqlText,
    "q_tpch_q22" -> tpchQ22SqlText,
    "q_tpch_q20" -> tpchQ20SqlText,
    "q_tpch_q17" -> tpchQ17SqlText,
    "q_tpch_q21" -> tpchQ21SqlText,
    "q_tpch_q5" -> tpchQ5Sql,
    "q_sq_scalar" -> scalarSql,
    "q_sq_lateral" -> lateralSql,
    "q_sq_in" -> inSql,
    "q_sq_not_in" -> notInSql,
    "q_sq_exists" -> existsSql,
    "q_tpch_q3" -> tpchQ3Sql,
    "q_tpch_q1" -> tpchQ1SqlText,
    "q_tpch_q18" -> tpchQ18SqlText,
    "q_tpch_q13" -> tpchQ13SqlText)
}
