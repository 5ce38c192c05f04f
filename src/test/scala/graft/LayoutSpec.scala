package graft

import org.apache.spark.sql.functions._

import graft.core.Layout

/** Bucketed co-located joins and skew salting: equivalence to the plain
  * operators plus the plan property that makes bucketing worth it (no
  * exchange on either join side). */
class LayoutSpec extends SparkSpec {

  test("bucketed tables join with no exchange on either side") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Layout.writeBucketed(o, "graft_b_orders", "o_orderkey", 8)
    Layout.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "graft_b_lineitem", "o_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("graft_b_orders")
        .join(spark.table("graft_b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      // result parity with the unbucketed join
      assert(joined.count() ===
        o.join(l, o("o_orderkey") === l("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    }
  }

  test("min/max manifest skipping reads strictly fewer files, same result") {
    import graft.queries.LayoutQueries
    val root = LayoutQueries.minMaxStage(spark, sf)
    val manifest = LayoutQueries.minMaxManifest(spark, root).collect()
    assert(manifest.length > 1, "stage must produce multiple files")
    // spans must tile the key space tightly enough that the probe range
    // (3..9) skips most files — the point of range-clustering the stage
    val matched = manifest.count(r =>
      r.getAs[Long]("min_u") <= 9L && r.getAs[Long]("max_u") >= 3L)
    assert(matched >= 1)
    assert(matched < manifest.length,
      s"skip must be real: $matched of ${manifest.length} files matched")
    // and the pruned read returns exactly the unpruned slice
    val pruned = LayoutQueries.all("q_ly_minmax_skip")(spark, sf).collect()
    val flat = Tables.events(spark, sf)
      .filter(col("user_id").between(3, 9))
      .select("event_id", "user_id", "ts", "value")
      .orderBy("event_id").collect()
    assert(pruned.map(_.getLong(0)).toSeq === flat.map(_.getLong(0)).toSeq)
  }

  test("min/max skip with a no-intersection range returns the empty slice") {
    import graft.queries.LayoutQueries
    // a range no file span can intersect (user ids are non-negative):
    // legal query, zero matching files — must be 0 rows, not a crash
    val out = LayoutQueries.minMaxSkipRange(spark, sf, -100L, -50L)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "value"))
  }

  test("salted two-phase aggregation equals the plain aggregation") {
    val ev = Tables.events(spark, sf)
    val salted = Layout.saltedCountSum(ev, "user_id", "value", salts = 8)
      .orderBy("user_id").collect()
    val plain = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("user_id").collect()
    assert(salted.length === plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getLong(0) === p.getLong(0))
      assert(s.getLong(1) === p.getLong(1))
      assert(s.getDouble(2) === p.getDouble(2)) // decimal combine = bit-equal
    }
  }

  test("compaction shrinks file count, preserves data, and sorts the layout") {
    val path = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("t").toString
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts", "value")
    ev.repartition(40).write.parquet(path) // simulate micro-batch fragmentation
    def parquetFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles >= 20, "setup should fragment the table")

    val before = spark.read.parquet(path).orderBy("event_id").collect().toSeq
    val n = graft.core.Layout.compact(spark, path,
      targetBytes = 512L << 20, sortCols = Seq("user_id", "ts"))
    assert(n === 1)
    assert(parquetFiles === 1, "compaction should hit the target file count")
    val after = spark.read.parquet(path).orderBy("event_id").collect().toSeq
    assert(after === before, "compaction must not change the data")
  }

  test("date-partitioned layout prunes partitions for time-ranged history reads") {
    val path = java.nio.file.Files.createTempDirectory("graft-datepart")
      .resolve("events").toString
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts", "value")
    Layout.writeDatePartitioned(ev, path, "ts", Seq("user_id", "ts"))

    val totalDays = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("day="))
    assert(totalDays >= 25, s"events span a month; got $totalDays day partitions")

    // the get_history access path over the partitioned layout
    val slice = spark.read.parquet(path)
      .filter(col("user_id") === 7 &&
        col("day").between(lit("2024-01-05").cast("date"), lit("2024-01-08").cast("date")))
    val scans = slice.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // partition pruning is real: only the 4 requested days are listed/read
    assert(scans.head.selectedPartitions.partitionCount === 4,
      s"expected 4 pruned partitions, got ${scans.head.selectedPartitions.partitionCount}")
    val p = slice.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("day"),
      s"day range must land in PartitionFilters:\n${p.take(1500)}")
    // and the non-partition key predicate still pushes to the scan
    assert(p.contains("EqualTo(user_id,7)"), p.take(1500))
    // correctness of the pruned read vs the unpartitioned table
    val expected = ev.filter(col("user_id") === 7 &&
      to_date(col("ts")).between(lit("2024-01-05").cast("date"), lit("2024-01-08").cast("date")))
    assert(slice.count() === expected.count())
  }

  test("joining the partitioned fact to a filtered day dim triggers dynamic partition pruning") {
    // Static pruning (above) covers literal ranges; at 100 TB the common
    // shape is a JOIN against a dim whose filter decides the days (a
    // calendar/campaign table) — the days are unknowable at plan time,
    // so only DYNAMIC partition pruning keeps the fact scan from listing
    // every partition. The dim must be a real relation (DPP's
    // reuse-broadcast path), so it is written to parquet first.
    val root = java.nio.file.Files.createTempDirectory("graft-dpp")
    val path = root.resolve("events").toString
    val dimPath = root.resolve("daydim").toString
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts", "value")
    Layout.writeDatePartitioned(ev, path, "ts", Seq("user_id", "ts"))
    ev.select(to_date(col("ts")).as("day")).distinct()
      .withColumn("tag",
        when(col("day").between(
          lit("2024-01-05").cast("date"), lit("2024-01-08").cast("date")), "keep")
          .otherwise("skip"))
      .write.parquet(dimPath)

    val fact = spark.read.parquet(path)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val joined = fact.join(dim, "day")
      .groupBy("day").agg(count(lit(1)).as("n"))

    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"fact scan should carry a dynamic pruning filter on day:\n${p.take(2000)}")
    // the pruned join must agree with the flat-table formulation
    val expected = ev.withColumn("day", to_date(col("ts")))
      .filter(col("day").between(
        lit("2024-01-05").cast("date"), lit("2024-01-08").cast("date")))
      .groupBy("day").agg(count(lit(1)).as("n"))
    assert(joined.orderBy("day").collect().toSeq ===
      expected.orderBy("day").collect().toSeq)
  }

  test("q_ly_pruned_history's scan prunes to exactly the 4 requested days") {
    // the DRIVER query path (not just the raw layout): the partitioned
    // read must list/read only the 4 day= partitions in the slice
    val df = graft.queries.LayoutQueries.prunedHistory(spark, sf)
    // the presentation sort makes this an AQE plan — descend the wrapper
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case _ => Nil
      }
      p +: (p.children ++ inner).flatMap(nodes)
    }
    val scans = nodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount === 4,
      s"expected 4 pruned partitions, got ${scans.head.selectedPartitions.partitionCount}")
  }

  test("q_ly_dpp's fact scan carries a dynamic pruning filter and reads only matching days") {
    // the DRIVER row path (the raw-layout DPP property is asserted
    // above): the staged day-partitioned fact joined to the
    // purchase-days dim must plan a dynamicpruning subquery on the
    // partition column, and after execution the scan must have listed
    // only the dim's days — not all ~30.
    val df = graft.queries.LayoutQueries.dppJoin(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "dpp row must be non-degenerate at every SF")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"fact scan should carry a dynamic pruning filter on day:\n${p.take(2000)}")
    // the pruned partition count equals the dim's day count (= output
    // rows, since every dim day has events at every SF). The executed
    // AQE plan nests scans inside query stages (not `children`), and a
    // dynamically pruned scan reports its runtime selection through the
    // numPartitions metric — `selectedPartitions` only reflects STATIC
    // filters.
    def nodes(pl: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = pl match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => Nil
      }
      pl +: (pl.children ++ inner).flatMap(nodes)
    }
    val pruned = nodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("events_by_day")) => f
    }
    assert(pruned.nonEmpty, "expected the partitioned events scan in the plan")
    assert(pruned.head.metrics("numPartitions").value === rows.length.toLong,
      s"expected ${rows.length} pruned day partitions, got " +
        s"${pruned.head.metrics("numPartitions").value}")
  }

  test("IVF probe reads ONLY the probed cell partitions (DPP on the ANN index)") {
    // q_sim_ivf_pruned's contract: the corpus is staged partitionBy(cell)
    // with the TRAINED quantizer (the on-disk inverted lists), and the
    // probe join must dynamically prune the scan to the NProbe probed
    // cell= directories — never the whole corpus.
    val df = graft.queries.Similarity.ivfPrunedTopK(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "probe must return candidates at every SF")
    val probedCells = rows.map(_.getAs[Long]("cell")).distinct
    assert(probedCells.length <= 2, s"NProbe=2 but saw cells ${probedCells.toSeq}")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"the corpus scan should carry a dynamic pruning filter on cell:\n${p.take(2000)}")
    def nodes(pl: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = pl match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => Nil
      }
      pl +: (pl.children ++ inner).flatMap(nodes)
    }
    val pruned = nodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("corpus_by_cell")) => f
    }
    assert(pruned.nonEmpty, "expected the cell-partitioned corpus scan in the plan")
    val n = pruned.head.metrics("numPartitions").value
    val tag = Tables.stageTag(sf)
    val root = s"${sys.props("java.io.tmpdir")}/graft_ivf_$tag/corpus_by_cell"
    val totalCells = new java.io.File(root).listFiles()
      .count(_.getName.startsWith("cell="))
    assert(n > 0 && n <= 2, s"expected <= NProbe pruned cell partitions, got $n")
    assert(n < totalCells,
      s"probe must prune: read $n of $totalCells cell partitions")
  }

  test("z-ordered layout bounds BOTH dimension spans per file") {
    // The property that makes z-order worth it: a single-dim sort gives
    // tight files on that dim but full-range spans on the other; the
    // Morton layout bounds both, so min/max stats prune either
    // predicate. Assert every file's user span AND day span is well
    // under the full range (a user-sorted layout would leave day spans
    // at ~full range in every file, and vice versa).
    graft.queries.LayoutQueries.zorderScan(spark, sf).collect() // stage
    val tag = Tables.stageTag(sf)
    val root = s"${sys.props("java.io.tmpdir")}/graft_layout_$tag/events_zorder"
    val files = new java.io.File(root).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 8, s"expected a multi-file z layout, got ${files.length}")
    val full = Tables.events(spark, sf)
      .agg(max("user_id").cast("double").as("u"),
        (datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))).cast("double").as("d"))
      .head()
    val (fullU, fullD) = (full.getDouble(0), full.getDouble(1))
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .withColumn("day_idx", datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")))
        .agg((max("user_id") - min("user_id")).cast("double"),
          (max("day_idx") - min("day_idx")).cast("double"))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }
    val avgU = spans.map(_._1).sum / spans.length
    val avgD = spans.map(_._2).sum / spans.length
    // each dim individually bounded (a day-sorted layout leaves user at
    // ~full span, and vice versa) ...
    assert(avgU < 0.8 * fullU,
      s"avg per-file user span $avgU not clustered vs full $fullU")
    assert(avgD < 0.8 * fullD,
      s"avg per-file day span $avgD not clustered vs full $fullD")
    // ... and the honest 2-D metric: the average (user × day) rectangle a
    // file covers is a small fraction of the full plane — min/max stats
    // prune most files for a point/range predicate on either dim. A
    // single-dim sort cannot get below ~1/nFiles of the plane times the
    // FULL other dim; the Morton layout shrinks the area multiplicatively.
    val areaRatio = (avgU * avgD) / (fullU * fullD)
    assert(areaRatio < 0.25,
      s"avg per-file 2-D area ratio $areaRatio not clustered " +
        s"(avgU=$avgU avgD=$avgD full=$fullU×$fullD)")
  }

  test("salted broadcast join equals the plain join") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val dim = Tables.events(spark, sf).select("user_id").distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))
    val salted = Layout.saltedBroadcastJoin(ev, dim, "user_id", salts = 4)
    val plain = ev.join(dim, "user_id")
    assert(salted.count() === plain.count())
    assert(salted.select("event_id", "user_tag").except(
      plain.select("event_id", "user_tag")).isEmpty)
  }
}
