package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.warehouse.{Normalize, Upsert}

/** Randomized property tests (SURVEY §5.3): the contracts that must hold
  * for EVERY input, not just the golden cases — upsert idempotence and
  * last-write-wins, dedup key-uniqueness, pagination
  * disjointness/coverage, and slug determinism.
  *
  * ScalaCheck generators are driven directly (fixed seed → reproducible
  * failures) because the scalatest-scalacheck bridge artifact is not in
  * the offline dependency cache.
  */
class PropertySpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  /** n reproducible samples from a generator. */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](gen: Gen[A], n: Int = 12)(body: A => Unit): Unit = {
    val xs = samples(gen, n)
    assert(xs.nonEmpty, "generator produced no samples")
    xs.foreach(body)
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val obsSchema = StructType(Seq(
    StructField("series_id", StringType),
    StructField("observation_time", IntegerType), // key stand-in
    StructField("value", DoubleType),
    StructField("ingestion_time", IntegerType)))

  private def obsDf(rows: Seq[(String, Int, Double, Int)]) =
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, obsSchema)

  private val genRows: Gen[List[(String, Int, Double, Int)]] =
    Gen.listOfN(40, for {
      sid <- Gen.oneOf("NG_A", "NG_B", "NG_C")
      t <- Gen.choose(0, 5)
      v <- Gen.choose(-1000, 1000).map(_ / 10.0)
      ver <- Gen.choose(0, 3)
    } yield (sid, t, v, ver))

  test("latestWins: one row per key, and it carries the max version (any input)") {
    forAll(genRows) { rows =>
      whenever(rows.nonEmpty) {
        val out = Upsert.latestWins(obsDf(rows),
          keys = Seq("series_id", "observation_time"),
          versionCol = "ingestion_time").collect()
        val byKey = rows.groupBy(r => (r._1, r._2))
        assert(out.length === byKey.size)
        out.foreach { r =>
          val key = (r.getString(0), r.getInt(1))
          assert(r.getInt(3) === byKey(key).map(_._4).max)
        }
      }
    }
  }

  test("latestWins is deterministic under any input row order and partitioning") {
    forAll(genRows) { rows =>
      whenever(rows.nonEmpty) {
        def run(df: org.apache.spark.sql.DataFrame) =
          Upsert.latestWins(df, Seq("series_id", "observation_time"), "ingestion_time")
            .orderBy("series_id", "observation_time")
            .collect().toSeq
        val a = run(obsDf(rows))
        val b = run(obsDf(rows.reverse).repartition(7))
        assert(a === b)
      }
    }
  }

  test("upsert to disk is idempotent: applying the same batch twice ≡ once") {
    forAll(Gen.listOfN(20, for {
      sid <- Gen.oneOf("NG_A", "NG_B")
      t <- Gen.choose(0, 3)
      v <- Gen.choose(0, 100).map(_.toDouble)
    } yield (sid, t, v, 1)), n = 4) { rows =>
      whenever(rows.nonEmpty) {
        val path = Files.createTempDirectory("graft-prop").resolve("t").toString
        val batch = obsDf(rows)
        Upsert.upsert(spark, path, batch, Seq("series_id", "observation_time"), "ingestion_time")
        val once = spark.read.parquet(path).orderBy("series_id", "observation_time").collect().toSeq
        Upsert.upsert(spark, path, batch, Seq("series_id", "observation_time"), "ingestion_time")
        val twice = spark.read.parquet(path).orderBy("series_id", "observation_time").collect().toSeq
        assert(once === twice)
      }
    }
  }

  test("pagination: pages are disjoint and cover the whole ordered result") {
    val df = Tables.orders(spark, sf)
      .select("o_orderkey").orderBy("o_orderkey")
    val total = df.count().toInt
    val pageSize = 500
    val pages = (0 until total by pageSize).map(off =>
      df.offset(off).limit(pageSize).collect().map(_.getLong(0)).toSeq)
    val all = pages.flatten
    assert(all.length === total, "pages must cover every row")
    assert(all.distinct.length === all.length, "pages must be disjoint")
    assert(all === all.sorted, "concatenated pages must preserve the order")
  }

  test("chunk windows tile exactly for ANY geometry and token counts") {
    import ss.implicits._
    // the contract that must hold for every (win, stride <= win, n):
    // indices dense from 0, starts step by stride, all-but-last windows
    // full, coverage of [0, n) with no gap, never an empty window
    val gen = for {
      win <- Gen.choose(1, 12)
      stride <- Gen.choose(1, win)
      sizes <- Gen.listOfN(6, Gen.choose(0, 40))
    } yield (win, stride, sizes)
    forAll(gen, n = 10) { case (win, stride, sizes) =>
      val docs = sizes.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val wins = graft.queries.TrainPrep.chunkDocs(docs, win.toLong, stride.toLong)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("window_idx"),
          r.getAs[Long]("tok_start"), r.getAs[Long]("win_len")))
        .groupBy(_._1)
      sizes.zipWithIndex.foreach { case (n, i) =>
        val ws = wins.getOrElse(i.toLong, Array.empty).sortBy(_._2)
        if (n == 0) assert(ws.isEmpty, "empty doc emits no windows")
        else {
          ws.zipWithIndex.foreach { case ((_, idx, start, len), j) =>
            assert(idx === j.toLong && start === j.toLong * stride)
            assert(len >= 1 && len <= win)
          }
          ws.init.foreach { case (_, _, _, len) => assert(len === win.toLong) }
          assert(ws.flatMap(w => w._3 until (w._3 + w._4)).toSet ===
            (0L until n.toLong).toSet, s"win=$win stride=$stride n=$n must tile")
        }
      }
    }
  }

  test("makeSeriesId is deterministic and case/whitespace-normalizing") {
    val genPair = for {
      a <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      b <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    } yield (a, b)
    forAll(genPair) { case (a, b) =>
      val df = spark.range(1).select(
        Normalize.makeSeriesId(lit("DS"), lit(s"  $a  "), lit(b)).as("s1"),
        Normalize.makeSeriesId(lit("DS"), lit(a.toLowerCase), lit(b)).as("s2"))
      val r = df.head
      assert(r.getString(0) === r.getString(1),
        "padding and case must not change the slug")
      assert(r.getString(0).startsWith("NG_DS_"))
    }
  }

  test("CDC chunking is insertion-stable: a shifted document re-aligns past one chunk") {
    import ss.implicits._
    import org.apache.spark.sql.functions.col
    // The property fixed-size windows lack: prepend an arbitrary prefix
    // and every chunk after the first boundary reproduces identically,
    // because boundaries depend only on content. Deterministic "docs"
    // built from the corpus vocabulary; for each prefix, the original's
    // chunks minus at most its FIRST (which may merge into the prefix
    // region) must all reappear in the shifted doc's chunk set.
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "line", "sort", "window")
    val base = (0 until 400).map(i => vocab((i * 7 + 3) % vocab.length)).mkString(" ")
    val prefixes = Seq("zzz", "alpha beta", "one two three four five six seven")
    val docs = (("base", base) +: prefixes.zipWithIndex.map { case (p, i) =>
      (s"shift$i", s"$p $base")
    }).toDF("id", "text")
    val chunkSets = docs
      .select(col("id"), graft.queries.TextAnalysis.cdcChunkArray(col("text")).as("cs"))
      .as[(String, Seq[String])].collect().toMap
    val baseChunks = chunkSets("base")
    assert(baseChunks.length >= 5, s"need several chunks, got ${baseChunks.length}")
    prefixes.indices.foreach { i =>
      val shifted = chunkSets(s"shift$i").toSet
      val missing = baseChunks.drop(1).filterNot(shifted)
      assert(missing.isEmpty,
        s"prefix $i broke ${missing.length} content-defined chunks: ${missing.take(2)}")
    }
  }

  test("connected components equal a union-find oracle on random graphs") {
    import ss.implicits._
    // The pointer-jumping rewrite must stay EXACT for every graph shape,
    // not just chains and cliques — random sparse graphs exercise merged
    // components, self-contained stars and multi-hop bridges. Oracle: a
    // plain Scala union-find over the same edges.
    val genGraph = for {
      n <- Gen.choose(2, 60)
      m <- Gen.choose(1, 90)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (a.toLong, b.toLong))
      if edges.nonEmpty
    } yield edges
    forAll(genGraph, n = 10) { edges =>
      val df = (edges ++ edges.map(_.swap)).toDF("src", "dst")
      val (labels, rounds) = graft.queries.Dedup.connectedComponents(df)
      val got = labels.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
      // union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-id per component from the oracle
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v => v -> nodes.filter(u => find(u) == find(v)).min }.toMap
      assert(got == expected, s"labels diverged from union-find on ${edges.take(8)}…")
      assert(rounds <= 16, s"$rounds rounds for a ≤60-node graph")
    }
  }

  test("AVI mux → relational frame extraction round-trips ANY frame geometry") {
    import ss.implicits._
    // any frame count (incl. zero), any frame lengths (incl. zero and
    // odd — RIFF padding), any junk chunk: the idx1-driven slices must
    // recover the original frame bytes exactly
    val gen = for {
      n <- Gen.choose(0, 6)
      lens <- Gen.listOfN(n, Gen.choose(0, 40))
      junkLen <- Gen.choose(0, 9)
      w <- Gen.choose(1, 4096)
      h <- Gen.choose(1, 4096)
      us <- Gen.choose(1, 1000000)
    } yield (lens, junkLen, w, h, us)
    forAll(gen, n = 10) { case (lens, junkLen, w, h, us) =>
      val frames = lens.zipWithIndex.map { case (len, i) =>
        Array.tabulate[Byte](len)(j => (j * 31 + i * 7 + 3).toByte) }
      val junk = if (junkLen == 0) None
        else Some(Array.tabulate[Byte](junkLen)(_.toByte))
      val avi = graft.multimodal.Avi.encode(w, h, us, frames, junk)
      val rows = graft.multimodal.Avi.frames(
        Seq((1L, avi)).toDF("media_id", "payload"))
        .orderBy("frame_idx").collect()
      assert(rows.length == frames.length)
      def hex(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
        .digest(b).map(x => f"$x%02x").mkString
      rows.zip(frames).foreach { case (r, f) =>
        assert(r.getAs[Long]("frame_len") == f.length.toLong)
        assert(r.getAs[String]("frame_md5") == hex(f),
          s"frame bytes diverged at geometry lens=$lens junk=$junkLen")
      }
      assert(rows.forall(r => r.getAs[Long]("width") == w &&
        r.getAs[Long]("height") == h && r.getAs[Long]("us_per_frame") == us &&
        r.getAs[Long]("total_frames") == frames.length.toLong))
    }
  }

  test("BandJoinRewrite ≡ nested-loop for ANY data, widths, and signs") {
    import org.apache.spark.sql.functions.col
    val gen = for {
      n <- Gen.choose(5, 40)
      m <- Gen.choose(5, 40)
      // negative values exercise the floor-division path; clustered and
      // spread-out ranges exercise empty/full buckets
      ls <- Gen.listOfN(n, Gen.choose(-500L, 500L))
      rs <- Gen.listOfN(m, Gen.choose(-500L, 500L))
      w1 <- Gen.choose(0L, 120L)
      w2 <- Gen.choose(0L, 120L)
    } yield (ls, rs, w1, w2)
    forAll(gen, n = 10) { case (ls, rs, w1, w2) =>
      import ss.implicits._
      val l = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("lid", "lt")
      val r = rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("rid", "rt")
      def pairs() = l.join(r,
          col("lt") >= col("rt") - w1 && col("lt") <= col("rt") + w2)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val rewritten = pairs() // rule on (session default)
      spark.conf.set(graft.plans.BandJoinRewrite.EnabledKey, "false")
      val naive = try pairs()
        finally spark.conf.unset(graft.plans.BandJoinRewrite.EnabledKey)
      assert(rewritten === naive,
        s"w1=$w1 w2=$w2: rewrite diverged (${rewritten.size} vs ${naive.size})")
    }
  }

  test("BandJoinRewrite survives the Long domain edges and zero-width bands") {
    import org.apache.spark.sql.functions.col
    import ss.implicits._
    // Values within w of Long.MinValue wrapped in the old
    // x - pmod(x, b) floor division: ANSI throws, non-ANSI silently
    // mis-buckets (= DROPS) qualifying pairs; w1 = w2 = 0 exercises
    // the b == 1 equi-join arm. Edge values sit on the LEFT side only
    // (no arithmetic touches lt in the condition); rt values stay at
    // least max-width from the domain edge so rt ± w itself is
    // representable under ANSI.
    val edge = Seq(Long.MinValue, Long.MinValue + 1, Long.MinValue + 7,
      Long.MinValue + 100, -3L, 0L, 5L,
      Long.MaxValue - 100, Long.MaxValue - 1, Long.MaxValue)
    val rvals = Seq(Long.MinValue + 100, Long.MinValue + 120, -3L, 0L, 5L,
      Long.MaxValue - 130, Long.MaxValue - 120)
    val l = edge.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("lid", "lt")
    val r = rvals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("rid", "rt")
    for ((w1, w2) <- Seq((0L, 0L), (3L, 5L), (100L, 7L), (0L, 120L))) {
      def pairs() = l.join(r,
          col("lt") >= col("rt") - w1 && col("lt") <= col("rt") + w2)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val rewritten = pairs()
      spark.conf.set(graft.plans.BandJoinRewrite.EnabledKey, "false")
      val naive = try pairs()
        finally spark.conf.unset(graft.plans.BandJoinRewrite.EnabledKey)
      assert(rewritten === naive,
        s"w1=$w1 w2=$w2: edge-domain divergence " +
          s"(${rewritten.size} vs ${naive.size})")
    }
  }

  test("UnwrapStringCast: IN-lists unwrap only when every literal round-trips") {
    import org.apache.spark.sql.functions.col
    val df = Tables.orders(spark, sf)
    // all-canonical list: results equal the typed IN
    val typed = df.filter(col("o_custkey").isin(3L, 5L, 7L)).count()
    val asStr = df.filter(col("o_custkey").cast("string").isin("3", "5", "7"))
    assert(asStr.count() === typed)
    val p = asStr.queryExecution.executedPlan.toString
    assert(p.contains("In(o_custkey") || p.contains("o_custkey#"),
      s"IN should unwrap to the typed column:\n${p.take(1500)}")
    assert(!p.contains("cast(o_custkey"),
      s"unwrapped IN must not retain the string cast:\n${p.take(1500)}")
    // a non-canonical member ('05') blocks the whole-list rewrite and
    // string semantics hold: '05' matches nothing
    val mixed = df.filter(col("o_custkey").cast("string").isin("05", "7"))
    assert(mixed.count() ===
      df.filter(col("o_custkey") === 7L).count())
    val pm = mixed.queryExecution.executedPlan.toString
    assert(pm.contains("cast(o_custkey"),
      s"mixed-canonical IN must stay in string space:\n${pm.take(1500)}")
  }

  test("exact selection: adversarial domains — constants, outliers, Long extremes, 1..10k groups") {
    import ss.implicits._
    import graft.queries.Analytics
    // The regimes the sf fixtures don't reach: degenerate width
    // (all-equal groups), a bucket-isolating outlier, the full Long
    // domain (where lo-anchored bucket-BOUND arithmetic would wrap —
    // the aligned-bucket form has no bound to overflow), and group
    // cardinalities 1 / 2 / 10k. Oracle: in-memory sort at the lower
    // median rank.
    def check(rows: Seq[(String, Long)], tag: String): Unit = {
      val out = Analytics.exactMedianOf(ss, rows.toDF("g", "v")).collect()
        .map(r => r.getAs[String]("g") ->
          (r.getAs[Long]("n"), r.getAs[Long]("median_cents"))).toMap
      val expect = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> (vs.size.toLong, sorted(((vs.size + 1) / 2) - 1))
      }
      assert(out === expect, s"[$tag] got $out")
    }
    check(Seq(("a", 7L)), "single row")
    check(Seq.fill(5)(("min", Long.MinValue)) ++
      Seq.fill(4)(("max", Long.MaxValue)), "constant groups at extremes")
    check((1 to 9).map(i => ("o", i.toLong)) :+ (("o", Long.MaxValue)),
      "single outlier widens the domain without moving the median")
    check(Seq(("x", Long.MinValue), ("x", Long.MinValue + 1), ("x", -1L),
      ("x", 0L), ("x", 1L), ("x", Long.MaxValue - 1),
      ("x", Long.MaxValue)), "full Long domain in one group")
    val rnd = new scala.util.Random(7)
    check((0 until 10000).flatMap { g =>
      (0 to rnd.nextInt(5)).map(_ => (s"g$g", rnd.nextLong()))
    }, "10k groups of random Longs")
  }

  test("exact multi-rank selection: edge ranks k=1 and k=n at adversarial domains") {
    import ss.implicits._
    import graft.queries.Analytics
    // p1 (k = ceil(n/100) = 1 for n <= 100 → group min) and p100
    // (k = n → group max) are the rank walk's boundary conditions;
    // p50 rides the same pass. Values span the full Long domain.
    val spec = Seq(("p1", 1L, 100L), ("p50", 1L, 2L), ("p100", 1L, 1L))
    val rows = Seq(("x", Long.MinValue), ("x", -5L), ("x", 0L),
      ("x", 5L), ("x", Long.MaxValue),
      ("y", 3L), ("y", 3L), ("y", 3L))
    val base = rows.toDF("g", "v")
    val out = Analytics.selectAtRanks(base, spec).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("quantile")) ->
        r.getAs[Long]("value_cents")).toMap
    val expect = rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      spec.map { case (label, num, den) =>
        val k = (vs.size * num + den - 1) / den
        (g, label) -> sorted((k - 1).toInt)
      }
    }
    assert(out === expect, s"got $out")
  }

  test("markovStationary cardinality guard fails loudly on a high-cardinality state column") {
    // The driver-matrix iteration is only legal at digest-sized K; a
    // state column with corpus-grain cardinality must trip the guard
    // BEFORE the K²-cell collect — loudly, with the distributed
    // alternative named — instead of silently OOM-ing the driver.
    import ss.implicits._
    // a closed 60-state cycle (the 61st event returns to state_1), so
    // the under-cap run below conserves probability mass exactly
    val wide = (1 to 61).map(i =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        i.toLong, if (i == 61) "state_1" else s"state_$i"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val err = intercept[IllegalArgumentException] {
      graft.queries.Analytics.markovStationaryOf(spark, wide, maxStates = 16)
    }
    assert(err.getMessage.contains("driver-matrix cap"), err.getMessage)
    assert(err.getMessage.contains("power iteration"), err.getMessage)

    // under the cap the same fixture computes: a valid distribution
    // (non-negative, sums to ~1 over the reachable chain)
    val ok = graft.queries.Analytics.markovStationaryOf(spark, wide, maxStates = 60)
      .collect().map(_.getDouble(1))
    assert(ok.forall(_ >= 0.0))
    assert(math.abs(ok.sum - 1.0) < 1e-9, s"mass ${ok.sum}")
  }

  test("gram_tri digest equals the BigDecimal HALF_UP brute on any vector set") {
    import org.apache.spark.sql.functions.col
    import ss.implicits._
    val gen: Gen[(Int, List[List[Double]])] = for {
      dims <- Gen.choose(1, 8)
      n <- Gen.choose(1, 20)
      rows <- Gen.listOfN(n, Gen.listOfN(dims,
        Gen.choose(-2000000, 2000000).map(_ / 1000000.0)))
    } yield (dims, rows)
    forAll(gen, n = 10) { case (dims, rows) =>
      val df = rows.map(r => Tuple1(r.toArray)).toDF("v")
        .repartition(3) // force partial buffers + a real merge
      val got = df.agg(graft.functions.GramTriFunctions
          .gramTri(col("v"), 1000000.0).as("g"))
        .head().getSeq[Long](0)
      val cells = dims * (dims + 1) / 2
      assert(got.length === cells)
      val expected = Array.ofDim[Long](cells)
      rows.foreach { v =>
        var p = 0
        for (i <- 0 until dims; j <- i until dims) {
          expected(p) += java.math.BigDecimal.valueOf(v(i) * v(j) * 1000000.0)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
          p += 1
        }
      }
      assert(got === expected.toSeq)
    }
  }

  test("pca2: orthonormal to PC1, dominated by lambda1, reconstruction consistent") {
    import graft.queries.Similarity
    val v1 = Similarity.pca(spark, sf).collect()
      .sortBy(_.getAs[Long]("dim")).map(_.getAs[Double]("loading"))
    val p2 = Similarity.pca2(spark, sf).collect().sortBy(_.getAs[Long]("dim"))
    val v2 = p2.map(_.getAs[Double]("loading2"))
    val l1 = Similarity.pca(spark, sf).head().getAs[Double]("eigenvalue")
    val l2 = p2.head.getAs[Double]("eigenvalue2")
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(v1, v2)) < 1e-9, s"v1.v2 = ${dot(v1, v2)}")
    assert(math.abs(dot(v2, v2) - 1.0) < 1e-12, "v2 not unit norm")
    // the synthetic corpus has a near-degenerate top spectrum
    // (lambda1 ~ lambda2 ~ 0.026 at sf0.001): 8-round power iteration
    // lands v1 SOMEWHERE in the top-2 span and deflation finds the
    // orthogonal rest of it, so the two Rayleigh quotients bracket the
    // top-2 eigenvalues in arbitrary order - assert the bracket, not
    // strict dominance (which only a separated spectrum guarantees)
    assert(l2 > 0.0 && l2 <= l1 * 1.05, s"eigenvalue pair $l1 / $l2")
    val cum = p2.head.getAs[Double]("cum_var_ratio")
    assert(cum > 0.0 && cum <= 1.0 + 1e-12)
    // reconstruction: err >= -eps everywhere (Pythagoras under the
    // orthonormal basis) and err_ratio means to ~1 by construction
    val er = Similarity.reconErr(spark, sf).collect()
    assert(er.nonEmpty)
    er.foreach(r => assert(r.getAs[Double]("recon_err") >= -1e-9))
    val ratios = er.map(_.getAs[Double]("err_ratio"))
    val meanRatio = ratios.sum / ratios.length
    assert(math.abs(meanRatio - 1.0) < 1e-6, s"mean err_ratio $meanRatio")
  }

  test("dyadic tree digest is structurally bounded under the driver guard") {
    import ss.implicits._
    // cover EVERY finest-level bucket (cents i*256, i in 0..4095) plus
    // out-of-range extremes that must clamp into buckets 0 and 4095:
    // the digest then reaches its structural maximum,
    // sum over l=8..19 of 2^(20-l) = 8,190 rows, far under DyadMaxRows
    // (200,000) — the require guards a future DyadBits/DyadMinLevel
    // change, not any possible corpus at the current geometry.
    val vals = (0 until 4096).map(i => (i.toLong, (i * 256).toDouble / 100.0)) ++
      Seq((9999L, -5.0), (10000L, 9.9e7))
    val tree = graft.queries.Analytics.dyadicTree(vals.toDF("event_id", "value"))
    assert(tree.count() === 8190L)
  }

  test("cap registry enumerates every guard with live headroom and named fallback") {
    val rows = graft.queries.Discovery.capRegistry(spark, sf).collect()
    val names = rows.map(_.getAs[String]("cap_name")).toSet
    assert(names === Set(
      "cap_dedup_shingle_df", "cap_dedup_minhash_band", "cap_dedup_minhash_wide",
      "cap_dedup_simhash_band", "cap_dedup_simhash_wide", "cap_dedup_embed_band",
      "cap_dedup_sem_cluster", "cap_markov_states", "cap_dyadic_digest_rows",
      "cap_pca_gram_dims", "cap_graph_broadcast_nodes", "cap_export_page_rows",
      "cap_streaming_neardup_shard"))
    rows.foreach { r =>
      val limit = r.getAs[Long]("guard_limit")
      val cur = r.getAs[Long]("current_value")
      assert(limit > 0 && cur >= 0, r.toString)
      assert(r.getAs[String]("fallback").nonEmpty)
      // headroom is integer percent of limit over current (null iff cur=0)
      if (cur == 0L) assert(r.isNullAt(r.fieldIndex("headroom_pct")))
      else assert(r.getAs[Long]("headroom_pct") === limit * 100L / cur)
      // a live 'fail' guard over its limit would have thrown before this
      // row ever materialized — the registry must agree
      if (r.getAs[String]("kind") == "fail")
        assert(cur <= limit, s"fail-kind guard over limit: $r")
    }
  }
}
