package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Dedup-specific guarantees beyond the driver oracles: the banded
  * simhash candidate generation is EXACT (equal to the all-pairs
  * baseline) for the hamming<=2 threshold, and hot-shingle doc-freq
  * capping bounds candidate buckets without losing rare-shingle dups.
  */
class DedupSpec extends SparkSpec {

  test("banded simhash candidates == all-pairs baseline (pigeonhole recall)") {
    val banded = Dedup.simhash(spark, sf).collect().toSeq
    val allPairs = Dedup.simhashAllPairs(spark, sf).collect().toSeq
    assert(banded == allPairs,
      s"banded=${banded.size} rows, all-pairs=${allPairs.size} rows")
    assert(allPairs.nonEmpty, "corpus should contain planted near-dups")
  }

  test("semdedup decisions agree with an interpreted-HOF brute-force recompute") {
    // Independent recompute of the drop rule on a different code path:
    // interpreted HOF dot products (dotHof) and a raw groupBy — if the
    // codegen'd vec_dot, the cluster argmax, or the join/aggregate shape
    // in semDedup drifted, the decisions would diverge.
    import graft.queries.{Similarity, Vectors}
    val got = Dedup.semDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("n_earlier_dups"), r.getAs[Boolean]("is_kept")))
    assert(got.nonEmpty)
    got.foreach { case (_, _, n, kept) => assert(kept === (n == 0L)) }
    val e = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cluster_id", Similarity.clusterOf(col("v")))
    val brute = e.toDF("da", "va", "ca")
      .join(e.toDF("db", "vb", "cb"), col("ca") === col("cb") && col("da") < col("db"))
      .filter(Vectors.dotHof(col("va"), col("vb")) /
        (sqrt(Vectors.dotHof(col("va"), col("va"))) *
          sqrt(Vectors.dotHof(col("vb"), col("vb")))) >= 0.45)
      .groupBy("db").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("db") -> r.getAs[Long]("n")).toMap
    got.foreach { case (id, _, n, _) =>
      assert(brute.getOrElse(id, 0L) === n, s"vec $id: dup count mismatch")
    }
    // the corpus plants embedding near-dups, so some doc must be dropped
    assert(got.exists(!_._4), "expected at least one semantic dup dropped")
  }

  test("a 150-doc stop-shingle cannot blow up a bucket; rare-shingle dups survive") {
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-hotshingle").toString
    // 150 IDENTICAL docs whose only distinct shingle has df=150 > cap:
    // uncapped, they'd explode C(150,2)=11175 candidate pairs from one
    // bucket (all at jaccard 1.0); the cap must yield zero. Plus one
    // planted near-dup pair sharing 5 of 7 rare shingles (jaccard 5/7).
    val hot = (1 to 150).map(i => (i.toLong, "hot hot hot hot hot"))
    val planted = Seq(
      (1001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1002L, "alpha beta gamma delta epsilon zeta eta iota"))
    (hot ++ planted).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Dedup.ngramJaccard(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1001L, 1002L)), s"got ${out.size} pairs: ${out.take(5)}")
  }

  test("prefix-filtered join: identical output to the rare-shingle join, fewer candidates") {
    import org.apache.spark.sql.expressions.Window
    // exactness: the τ-prefix theorem says every J >= 0.5 pair collides
    // on a prefix element, so the output must equal q_dd_ngram_jaccard's
    // (the corpus is under the hot cap everywhere at this SF, so both
    // caps are no-ops and both queries emit the all-pairs truth)
    val viaPrefix = Dedup.prefixJoin(spark, sf).collect().toSeq
    val viaRare = Dedup.ngramJaccard(spark, sf).collect().toSeq
    assert(viaPrefix === viaRare,
      s"prefix=${viaPrefix.size} rare=${viaRare.size}")
    assert(viaPrefix.nonEmpty, "corpus should contain planted near-dups")
    // the point of the prefix: strictly fewer candidate-generating pairs
    // (sum of C(bucket, 2) over join buckets)
    val ex = graft.queries.Text.shingleRows(spark, sf)
    def bucketPairs(rows: org.apache.spark.sql.DataFrame): Long =
      rows.groupBy("s").count()
        .agg(sum(expr("`count` * (`count` - 1) DIV 2")).as("p"))
        .head.getLong(0)
    val dfq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val rareRows = ex.join(dfq.filter(col("df") > 1 && col("df") <= 100), "s")
    val wd = Window.partitionBy("doc_id").orderBy(col("df"), col("s"))
    val wn = Window.partitionBy("doc_id")
    val prefixRows = ex.join(dfq, "s")
      .withColumn("rk", row_number().over(wd))
      .withColumn("n", count(lit(1)).over(wn))
      .filter(col("rk") <= expr("n DIV 2 + 1"))
    val (cp, cr) = (bucketPairs(prefixRows), bucketPairs(rareRows))
    assert(cp < cr, s"prefix candidates $cp should undercut rare candidates $cr")
    // fixture characterization: this corpus has zero hot prefix
    // members, so the equality above exercises the cap-free path; the
    // adversarial hot-heavy path is driven by the dedicated fixture
    // test below (the recall THEOREM at Dedup.prefixJoin needs no
    // per-document precondition).
    val hotPrefix = prefixRows.filter(col("df") > 100).count()
    assert(hotPrefix === 0L,
      s"fixture unexpectedly has $hotPrefix hot prefix members")
  }

  test("prefix recall is unconditional: a two-thirds-hot qualifying pair is still caught") {
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-hotprefix").toString
    // 110 filler docs push (hot,alpha,beta) and (alpha,beta,gamma) over
    // the df cap. The planted pair is IDENTICAL docs with 3 shingles —
    // 2 hot + 1 sub-cap — i.e. two-thirds of their shingles are hot,
    // violating the old documented "less than half hot" precondition.
    // The recall theorem says the sub-cap shared shingle lands in both
    // prefixes, so the pair must still be caught at jaccard 1.0.
    val fillers = (1 to 110).map(i => (i.toLong, s"hot alpha beta gamma tail$i"))
    val planted = Seq(
      (9001L, "hot alpha beta gamma zeta"),
      (9002L, "hot alpha beta gamma zeta"))
    (fillers ++ planted).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // characterize the adversarial shape: each planted doc draws 2 of
    // its 3 shingles from the hot set (df > 100)
    val ex = graft.queries.Text.shingleRows(spark, dir)
    val dfq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val plantedHot = ex.join(dfq, "s")
      .filter(col("doc_id") === 9001L && col("df") > 100).count()
    assert(plantedHot === 2L, s"fixture must be 2/3 hot, got $plantedHot of 3")

    val viaPrefix = Dedup.prefixJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaRare = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // twin equality holds on the adversarial corpus too
    assert(viaPrefix === viaRare, s"prefix=$viaPrefix rare=$viaRare")
    // the two-thirds-hot qualifying pair IS caught, exactly
    assert(viaPrefix.contains((9001L, 9002L, 1.0)), viaPrefix.toString)
    // and the documented residual class — filler pairs qualify at
    // J = 2/(3+3-2) = 0.5 but their ENTIRE intersection is hot — is
    // missed by BOTH twins identically (the cap-audit's territory):
    // the planted pair is the only output row
    assert(viaPrefix.size === 1, s"expected only the planted pair: $viaPrefix")
  }

  test("exact substring duplication: shared spans merge, unique text scores zero") {
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-substrdup").toString
    // doc 1 and 2 share one exact 40-char run embedded in otherwise
    // unique text; doc 3 is unique; doc 4 repeats a 30-char run TWICE
    // internally (self-repetition counts, per the suffix-array
    // criterion). L = 24, so the 40-char share yields 17 consecutive
    // duplicated positions in each doc -> ONE merged span of 40 chars.
    val shared = "the quick brown fox jumps over lazy dogs" // 40 chars
    val rep = "abcdefghijklmnopqrstuvwxyz0123" // 30 chars
    require(shared.length == 40 && rep.length == 30)
    val docs = Seq(
      (1L, s"UNIQUEPREFIXONE$shared[ONE-UNIQUE-SUFFIX-PADDING]"),
      (2L, s"completely-different-head$shared<<other tail text here>>"),
      (3L, "this text shares nothing long enough with any other document"),
      (4L, s"xx${rep}yy-some-unique-middle-part-zz${rep}ww"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.substringDup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_chars"))).toMap
    assert(out(1L) === ((1L, 40L)), s"doc1: ${out(1L)}")
    assert(out(2L) === ((1L, 40L)), s"doc2: ${out(2L)}")
    assert(out(3L) === ((0L, 0L)), s"doc3: ${out(3L)}")
    assert(out(4L) === ((2L, 60L)), s"doc4: ${out(4L)}")
  }

  test("substring duplication: OVERLAPPING duplicated grams merge into one span, no double-count") {
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-substroverlap").toString
    // Duplicated positions p and p+2 (gap 2 < L = 24) cover overlapping
    // 24-char intervals whose union is 26 chars. A position-run merge
    // (island on consecutive p only) would count both intervals fully:
    // 2 spans / 48 chars — the Lee-et-al duplicated-char total demands
    // interval union: 1 span / 26 chars. Construction: S is 26 chars;
    // doc B elsewhere contains ONLY S[0,24) and doc C ONLY S[2,26), so
    // in doc A the grams at p and p+2 are duplicated but the one at
    // p+1 is not.
    val s26 = "qwertyuiopasdfghjklzxcvbnm"
    require(s26.length == 26)
    val g1 = s26.substring(0, 24)
    val g2 = s26.substring(2, 26)
    val docs = Seq(
      (1L, s"A-DOC-UNIQUE-HEAD-TEXT::${s26}::A-TAIL-PADDING"),
      (2L, s"B-DOC-LEADIN-SECTION#${g1}#B-TAIL-FILLER"),
      (3L, s"C-DOC-OTHER-PREAMBLE*${g2}*C-PAD-ENDING"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.substringDup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_chars"),
          r.getAs[Double]("dup_frac"))).toMap
    assert(out(1L)._1 === 1L, s"doc1 spans: ${out(1L)}")
    assert(out(1L)._2 === 26L, s"doc1 chars: ${out(1L)}")
    assert(out(2L)._1 === 1L && out(2L)._2 === 24L, s"doc2: ${out(2L)}")
    assert(out(3L)._1 === 1L && out(3L)._2 === 24L, s"doc3: ${out(3L)}")
    out.values.foreach { case (_, _, f) =>
      assert(f >= 0.0 && f <= 1.0, s"dup_frac out of [0,1]: $f") }
  }

  test("a mega-cluster past MaxSemCluster generates no semdedup drops; small clusters still dedup") {
    import ss.implicits._
    import graft.queries.Similarity
    val dir = Files.createTempDirectory("graft-megacluster").toString
    // 700 identical vectors along centroid 0's own direction (all land in
    // cluster 0, pairwise cosine 1.0): uncapped they'd drop 699; the
    // cluster cap (700 > 600) must keep ALL of them. Two identical
    // vectors along centroid 1's direction form a small cluster whose
    // near-dup must STILL be dropped — the cap is per-cluster, not global.
    val w0 = Similarity.centroidWeights(0).toArray
    val w1 = Similarity.centroidWeights(1).toArray
    val rows = (0 until 700).map(i => (i.toLong, w0)) ++
      Seq((700L, w1), (701L, w1))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = graft.queries.Dedup.semDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_kept"))).toSeq
    assert(got.size == 702)
    val (mega, small) = got.partition(_._1 < 700)
    assert(mega.forall(_._3), "capped mega-cluster must keep every member")
    assert(small.map(t => t._1 -> t._3).toMap == Map(700L -> true, 701L -> false),
      s"small cluster must still dedup: $small")
    // the two groups really did land in different clusters (else the test
    // would not exercise the per-cluster boundary)
    assert(mega.map(_._2).toSet.size == 1 && small.map(_._2).toSet.size == 1)
    assert(mega.head._2 != small.head._2)
  }

  test("cap audit detects a planted hot-shingle overflow and reports its impact") {
    import ss.implicits._
    // The audit row's whole purpose is visibility of what the caps drop —
    // so prove it SEES a planted overflow: 150 identical docs make one
    // shingle bucket (df=150 > cap=100) and identical minhash/simhash
    // signatures (every band bucket 150 > 100); two rare-shingle docs
    // stay under every cap. A tiny embeddings table covers the embed/sem
    // paths (far below their caps — zero overflow expected there).
    val dir = Files.createTempDirectory("graft-capaudit").toString
    val hot = (1 to 150).map(i => (i.toLong, "hot hot hot hot hot"))
    val planted = Seq(
      (1001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1002L, "alpha beta gamma delta epsilon zeta eta iota"))
    (hot ++ planted).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w0 = graft.queries.Similarity.centroidWeights(0).toArray
    (0 until 3).map(i => (i.toLong, w0)).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val audit = Dedup.capAudit(spark, dir).collect()
      .map(r => r.getAs[String]("path") ->
        (r.getAs[Long]("n_overflow"), r.getAs[Long]("docs_affected"),
          r.getAs[Long]("max_bucket"))).toMap
    val (shOvf, shDocs, shMax) = audit("ngram_shingle")
    assert(shOvf == 1 && shDocs == 150 && shMax == 150,
      s"hot shingle must surface as 1 overflowed df-150 bucket: ${audit("ngram_shingle")}")
    val (mhOvf, mhDocs, _) = audit("minhash_band")
    assert(mhOvf >= 1 && mhDocs == 150,
      s"identical signatures must overflow minhash band buckets: ${audit("minhash_band")}")
    val (emOvf, emDocs, _) = audit("embed_band")
    assert(emOvf == 0 && emDocs == 0, s"3 vectors cannot overflow: ${audit("embed_band")}")
  }

  test("observe counters on production LSH scans equal the offline cap audit") {
    import ss.implicits._
    // Same planted corpus as the audit test (one guaranteed overflow):
    // the observe counters ride the PRODUCTION minhash/simhash/embed
    // scans — CollectMetrics between the bucket aggregate and the
    // overflow filter, zero extra scans — and must agree with the
    // offline audit's recomputed histogram on n_buckets and n_overflow;
    // max_seen saturates at cap+1 by bounded_collect construction.
    val dir = Files.createTempDirectory("graft-capobs").toString
    val hot = (1 to 150).map(i => (i.toLong, "hot hot hot hot hot"))
    val planted = Seq(
      (1001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1002L, "alpha beta gamma delta epsilon zeta eta iota"))
    (hot ++ planted).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w0 = graft.queries.Similarity.centroidWeights(0).toArray
    (0 until 3).map(i => (i.toLong, w0)).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val audit = Dedup.capAudit(spark, dir).collect()
      .map(r => r.getAs[String]("path") ->
        (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_overflow"),
          r.getAs[Long]("max_bucket"))).toMap

    def observed(run: org.apache.spark.sql.Observation =>
        org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val o = org.apache.spark.sql.Observation()
      run(o).collect()
      val m = o.get
      (m("n_buckets").asInstanceOf[Long], m("n_overflow").asInstanceOf[Long],
        m("max_seen").asInstanceOf[Number].longValue)
    }
    val cases = Seq(
      ("minhash_band", 100L,
        (o: org.apache.spark.sql.Observation) => Dedup.minhashLshWith(spark, dir, Some(o))),
      ("simhash_band", 100L,
        (o: org.apache.spark.sql.Observation) => Dedup.simhashWith(spark, dir, Some(o))),
      ("embed_band", 1000L,
        (o: org.apache.spark.sql.Observation) => Dedup.embedLshWith(spark, dir, Some(o))))
    for ((path, cap, run) <- cases) {
      val (nb, no, mx) = observed(run)
      val (anb, ano, amx) = audit(path)
      assert(nb == anb && no == ano,
        s"$path: observe ($nb buckets, $no overflow) != audit ($anb, $ano)")
      assert(mx == math.min(amx, cap + 1),
        s"$path: max_seen $mx != min(audit max $amx, cap+1=${cap + 1})")
    }
    // the planted overflow must actually be visible through observe
    assert(observed(o => Dedup.minhashLshWith(spark, dir, Some(o)))._2 >= 1,
      "planted identical-signature overflow must surface in observe counters")
  }

  test("connected components converge in O(log n) rounds on a 1000-node chain") {
    import ss.implicits._
    // Worst case for plain min-label propagation: a path graph
    // 0-1-2-...-999 (diameter 999 would need ~1000 neighbor-min rounds).
    // The pointer-jumping step must bring this to ~log2(1000) ≈ 10.
    val n = 1000
    val fwd = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val (labels, rounds) = Dedup.connectedComponents(edges)
    assert(rounds <= 12, s"chain took $rounds rounds; pointer jumping broken?")
    val got = labels.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "every chain node must label to the min id 0")
  }

  test("connected components keep disjoint clusters disjoint") {
    import ss.implicits._
    // Two triangles + one isolated edge: labels must be the per-component
    // mins {10, 20, 30}, never bleed across components.
    val und = Seq((10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (21L, 22L), (22L, 20L), (30L, 31L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val (labels, rounds) = Dedup.connectedComponents(edges)
    assert(rounds <= 4, s"clique-ish graph took $rounds rounds")
    val got = labels.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("bloom probe: supersets the exact screen, FP rate under the design point") {
    // n_bloom >= n_exact per doc (no false negatives, ever), and the
    // realized per-probe FP rate stays under 1% (the m=2^15, k=3
    // design point for this eval-shingle load). The nonzero FP gap is
    // itself part of the verified contract — the oracle replays the
    // identical integer arithmetic, false positives included.
    val rows = graft.queries.Dedup.bloomProbe(spark, sf).collect()
    assert(rows.nonEmpty)
    var fp = 0L; var negatives = 0L
    rows.foreach { r =>
      val nb = r.getAs[Long]("n_bloom"); val ne = r.getAs[Long]("n_exact")
      assert(nb >= ne, s"doc ${r.getAs[Long]("doc_id")}: bloom lost a member")
      fp += nb - ne
      negatives += r.getAs[Long]("n_shingles") - ne
    }
    assert(negatives > 0)
    assert(fp.toDouble / negatives < 0.01,
      s"FP rate ${fp.toDouble / negatives} above the 1% design point")
  }

  test("containment: brute-force exact per pair, directed, and ≥ jaccard pointwise") {
    val rows = Dedup.containment(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute shingle sets for every referenced doc
    val ids = rows.flatMap(r => Seq(r.getAs[Long]("doc_inner"),
      r.getAs[Long]("doc_outer"))).distinct
    val sets = graft.queries.Text.shingleRows(spark, sf)
      .filter(col("doc_id").isin(ids: _*))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("s")))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    rows.foreach { r =>
      val a = sets(r.getAs[Long]("doc_inner"))
      val b = sets(r.getAs[Long]("doc_outer"))
      val common = (a & b).size.toLong
      val c = r.getAs[Double]("containment")
      assert(r.getAs[Long]("common") === common, "intersection size")
      assert(r.getAs[Long]("n_inner") === a.size.toLong, "inner size")
      assert(c === common.toDouble / a.size.toDouble, "containment bits")
      assert(c >= Dedup.ContainTau, "threshold")
      val jac = common.toDouble / (a.size + b.size - common).toDouble
      assert(c >= jac - 1e-15, "containment dominates jaccard")
    }
    // the asymmetric screen supersets the symmetric one at the same τ:
    // every jaccard ≥ τ pair must appear in BOTH directions
    val dirPairs = rows.map(r =>
      (r.getAs[Long]("doc_inner"), r.getAs[Long]("doc_outer"))).toSet
    Dedup.ngramJaccard(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard") >= Dedup.ContainTau)
      .foreach { p =>
        val x = p.getAs[Long]("doc_a")
        val y = p.getAs[Long]("doc_b")
        assert(dirPairs.contains((x, y)) && dirPairs.contains((y, x)),
          s"high-jaccard pair ($x,$y) missing a direction")
      }
  }

  test("hamming join: pigeonhole candidates are COMPLETE vs brute force (randomized)") {
    // the operator's load-bearing theorem: d+1 fixed segments, ≤ d
    // substitutions → some segment untouched → the (slot, segment)
    // equi-join misses NO true pair. Randomized over a small alphabet
    // (so natural collisions occur too), checked against an exact
    // O(n²) recompute.
    import ss.implicits._
    val rnd = new scala.util.Random(20240815L)
    val w = 12
    val alphabet = "abc"
    def rndStr(): String = Seq.fill(w)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val baseStrs = Seq.fill(60)(rndStr())
    val variants = baseStrs.zipWithIndex.collect { case (s0, idx) if idx % 3 == 0 =>
      val nEdits = 1 + rnd.nextInt(2)
      var s = s0.toCharArray
      (1 to nEdits).foreach { _ =>
        s(rnd.nextInt(w)) = alphabet(rnd.nextInt(alphabet.length))
      }
      new String(s)
    }
    val all = (baseStrs ++ variants).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val got = graft.queries.Dedup.hammingPairsOf(all.toDF("id", "s"), w, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ia) <- all; (b, ib) <- all if a < b
      d = ia.zip(ib).count { case (x, y) => x != y } if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got === brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must plant at least one true pair")
  }

  test("two-level rescue recovers pairs the hot-bucket cap drops (planted cluster)") {
    import ss.implicits._
    import graft.queries.Text
    // 40 docs sharing an 84-token template with 4 positions replaced by
    // per-doc unique tokens: pairwise jaccard ~0.74, so at cap=16 every
    // 4-row band key is template-determined for most docs (hot buckets
    // of ~20-40 > cap -> ALL pairs dropped by the base operator), while
    // the 8-row wide keys split the escalated set into <=16-doc buckets
    // the cap admits. The exact outcome is deterministic (md5 + fixed
    // permutations): 4 hot level-1 buckets, 0 base pairs, 105 rescued
    // pairs all verified at jaccard >= 0.5.
    val template = (0 until 84).map(j => s"tok$j")
    val docs = (0 until 40).map { i =>
      val t = template.toArray
      Seq(10, 30, 50, 70).zipWithIndex.foreach { case (p, k) =>
        t(p) = s"uniq${i}_$k"
      }
      (i.toLong, t.mkString(" "))
    }.toSeq.toDF("doc_id", "text")
    val stream = docs.select(col("doc_id"),
      explode(array_distinct(Text.shingles(Text.tokens(col("text")), 3))).as("s"))
      .localCheckpoint()
    val sets = stream.groupBy("doc_id").agg(collect_list(col("s")).as("shingles"))
    val obs = new org.apache.spark.sql.Observation("rescue")
    val rescued = Dedup.minhashRescueFrom(stream, sets, cap = 16,
      rescObs = Some(obs)).collect()
    assert(rescued.length === 105, s"rescued ${rescued.length} pairs")
    rescued.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
    // the production-run counter: every planted doc escalated
    assert(obs.get("n_escalated_docs") === 40L)
  }

  test("S-curve audit: textbook curve monotone, rates in range, ends separated") {
    val rows = graft.queries.Dedup.scurveAudit(spark, sf).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("measured_rate"), r.getAs[Double]("expected_rate"),
        r.getAs[Double]("p_mid"))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, m, e, p) =>
      assert(n > 0)
      assert(m >= 0.0 && m <= 1.0, s"measured out of range at $b")
      assert(e >= 0.0 && e <= 1.0, s"expected out of range at $b")
      assert(p >= 0.0 && p <= 1.0, s"p_mid out of range at $b")
    }
    // the theoretical S-curve is strictly increasing in similarity
    rows.sliding(2).foreach {
      case Array((b0, _, _, _, p0), (b1, _, _, _, p1)) =>
        assert(p0 < p1, s"p_mid not increasing: $b0 -> $b1")
      case _ => ()
    }
    // the curve separates the ends: low-similarity pairs are (almost)
    // never candidates, high-similarity pairs (almost) always are
    rows.find(_._1 == 0L).foreach { case (_, _, m, e, _) =>
      assert(m < 0.01 && e < 0.01, s"bucket 0 not suppressed: $m / $e") }
    rows.filter(r => r._1 >= 18L && r._2 >= 5L).foreach {
      case (b, _, m, _, _) =>
        assert(m > 0.9, s"high-similarity bucket $b under-surfaced: $m") }
  }
}
