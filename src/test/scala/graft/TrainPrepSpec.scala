package graft

import org.apache.spark.sql.functions._

import graft.queries.{Sampling, TrainPrep}

/** Training-set prep invariants that the value-exact oracle cannot
  * express: packing assignments must be STABLE as the corpus grows
  * (the property that keeps already-trained-on chunks addressable),
  * and the mixture sampler's data-dependent thresholds must respect
  * their bounds on any corpus.
  */
class TrainPrepSpec extends SparkSpec {

  test("epoch upsampling: replicas equal the quartile, quartiles monotone in score") {
    val rows = TrainPrep.epochs(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("quartile"), r.getAs[Long]("epoch")))
    assert(rows.nonEmpty)
    // each doc materializes epochs 1..quartile, exactly once each
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val q = rs.head._3
      assert(rs.forall(_._3 == q))
      assert(rs.map(_._4).sorted.toSeq === (1L to q), s"doc $doc epochs")
    }
    // value-based quartiles: score ranges of the tiers never interleave
    val byQ = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    for (q <- 1L to 3L if byQ.contains(q) && byQ.contains(q + 1))
      assert(byQ(q).max < byQ(q + 1).min,
        s"tier $q max ${byQ(q).max} overlaps tier ${q + 1} min ${byQ(q + 1).min}")
    // upsampling really happened: more replicas than docs
    assert(rows.length > rows.map(_._1).distinct.length)
  }

  test("pack: golden chunk assignment on a constructed corpus") {
    import ss.implicits._
    // token counts 3, 2, 4 in doc order; budget 4:
    // offsets 0, 3, 5 → chunks 0, 0, 1 (doc 2 STARTS in chunk 0 and
    // straddles into 1 — concat-and-chunk, not bin packing)
    val docs = Seq(
      (1L, "a", "w w w"),
      (2L, "a", "w w"),
      (3L, "a", "w w w w"),
      (10L, "b", "x")).toDF("doc_id", "source", "text")
    val got = TrainPrep.packDocs(docs, budget = 4)
      .select("source", "doc_id", "tok_offset", "chunk_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a", 1L, 0L, 0L), ("a", 2L, 3L, 0L), ("a", 3L, 5L, 1L),
      ("b", 10L, 0L, 0L)))
  }

  test("pack: assignments are stable under corpus growth (append-only)") {
    // Packing orders by doc_id within a shard, so ingesting NEW docs
    // (larger ids) must never move an existing doc's offset or chunk —
    // otherwise previously-emitted training chunks would be silently
    // redefined. Verify: packing a prefix equals the prefix of packing
    // the whole corpus.
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    val full = TrainPrep.packDocs(docs).filter(col("doc_id") < 200)
    val prefix = TrainPrep.packDocs(docs.filter(col("doc_id") < 200))
    assert(full.count() > 0)
    assert(full.except(prefix).isEmpty && prefix.except(full).isEmpty,
      "growing the corpus must not reassign existing docs")
  }

  test("shard manifest: shards exactly partition the corpus and are hash-stable") {
    val docs = Tables.documents(spark, sf)
    val m = TrainPrep.shardManifest(spark, sf).collect()
    assert(m.nonEmpty && m.length <= 16)
    assert(m.map(_.getAs[Long]("shard")).forall(s => s >= 0 && s < 16))
    // the manifest must account for every doc and token exactly once
    // (token counts recomputed through the packing path — same tokenizer)
    val total = TrainPrep.packDocs(docs)
      .agg(count(lit(1)), sum(col("n_tokens"))).head()
    assert(m.map(_.getAs[Long]("n_docs")).sum === total.getLong(0))
    assert(m.map(_.getAs[Long]("sum_tokens")).sum === total.getLong(1))
    // content-hash assignment: unchanged under arbitrary repartitioning
    // (what rand()-based sharding cannot promise across retries)
    val again = TrainPrep.shardManifest(spark, sf).collect()
    assert(m.toSeq === again.toSeq)
  }

  test("chunk windows: golden boundary cases on a constructed corpus") {
    import ss.implicits._
    // win=4 / stride=3: the exact boundary grid — shorter-than-window,
    // exactly-one-window, straddle-by-one, exact-two-window tiling,
    // short tail, and the empty doc (no rows)
    val docs = Seq(
      (1L, "a b c"),             // 3 < win           → one short window
      (2L, "a b c d"),           // == win            → exactly one
      (3L, "a b c d e"),         // win+1             → tail of 2
      (4L, "a b c d e f g"),     // win+stride        → two full windows
      (5L, "a b c d e f g h"),   // win+stride+1      → three, tail of 2
      (6L, ""))                  // empty             → no windows
      .toDF("doc_id", "text")
    val got = TrainPrep.chunkDocs(docs, win = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("window_idx"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("win_len"),
        r.getAs[String]("first_tok")))
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 3L, "a"),
      (2L, 0L, 0L, 4L, "a"),
      (3L, 0L, 0L, 4L, "a"), (3L, 1L, 3L, 2L, "d"),
      (4L, 0L, 0L, 4L, "a"), (4L, 1L, 3L, 4L, "d"),
      (5L, 0L, 0L, 4L, "a"), (5L, 1L, 3L, 4L, "d"), (5L, 2L, 6L, 2L, "g")))
  }

  test("chunk windows tile every doc: stride steps, full coverage, bounded overlap") {
    val wins = TrainPrep.chunkOverlap(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("window_idx"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("win_len")))
      .groupBy(_._1).values
    val nDocs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0).count()
    assert(wins.size.toLong === nDocs, "every nonempty doc gets windows")
    // the driver geometry (32/24) must actually multi-window this
    // corpus, or the overlap assertions below are vacuous
    assert(wins.exists(_.size > 1), "corpus should produce multi-window docs")
    wins.foreach { ws =>
      val sorted = ws.sortBy(_._2)
      // indices are 0..n-1, starts step by the stride
      sorted.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
        assert(idx === i.toLong)
        assert(start === i * 24L)
        assert(len >= 1 && len <= 32)
      }
      // only the last window may be short (full coverage has no gaps:
      // stride < window means consecutive windows overlap by w - s)
      sorted.init.foreach { case (_, _, _, len) =>
        assert(len === 32L, "only the last window may be short")
      }
      val (_, _, lastStart, lastLen) = sorted.last
      val end = lastStart + lastLen
      // every token index < end is covered by some window
      assert(sorted.flatMap(w => w._3 until (w._3 + w._4))
        .toSet.size.toLong === end, "windows must cover [0, n) with no gap")
    }
  }

  test("row ids are a contiguous 1..N numbering of the shuffle order") {
    import ss.implicits._
    val ids = TrainPrep.rowIds(spark, sf)
    val n = graft.Tables.documents(spark, sf).count()
    val got = ids.select("global_id").as[Long].collect()
    assert(got.toSeq == (1L to n).toSeq,
      "global ids must be exactly 1..N in output order")
    // and the numbering respects the shard-major training order
    val shards = ids.select("shard").as[Long].collect()
    assert(shards.toSeq == shards.sorted.toSeq,
      "global ids must be shard-major")
  }

  test("token budget: quality-monotone admission lands within a bucket of the budget") {
    import ss.implicits._
    val r = Sampling.tokenBudget(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().toSeq // (doc_id, qb, n_tokens, admitted)
    val total = r.map(_._3).sum
    val budget = total * 2 / 5
    val admittedTokens = r.filter(_._4).map(_._3).sum
    // quality monotonicity: per bucket either all-in, all-out, or the ONE
    // hash-split boundary bucket; everything above a non-full bucket is
    // fully admitted and everything below a non-empty one fully rejected
    val byBucket = r.groupBy(_._2).view.mapValues(_.map(_._4)).toMap
    val mixed = byBucket.filter { case (_, fs) => fs.exists(identity) && fs.exists(!_) }
    assert(mixed.size <= 1, s"more than one hash-split bucket: ${mixed.keys}")
    val fullyAdmitted = byBucket.filter(_._2.forall(identity)).keySet
    val fullyRejected = byBucket.filter(_._2.forall(!_)).keySet
    for (a <- fullyRejected; b <- fullyAdmitted)
      assert(a < b, s"rejected bucket $a above admitted bucket $b")
    // budget proximity: worst-case deviation is the boundary bucket's mass
    val maxBucketTokens = r.groupBy(_._2).values.map(_.map(_._3).sum).max
    assert(math.abs(admittedTokens - budget) <= maxBucketTokens,
      s"admitted $admittedTokens vs budget $budget (slack $maxBucketTokens)")
  }

  test("mixture: a skewed corpus is actually downsampled toward balance") {
    import ss.implicits._
    // constructed 10:1 skew so the sub-10000 threshold path is
    // load-bearing (not just bounds-checked): 500 docs in domain "big",
    // 50 in domain "small"
    val docs = ((1L to 500L).map(i => (i, "big")) ++
      (1001L to 1050L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val rows = Sampling.mixtureOf(docs, "lang").collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_total"),
        r.getAs[Long]("threshold"), r.getAs[Long]("n_kept"))).sortBy(_._1)
    val Seq(big, small) = rows.toSeq
    assert(small === (("small", 50L, 10000L, 50L)), "smallest domain kept whole")
    assert(big._3 === 1000L, "10:1 skew → threshold 1000 (10%)")
    assert(big._4 < big._2, "the hot domain must actually shrink")
    // hash-uniformity sanity: kept count lands near the 10% target
    assert(big._4 > 20 && big._4 < 80, s"kept ${big._4} of 500 at 10% target")
  }

  test("mixture: driver-grain invariants hold on the real corpus (lang skew)") {
    val rows = Sampling.mixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val parsed = rows.map(r => (r.getAs[Long]("n_total"),
      r.getAs[Long]("threshold"), r.getAs[Long]("n_kept")))
    parsed.foreach { case (total, thr, kept) =>
      assert(thr > 0 && thr <= 10000, s"threshold $thr out of range")
      assert(kept <= total, "cannot keep more than exists")
    }
    val smallest = parsed.minBy(_._1)
    assert(smallest._2 === 10000L)
    assert(smallest._3 === smallest._1, "smallest domain must be kept whole")
    // the corpus's lang dimension is genuinely skewed — at least one
    // domain must be in the downsampled regime or the oracle row isn't
    // exercising the hash filter at all
    assert(parsed.exists(_._2 < 10000L), "expected a sub-10000 threshold")
  }

  test("BPE encode fold: leftmost-nonoverlapping merges applied in rank order") {
    import ss.implicits._
    import org.apache.spark.sql.functions.col
    val words = Seq("banana", "aaab", "x", "").toDF("w")
    def enc(ms: Seq[(String, String)]): Seq[Seq[String]] =
      words.select(TrainPrep.bpeEncode(col("w"), ms).as("e"))
        .as[Seq[String]].collect().toSeq
    val none = enc(Nil)
    assert(none == Seq(Seq("b", "a", "n", "a", "n", "a"),
      Seq("a", "a", "a", "b"), Seq("x"), Seq()))
    // rank order: (a,n) first, then (an,an) over the merged symbols
    val merged = enc(Seq("a" -> "n", "an" -> "an"))
    assert(merged.head == Seq("b", "anan", "a"))
    // leftmost-nonoverlapping: aaa + (a,a) -> [aa, a], not [a, aa]
    assert(enc(Seq("a" -> "a")) ==
      Seq(Seq("b", "a", "n", "a", "n", "a"),
        Seq("aa", "a", "b"), Seq("x"), Seq()))
  }

  test("systematic sample: selection set equals the single-pass cumsum walk") {
    val got = Sampling.systematic(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"), r.getAs[Long]("cum")))
    // independent single-pass walk (no bucketing): global cumsum in
    // doc_id order, select docs whose (cum-w, cum] interval contains a
    // stride multiple — must equal the two-level bucketed plan exactly
    val docs = queries.TextAnalysis.all("q_tx_token_count")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Number]("n_tokens").longValue))
      .sortBy(_._1)
    val total = docs.map(_._2).sum
    val stride = math.max(1L, total / 40L)
    var cum = 0L
    val expected = docs.flatMap { case (id, w) =>
      cum += w
      if (cum / stride > (cum - w) / stride) Some((id, w, cum)) else None
    }
    assert(got.toSeq === expected.toSeq,
      "bucketed two-level prefix sum diverges from the sequential walk")
    // a sample proportional-to-size never selects more docs than
    // stride multiples available
    assert(got.length <= (total / stride).toInt)
    assert(got.nonEmpty)
  }

  test("BPE training picks the count-then-lexicographic argmax pair per round") {
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Seq((1L, "the the the cat", "s"), (2L, "the", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // vocab: the×4, cat×1. Round 1: (t,h)=4 ties (h,e)=4 → lex (h,e).
    // Round 2: the→[t,he]: (t,he)=4 beats (c,a)=(a,t)=1 → (t,he).
    // Round 3: only cat pairs left, (a,t) < (c,a) lexicographically.
    val merges = TrainPrep.trainBpeMerges(spark, dir, 3)
    assert(merges == Seq("h" -> "e", "t" -> "he", "a" -> "t"),
      s"unexpected merge table: $merges")
  }

  test("span corruption plan replays brute per-doc; spans merge, ratio is realized") {
    val rows = TrainPrep.spanCorruption(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"),
          r.getAs[Long]("n_spans"), r.getAs[Double]("mask_ratio")))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .filter(_._2.nonEmpty)
    assert(rows.size === docs.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(sStr: String): Long = {
      md.reset()
      val dg = md.digest(sStr.getBytes("UTF-8"))
      java.lang.Long.parseLong(dg.take(4).map("%02x".format(_)).mkString, 16)
    }
    docs.foreach { case (id, t) =>
      val starts = (1 to t.length).map(i => h32(s"${id}_span_$i") % 100 < 5)
      val masked = (1 to t.length).map(i =>
        starts(i - 1) || (i > 1 && starts(i - 2)) || (i > 2 && starts(i - 3)))
      val nSpans = masked.zipWithIndex.count { case (m, ix) =>
        m && (ix == 0 || !masked(ix - 1))
      }
      val (nt, nm, ns, ratio) = rows(id)
      assert(nt === t.length.toLong, s"doc $id n_tokens")
      assert(nm === masked.count(identity).toLong, s"doc $id n_masked")
      assert(ns === nSpans.toLong, s"doc $id n_spans")
      assert(math.abs(ratio - masked.count(identity).toDouble / t.length) < 1e-12)
      // each maximal run masks at least one token (runs can exceed
      // SpanLen when overlapping starts merge — that's the point)
      assert(ns <= nm)
    }
    // realized corpus rate is in the neighborhood of pct*len = 15%
    val tot = rows.values.map(_._1).sum.toDouble
    val msk = rows.values.map(_._2).sum.toDouble
    assert(msk / tot > 0.08 && msk / tot < 0.25, s"corpus mask rate ${msk / tot}")
  }

  test("curation e2e: funnel monotone, split disjoint, totals consistent") {
    val df = graft.queries.TrainPrep.curationE2e(spark, sf).collect()
    assert(df.nonEmpty)
    val nRaw = df.head.getAs[Long]("n_raw")
    val nNd = df.head.getAs[Long]("n_nd_kept")
    val nQ = df.head.getAs[Long]("n_q_kept")
    // funnel constants are identical on every row and monotone non-increasing
    assert(df.forall(r => r.getAs[Long]("n_raw") == nRaw &&
      r.getAs[Long]("n_nd_kept") == nNd && r.getAs[Long]("n_q_kept") == nQ))
    assert(nRaw >= nNd && nNd >= nQ && nQ > 0)
    // the group-disjoint split audit is structurally zero
    assert(df.forall(_.getAs[Long]("n_leaked_sources") == 0L))
    // per-(split, shard) doc counts re-assemble the quality-kept total
    assert(df.map(_.getAs[Long]("n_docs")).sum === nQ)
    // stage ordering is pinned: the near-dup stage ran on RAW docs, so
    // re-running the quality screen alone keeps MORE docs than n_q_kept
    // whenever any near-dup was dropped (and equal otherwise)
    import org.apache.spark.sql.functions._
    val qAlone = graft.Tables.documents(spark, sf)
      .filter(col("n_chars") >= 50 && col("n_chars") <= 5000 &&
        length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
          greatest(length(col("text")), lit(1)).cast("double") <= 0.1)
      .count()
    assert(qAlone >= nQ)
  }

  test("BPE decode round-trips every vocabulary word through the closed id table") {
    val rows = graft.queries.TrainPrep.bpeRoundtrip(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") === 0L,
        s"word '${r.getAs[String]("w")}' emitted a token outside the closed vocabulary")
      assert(r.getAs[Boolean]("ok"),
        s"decode(encode(w)) != w for '${r.getAs[String]("w")}'")
      assert(r.getAs[Long]("n_toks") >= 1L)
    }
  }

  test("SFT pack spans are a brute per-conversation replay; loss only on assistant") {
    val rows = graft.queries.TrainPrep.sftPack(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("turn_idx"),
        r.getAs[String]("role"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
        r.getAs[Long]("char_start"), r.getAs[Long]("char_end"),
        r.getAs[Boolean]("loss"), r.getAs[Long]("doc_id")))
    assert(rows.nonEmpty)
    // brute char widths straight off the raw text (codePointCount —
    // Spark's length() counts code points, not UTF-16 units)
    val docLen = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).codePointCount(0, r.getString(1).length).toLong).toMap
    rows.groupBy(_._1).foreach { case (src, ts) =>
      val ordered = ts.sortBy(_._2)
      // roles alternate from user; spans tile the streams gaplessly
      var tok = 0L
      var ch = 0L
      ordered.zipWithIndex.foreach { case ((_, idx, role, n, ts0, te, cs, ce, loss, docId), i) =>
        assert(idx === i.toLong)
        assert(role === (if (i % 2 == 0) "user" else "assistant"), s"$src/$i")
        assert(loss === (role == "assistant"))
        assert(ts0 === tok && cs === ch, s"span gap at $src/$i")
        assert(te === ts0 + n + 2) // role marker + content + end marker
        val hdr = if (role == "user") 9L else 14L
        assert(ce === cs + hdr + docLen(docId) + 9L, s"char width at $src/$i")
        tok = te; ch = ce
      }
    }
  }
}
