package graft

import org.apache.spark.sql.functions._

import graft.functions.BoundedCollectFunctions.boundedCollect

/** Semantics of the bounded_collect aggregate: completeness below the
  * cap, hard truncation above it, and behavioral equality with the
  * collect_list + size-filter idiom it replaces on the dedup hot paths.
  */
class BoundedCollectSpec extends SparkSpec {

  test("groups at or below the cap are collected completely") {
    import ss.implicits._
    val df = (1 to 50).flatMap(k => (0 until k % 7 + 1).map(i => (k, i.toLong)))
      .toDF("k", "v")
    val got = df.groupBy("k").agg(sort_array(boundedCollect(col("v"), 10)).as("vs"))
      .as[(Int, Seq[Long])].collect().toMap
    val want = df.groupBy("k").agg(sort_array(collect_list(col("v"))).as("vs"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got == want)
  }

  test("top_k_by keeps exactly the k largest with deterministic tie-breaks") {
    import ss.implicits._
    import graft.functions.TopKByFunctions.topKBy
    // duplicate sort keys + a hot group larger than k: the heap must
    // evict below the floor, keep ties by the unique id, and agree with
    // the full-sort answer under any partition order
    val df = (1 to 10000).map(i => (i % 4, (i % 50).toDouble, i.toLong))
      .toDF("g", "v", "id").repartition(13)
    val got = df.groupBy("g")
      .agg(topKBy(struct(col("v"), col("id")), 5).as("top"))
      .select(col("g"), col("top"))
      .as[(Int, Seq[(Double, Long)])].collect().toMap
    val want = df.as[(Int, Double, Long)].collect()
      .groupBy(_._1)
      .map { case (g, rows) =>
        g -> rows.map(r => (r._2, r._3)).sorted(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long).reverse)
          .take(5).toSeq
      }
    assert(got == want)
  }

  test("an oversized group truncates at cap elements, never materializes more") {
    import ss.implicits._
    // one hot key with 100k members next to a small one — the degenerate
    // LSH bucket / stop-shingle shape
    val df = ((1 to 100000).map(i => ("hot", i.toLong)) ++
      Seq(("cold", 1L), ("cold", 2L))).toDF("k", "v")
    val out = df.groupBy("k").agg(boundedCollect(col("v"), 101).as("vs"))
      .select(col("k"), size(col("vs")).as("n")).as[(String, Int)].collect().toMap
    assert(out == Map("hot" -> 101, "cold" -> 2))
  }

  test("cap classification matches the collect_list + filter idiom") {
    import ss.implicits._
    val cap = 5
    val df = (1 to 30).flatMap(k => (0 until k).map(i => (k, i.toLong))).toDF("k", "v")
    // keys kept by bounded_collect(cap+1) with size <= cap must be
    // exactly the keys collect_list keeps under the same filter, with the
    // same complete contents
    val bounded = df.groupBy("k")
      .agg(sort_array(boundedCollect(col("v"), cap + 1)).as("vs"))
      .filter(size(col("vs")) > 1 && size(col("vs")) <= cap)
      .as[(Int, Seq[Long])].collect().toMap
    val reference = df.groupBy("k")
      .agg(sort_array(collect_list(col("v"))).as("vs"))
      .filter(size(col("vs")) > 1 && size(col("vs")) <= cap)
      .as[(Int, Seq[Long])].collect().toMap
    assert(bounded == reference)
  }

  test("heavy_hitters holds the Misra-Gries bound against exact counts") {
    import ss.implicits._
    import graft.functions.HeavyHittersFunctions.heavyHitters
    // a Zipf-ish stream across partitions: the bound must survive
    // map-side partials + merges under any partition order
    val k = 16
    val items = (1 to 20000).map(i => s"w${i % (i % 97 + 3)}")
    val df = items.toDF("w").repartition(13)
    val n = items.size.toLong
    val est = df.agg(heavyHitters(col("w"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("w"), col("e.est").as("est"))
      .as[(String, Long)].collect().toMap
    assert(est.size <= k, s"sketch must hold at most $k counters, got ${est.size}")
    val exact = items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    est.foreach { case (w, e) =>
      val t = exact.getOrElse(w, 0L)
      assert(e <= t, s"$w: estimate $e exceeds true count $t")
      assert(e >= t - n / k, s"$w: estimate $e below the N/k bound (true $t)")
    }
    // guarantee: every item with true count > N/k is present
    exact.filter(_._2 > n / k).keys.foreach(w =>
      assert(est.contains(w), s"true heavy hitter $w missing from the sketch"))
  }

  test("heavy_hitters surfaces a planted dominant key from a wide tail") {
    import ss.implicits._
    import graft.functions.HeavyHittersFunctions.heavyHitters
    // 60% of the stream is one planted key, the rest is 40k distinct
    // singletons — the exact aggregation would build 40k groups; the
    // sketch must find the key with k = 8 counters
    val planted = Seq.fill(60000)("PLANTED")
    val tail = (1 to 40000).map(i => s"tail_$i")
    val df = scala.util.Random.shuffle(planted ++ tail).toDF("w").repartition(17)
    val top = df.agg(heavyHitters(col("w"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("w"), col("e.est").as("est"))
      .as[(String, Long)].collect()
      .sortBy(-_._2)
    assert(top.head._1 == "PLANTED", s"planted key not on top: ${top.toSeq}")
    assert(top.head._2 <= 60000L && top.head._2 >= 60000L - 100000L / 8,
      s"planted estimate ${top.head._2} outside the MG bound")
  }

  test("heavy_hitters is callable from SQL via the registry") {
    import ss.implicits._
    Seq("a", "a", "a", "b", "b", "c").toDF("w").createOrReplaceTempView("hh_input")
    val rows = ss.sql(
      "SELECT inline(heavy_hitters(w, 10)) FROM hh_input")
      .as[(String, Long)].collect().toSeq
    // below capacity the sketch IS the exact multiset, sorted (est desc, item)
    assert(rows == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("bounded_collect is callable from SQL via the registry") {
    import ss.implicits._
    Seq((1, 10L), (1, 20L), (2, 30L)).toDF("k", "v")
      .createOrReplaceTempView("bc_input")
    val rows = ss.sql(
      "SELECT k, sort_array(bounded_collect(v, 5)) AS vs FROM bc_input GROUP BY k ORDER BY k")
      .as[(Int, Seq[Long])].collect().toSeq
    assert(rows == Seq((1, Seq(10L, 20L)), (2, Seq(30L))))
  }

  test("relational HLL estimate lands within the theoretical error band") {
    // sigma = 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5%. At sf0.01 the
    // cardinalities (~2000 per group, m=256) sit in the raw-estimate
    // regime the query targets (sf0.001's ~200 would need the
    // ln-based linear-counting correction the query deliberately
    // leaves to consumers), so the harmonic estimate must track the
    // exact distinct there.
    val rows = graft.queries.Analytics
      .hllRelational(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_hll")
      val exact = r.getAs[Long]("n_exact").toDouble
      val err = math.abs(est - exact) / exact
      assert(err < 0.20,
        s"${r.getAs[String]("event_type")}: est=$est exact=$exact err=$err")
    }
  }

  test("count-min sketch: never undercounts, overestimate mass within design bound") {
    // d=4, w=256: est >= true for EVERY key (counters only overcount),
    // and the mean overestimate stays under the eps*N = (e/w)*N design
    // bound with room (the per-query guarantee is P(over > eps*N) <=
    // e^-d ~ 1.8%, so the MEAN must sit far below the bound).
    val rows = graft.queries.Analytics.cms(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("true_n")).sum.toDouble
    val overs = rows.map { r =>
      val over = r.getAs[Long]("est") - r.getAs[Long]("true_n")
      assert(over >= 0, s"CMS undercounted user ${r.getAs[Long]("user_id")}")
      over.toDouble
    }
    val bound = math.E / 256.0 * n
    assert(overs.sum / overs.length < bound,
      s"mean over ${overs.sum / overs.length} vs eps*N $bound")
  }
}
