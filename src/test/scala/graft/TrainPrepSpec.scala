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

  test("mixture: thresholds bounded, smallest source kept whole, kept <= total") {
    val rows = Sampling.mixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val byThreshold = rows.map(r => (r.getAs[Long]("n_total"),
      r.getAs[Long]("threshold"), r.getAs[Long]("n_kept")))
    byThreshold.foreach { case (total, thr, kept) =>
      assert(thr > 0 && thr <= 10000, s"threshold $thr out of range")
      assert(kept <= total, "cannot keep more than exists")
    }
    // the smallest source's threshold is exactly 10000 → it keeps all
    val smallest = byThreshold.minBy(_._1)
    assert(smallest._2 === 10000L)
    assert(smallest._3 === smallest._1, "smallest source must be kept whole")
  }
}
