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
}
