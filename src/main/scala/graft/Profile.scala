package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for hotspot hunting (not part of the driver
  * contract). `runMain graft.Profile [sfDir]` times the building blocks
  * of the dedup pipeline separately so regressions are attributable.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    import graft.queries.{Dedup, Text}
    val d = sfDir
    time("documents scan")(Tables.documents(spark, d).count())
    time("tokens explode")(Tables.documents(spark, d)
      .select(explode(Text.tokens(col("text")))).count())
    time("shingleSets")(Text.shingleSets(spark, d).count())
    time("shingleSets explode")(Text.shingleSets(spark, d)
      .select(explode(col("shingles"))).count())
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    time("explode noop")(force(Text.shingleSets(spark, d)
      .select(col("doc_id"), explode(col("shingles")).as("t"))))
    time("explode+md5 noop")(force(Text.shingleSets(spark, d)
      .select(col("doc_id"), explode(col("shingles")).as("t"))
      .select(graft.queries.Hashes.md5Int32(col("t")).as("h"))))
    val rep = Tables.documents(spark, d).repartition(64)
      .select(col("doc_id"),
        array_distinct(Text.shingles(Text.tokens(col("text")), 3)).as("shingles"))
    time("repart explode+md5 noop")(force(rep
      .select(col("doc_id"), explode(col("shingles")).as("t"))
      .select(graft.queries.Hashes.md5Int32(col("t")).as("h"))))
    time("token md5 noop")(force(Tables.documents(spark, d)
      .select(explode(Text.tokens(col("text"))).as("t"))
      .select(graft.queries.Hashes.md5Int32(col("t")).as("h"))))
    // Option A: materialize toks as an attribute so the shingle lambda
    // slices an array instead of re-running split() per element.
    val matToks = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_distinct(Text.shingles(col("toks"), 3)).as("shingles"))
    time("matToks shingle build")(force(matToks))
    time("matToks explode+md5")(force(matToks
      .select(col("doc_id"), explode(col("shingles")).as("t"))
      .select(graft.queries.Hashes.md5Int32(col("t")).as("h"))))
    matToks.explain("formatted")
    val exRows = Text.shingleRows(spark, d)
    time("shingleRows")(exRows.count())
    val aa = exRows.toDF("da", "s"); val bb = exRows.toDF("db", "s")
    val common = aa.join(bb, Seq("s")).filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("common"))
    time("common pairs")(common.count())
    val nReuse = Dedup.ngramJaccard(spark, d).queryExecution.executedPlan
      .toString.linesIterator.count(_.contains("ReusedExchange"))
    println(s"[profile] ngram ReusedExchange nodes: $nReuse")
    time("ngramJaccard full")(Dedup.ngramJaccard(spark, d).count())
    time("minhashLsh full")(Dedup.minhashLsh(spark, d).count())
    spark.stop()
  }
}
