package graft.queries

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.queries.Text.shingleRows

/** Scratch perf triage — stage-level timing for the shingle-family
  * queries. Not part of the library surface and not registered in
  * SparkEntry.
  */
object Profile {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local("32", "graft-profile")
    s.sparkContext.setLogLevel("WARN")

    for (pass <- 1 to 2) {
      time(s"exact#$pass (canary)")(Dedup.exact(s, d).count())

      val ex = time(s"shingle ex+ckpt#$pass")(shingleRows(s, d).localCheckpoint())
      val hotS = ex.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).select("s")
      time(s"hotS count#$pass")(println("  hot = " + hotS.count()))
      val commonRare = ex.join(broadcast(hotS), Seq("s"), "left_anti")
        .groupBy("s").agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(Dedup.pairsOf(col("ds"))).as("p"))
        .groupBy(col("p.da").as("da"), col("p.db").as("db"))
        .agg(count(lit(1)).as("common_rare"))
      time(s"commonRare#$pass")(println("  pairs = " + commonRare.count()))
      val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val joined = commonRare
        .join(sizes.toDF("da", "na"), "da")
        .join(sizes.toDF("db", "nb"), "db")
        .select(col("da"), col("db"),
          (col("common_rare").cast("double") /
            (col("na") + col("nb") - col("common_rare"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      time(s"size joins#$pass")(println("  out = " + joined.count()))
      time(s"full ngram#$pass")(Dedup.ngramJaccard(s, d).count())
      time(s"full contamination#$pass")(Dedup.contamination(s, d).count())
      ex.unpersist(false)
    }
    s.stop()
  }
}
