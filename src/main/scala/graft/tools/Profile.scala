package graft.queries

import graft.Sessions

/** Scratch perf triage — times suspect queries end to end at the env SF
  * next to a cheap canary (q_dd_exact): if the canary drifts, the HOST
  * is in a slow phase and the pass's numbers are meaningless. Not part
  * of the library surface and not registered in SparkEntry.
  */
object Profile {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local("32", "graft-profile")
    s.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_dd_ngram_jaccard", "q_dd_cluster_keeper", "q_st_windowed")
    for (pass <- 1 to 3) {
      time(s"canary q_dd_exact#$pass")(graft.SparkEntry.queries("q_dd_exact")(s, d).count())
      for (n <- names)
        time(s"$n#$pass")(graft.SparkEntry.queries(n)(s, d).count())
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    s.stop()
  }
}
