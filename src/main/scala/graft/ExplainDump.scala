package graft

/** Ad-hoc plan dumper for the optimization-round evidence trail (not
  * part of the driver contract). `runMain graft.ExplainDump <sfDir>
  * <outDir> <suffix> <q1,q2,...>` executes each named query once
  * (collect — the final AQE plan only exists on the EXECUTED Dataset)
  * and writes its `explain("formatted")` text to
  * `<outDir>/<name>_<suffix>.txt`, e.g. plans/r17/q_x_before.txt.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, nameCsv) = args.take(4)
    val names = nameCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-explain")
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = SparkEntry.queries
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    for (n <- names) {
      spark.sparkContext.setJobDescription(s"explain:$n")
      val df = qs(n)(spark, sfDir)
      df.collect(): Unit // finalize AQE before reading the plan
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt): Unit
      println(s"[explain] $n -> $outDir/${n}_$suffix.txt")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
