package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the multimodal frame family (hotspot
  * attribution only — not part of the driver contract). */
object MmProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-mm-profile")
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[mm] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val q = graft.SparkEntry.queries
    // warm
    time("warm neardup")(q("q_mm_frame_neardup")(spark, d).count())
    for (_ <- 1 to 2) {
      time("media build (count)")(
        graft.queries.Parity.aviDecodeMediaProbe(spark, d).count())
      val media = graft.queries.Parity.aviDecodeMediaProbe(spark, d)
      time("media noop")({
        media.write.format("noop").mode("overwrite").save(); 0L })
      time("frames noop")({
        graft.multimodal.Avi.frames(media)
          .write.format("noop").mode("overwrite").save(); 0L })
      time("frameAHash noop")({
        graft.multimodal.Avi.frameAHash(media)
          .write.format("noop").mode("overwrite").save(); 0L })
      time("full neardup")(q("q_mm_frame_neardup")(spark, d).count())
      time("avi_decode")(q("q_mm_avi_decode")(spark, d).count())
      time("scene_cut")(q("q_mm_scene_cut")(spark, d).count())
    }
    spark.stop()
  }
}
