package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. One JVM-wide session keeps the
  * suite fast; UTC + fixed shuffle partitions mirror Verify/Bench configs.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = Sessions.local("4", "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sf

  /** Stable session identifier so specs can `import ss.implicits._`. */
  protected lazy val ss: SparkSession = SparkSpec.spark
}
