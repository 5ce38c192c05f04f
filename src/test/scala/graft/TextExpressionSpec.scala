package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Semantics of the custom codegen NFC expression: real canonical
  * composition (not a pass-through), interpreted/codegen agreement, and
  * SQL callability through the registry. All literals use explicit \\u
  * escapes — source-encoding normalization must not be able to collapse
  * the decomposed/composed distinction the tests exist to pin.
  */
class TextExpressionSpec extends SparkSpec {

  private val Decomposed = "café"   // e + combining acute
  private val Composed = "café"      // precomposed é

  test("nfc_normalize composes decomposed sequences to canonical form") {
    import ss.implicits._
    TextFunctions.register(spark)
    val rows = Seq(Decomposed, "plain ascii", "Åpple")
      .toDF("s")
      .select(col("s"), TextFunctions.nfcNormalize(col("s")).as("n"))
      .as[(String, String)].collect().toMap
    assert(rows(Decomposed) == Composed)
    assert(rows("plain ascii") == "plain ascii")
    assert(rows("Åpple") == "Åpple") // A + combining ring → Å
  }

  test("codegen output is identical to interpreted eval") {
    import ss.implicits._
    TextFunctions.register(spark)
    val df = Tables.documents(spark, sf)
      .withColumn("dirty", regexp_replace(col("text"), "e", "é"))
    val viaCodegen = df.select(TextFunctions.nfcNormalize(col("dirty")))
      .as[String].collect().toSeq
    val interpreted = df.select(col("dirty")).as[String].collect()
      .map(s => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      .toSeq
    assert(viaCodegen == interpreted)
  }

  test("nfc_normalize is SQL-callable after registration") {
    TextFunctions.register(spark)
    val out = spark.sql(s"SELECT nfc_normalize('é') AS n")
      .head().getString(0)
    assert(out == "é")
  }
}
