package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.queries.Vectors

class VectorExpressionSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("codegen vec_dot is bit-identical to the interpreted HOF fold") {
    val a = vecs.toDF("ia", "va")
    val b = vecs.toDF("ib", "vb")
    val pairs = a.crossJoin(b).limit(2000)
      .select(
        Vectors.dot(col("va"), col("vb")).as("fast"),
        Vectors.dotHof(col("va"), col("vb")).as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).isEmpty)
  }

  test("vec_dot participates in whole-stage codegen") {
    val plan = vecs.select(Vectors.dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // the leading `*(n)` marks an operator inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [vec_dot"), s"no codegen span:\n$plan")
  }

  test("vec_dot is SQL-callable after registration") {
    // extensions hook must construct/apply cleanly
    new graft.functions.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT vec_dot(v, v) AS d FROM emb_v ORDER BY vec_id LIMIT 1").head
    assert(r.getDouble(0) > 0)
  }

  test("vecCosine of a vector with itself is 1") {
    val r = vecs.select(VectorFunctions.vecCosine(col("v"), col("v")).as("c"))
      .agg(min("c"), max("c")).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }
}
