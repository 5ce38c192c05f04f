package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Two paths, the standard ANN trade-off:
  *  - [[bruteTopK]]: exact cosine top-k. The query vector is a one-row
  *    broadcast; the corpus side is a single scan + per-row fold + a
  *    TakeOrderedAndProject top-k (per-partition heaps, driver merge of
  *    k-row heads — no global sort, which is what survives 100 TB).
  *  - [[ivfTopK]]: IVF-style bucketed search — restrict the scan to the
  *    query's coarse cell and take top-k inside it. Here the coarse
  *    assignment is the precomputed `label` column (in production: a
  *    k-means assignment materialized at write time, which makes the cell
  *    a partition-pruned read instead of a full scan).
  *
  * Dot products are sequential folds (see [[Vectors]]) so the DuckDB
  * oracle reproduces the doubles bit-for-bit.
  */
object Similarity {

  private val QueryId = 0
  private val K = 10

  // --- q_sim_topk_brute ---------------------------------------------------
  def bruteTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(K)
  }

  val bruteTopKSql: String =
    s"""SELECT b.vec_id, b.label,
       |  ${Vectors.cosineSql("b.emb", "q.emb")} AS cosine
       |FROM (SELECT vec_id, label, embedding AS emb FROM embeddings WHERE vec_id <> $QueryId) b,
       |     (SELECT embedding AS emb FROM embeddings WHERE vec_id = $QueryId) q
       |ORDER BY cosine DESC, vec_id
       |LIMIT $K""".stripMargin

  // --- q_sim_ivf_topk -----------------------------------------------------
  // Same top-k but scanning only the query's coarse cell. With the corpus
  // partitioned by cell on disk this is a partition-pruned read of ~1/C of
  // the data; the recall/latency knob is nprobe (how many cells to scan).
  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId)
      .select(col("v").as("qv"), col("label").as("qlabel"))
    e.filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .filter(col("label") === col("qlabel"))
      .select(col("vec_id"), col("label"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(K)
  }

  val ivfTopKSql: String =
    s"""SELECT b.vec_id, b.label,
       |  ${Vectors.cosineSql("b.emb", "q.emb")} AS cosine
       |FROM (SELECT vec_id, label, embedding AS emb FROM embeddings WHERE vec_id <> $QueryId) b,
       |     (SELECT embedding AS emb, label AS qlabel FROM embeddings WHERE vec_id = $QueryId) q
       |WHERE b.label = q.qlabel
       |ORDER BY cosine DESC, vec_id
       |LIMIT $K""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk_brute" -> (bruteTopK _),
    "q_sim_ivf_topk" -> (ivfTopK _))

  val oracles: Map[String, String] = Map(
    "q_sim_topk_brute" -> bruteTopKSql,
    "q_sim_ivf_topk" -> ivfTopKSql)
}
