package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // --- q_sim_filtered_topk --------------------------------------------------
  // FILTERED VECTOR SEARCH — the production ANN shape vector databases
  // are judged on: top-k under a metadata predicate (here `label`
  // parity — the stand-in for lang/license/split constraints). The two
  // strategies every deployment weighs:
  //   PRE-filter  — the predicate rides INTO the cell scan next to the
  //                 cell equality (both are attribute filters: with
  //                 the corpus partitioned by cell and the metadata
  //                 shredded, the scan prunes on both), ranking only
  //                 qualifying vectors: the CORRECT top-k.
  //   POST-filter — rank first, filter the k survivors: the cheap
  //                 pipeline mistake, silently returning < k and
  //                 missing qualifying vectors that sat below rank k.
  // The output is the correct pre-filtered top-k with a per-row
  // `in_postfilter` flag — the rows flagged false are exactly the
  // results the post-filter strategy loses, making the recall cost of
  // the lazy plan a verified number instead of folklore. Probe scope
  // is the query's TRAINED Lloyd cell (q_sim_ivfpq_trained's coarse
  // quantizer, not the label — q_sim_recall measures why).
  // Scale: one partition-pruned cell scan feeding both strategies;
  // TakeOrderedAndProject on both limits; the rank window runs over
  // ≤ k rows, never the corpus.
  def filteredTopK(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", clusterOf(col("v")))
    val q = e.filter(col("vec_id") === QueryId)
      .select(col("v").as("qv"), col("cell").as("qcell"))
    val pred = col("label") % 2 === 0
    val cellScan = e.filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .filter(col("cell") === col("qcell"))
      .select(col("vec_id"), col("label"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .localCheckpoint() // both strategies read the one cell scan
    val pre = cellScan.filter(pred)
      .orderBy(col("cosine").desc, col("vec_id")).limit(K)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cosine").desc, col("vec_id")))
          .cast("long"))
    val post = cellScan
      .orderBy(col("cosine").desc, col("vec_id")).limit(K)
      .filter(pred)
      .select(col("vec_id"), lit(true).as("in_postfilter"))
    pre.join(post, Seq("vec_id"), "left")
      .select(col("rank"), col("vec_id"), col("label"), col("cosine"),
        coalesce(col("in_postfilter"), lit(false)).as("in_postfilter"))
      .orderBy("rank")
  }

  // lazy: interpolates clusterOfSql, whose centroid tables are declared
  // further down the object — a plain val here reads them empty (the
  // documented object-init-order trap)
  lazy val filteredTopKSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, label, embedding,
       |    ${clusterOfSql("embedding")} AS cell
       |  FROM embeddings),
       |q AS (SELECT embedding AS qemb, cell AS qcell FROM e
       |      WHERE vec_id = $QueryId),
       |scan AS MATERIALIZED (
       |  SELECT b.vec_id, b.label,
       |    ${Vectors.cosineSql("b.embedding", "q.qemb")} AS cosine
       |  FROM e b, q WHERE b.vec_id <> $QueryId AND b.cell = q.qcell),
       |pre AS (
       |  SELECT vec_id, label, cosine, rank FROM (
       |    SELECT vec_id, label, cosine,
       |      row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank
       |    FROM scan WHERE label % 2 = 0)
       |  WHERE rank <= $K),
       |post AS (
       |  SELECT vec_id FROM (
       |    SELECT vec_id, label,
       |      row_number() OVER (ORDER BY cosine DESC, vec_id) AS rn
       |    FROM scan)
       |  WHERE rn <= $K AND label % 2 = 0)
       |SELECT p.rank::BIGINT AS rank, p.vec_id, p.label, p.cosine,
       |  (post.vec_id IS NOT NULL) AS in_postfilter
       |FROM pre p LEFT JOIN post ON p.vec_id = post.vec_id
       |ORDER BY rank""".stripMargin

  // --- q_sim_recall -------------------------------------------------------
  // The index EVALUATION harness: recall@k of the IVF path against the
  // exact brute-force baseline, per query, over a 20-query batch — the
  // number every ANN deployment watches when tuning nprobe/cells, here
  // a first-class verified query instead of an offline notebook. The
  // batch shape is the production one: all query vectors BROADCAST as
  // one dimension table, ONE corpus scan computes every (query, doc)
  // cosine for the brute side (at 100 TB the scan is the irreducible
  // cost and batching amortizes it across queries), the IVF side
  // restricts each query to its own coarse cell, and recall is a
  // per-query set intersection of two 10-row lists. All ranking ties
  // break on vec_id; recall = common/k is one exact-int division.
  //
  // Measured finding (sf0.01): single-probe retrieval over the LABEL
  // cells scores mean recall@10 ≈ 0.13 — class labels are not
  // geometric cells. That number is exactly what this harness is for:
  // it is the quantitative case for the TRAINED coarse quantizer
  // (q_sim_ivfpq_trained's Lloyd cells) and for nprobe > 1, measured
  // instead of assumed.
  private val RecallQ = 20

  // --- q_sim_sq8 ------------------------------------------------------------
  // SCALAR QUANTIZATION retrieval (SQ8 — the Lucene int8-HNSW storage
  // shape / Faiss ScalarQuantizer family, public): vectors L2-normalize,
  // each dimension stores the SYMMETRIC int8 code c = floor(x · 127)
  // (no per-dim affine offset — an offset adds a vector-dependent bias
  // term to the code dot product, which mis-ranks candidates; on the
  // unit sphere a shared scale suffices), candidates rank by the
  // ASYMMETRIC integer score Σ floor(q_d·1e6) · c_d — the query keeps
  // 20-bit fixed-point precision, so the only approximation is the
  // doc-side 8-bit code — and the top 100 re-rank by exact cosine for
  // the final 10. Completes the quantization family: PQ/IVF-PQ
  // compress by codebook, SQ8 per-dimension — 4 bytes → 1 byte per
  // dim. The candidate score is EXACT integer arithmetic (bit-equal
  // cross-engine); floats appear only in the normalization (shared
  // IEEE fold) and the 100-row exact re-rank. Scan shape at 100 TB:
  // codes live at (vec, dim) grain or packed as a byte column; scoring
  // is one broadcast-joined aggregation, no shuffle wider than top-k.
  private val Sq8Candidates = 100

  def sq8(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // L2-normalize BEFORE quantizing: the integer code dot product then
    // tracks COSINE (what the exact re-rank uses) instead of the raw
    // dot, which norm-heavy vectors would dominate — the standard SQ
    // preprocessing for cosine retrieval. The norm is materialized as
    // its own column first (interpreted HOFs have no subexpression
    // elimination — a lambda referencing norm(v) would refold it per
    // element).
    val dims = e
      .withColumn("nrm", Vectors.norm(col("v")))
      .select(col("vec_id"), col("nrm"), posexplode(col("v")))
      .toDF("vec_id", "nrm", "dim", "x0")
      .select(col("vec_id"), col("dim"), (col("x0") / col("nrm")).as("x"))
    val codes = dims.filter(col("vec_id") =!= QueryId)
      .select(col("vec_id"), col("dim"),
        floor(col("x") * 127.0).cast("bigint").as("code"))
    val qCodes = dims.filter(col("vec_id") === QueryId)
      .select(col("dim"), floor(col("x") * 1000000.0).cast("bigint").as("qf"))
    val scored = codes
      .join(broadcast(qCodes), "dim")
      .groupBy("vec_id")
      .agg(sum(col("code") * col("qf")).as("sq_score"))
    val cand = scored
      .orderBy(col("sq_score").desc, col("vec_id"))
      .limit(Sq8Candidates)
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    cand.join(e, "vec_id").crossJoin(broadcast(q))
      .select(col("vec_id"), col("sq_score"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(K)
  }

  val sq8Sql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding AS emb FROM embeddings),
       |norms AS MATERIALIZED (
       |  SELECT vec_id, sqrt(${Vectors.dotSql("emb", "emb")}) AS nrm FROM e),
       |dims AS MATERIALIZED (
       |  SELECT e.vec_id, g.i - 1 AS dim, emb[g.i]::DOUBLE / n.nrm AS x
       |  FROM e JOIN norms n USING (vec_id),
       |       unnest(generate_series(1, len(emb))) g(i)),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, dim, CAST(floor(x * 127.0) AS BIGINT) AS code
       |  FROM dims WHERE vec_id <> $QueryId),
       |qcodes AS MATERIALIZED (
       |  SELECT dim, CAST(floor(x * 1000000.0) AS BIGINT) AS qf
       |  FROM dims WHERE vec_id = $QueryId),
       |scored AS MATERIALIZED (
       |  SELECT c.vec_id, CAST(sum(c.code * q.qf) AS BIGINT) AS sq_score
       |  FROM codes c JOIN qcodes q USING (dim)
       |  GROUP BY c.vec_id),
       |cand AS MATERIALIZED (
       |  SELECT vec_id, sq_score FROM scored
       |  ORDER BY sq_score DESC, vec_id LIMIT $Sq8Candidates)
       |SELECT c.vec_id, c.sq_score,
       |  ${Vectors.cosineSql("b.emb", "q.emb")} AS cosine
       |FROM cand c
       |JOIN e b ON b.vec_id = c.vec_id,
       |     (SELECT emb FROM e WHERE vec_id = $QueryId) q
       |ORDER BY cosine DESC, c.vec_id
       |LIMIT $K""".stripMargin

  // --- q_sim_matryoshka -----------------------------------------------------
  // MATRYOSHKA truncation evaluation (Kusupati et al. 2022, public): MRL
  // embeddings are trained so PREFIXES of the vector are themselves
  // usable embeddings — serving retrieves with the first m dims (m·cost
  // of the scan, m/d of the memory) and re-ranks with the full vector.
  // The operational question is the same as IVF's: what recall does the
  // cheap stage keep? Same harness shape as q_sim_recall: a 20-query
  // broadcast batch, ONE corpus scan computing both the full-dim and the
  // first-16-dim cosine per (query, doc) (the truncated dot is a slice
  // of the same row — no second scan), two rankings off one cached
  // frame, recall@10 = exact set intersection. At 100 TB the truncated
  // column is what you'd actually STORE alongside (16/64 of the bytes);
  // computing it by slice here keeps the fixture single-table. Ranking
  // ties break on vec_id; the doubles are the same IEEE folds in both
  // engines (q_sim_recall's established route).
  private val MatDims = 16

  def matryoshka(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < RecallQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Vectors.cosine(col("v"), col("qv")).as("cos_full"),
        Vectors.cosine(slice(col("v"), 1, MatDims),
          slice(col("qv"), 1, MatDims)).as("cos_trunc"))
      .localCheckpoint() // two rankings read it
    val wf = Window.partitionBy("qid")
      .orderBy(col("cos_full").desc, col("vec_id"))
    val wt = Window.partitionBy("qid")
      .orderBy(col("cos_trunc").desc, col("vec_id"))
    val full = scored.withColumn("rk", row_number().over(wf))
      .filter(col("rk") <= K).select("qid", "vec_id")
    val trunc = scored.withColumn("rk", row_number().over(wt))
      .filter(col("rk") <= K).select("qid", "vec_id")
    val common = full.join(trunc, Seq("qid", "vec_id"))
      .groupBy("qid").agg(count(lit(1)).as("n_common"))
    full.groupBy("qid").agg(count(lit(1)).as("n_full"))
      .join(common, Seq("qid"), "left")
      .select(col("qid"), col("n_full"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          lit(K.toDouble)).as("recall"))
      .orderBy("qid")
  }

  val matryoshkaSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, embedding AS qemb
       |  FROM embeddings WHERE vec_id < $RecallQ),
       |scored AS MATERIALIZED (
       |  SELECT q.qid, e.vec_id,
       |    ${Vectors.cosineSql("e.emb", "q.qemb")} AS cos_full,
       |    ${Vectors.cosineSql(s"e.emb[1:$MatDims]", s"q.qemb[1:$MatDims]")}
       |      AS cos_trunc
       |  FROM e, q WHERE e.vec_id <> q.qid),
       |fullr AS MATERIALIZED (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos_full DESC, vec_id) AS rk
       |    FROM scored)
       |  WHERE rk <= $K),
       |truncr AS MATERIALIZED (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos_trunc DESC, vec_id) AS rk
       |    FROM scored)
       |  WHERE rk <= $K),
       |com AS MATERIALIZED (
       |  SELECT qid, count(*) AS n_common
       |  FROM fullr JOIN truncr USING (qid, vec_id) GROUP BY qid)
       |SELECT f.qid, f.n_full, COALESCE(c.n_common, 0) AS n_common,
       |  COALESCE(c.n_common, 0)::DOUBLE / ${K}.0 AS recall
       |FROM (SELECT qid, count(*) AS n_full FROM fullr GROUP BY qid) f
       |LEFT JOIN com c USING (qid)
       |ORDER BY qid""".stripMargin

  def recallEval(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < RecallQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("label").as("qlabel"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .localCheckpoint() // consumed by both rankings
    val wb = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("vec_id"))
    val brute = scored.withColumn("rk", row_number().over(wb))
      .filter(col("rk") <= K).select("qid", "vec_id")
    val wi = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("vec_id"))
    val ivf = scored.filter(col("label") === col("qlabel"))
      .withColumn("rk", row_number().over(wi))
      .filter(col("rk") <= K).select("qid", "vec_id")
    val common = brute.join(ivf, Seq("qid", "vec_id"))
      .groupBy("qid").agg(count(lit(1)).as("n_common"))
    brute.groupBy("qid").agg(count(lit(1)).as("n_brute"))
      .join(ivf.groupBy("qid").agg(count(lit(1)).as("n_ivf")), Seq("qid"))
      .join(common, Seq("qid"), "left")
      .select(col("qid"), col("n_brute"), col("n_ivf"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          lit(K.toDouble)).as("recall"))
      .orderBy("qid")
  }

  val recallEvalSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, label, embedding AS emb FROM embeddings),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, embedding AS qemb, label AS qlabel
       |  FROM embeddings WHERE vec_id < $RecallQ),
       |scored AS MATERIALIZED (
       |  SELECT q.qid, q.qlabel, e.vec_id, e.label,
       |    ${Vectors.cosineSql("e.emb", "q.qemb")} AS cosine
       |  FROM e, q WHERE e.vec_id <> q.qid),
       |brute AS MATERIALIZED (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
       |    FROM scored)
       |  WHERE rk <= $K),
       |ivf AS MATERIALIZED (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
       |    FROM scored WHERE label = qlabel)
       |  WHERE rk <= $K),
       |com AS MATERIALIZED (
       |  SELECT qid, count(*) AS n_common
       |  FROM brute JOIN ivf USING (qid, vec_id) GROUP BY qid)
       |SELECT b.qid, b.n_brute, i.n_ivf,
       |  COALESCE(c.n_common, 0) AS n_common,
       |  CAST(COALESCE(c.n_common, 0) AS DOUBLE) / ${K.toDouble} AS recall
       |FROM (SELECT qid, count(*) AS n_brute FROM brute GROUP BY qid) b
       |JOIN (SELECT qid, count(*) AS n_ivf FROM ivf GROUP BY qid) i USING (qid)
       |LEFT JOIN com c USING (qid)
       |ORDER BY qid""".stripMargin

  // --- q_sim_recall_trained -----------------------------------------------
  // The other arm of the recall experiment q_sim_recall opens: the SAME
  // 20-query batch and exact baseline, but retrieval probes the TRAINED
  // Lloyd cells (corpusByCell's staged index) with NProbe=2 multiprobe
  // instead of the single class-label cell. Per-query probe selection is
  // the centroid-distance sort as plan literals (the ivfPrunedTopK
  // machinery applied per query row); candidates are the probed cells'
  // members only. PipelineOpsSpec pins the experiment's conclusion —
  // trained-cell multiprobe recall strictly beats label-cell recall —
  // so the index quality claim is a measured assertion in CI, not
  // prose. Oracle replays Lloyd training + assignment + probe + rank.
  def recallTrained(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = trainedCentroids(s, d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < RecallQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .localCheckpoint()
    val cellStructs = array(cents.zipWithIndex.map { case (c, cid) =>
      val cArr = array(c.map(lit): _*)
      struct((Vectors.dot(cArr, cArr) -
        lit(2.0) * Vectors.dot(col("qv"), cArr)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    val probes = q.select(col("qid"), explode(
      transform(slice(array_sort(cellStructs), 1, NProbe),
        x => x.getField("cid").cast("long"))).as("cell"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .localCheckpoint() // consumed by both rankings
    val wr = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("vec_id"))
    val brute = scored.withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= K).select("qid", "vec_id")
    val cells = corpusByCell(s, d)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
    val ivft = scored.join(cells, Seq("vec_id"))
      .join(broadcast(probes), Seq("qid", "cell"))
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= K).select("qid", "vec_id")
    val common = brute.join(ivft, Seq("qid", "vec_id"))
      .groupBy("qid").agg(count(lit(1)).as("n_common"))
    brute.groupBy("qid").agg(count(lit(1)).as("n_brute"))
      .join(ivft.groupBy("qid").agg(count(lit(1)).as("n_ivf")), Seq("qid"))
      .join(common, Seq("qid"), "left")
      .select(col("qid"), col("n_brute"), col("n_ivf"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          lit(K.toDouble)).as("recall"))
      .orderBy("qid")
  }

  // lazy: interpolates NProbe/LloydIters/lloydChainSql, declared later
  // in the object — an eager val here would read them pre-init (as 0)
  lazy val recallTrainedSql: String =
    s"""WITH $lloydChainSql,
       |qs AS MATERIALIZED (
       |  SELECT vec_id AS qid, embedding AS qv FROM e WHERE vec_id < $RecallQ),
       |probe AS MATERIALIZED (
       |  SELECT qid, cid FROM (
       |    SELECT q.qid, x.cid, row_number() OVER (PARTITION BY q.qid
       |      ORDER BY (${Vectors.dotSql("x.c", "x.c")})
       |        - 2 * (${Vectors.dotSql("q.qv", "x.c")}), x.cid) AS rk
       |    FROM c$LloydIters x, qs q)
       |  WHERE rk <= $NProbe),
       |assign AS MATERIALIZED (
       |  SELECT e.vec_id, min({'d': (${Vectors.dotSql("x.c", "x.c")})
       |      - 2 * (${Vectors.dotSql("e.embedding", "x.c")}), 'cid': x.cid}).cid
       |    AS cell
       |  FROM e, c$LloydIters x
       |  GROUP BY e.vec_id),
       |scored AS MATERIALIZED (
       |  SELECT q.qid, e.vec_id,
       |    ${Vectors.cosineSql("e.embedding", "q.qv")} AS cosine
       |  FROM e, qs q WHERE e.vec_id <> q.qid),
       |brute AS MATERIALIZED (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
       |    FROM scored)
       |  WHERE rk <= $K),
       |ivft AS MATERIALIZED (
       |  SELECT qid, vec_id FROM (
       |    SELECT s.qid, s.vec_id, row_number() OVER (
       |      PARTITION BY s.qid ORDER BY s.cosine DESC, s.vec_id) AS rk
       |    FROM scored s
       |    JOIN assign a ON s.vec_id = a.vec_id
       |    JOIN probe p ON p.qid = s.qid AND p.cid = a.cell)
       |  WHERE rk <= $K),
       |com AS MATERIALIZED (
       |  SELECT qid, count(*) AS n_common
       |  FROM brute JOIN ivft USING (qid, vec_id) GROUP BY qid)
       |SELECT b.qid, b.n_brute, i.n_ivf,
       |  COALESCE(c.n_common, 0) AS n_common,
       |  CAST(COALESCE(c.n_common, 0) AS DOUBLE) / ${K.toDouble} AS recall
       |FROM (SELECT qid, count(*) AS n_brute FROM brute GROUP BY qid) b
       |JOIN (SELECT qid, count(*) AS n_ivf FROM ivft GROUP BY qid) i USING (qid)
       |LEFT JOIN com c USING (qid)
       |ORDER BY qid""".stripMargin

  // --- q_sim_mips ---------------------------------------------------------
  // Maximum-inner-product search via the norm-augmentation reduction
  // (Bachrach et al., RecSys 2014 — public literature): MIPS is NOT a
  // metric problem (the query's own norm dominates; "nearest by dot"
  // violates the triangle inequality), which is why recommendation
  // retrieval (user·item scores) can't ride a cosine/L2 index as-is.
  // The classic fix appends ONE dimension: corpus vectors become
  // [v, sqrt(M² − |v|²)] (M = max corpus norm, so every augmented
  // vector has norm exactly M), the query appends 0 — then
  // L2²(q̂, v̂) = |q|² + M² − 2⟨q,v⟩, a strictly decreasing function
  // of the inner product: L2-NN on the augmented space ≡ MIPS. After
  // this reduction the ENTIRE ANN stack above (IVF cells, PQ codes,
  // DPP-pruned layouts) serves dot-product retrieval unchanged —
  // that's the point of the operator.
  //
  // M² is a one-double corpus scalar (the Lloyd collect pattern at
  // O(1)), broadcast with the query row; scoring is a zero-shuffle
  // scan projection; the cut is TakeOrderedAndProject. The augmented
  // distance is computed FROM the augmentation (aug·aug, not the
  // algebraic shortcut) in one pinned operand order — sqrt is the
  // portable transcendental — and the raw inner product rides along,
  // so the hash pins the reduction's arithmetic while the spec pins
  // its CONTRACT: dist²-ascending order ≡ dot-descending order.
  // dot(v,v) materializes once as a column (interpreted-HOF lesson:
  // no CSE across repeated references).
  def mipsTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    val corpus = e.filter(col("vec_id") =!= QueryId)
      .withColumn("vv", Vectors.dot(col("v"), col("v")))
    val m2 = corpus.agg(max(col("vv")).as("m2"))
    val aug = sqrt(greatest(lit(0.0), col("m2") - col("vv")))
    corpus.crossJoin(broadcast(q)).crossJoin(broadcast(m2))
      .withColumn("qq", Vectors.dot(col("qv"), col("qv")))
      .withColumn("ip", Vectors.dot(col("v"), col("qv")))
      .select(col("vec_id"), col("label"), col("ip"),
        (col("vv") + aug * aug + col("qq") - lit(2.0) * col("ip"))
          .as("aug_dist2"))
      .orderBy(col("aug_dist2"), col("vec_id"))
      .limit(K)
  }

  val mipsTopKSql: String = {
    val augSql = "sqrt(greatest(0.0, m2 - vv))"
    s"""WITH b AS MATERIALIZED (
       |  SELECT vec_id, label, embedding AS emb,
       |    ${Vectors.dotSql("embedding", "embedding")} AS vv
       |  FROM embeddings WHERE vec_id <> $QueryId),
       |q AS (
       |  SELECT embedding AS emb,
       |    ${Vectors.dotSql("embedding", "embedding")} AS qq
       |  FROM embeddings WHERE vec_id = $QueryId),
       |m AS (SELECT max(vv) AS m2 FROM b),
       |sc AS (
       |  SELECT b.vec_id, b.label, b.vv, q.qq,
       |    ${Vectors.dotSql("b.emb", "q.emb")} AS ip, m.m2
       |  FROM b, q, m)
       |SELECT vec_id, label, ip,
       |  vv + $augSql * $augSql + qq - 2.0 * ip AS aug_dist2
       |FROM sc
       |ORDER BY aug_dist2, vec_id
       |LIMIT $K""".stripMargin
  }

  // --- q_sim_kmeans_assign ------------------------------------------------
  // Semantic-cluster assignment (the k-means E-step) — how a curation
  // pipeline balances or stratifies a corpus by topic: every vector is
  // assigned to its nearest centroid. Centroids are a small external
  // model artifact by nature; here they are deterministic ±1 vectors
  // (md5-parity, like the LSH hyperplanes) embedded as plan literals in
  // BOTH engines. Equal-norm centroids make argmax-dot ≡ nearest-cosine.
  //
  // 100 TB shape: a pure scan projection — K×dim literal dot products
  // per row inside whole-stage codegen, zero shuffle. The M-step
  // (recompute centroids) would be one map-side-combinable aggregation
  // per dimension, decimal-routed for retry-stable double sums.
  // Ties (practically impossible on real-valued scores) break to the
  // lowest centroid id via the struct max over (score, -cid).
  private val NumCentroids = 8

  private[graft] def centroidWeights(c: Int): IndexedSeq[Double] =
    (0 until 64).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"c${c}_$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0) 1.0 else -1.0
    }

  /** (score, -cid) struct whose array_max is the E-step argmax — the
    * single construction behind kmeansAssign/kmeansUpdate/clusterOf. */
  private def bestCentroid(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_max(array((0 until NumCentroids).map { cid =>
      val w = array(centroidWeights(cid).map(lit): _*)
      struct(Vectors.dot(v, w).as("score"), lit(-cid).as("ncid"))
    }: _*))

  def kmeansAssign(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    e.select(col("vec_id"), col("label"), bestCentroid(col("v")).as("best"))
      .select(col("vec_id"), col("label"),
        (-col("best.ncid")).cast("long").as("cluster_id"),
        col("best.score").as("score"))
      .orderBy("vec_id")
  }

  private def clusterStructsSqlOf(c: String): String = {
    def wLit(cid: Int): String =
      centroidWeights(cid).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    (0 until NumCentroids).map { cid =>
      s"{'score': ${Vectors.dotSql(c, wLit(cid))}, 'ncid': ${-cid}}"
    }.mkString("[", ", ", "]")
  }

  private def clusterStructsSql: String = clusterStructsSqlOf("embedding")

  /** Cluster id of an `array<double>` embedding column — the E-step
    * argmax shared by the k-means queries and [[Dedup.semDedup]]'s
    * semantic bucketing (same centroids, same lowest-id tie-break). */
  private[graft] def clusterOf(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (-bestCentroid(v).getField("ncid")).cast("long")

  /** DuckDB twin of [[clusterOf]] over a named vector column. */
  private[graft] def clusterOfSql(c: String): String =
    s"(-(list_max(${clusterStructsSqlOf(c)}).ncid))::BIGINT"

  val kmeansAssignSql: String =
    s"""SELECT vec_id, label,
       |  (-(list_max($clusterStructsSql).ncid))::BIGINT AS cluster_id,
       |  list_max($clusterStructsSql).score AS score
       |FROM embeddings
       |ORDER BY vec_id""".stripMargin

  // --- q_sim_kmeans_update ------------------------------------------------
  // The k-means M-step completing the E-step above: per-cluster member
  // counts and per-dimension centroid means. Parallel double summation is
  // order-unstable, so components route through 1e-6 fixed point: every
  // element becomes round(v * 1e6) as an exact BIGINT, sums are exact
  // integer arithmetic in any order (retry- and partitioning-stable), and
  // the mean divides two exact integers in double space — bit-identical
  // across engines and runs. Same rationale as the DECIMAL-routed money
  // sums, chosen over DECIMAL here because embeddings are unit-scale.
  //
  // 100 TB shape: posexplode to a (cluster, dim) stream, then ONE
  // map-side-combinable aggregation — 8x64 groups regardless of corpus
  // size. The E-step scan fuses into the same stage (zero extra passes).
  def kmeansUpdate(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.select(clusterOf(col("v")).as("cluster_id"), posexplode(col("v")))
      .toDF("cluster_id", "dim", "v")
      .groupBy("cluster_id", "dim")
      .agg(count(lit(1)).as("n"),
        sum(round(col("v") * 1000000.0).cast("long")).as("sum_fixed"))
      .select(col("cluster_id"), col("dim").cast("long").as("dim"), col("n"),
        (col("sum_fixed").cast("double") / 1000000.0 / col("n").cast("double"))
          .as("mean_val"))
      .orderBy("cluster_id", "dim")
  }

  val kmeansUpdateSql: String =
    s"""WITH a AS (
       |  SELECT (-(list_max($clusterStructsSql).ncid))::BIGINT AS cluster_id,
       |    embedding
       |  FROM embeddings),
       |ex AS (
       |  SELECT cluster_id, i - 1 AS dim, embedding[i]::DOUBLE AS v
       |  FROM a, unnest(generate_series(1, len(embedding))) g(i))
       |SELECT cluster_id, dim::BIGINT AS dim, count(*) AS n,
       |  sum(CAST(round(v * 1000000.0) AS BIGINT))::DOUBLE / 1000000.0
       |    / count(*)::DOUBLE AS mean_val
       |FROM ex
       |GROUP BY cluster_id, dim
       |ORDER BY cluster_id, dim""".stripMargin

  // --- q_sim_silhouette -----------------------------------------------------
  // SIMPLIFIED SILHOUETTE per cluster — the O(n·k) cluster-validity
  // audit (Hruschka 2004) every curation clustering ships with: for
  // each vector, a = distance to its OWN centroid, b = distance to the
  // nearest OTHER centroid, s = (b − a)/max(a, b). The full silhouette
  // is O(n²) pairwise and dead at scale; the centroid form is a pure
  // scan — and because the seed centroids are equal-norm ±1 vectors,
  // both distances come from the SAME per-centroid dot products as the
  // E-step: dist² = v·v − 2·dot + 64, so the best and second-best
  // struct scores (one sorted 8-element literal array per row, inside
  // codegen) give a and b with no extra passes. b ≥ a by construction
  // ⇒ s = 1 − a/b, a fixed-order double tree over correctly-rounded
  // sqrt — bit-identical across engines. Per-row s re-rounds at 1e-9
  // into exact integers so the per-cluster mean is order-stable.
  // Scale: one scan, one k-row aggregation; zero shuffle beyond the
  // 8-row digest exchange.
  def silhouette(s: SparkSession, d: String): DataFrame = {
    val arr = array((0 until NumCentroids).map { cid =>
      val w = array(centroidWeights(cid).map(lit): _*)
      struct(Vectors.dot(col("v"), w).as("score"), lit(-cid).as("ncid"))
    }: _*)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("vv", Vectors.dot(col("v"), col("v")))
      .withColumn("sorted", sort_array(arr))
      .withColumn("best", element_at(col("sorted"), NumCentroids))
      .withColumn("second", element_at(col("sorted"), NumCentroids - 1))
      .withColumn("a", sqrt(greatest(lit(0.0),
        col("vv") - lit(2.0) * col("best.score") + lit(64.0))))
      .withColumn("b", sqrt(greatest(lit(0.0),
        col("vv") - lit(2.0) * col("second.score") + lit(64.0))))
      // a vector sitting exactly ON its second-nearest centroid (b = 0,
      // forcing a = 0 too) is perfectly ambiguous: s = 0, never NaN
      .withColumn("sil",
        when(col("b") > 0.0, lit(1.0) - col("a") / col("b"))
          .otherwise(lit(0.0)))
    e.groupBy((-col("best.ncid")).cast("long").as("cluster_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("sil") * 1.0e9).cast("long")).as("s9"))
      .select(col("cluster_id"), col("n"),
        (col("s9").cast("double") / 1.0e9 / col("n").cast("double"))
          .as("mean_silhouette"))
      .orderBy("cluster_id")
  }

  lazy val silhouetteSql: String =
    s"""WITH scored AS MATERIALIZED (
       |  SELECT vec_id,
       |    ${Vectors.dotSql("embedding", "embedding")} AS vv,
       |    list_sort($clusterStructsSql) AS srt
       |  FROM embeddings),
       |ab AS MATERIALIZED (
       |  SELECT vec_id,
       |    (-(srt[$NumCentroids].ncid))::BIGINT AS cluster_id,
       |    sqrt(greatest(0.0, vv - 2.0 * srt[$NumCentroids].score + 64.0))
       |      AS a,
       |    sqrt(greatest(0.0, vv - 2.0 * srt[${NumCentroids - 1}].score
       |      + 64.0)) AS b
       |  FROM scored)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(round(
       |      (CASE WHEN b > 0.0 THEN 1.0 - a / b ELSE 0.0 END) * 1e9)
       |    AS BIGINT)) AS BIGINT)::DOUBLE
       |    / 1e9 / count(*)::DOUBLE AS mean_silhouette
       |FROM ab GROUP BY cluster_id
       |ORDER BY cluster_id""".stripMargin

  // --- q_sim_quantize -------------------------------------------------------
  // Int8 scalar quantization of the embedding store — the compression
  // step that makes a 100 TB float32 vector corpus a 25 TB int8 one
  // (the standard SQ8 ANN layout). Per-dimension min/max come from ONE
  // map-side-combined aggregate (64 groups regardless of corpus size)
  // and broadcast back; the quantize + reconstruction-error pass is then
  // scan-side — the corpus explodes to (vec_id, dim, v) but never
  // shuffles (the only exchanges carry the 64-row stats and the 64-row
  // audit). Two scans total, which beats the one-scan window alternative
  // that would shuffle the entire exploded stream on dim. Every
  // arithmetic step is a fixed shape of correctly-rounded IEEE ops
  // ((v-min)/(max-min)*255, floored; reconstruction at the bucket
  // midpoint), so the DuckDB twin reproduces the doubles bit-for-bit;
  // the error sum routes through 1e-6 fixed point like the k-means
  // M-step. Output: the per-dimension audit a quantization job emits —
  // range, code span actually used, mean |reconstruction error|.
  def quantize(s: SparkSession, d: String): DataFrame = {
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding").cast("array<double>")))
      .toDF("vec_id", "dim", "v")
    val stats = ex.groupBy("dim")
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    ex.join(broadcast(stats), "dim")
      .withColumn("q",
        floor(((col("v") - col("vmin")) / (col("vmax") - col("vmin"))) * 255))
      .withColumn("vp",
        col("vmin") + ((col("q").cast("double") + 0.5) / 255.0)
          * (col("vmax") - col("vmin")))
      .withColumn("err_fp", round(abs(col("v") - col("vp")) * 1000000.0).cast("long"))
      .groupBy("dim", "vmin", "vmax")
      .agg(min(col("q")).as("q_min"), max(col("q")).as("q_max"),
        count(lit(1)).as("n"), sum(col("err_fp")).as("sum_err_fp"))
      .select(col("dim").cast("long").as("dim"), col("vmin"), col("vmax"),
        col("q_min"), col("q_max"), col("n"),
        (col("sum_err_fp").cast("double") / 1000000.0 / col("n").cast("double"))
          .as("mean_abs_err"))
      .orderBy("dim")
  }

  val quantizeSql: String =
    """WITH ex AS (
      |  SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS v
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) g(i)),
      |st AS (SELECT dim, min(v) AS vmin, max(v) AS vmax FROM ex GROUP BY dim),
      |qz AS (
      |  SELECT ex.dim, st.vmin, st.vmax,
      |    floor(((ex.v - st.vmin) / (st.vmax - st.vmin)) * 255) AS q,
      |    ex.v
      |  FROM ex JOIN st USING (dim)),
      |re AS (
      |  SELECT dim, vmin, vmax, q,
      |    CAST(round(abs(v - (vmin + ((q::DOUBLE + 0.5) / 255.0) * (vmax - vmin)))
      |      * 1000000.0) AS BIGINT) AS err_fp
      |  FROM qz)
      |SELECT dim::BIGINT AS dim, vmin, vmax,
      |  CAST(min(q) AS BIGINT) AS q_min, CAST(max(q) AS BIGINT) AS q_max,
      |  count(*) AS n,
      |  sum(err_fp)::DOUBLE / 1000000.0 / count(*)::DOUBLE AS mean_abs_err
      |FROM re
      |GROUP BY dim, vmin, vmax
      |ORDER BY dim""".stripMargin

  // --- q_sim_pq -------------------------------------------------------------
  // Product quantization ENCODE — the compression half of IVF-PQ, the
  // standard billion-vector ANN layout: the 64-dim embedding splits into
  // 4 subspaces of 16 dims, and each subvector is assigned to its
  // nearest codeword in a per-subspace codebook (8 codewords here), so
  // the vector is stored as 4 small codes instead of 64 floats — at
  // 100 TB that is the difference between the index fitting in executor
  // memory and not. Codebooks are a small external model artifact by
  // nature; like the k-means centroids they are deterministic ±1
  // vectors embedded as plan literals in BOTH engines, and equal-norm
  // codewords make argmax-dot ≡ nearest-L2. The whole encode is a
  // zero-shuffle scan projection (M×K literal dot products per row);
  // ties break to the lowest code via the (score, -k) struct max.
  private val PqM = 4 // subspaces
  private val PqK = 8 // codewords per subspace
  private val PqSub = 16 // dims per subspace (64 / PqM)

  private[graft] def pqWeights(m: Int, k: Int): IndexedSeq[Double] =
    (0 until PqSub).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"pq${m}_${k}_$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0) 1.0 else -1.0
    }

  def pqEncode(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cols = (0 until PqM).flatMap { m =>
      val sub = slice(col("v"), m * PqSub + 1, PqSub)
      val best = array_max(array((0 until PqK).map { k =>
        struct(
          Vectors.dot(sub, array(pqWeights(m, k).map(lit): _*)).as("score"),
          lit(-k).as("nk"))
      }: _*))
      Seq((-best.getField("nk")).cast("long").as(s"code_$m"),
        best.getField("score").as(s"score_$m"))
    }
    e.select(col("vec_id") +: cols: _*).orderBy("vec_id")
  }

  val pqEncodeSql: String = {
    def wLit(m: Int, k: Int): String =
      pqWeights(m, k).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val subDefs = (0 until PqM)
      .map(m => s"embedding[${m * PqSub + 1}:${(m + 1) * PqSub}] AS s$m")
      .mkString(", ")
    val bestDefs = (0 until PqM).map { m =>
      val structs = (0 until PqK)
        .map(k => s"{'score': ${Vectors.dotSql(s"s$m", wLit(m, k))}, 'nk': ${-k}}")
        .mkString("[", ", ", "]")
      s"list_max($structs) AS b$m"
    }.mkString(",\n  ")
    val outs = (0 until PqM)
      .map(m => s"CAST(-(b$m.nk) AS BIGINT) AS code_$m, b$m.score AS score_$m")
      .mkString(",\n  ")
    s"""WITH sub AS (SELECT vec_id, $subDefs FROM embeddings),
       |best AS (SELECT vec_id,
       |  $bestDefs
       |FROM sub)
       |SELECT vec_id,
       |  $outs
       |FROM best
       |ORDER BY vec_id""".stripMargin
  }

  // --- q_sim_pq_adc ---------------------------------------------------------
  // The SEARCH half of PQ: asymmetric distance computation. The query
  // stays exact; every candidate is represented only by its 4 codes, and
  // its score is the sum over subspaces of dot(query_sub, codeword[code])
  // — a 4-entry lookup into per-subspace LUTs of the query against the
  // codebook. At scale the LUT is M×K doubles computed ONCE per query
  // and broadcast; candidates never touch their float vectors again,
  // which is what makes billion-vector search memory-feasible. Here the
  // LUT build and the lookup are both in-plan (the query vector joins by
  // broadcast, the codebooks are literals), so the DuckDB twin
  // reproduces ADC scores bit-for-bit; the exact cosine rides along to
  // expose approximation quality. Top-k by (adc, vec_id) is total.
  def pqAdcTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    def wArr(m: Int, k: Int) = array(pqWeights(m, k).map(lit): _*)
    val adc = (0 until PqM).map { m =>
      val subV = slice(col("v"), m * PqSub + 1, PqSub)
      val subQ = slice(col("qv"), m * PqSub + 1, PqSub)
      val best = array_max(array((0 until PqK).map { k =>
        struct(Vectors.dot(subV, wArr(m, k)).as("score"), lit(-k).as("nk"))
      }: _*))
      val lut = array((0 until PqK).map(k => Vectors.dot(subQ, wArr(m, k))): _*)
      element_at(lut, (-best.getField("nk") + 1).cast("int"))
    }.reduce(_ + _)
    e.filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), adc.as("adc"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(K)
  }

  val pqAdcTopKSql: String = {
    def wLit(m: Int, k: Int): String =
      pqWeights(m, k).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val subDefs = (0 until PqM).flatMap(m => Seq(
      s"v[${m * PqSub + 1}:${(m + 1) * PqSub}] AS v$m",
      s"qv[${m * PqSub + 1}:${(m + 1) * PqSub}] AS q$m")).mkString(", ")
    val adcTerms = (0 until PqM).map { m =>
      val structs = (0 until PqK)
        .map(k => s"{'score': ${Vectors.dotSql(s"v$m", wLit(m, k))}, 'nk': ${-k}}")
        .mkString("[", ", ", "]")
      val lut = (0 until PqK)
        .map(k => Vectors.dotSql(s"q$m", wLit(m, k)))
        .mkString("[", ", ", "]")
      s"($lut)[CAST(-(list_max($structs).nk) + 1 AS INT)]"
    }.mkString(" + ")
    s"""WITH j AS (
       |  SELECT b.vec_id, b.embedding AS v, q.embedding AS qv
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> $QueryId) b,
       |       (SELECT embedding FROM embeddings WHERE vec_id = $QueryId) q),
       |sub AS (SELECT vec_id, v, qv, $subDefs FROM j)
       |SELECT vec_id, $adcTerms AS adc,
       |  ${Vectors.cosineSql("v", "qv")} AS cosine
       |FROM sub
       |ORDER BY adc DESC, vec_id
       |LIMIT $K""".stripMargin
  }

  // --- q_sim_kmeans_lloyd ---------------------------------------------------
  // LLOYD'S ITERATIONS — real centroid training, not just one E/M step:
  // starting from the literal ±1 seeds, N rounds of assign (true argmin
  // L2 against the CURRENT centroids — post-M-step means are not
  // equal-norm, so argmax-dot would be wrong here) then recompute means.
  // Each round's means route through 1e-6 fixed point (exact BIGINT
  // sums, order/partitioning/retry-stable — the kmeansUpdate
  // convention), are collected to the driver (8×64 doubles — the model
  // artifact, tiny by construction), and are embedded as LITERALS in
  // the next round's plan: lineage resets every round (the same reason
  // clusterKeeper checkpoints, without materializing data), and the
  // assignment stays a zero-shuffle scan projection. Empty clusters
  // keep their previous centroid. The driver row is the FINAL
  // assignment with its exact squared distance; the DuckDB twin
  // replays all N rounds as a CTE chain — same seeds, same fixed-point
  // means, same (dist, cid) argmin ties — bit-for-bit.
  //
  // 100 TB shape per round: one scan fused with the E-step (the
  // argmin is K×dim literal dots inside codegen), ONE map-side-
  // combinable aggregation to 8×64 groups, an 8-row driver collect.
  // Rounds are sequential by nature; the corpus never shuffles.
  private val LloydIters = 3

  /** (dist, cid) structs for argmin assignment under explicit centroid
    * arrays; dist = c·c − 2·v·c (the v·v shift is constant per row and
    * dropped during iteration). Ties break to the lowest cid. */
  private def lloydBest(v: org.apache.spark.sql.Column,
      cents: IndexedSeq[IndexedSeq[Double]]): org.apache.spark.sql.Column =
    array_min(array(cents.zipWithIndex.map { case (c, cid) =>
      val cArr = array(c.map(lit): _*)
      struct((Vectors.dot(cArr, cArr) - lit(2.0) * Vectors.dot(v, cArr)).as("d"),
        lit(cid).as("cid"))
    }: _*))

  /** Run `iters` Lloyd rounds; returns the trained centroids. */
  private[graft] def lloydCentroids(s: SparkSession, d: String,
      iters: Int): IndexedSeq[IndexedSeq[Double]] = {
    // Pinned once for all rounds: each round is a separate job, and
    // without the pin every one re-reads + re-casts the parquet scan.
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    var cents: IndexedSeq[IndexedSeq[Double]] =
      (0 until NumCentroids).map(centroidWeights)
    for (_ <- 1 to iters) {
      val means = e
        .select(lloydBest(col("v"), cents).getField("cid").as("cid"),
          posexplode(col("v")))
        .toDF("cid", "dim", "x")
        .groupBy("cid", "dim")
        .agg(count(lit(1)).as("n"),
          sum(round(col("x") * 1000000.0).cast("long")).as("sum_fixed"))
        .select(col("cid"), col("dim"),
          (col("sum_fixed").cast("double") / 1000000.0 / col("n").cast("double"))
            .as("m"))
        .collect()
        .map(r => (r.getAs[Int]("cid"), r.getAs[Int]("dim")) -> r.getAs[Double]("m"))
        .toMap
      cents = (0 until NumCentroids).map { cid =>
        if (means.contains((cid, 0)))
          cents(cid).indices.map(dim => means((cid, dim)))
        else cents(cid) // empty cluster keeps its previous centroid
      }
    }
    cents
  }

  def kmeansLloyd(s: SparkSession, d: String): DataFrame = {
    // Through the per-fingerprint cache: the first cut retrained the
    // 3 Lloyd rounds on EVERY call (3 extra jobs + 3 Janino compiles
    // of the K×dim literal-dot tree per bench run — the r11 3×
    // regression); training is an index-build artifact shared with
    // the IVF family, so pay it once per staged dataset.
    val cents = trainedCentroids(s, d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // final assignment carries the FULL squared distance (v·v + c·c −
    // 2·v·c, that operand order on both engines) so the output is a
    // meaningful training artifact, not just a label
    val best = array_min(array(cents.zipWithIndex.map { case (c, cid) =>
      val cArr = array(c.map(lit): _*)
      struct((Vectors.dot(col("v"), col("v")) + Vectors.dot(cArr, cArr)
        - lit(2.0) * Vectors.dot(col("v"), cArr)).as("d"),
        lit(cid).as("cid"))
    }: _*))
    e.select(col("vec_id"),
      best.getField("cid").cast("long").as("cluster_id"),
      best.getField("d").as("dist_sq"))
      .orderBy("vec_id")
  }

  /** The Lloyd training replay as a CTE chain (`e`, `c0`, then
    * d/a/m/c per round — `c$LloydIters` holds the trained centroids).
    * Shared by the kmeansLloyd oracle and the trained-IVF-PQ oracle,
    * so both engines derive the SAME coarse quantizer from the same
    * replay. */
  private def lloydChainSql: String = {
    def centLit(c: IndexedSeq[Double]): String =
      c.map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val c0rows = (0 until NumCentroids)
      .map(cid => s"($cid, ${centLit(centroidWeights(cid))})").mkString(", ")
    val iterCtes = (1 to LloydIters).map { i =>
      val prev = s"c${i - 1}"
      s"""d$i AS (
         |  SELECT e.vec_id, x.cid,
         |    (${Vectors.dotSql("x.c", "x.c")}) - 2 * (${Vectors.dotSql("e.embedding", "x.c")}) AS dd
         |  FROM e, $prev x),
         |a$i AS (
         |  SELECT vec_id, min({'d': dd, 'cid': cid}).cid AS cid
         |  FROM d$i GROUP BY vec_id),
         |m$i AS (
         |  SELECT a.cid, g.i - 1 AS dim, count(*) AS n,
         |    sum(CAST(round(e.embedding[g.i]::DOUBLE * 1000000.0) AS BIGINT))::DOUBLE
         |      / 1000000.0 / count(*)::DOUBLE AS m
         |  FROM a$i a JOIN e ON a.vec_id = e.vec_id,
         |       unnest(generate_series(1, len(e.embedding))) g(i)
         |  GROUP BY a.cid, g.i),
         |c$i AS (
         |  SELECT p.cid, COALESCE(u.c, p.c) AS c
         |  FROM $prev p LEFT JOIN
         |    (SELECT cid, list(m ORDER BY dim) AS c FROM m$i GROUP BY cid) u
         |    ON p.cid = u.cid)""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT * FROM (VALUES $c0rows) t(cid, c)),
       |$iterCtes""".stripMargin
  }

  val kmeansLloydSql: String = {
    s"""WITH $lloydChainSql,
       |fin AS (
       |  SELECT e.vec_id, x.cid,
       |    (${Vectors.dotSql("e.embedding", "e.embedding")}) + (${Vectors.dotSql("x.c", "x.c")})
       |      - 2 * (${Vectors.dotSql("e.embedding", "x.c")}) AS dd
       |  FROM e, c$LloydIters x)
       |SELECT vec_id, CAST(min({'d': dd, 'cid': cid}).cid AS BIGINT) AS cluster_id,
       |  min({'d': dd, 'cid': cid}).d AS dist_sq
       |FROM fin
       |GROUP BY vec_id
       |ORDER BY vec_id""".stripMargin
  }

  // --- q_sim_ivfpq_topk -----------------------------------------------------
  // IVF-PQ COMPOSED — the shape a billion-vector index actually runs
  // (coarse quantizer routes, ADC scores, nothing else touches floats):
  // (1) the query routes to its NProbe best coarse cells (the k-means
  // centroids ARE the coarse quantizer — same argmax construction as
  // kmeansAssign, computed in-plan from the broadcast query row, sorted
  // (score, -cid) structs so ties break to the lowest cell id in both
  // engines); (2) ONLY vectors whose cell is probed become candidates —
  // at scale the corpus is partitioned by cell on disk, so this is a
  // partition-pruned read of ~NProbe/C of the data; (3) candidates are
  // scored by asymmetric distance — the query's M×K LUT against each
  // candidate's PQ codes — never by their float vectors (here the codes
  // derive in-plan, the q_sim_pq encode; in the deployed index they are
  // the stored representation). Exact cosine rides along to expose
  // recall quality. Top-k by (adc, vec_id) is total. The DuckDB twin
  // replays routing, cell membership, LUT and lookup bit-for-bit.
  private val NProbe = 2

  private def centroidLit(cid: Int): String =
    centroidWeights(cid).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** Candidates with ADC scores, BEFORE top-k — split out so the spec
    * can assert the candidate set is exactly the probed cells' members
    * (the bound that makes IVF sub-linear). */
  private[graft] def ivfPqCandidates(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    val cellStructs = array((0 until NumCentroids).map { cid =>
      struct(
        Vectors.dot(col("qv"), array(centroidWeights(cid).map(lit): _*)).as("score"),
        lit(-cid).as("ncid"))
    }: _*)
    // ascending struct sort then reverse = score desc, lowest cid on ties
    val probe = transform(slice(reverse(array_sort(cellStructs)), 1, NProbe),
      x => (-x.getField("ncid")).cast("long"))
    def wArr(m: Int, k: Int) = array(pqWeights(m, k).map(lit): _*)
    val adc = (0 until PqM).map { m =>
      val subV = slice(col("v"), m * PqSub + 1, PqSub)
      val subQ = slice(col("qv"), m * PqSub + 1, PqSub)
      val best = array_max(array((0 until PqK).map { k =>
        struct(Vectors.dot(subV, wArr(m, k)).as("score"), lit(-k).as("nk"))
      }: _*))
      val lut = array((0 until PqK).map(k => Vectors.dot(subQ, wArr(m, k))): _*)
      element_at(lut, (-best.getField("nk") + 1).cast("int"))
    }.reduce(_ + _)
    e.filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .withColumn("cell", clusterOf(col("v")))
      .filter(array_contains(probe, col("cell")))
      .select(col("vec_id"), col("cell"), adc.as("adc"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
  }

  def ivfPqTopK(s: SparkSession, d: String): DataFrame =
    ivfPqCandidates(s, d)
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(K)

  val ivfPqTopKSql: String = {
    def wLit(m: Int, k: Int): String =
      pqWeights(m, k).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val cellStructs = (0 until NumCentroids)
      .map(cid => s"{'score': ${Vectors.dotSql("qv", centroidLit(cid))}, 'ncid': ${-cid}}")
      .mkString("[", ", ", "]")
    val subDefs = (0 until PqM).flatMap(m => Seq(
      s"v[${m * PqSub + 1}:${(m + 1) * PqSub}] AS v$m",
      s"qv[${m * PqSub + 1}:${(m + 1) * PqSub}] AS q$m")).mkString(", ")
    val adcTerms = (0 until PqM).map { m =>
      val structs = (0 until PqK)
        .map(k => s"{'score': ${Vectors.dotSql(s"v$m", wLit(m, k))}, 'nk': ${-k}}")
        .mkString("[", ", ", "]")
      val lut = (0 until PqK)
        .map(k => Vectors.dotSql(s"q$m", wLit(m, k)))
        .mkString("[", ", ", "]")
      s"($lut)[CAST(-(list_max($structs).nk) + 1 AS INT)]"
    }.mkString(" + ")
    s"""WITH j AS (
       |  SELECT b.vec_id, b.embedding AS v, q.embedding AS qv
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> $QueryId) b,
       |       (SELECT embedding FROM embeddings WHERE vec_id = $QueryId) q),
       |routed AS (
       |  SELECT vec_id, v, qv,
       |    list_transform((list_reverse(list_sort($cellStructs)))[1:$NProbe],
       |      x -> CAST(-(x.ncid) AS BIGINT)) AS probe_cells,
       |    ${clusterOfSql("v")} AS cell
       |  FROM j),
       |sub AS (
       |  SELECT vec_id, v, qv, cell, $subDefs
       |  FROM routed WHERE list_contains(probe_cells, cell))
       |SELECT vec_id, cell, $adcTerms AS adc,
       |  ${Vectors.cosineSql("v", "qv")} AS cosine
       |FROM sub
       |ORDER BY adc DESC, vec_id
       |LIMIT $K""".stripMargin
  }

  // --- q_sim_ivfpq_trained --------------------------------------------------
  // IVF-PQ with a TRAINED coarse quantizer — the actual index-build path
  // of a billion-vector system: lloydCentroids trains the cells (3
  // Lloyd rounds from the ±1 seeds, fixed-point means), the trained
  // means are embedded as plan literals (the lineage-reset trick of
  // kmeansLloyd — the 8×64-double model artifact is the ONLY thing
  // that ever leaves the cluster), and routing/membership both run
  // argmin-L2 against them (trained centroids are not equal-norm, so
  // the argmax-dot shortcut of the seed-based router would be WRONG
  // here — using lloydBest is semantics, not style). Candidates are
  // scored by PQ asymmetric distance exactly as q_sim_ivfpq_topk. The
  // DuckDB twin REPLAYS the training (the shared Lloyd CTE chain),
  // routes and scores from its own c3 — a drift anywhere in training,
  // routing, membership, or ADC breaks the hash.
  private[graft] def ivfPqTrainedCandidates(s: SparkSession, d: String): DataFrame = {
    val cents = trainedCentroids(s, d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    // query routing: NProbe cells by ascending (L2, cid) — struct sort
    // is lexicographic in both engines, ties to the lowest cell id
    val cellStructs = array(cents.zipWithIndex.map { case (c, cid) =>
      val cArr = array(c.map(lit): _*)
      struct((Vectors.dot(cArr, cArr) - lit(2.0) * Vectors.dot(col("qv"), cArr)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    val probe = transform(slice(array_sort(cellStructs), 1, NProbe),
      x => x.getField("cid").cast("long"))
    def wArr(m: Int, k: Int) = array(pqWeights(m, k).map(lit): _*)
    val adc = (0 until PqM).map { m =>
      val subV = slice(col("v"), m * PqSub + 1, PqSub)
      val subQ = slice(col("qv"), m * PqSub + 1, PqSub)
      val best = array_max(array((0 until PqK).map { k =>
        struct(Vectors.dot(subV, wArr(m, k)).as("score"), lit(-k).as("nk"))
      }: _*))
      val lut = array((0 until PqK).map(k => Vectors.dot(subQ, wArr(m, k))): _*)
      element_at(lut, (-best.getField("nk") + 1).cast("int"))
    }.reduce(_ + _)
    e.filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .withColumn("cell", lloydBest(col("v"), cents).getField("cid").cast("long"))
      .filter(array_contains(probe, col("cell")))
      .select(col("vec_id"), col("cell"), adc.as("adc"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
  }

  def ivfPqTrainedTopK(s: SparkSession, d: String): DataFrame =
    ivfPqTrainedCandidates(s, d)
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(K)

  val ivfPqTrainedSql: String = {
    def wLit(m: Int, k: Int): String =
      pqWeights(m, k).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val subDefs = (0 until PqM).flatMap(m => Seq(
      s"v[${m * PqSub + 1}:${(m + 1) * PqSub}] AS v$m",
      s"qv[${m * PqSub + 1}:${(m + 1) * PqSub}] AS q$m")).mkString(", ")
    val adcTerms = (0 until PqM).map { m =>
      val structs = (0 until PqK)
        .map(k => s"{'score': ${Vectors.dotSql(s"v$m", wLit(m, k))}, 'nk': ${-k}}")
        .mkString("[", ", ", "]")
      val lut = (0 until PqK)
        .map(k => Vectors.dotSql(s"q$m", wLit(m, k)))
        .mkString("[", ", ", "]")
      s"($lut)[CAST(-(list_max($structs).nk) + 1 AS INT)]"
    }.mkString(" + ")
    s"""WITH $lloydChainSql,
       |q AS (SELECT embedding AS qv FROM e WHERE vec_id = $QueryId),
       |probe AS (
       |  SELECT x.cid
       |  FROM c$LloydIters x, q
       |  ORDER BY (${Vectors.dotSql("x.c", "x.c")}) - 2 * (${Vectors.dotSql("q.qv", "x.c")}), x.cid
       |  LIMIT $NProbe),
       |assign AS (
       |  SELECT e.vec_id, min({'d': (${Vectors.dotSql("x.c", "x.c")})
       |      - 2 * (${Vectors.dotSql("e.embedding", "x.c")}), 'cid': x.cid}).cid AS cell
       |  FROM e, c$LloydIters x
       |  WHERE e.vec_id <> $QueryId
       |  GROUP BY e.vec_id),
       |cand AS (
       |  SELECT a.vec_id, a.cell, e.embedding AS v, q.qv
       |  FROM assign a
       |  JOIN e ON e.vec_id = a.vec_id, q
       |  WHERE a.cell IN (SELECT cid FROM probe)),
       |sub AS (SELECT vec_id, cell, v, qv, $subDefs FROM cand)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, $adcTerms AS adc,
       |  ${Vectors.cosineSql("v", "qv")} AS cosine
       |FROM sub
       |ORDER BY adc DESC, vec_id
       |LIMIT $K""".stripMargin
  }

  // --- q_sim_ivfpq_residual -------------------------------------------------
  // RESIDUAL IVF-PQ + EXACT RE-RANK — the full production index shape
  // (what Faiss's IVFPQ actually stores): PQ codes encode the RESIDUAL
  // v − centroid(cell(v)), not the raw vector. That is what makes
  // coarse + fine quantization COMPOSE: the coarse quantizer absorbs
  // the cluster-scale component, the codebook only has to represent
  // the (smaller, centered) remainder, and the ADC estimate becomes
  // dot(q, centroid) [exact, per probed cell] + dot(q, residual-code)
  // [LUT]. Search then re-ranks the ADC top-R by EXACT cosine — the
  // standard two-stage retrieve: the cheap code-only scan bounds the
  // candidate pool, the expensive float pass runs on R rows only.
  //
  // Plan shape notes (the 100 TB story): the per-row PQ folds
  // (dot(v_sub, w) for all M×K codewords) are materialized ONCE as
  // projected columns — interpreted HOF eval has no subexpression
  // elimination, and the per-cell encode branches would otherwise
  // recompute each 16-element fold 8×. The per-(cell,subspace,code)
  // constants dot(centroid_sub, w) are driver-side literals folded in
  // EXACTLY Vectors.dot's left-to-right order, so they are bit-equal
  // to the DuckDB twin's in-query folds over its replayed c3 chain.
  // Both top cuts are TakeOrderedAndProject (per-partition heaps, no
  // global sort). Exact float vectors are touched only by the R-row
  // re-rank — at scale they'd page in from the row store by vec_id.
  private val ReRankR = 30

  /** Driver-side twin of [[Vectors.dot]]: same left fold from 0.0, so
    * literal constants are bit-equal to the in-plan / DuckDB folds. */
  private def dotConst(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)

  /** Residual-PQ ADC scores for every candidate of `e` (vec_id, v)
    * against the one-row broadcast `q` (qv), given trained cells:
    * (vec_id, cell, adc, cosine). Factored out so the spec can run it
    * on a CONSTRUCTED corpus against [[rawAdcScores]]. */
  private[graft] def residualAdcScores(e: DataFrame, q: DataFrame,
      cents: IndexedSeq[IndexedSeq[Double]]): DataFrame = {
    val centSubDot = cents.map { c =>
      (0 until PqM).map { m =>
        (0 until PqK).map { k =>
          dotConst(c.slice(m * PqSub, (m + 1) * PqSub), pqWeights(m, k)) } } }
    def wArr(m: Int, k: Int) = array(pqWeights(m, k).map(lit): _*)
    val dvCols = for { m <- 0 until PqM; k <- 0 until PqK } yield
      Vectors.dot(slice(col("v"), m * PqSub + 1, PqSub), wArr(m, k)).as(s"dv_${m}_$k")
    // The query LUT (dot(q_sub, w)) and per-cell dot(qv, cent) folds are
    // projected on the ONE-ROW side BEFORE the crossJoin: Catalyst has
    // no cross-row CSE, so computing them after the join re-ran 64+8
    // dot products per DATA row for values that depend only on qv.
    val qlCols = for { m <- 0 until PqM; k <- 0 until PqK } yield
      Vectors.dot(slice(col("qv"), m * PqSub + 1, PqSub), wArr(m, k)).as(s"ql_${m}_$k")
    val qcCols = (0 until NumCentroids).map { cid =>
      Vectors.dot(col("qv"), array(cents(cid).map(lit): _*)).as(s"qc_$cid") }
    val qPre = q.select(col("qv") +: (qlCols ++ qcCols): _*)
    val staged = e.crossJoin(broadcast(qPre))
      .withColumn("cell", lloydBest(col("v"), cents).getField("cid").cast("long"))
      .select(Seq(col("vec_id"), col("cell"), col("v"), col("qv")) ++
        dvCols ++
        (for { m <- 0 until PqM; k <- 0 until PqK } yield col(s"ql_${m}_$k")) ++
        (0 until NumCentroids).map(cid => col(s"qc_$cid")): _*)
    // residual encode: argmax_k dot(v_sub − cent_sub, w_k)
    //                = argmax_k (dv_m_k − const(cell, m, k)), ties → lowest k.
    // const(cell, m, k) is SELECTED per row (element_at over the
    // per-cell literal array) instead of expanding the whole argmax
    // once per cell and element_at-picking one afterwards: the
    // expanded form built NumCentroids×PqK struct branches per
    // subspace (~4k expression nodes), whose generated processNext()
    // failed janino compilation — the projection silently fell back to
    // INTERPRETED eval (the "ERROR CodeGenerator" in any verify log),
    // which is why this query cost >1 s for 2,000 rows. Same doubles
    // (identical subtract-const per row), same (score, −k) tie-break,
    // 8× fewer nodes, and whole-stage codegen compiles again.
    def constSel(m: Int, k: Int) = element_at(
      array((0 until NumCentroids).map(cid => lit(centSubDot(cid)(m)(k))): _*),
      (col("cell") + 1).cast("int"))
    def codeFor(m: Int) =
      -array_max(array((0 until PqK).map { k =>
        struct((col(s"dv_${m}_$k") - constSel(m, k)).as("score"),
          lit(-k).as("nk"))
      }: _*)).getField("nk")
    val qDotCent = element_at(
      array((0 until NumCentroids).map(cid => col(s"qc_$cid")): _*),
      (col("cell") + 1).cast("int"))
    val adc = (0 until PqM).map { m =>
      element_at(array((0 until PqK).map(k => col(s"ql_${m}_$k")): _*),
        (codeFor(m) + 1).cast("int"))
    }.foldLeft(qDotCent)(_ + _)
    staged.select(col("vec_id"), col("cell"), adc.as("adc"),
      Vectors.cosine(col("v"), col("qv")).as("cosine"))
  }

  /** RAW-vector PQ ADC (the q_sim_ivfpq_topk scoring) over the same
    * interface, for the spec's residual-vs-raw ranking comparison. */
  private[graft] def rawAdcScores(e: DataFrame, q: DataFrame): DataFrame = {
    def wArr(m: Int, k: Int) = array(pqWeights(m, k).map(lit): _*)
    val adc = (0 until PqM).map { m =>
      val subV = slice(col("v"), m * PqSub + 1, PqSub)
      val subQ = slice(col("qv"), m * PqSub + 1, PqSub)
      val best = array_max(array((0 until PqK).map { k =>
        struct(Vectors.dot(subV, wArr(m, k)).as("score"), lit(-k).as("nk"))
      }: _*))
      val lut = array((0 until PqK).map(k => Vectors.dot(subQ, wArr(m, k))): _*)
      element_at(lut, (-best.getField("nk") + 1).cast("int"))
    }.reduce(_ + _)
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), adc.as("adc"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
  }

  def ivfPqResidualTopK(s: SparkSession, d: String): DataFrame = {
    val cents = trainedCentroids(s, d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    // query routing: NProbe cells by ascending (L2, cid), as in the
    // trained rows (argmin-L2 — trained centroids are not equal-norm)
    val cellStructs = array(cents.zipWithIndex.map { case (c, cid) =>
      val cArr = array(c.map(lit): _*)
      struct((Vectors.dot(cArr, cArr) - lit(2.0) * Vectors.dot(col("qv"), cArr)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    val probe = transform(slice(array_sort(cellStructs), 1, NProbe),
      x => x.getField("cid").cast("long"))
    val scored = residualAdcScores(e.filter(col("vec_id") =!= QueryId), q, cents)
      .filter(array_contains(probe, col("cell")))
    // stage 1: ADC top-R (code-only scan); stage 2: exact re-rank to K
    scored.orderBy(col("adc").desc, col("vec_id")).limit(ReRankR)
      .orderBy(col("cosine").desc, col("vec_id")).limit(K)
  }

  val ivfPqResidualSql: String = {
    def wLit(m: Int, k: Int): String =
      pqWeights(m, k).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val subDefs = ((0 until PqM).flatMap(m => Seq(
      s"v[${m * PqSub + 1}:${(m + 1) * PqSub}] AS v$m",
      s"qv[${m * PqSub + 1}:${(m + 1) * PqSub}] AS q$m")) ++
      (0 until PqM).map(m => s"c[${m * PqSub + 1}:${(m + 1) * PqSub}] AS c$m"))
      .mkString(", ")
    // residual encode per subspace: scores are dot(v_sub,w) − dot(c_sub,w)
    val codeDefs = (0 until PqM).map { m =>
      val structs = (0 until PqK)
        .map(k => s"{'score': (${Vectors.dotSql(s"v$m", wLit(m, k))}) - (${Vectors.dotSql(s"c$m", wLit(m, k))}), 'nk': ${-k}}")
        .mkString("[", ", ", "]")
      s"CAST(-(list_max($structs).nk) AS INT) AS code$m"
    }.mkString(",\n  ")
    val adcTerms = (0 until PqM).map { m =>
      val lut = (0 until PqK)
        .map(k => Vectors.dotSql(s"q$m", wLit(m, k)))
        .mkString("[", ", ", "]")
      s"(($lut)[code$m + 1])"
    }.mkString(" + ")
    s"""WITH $lloydChainSql,
       |q AS (SELECT embedding AS qv FROM e WHERE vec_id = $QueryId),
       |probe AS (
       |  SELECT x.cid
       |  FROM c$LloydIters x, q
       |  ORDER BY (${Vectors.dotSql("x.c", "x.c")}) - 2 * (${Vectors.dotSql("q.qv", "x.c")}), x.cid
       |  LIMIT $NProbe),
       |assign AS (
       |  SELECT e.vec_id, min({'d': (${Vectors.dotSql("x.c", "x.c")})
       |      - 2 * (${Vectors.dotSql("e.embedding", "x.c")}), 'cid': x.cid}).cid AS cell
       |  FROM e, c$LloydIters x
       |  WHERE e.vec_id <> $QueryId
       |  GROUP BY e.vec_id),
       |cand AS (
       |  SELECT a.vec_id, a.cell, e.embedding AS v, q.qv, x.c
       |  FROM assign a
       |  JOIN e ON e.vec_id = a.vec_id
       |  JOIN c$LloydIters x ON x.cid = a.cell, q
       |  WHERE a.cell IN (SELECT cid FROM probe)),
       |sub AS (SELECT vec_id, cell, v, qv, c, $subDefs FROM cand),
       |enc AS (SELECT vec_id, cell, v, qv, c, q0, q1, q2, q3,
       |  $codeDefs
       |FROM sub),
       |scored AS (
       |  SELECT vec_id, cell, v, qv,
       |    (${Vectors.dotSql("qv", "c")}) + $adcTerms AS adc
       |  FROM enc),
       |pool AS (
       |  SELECT * FROM scored ORDER BY adc DESC, vec_id LIMIT $ReRankR)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, adc,
       |  ${Vectors.cosineSql("v", "qv")} AS cosine
       |FROM pool
       |ORDER BY cosine DESC, vec_id
       |LIMIT $K""".stripMargin
  }

  // --- q_sim_ivfpq_full -----------------------------------------------------
  // IVF-PQ with BOTH quantizers TRAINED — the complete production index
  // build: the coarse quantizer is the Lloyd-trained cells
  // (q_sim_ivfpq_trained) and the PQ codebooks are now themselves
  // trained BY SUBSPACE ON THE RESIDUALS (per-subspace Lloyd from the
  // ±1 seeds: assign by argmin L2 against the CURRENT codewords —
  // trained codewords aren't equal-norm, so the dot shortcut would be
  // wrong from round 1 — then fixed-point means; empty codewords keep
  // their previous value). That is the step that makes the codebook
  // match the residual DISTRIBUTION, not just the residual direction:
  // codewords take the scale and shape of v − centroid(cell(v)), which
  // is what makes ADC over residual codes a calibrated estimate. The
  // model artifact is 4×8×16 doubles, trained once per dataset
  // fingerprint and embedded as plan literals (lineage reset, the
  // Lloyd convention).
  //
  // Floating-point discipline: dot(residual_sub, codeword) is computed
  // EVERYWHERE as dot(v_sub, cw) − dot(cent_sub, cw) — never as a dot
  // over materialized residual elements, whose per-element subtraction
  // would round differently — and the training means use the
  // fixed-point residual components round((v_i − c_i)·1e6) in both
  // engines. The DuckDB twin replays coarse training, cell assignment,
  // all per-subspace codebook rounds, the residual encode, ADC, and
  // the exact re-rank off one shared MATERIALIZED CTE chain.
  private val CbRounds = 2

  /** Driver-side per-subspace residual Lloyd. Returns codebooks
    * [m][k][dim16]. */
  private[graft] def residualCodebooks(s: SparkSession, d: String,
      cents: IndexedSeq[IndexedSeq[Double]]): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", lloydBest(col("v"), cents).getField("cid").cast("int"))
    val cents2D = array(cents.map(c => array(c.map(lit): _*)): _*)
    (0 until PqM).map { m =>
      var cb: IndexedSeq[IndexedSeq[Double]] = (0 until PqK).map(k => pqWeights(m, k))
      for (_ <- 1 to CbRounds) {
        val subV = slice(col("v"), m * PqSub + 1, PqSub)
        // argmin_k ||r_sub − cw||² via cw·cw − 2·(dot(v_sub,cw) − dot(c_sub,cw));
        // the per-(cell,k) constant dot(c_sub,cw) enters as literals
        val best = array_min(array(cb.zipWithIndex.map { case (cw, k) =>
          val cwArr = array(cw.map(lit): _*)
          val centSub = array(cents.indices.map(cid =>
            lit(dotConst(cents(cid).slice(m * PqSub, (m + 1) * PqSub), cw))): _*)
          struct((lit(dotConst(cw, cw)) -
            lit(2.0) * (Vectors.dot(subV, cwArr) -
              element_at(centSub, col("cell") + 1))).as("dd"),
            lit(k).as("k"))
        }: _*))
        val means = e
          .select(best.getField("k").as("k"), col("cell"),
            posexplode(subV).as(Seq("dim", "vi")))
          .withColumn("ci", element_at(element_at(cents2D, col("cell") + 1),
            col("dim") + lit(m * PqSub) + 1))
          .groupBy("k", "dim")
          .agg(count(lit(1)).as("n"),
            sum(round((col("vi") - col("ci")) * 1000000.0).cast("long")).as("sum_fixed"))
          .select(col("k"), col("dim"),
            (col("sum_fixed").cast("double") / 1000000.0 / col("n").cast("double"))
              .as("mv"))
          .collect()
          .map(r => (r.getAs[Int]("k"), r.getAs[Int]("dim")) -> r.getAs[Double]("mv"))
          .toMap
        cb = (0 until PqK).map { k =>
          if (means.contains((k, 0))) (0 until PqSub).map(dim => means((k, dim)))
          else cb(k) // empty codeword keeps its previous value
        }
      }
      cb
    }
  }

  private val cbCache = new java.util.concurrent.ConcurrentHashMap[
    String, IndexedSeq[IndexedSeq[IndexedSeq[Double]]]]()

  private[graft] def trainedCodebooks(s: SparkSession, d: String)
  : IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    cbCache.computeIfAbsent(Tables.stageTag(d),
      _ => residualCodebooks(s, d, trainedCentroids(s, d)))

  def ivfPqFullTopK(s: SparkSession, d: String): DataFrame = {
    val cents = trainedCentroids(s, d)
    val cbs = trainedCodebooks(s, d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    val cellStructs = array(cents.zipWithIndex.map { case (c, cid) =>
      val cArr = array(c.map(lit): _*)
      struct((Vectors.dot(cArr, cArr) - lit(2.0) * Vectors.dot(col("qv"), cArr)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    val probe = transform(slice(array_sort(cellStructs), 1, NProbe),
      x => x.getField("cid").cast("long"))
    // per-row folds materialized once: dot(v_sub, trained cw) and the
    // query LUT dot(q_sub, trained cw), plus dot(qv, cent) per cell
    val dvCols = for { m <- 0 until PqM; k <- 0 until PqK } yield
      Vectors.dot(slice(col("v"), m * PqSub + 1, PqSub),
        array(cbs(m)(k).map(lit): _*)).as(s"dv_${m}_$k")
    // query-side folds on the ONE-ROW side before the crossJoin (no
    // cross-row CSE — same reasoning as residualAdcScores)
    val qlCols = for { m <- 0 until PqM; k <- 0 until PqK } yield
      Vectors.dot(slice(col("qv"), m * PqSub + 1, PqSub),
        array(cbs(m)(k).map(lit): _*)).as(s"ql_${m}_$k")
    val qcCols = (0 until NumCentroids).map { cid =>
      Vectors.dot(col("qv"), array(cents(cid).map(lit): _*)).as(s"qc_$cid") }
    val qPre = q.select(col("qv") +: (qlCols ++ qcCols): _*)
    val staged = e.filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(qPre))
      .withColumn("cell", lloydBest(col("v"), cents).getField("cid").cast("long"))
      .filter(array_contains(probe, col("cell")))
      .select(Seq(col("vec_id"), col("cell"), col("v"), col("qv")) ++
        dvCols ++
        (for { m <- 0 until PqM; k <- 0 until PqK } yield col(s"ql_${m}_$k")) ++
        (0 until NumCentroids).map(cid => col(s"qc_$cid")): _*)
    // residual L2 encode: argmin_k cw·cw − 2·(dv − const(cell,m,k)).
    // const(cell,m,k) selected per row via element_at over the
    // per-cell literal array — the expanded per-cell argmin blew the
    // janino method limit and dropped the projection to interpreted
    // eval (see residualAdcScores). Identical doubles and tie-break.
    def centCbSel(m: Int, k: Int) = element_at(
      array((0 until NumCentroids).map(cid =>
        lit(dotConst(cents(cid).slice(m * PqSub, (m + 1) * PqSub), cbs(m)(k)))): _*),
      (col("cell") + 1).cast("int"))
    def codeFor(m: Int) =
      array_min(array((0 until PqK).map { k =>
        struct((lit(dotConst(cbs(m)(k), cbs(m)(k))) - lit(2.0) *
          (col(s"dv_${m}_$k") - centCbSel(m, k))).as("dd"), lit(k).as("k"))
      }: _*)).getField("k")
    val qDotCent = element_at(
      array((0 until NumCentroids).map(cid => col(s"qc_$cid")): _*),
      (col("cell") + 1).cast("int"))
    val adc = (0 until PqM).map { m =>
      element_at(array((0 until PqK).map(k => col(s"ql_${m}_$k")): _*),
        (codeFor(m) + 1).cast("int"))
    }.foldLeft(qDotCent)(_ + _)
    staged.select(col("vec_id"), col("cell"), adc.as("adc"),
      Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("adc").desc, col("vec_id")).limit(ReRankR)
      .orderBy(col("cosine").desc, col("vec_id")).limit(K)
  }

  val ivfPqFullSql: String = {
    def sub(c: String, m: Int): String = s"$c[${m * PqSub + 1}:${(m + 1) * PqSub}]"
    def seedLit(m: Int, k: Int): String =
      pqWeights(m, k).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    // per-subspace residual-Lloyd rounds (MATERIALIZED throughout: the
    // chain re-execution blowup of the BPE oracle applies here too)
    val cbCtes = (0 until PqM).flatMap { m =>
      val off = m * PqSub
      val seedRows = (0 until PqK).map(k => s"($k, ${seedLit(m, k)})").mkString(", ")
      val seed = s"cb_${m}_0 AS MATERIALIZED (SELECT * FROM (VALUES $seedRows) t(k, c))"
      val rounds = (1 to CbRounds).map { r =>
        val prev = s"cb_${m}_${r - 1}"
        s"""a_${m}_$r AS MATERIALIZED (
           |  SELECT e.vec_id,
           |    min({'dd': (${Vectors.dotSql("w.c", "w.c")})
           |      - 2 * ((${Vectors.dotSql(s"${sub("e.embedding", m)}", "w.c")})
           |             - (${Vectors.dotSql(s"${sub("x.c", m)}", "w.c")})),
           |      'k': w.k}).k AS k
           |  FROM e JOIN asg ON e.vec_id = asg.vec_id
           |       JOIN c$LloydIters x ON x.cid = asg.cell, $prev w
           |  GROUP BY e.vec_id),
           |mm_${m}_$r AS MATERIALIZED (
           |  SELECT a.k, g.i - 1 AS dim, count(*) AS n,
           |    sum(CAST(round((e.embedding[$off + g.i]::DOUBLE
           |          - x.c[$off + g.i]::DOUBLE) * 1000000.0) AS BIGINT))::DOUBLE
           |      / 1000000.0 / count(*)::DOUBLE AS mv
           |  FROM a_${m}_$r a JOIN e ON a.vec_id = e.vec_id
           |       JOIN asg ON a.vec_id = asg.vec_id
           |       JOIN c$LloydIters x ON x.cid = asg.cell,
           |       unnest(generate_series(1, $PqSub)) g(i)
           |  GROUP BY a.k, g.i),
           |cb_${m}_$r AS MATERIALIZED (
           |  SELECT p.k, COALESCE(u.c, p.c) AS c
           |  FROM $prev p LEFT JOIN
           |    (SELECT k, list(mv ORDER BY dim) AS c FROM mm_${m}_$r GROUP BY k) u
           |    ON p.k = u.k)""".stripMargin
      }
      seed +: rounds
    }.mkString(",\n")
    val subDefs = ((0 until PqM).flatMap(m => Seq(
      s"${sub("v", m)} AS v$m", s"${sub("qv", m)} AS q$m")) ++
      (0 until PqM).map(m => s"${sub("c", m)} AS c$m")).mkString(", ")
    val encCtes = (0 until PqM).map { m =>
      s"""enc_$m AS MATERIALIZED (
         |  SELECT s.vec_id,
         |    min({'dd': (${Vectors.dotSql("w.c", "w.c")})
         |      - 2 * ((${Vectors.dotSql(s"s.v$m", "w.c")}) - (${Vectors.dotSql(s"s.c$m", "w.c")})),
         |      'k': w.k}).k AS code
         |  FROM sub s, cb_${m}_$CbRounds w GROUP BY s.vec_id),
         |term_$m AS MATERIALIZED (
         |  SELECT s.vec_id, (${Vectors.dotSql(s"s.q$m", "w.c")}) AS term
         |  FROM enc_$m em JOIN sub s ON em.vec_id = s.vec_id
         |       JOIN cb_${m}_$CbRounds w ON w.k = em.code)""".stripMargin
    }.mkString(",\n")
    val termJoins = (0 until PqM)
      .map(m => s"JOIN term_$m t$m ON s.vec_id = t$m.vec_id").mkString("\n  ")
    val adcSum = (0 until PqM).map(m => s"t$m.term").mkString(" + ")
    s"""WITH $lloydChainSql,
       |asg AS MATERIALIZED (
       |  SELECT e.vec_id, min({'d': (${Vectors.dotSql("x.c", "x.c")})
       |      - 2 * (${Vectors.dotSql("e.embedding", "x.c")}), 'cid': x.cid}).cid AS cell
       |  FROM e, c$LloydIters x
       |  GROUP BY e.vec_id),
       |$cbCtes,
       |q AS (SELECT embedding AS qv FROM e WHERE vec_id = $QueryId),
       |probe AS (
       |  SELECT x.cid
       |  FROM c$LloydIters x, q
       |  ORDER BY (${Vectors.dotSql("x.c", "x.c")}) - 2 * (${Vectors.dotSql("q.qv", "x.c")}), x.cid
       |  LIMIT $NProbe),
       |cand AS MATERIALIZED (
       |  SELECT a.vec_id, a.cell, e.embedding AS v, q.qv, x.c
       |  FROM asg a JOIN e ON e.vec_id = a.vec_id
       |       JOIN c$LloydIters x ON x.cid = a.cell, q
       |  WHERE a.vec_id <> $QueryId AND a.cell IN (SELECT cid FROM probe)),
       |sub AS MATERIALIZED (SELECT vec_id, cell, v, qv, c, $subDefs FROM cand),
       |$encCtes,
       |scored AS (
       |  SELECT s.vec_id, s.cell, s.v, s.qv,
       |    (${Vectors.dotSql("s.qv", "s.c")}) + $adcSum AS adc
       |  FROM sub s
       |  $termJoins),
       |pool AS (
       |  SELECT * FROM scored ORDER BY adc DESC, vec_id LIMIT $ReRankR)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, adc,
       |  ${Vectors.cosineSql("v", "qv")} AS cosine
       |FROM pool
       |ORDER BY cosine DESC, vec_id
       |LIMIT $K""".stripMargin
  }

  // --- q_sim_ivf_pruned -----------------------------------------------------
  // The IVF access path MADE PHYSICAL: every other ANN row filters
  // probed cells out of a full scan (correct, but the scan still reads
  // the corpus); a deployed billion-vector index stores the corpus
  // PARTITIONED BY CELL so a probe only ever reads ~NProbe/C of the
  // data. This row stages exactly that layout — embeddings assigned to
  // their TRAINED cell (same quantizer as q_sim_ivfpq_trained) and
  // written `partitionBy("cell")`, the on-disk IVF inverted lists —
  // then routes the query to its NProbe cells IN-PLAN and joins the
  // probe set against the partitioned corpus, which Spark's dynamic
  // partition pruning turns into a scan of ONLY the probed `cell=`
  // directories (LayoutSpec asserts `dynamicpruning` on the executed
  // scan and numPartitions == the probe count — the q_ly_dpp machinery
  // applied to ANN). Scoring is exact cosine within the probed cells
  // (IVF-FLAT — the ADC variant of the same routing is
  // q_sim_ivfpq_trained). The DuckDB twin replays training, routing,
  // membership, and cosine off the flat table: equal output proves the
  // layout is a pure access-path optimization, like q_ly_pruned_history.
  private val lloydCache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[IndexedSeq[Double]]]()

  /** Trained coarse quantizer, cached per staged dataset: the model is
    * an index-build artifact (train once, reuse per query), so queries
    * composing it shouldn't pay 3 training rounds each. Keyed on the
    * content fingerprint, so regenerated data retrains. */
  private[graft] def trainedCentroids(s: SparkSession, d: String): IndexedSeq[IndexedSeq[Double]] =
    lloydCache.computeIfAbsent(Tables.stageTag(d), _ => lloydCentroids(s, d, LloydIters))

  /** The staged cell-partitioned corpus (the on-disk IVF index),
    * written once per dataset fingerprint. */
  private[graft] def corpusByCell(s: SparkSession, d: String): DataFrame = {
    val tag = Tables.stageTag(d)
    val root = s"${sys.props("java.io.tmpdir")}/graft_ivf_$tag/corpus_by_cell"
    graft.Stage.ensure(root) { tmp =>
      val cents = trainedCentroids(s, d)
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("cell", lloydBest(col("v"), cents).getField("cid").cast("long"))
        .write.partitionBy("cell").parquet(tmp)
    }
    s.read.parquet(root)
  }

  def ivfPrunedTopK(s: SparkSession, d: String): DataFrame = {
    val cents = trainedCentroids(s, d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    val cellStructs = array(cents.zipWithIndex.map { case (c, cid) =>
      val cArr = array(c.map(lit): _*)
      struct((Vectors.dot(cArr, cArr) - lit(2.0) * Vectors.dot(col("qv"), cArr)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    // the probe set as ROWS (not an array filter): joining it against
    // the partitioned corpus is what lets DPP prune the cell= dirs
    val probe = q.select(explode(
      transform(slice(array_sort(cellStructs), 1, NProbe),
        x => x.getField("cid").cast("long"))).as("cell"))
    corpusByCell(s, d)
      .withColumn("cell", col("cell").cast("long")) // partition col reads as int
      .join(broadcast(probe), Seq("cell"))
      .filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        Vectors.cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(K)
  }

  val ivfPrunedSql: String =
    s"""WITH $lloydChainSql,
       |q AS (SELECT embedding AS qv FROM e WHERE vec_id = $QueryId),
       |probe AS (
       |  SELECT x.cid
       |  FROM c$LloydIters x, q
       |  ORDER BY (${Vectors.dotSql("x.c", "x.c")}) - 2 * (${Vectors.dotSql("q.qv", "x.c")}), x.cid
       |  LIMIT $NProbe),
       |assign AS (
       |  SELECT e.vec_id, min({'d': (${Vectors.dotSql("x.c", "x.c")})
       |      - 2 * (${Vectors.dotSql("e.embedding", "x.c")}), 'cid': x.cid}).cid AS cell
       |  FROM e, c$LloydIters x
       |  WHERE e.vec_id <> $QueryId
       |  GROUP BY e.vec_id)
       |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
       |  ${Vectors.cosineSql("e.embedding", "q.qv")} AS cosine
       |FROM assign a
       |JOIN e ON e.vec_id = a.vec_id, q
       |WHERE a.cell IN (SELECT cid FROM probe)
       |ORDER BY cosine DESC, a.vec_id
       |LIMIT $K""".stripMargin

  // --- q_sim_linear_probe ---------------------------------------------------
  // A TRAINED linear probe over the embedding column — the model-based
  // quality/domain filter every LLM data pipeline runs (CCNet/fastText
  // style: score every document with a small trained classifier, admit
  // by score). Batch gradient descent is expressed relationally with
  // the Lloyd division of labor: the E-side (scores under the current
  // weights) is a ZERO-SHUFFLE scan projection — weights are plan
  // literals, the dot product a sequential fold — and the M-side (the
  // gradient) is one map-side-combinable aggregation at DIM grain
  // (posexplode → 65 groups), so each round shuffles 65 digest rows no
  // matter the corpus size. The model (65 doubles) is a legitimate
  // driver artifact like Lloyd's centroids; per-example state never
  // leaves the cluster.
  //
  // Cross-engine bit parity: the activation is the SOFTSIGN logistic
  // p = 0.5 + 0.5·z/(1+|z|) — same shape and [0,1] range as the
  // sigmoid but built from +,·,/,|x| only (exp() bits are not
  // portable across engines); per-(row, dim) gradient contributions
  // round at 1e-9 and sum exactly; the weight update divides exact
  // integers in double space with one operand order. The DuckDB twin
  // replays all rounds as MATERIALIZED CTEs. The delta rule
  // grad_j = Σ (p − y)·x_j is the cross-entropy gradient with the
  // activation swapped in. Trained weights cache per dataset
  // fingerprint (train once, score anywhere), like trainedCentroids.
  private val ProbeLr = 25.0
  private val ProbeRounds = 4
  private val ProbeFixed = 1.0e9

  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[Double]]()

  /** (vec_id, x = [1.0] ++ v — bias as dim 0, y = [label == 0]). */
  private def probeRows(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      concat(array(lit(1.0)), col("embedding").cast("array<double>")).as("x"),
      when(col("label") === 0, lit(1.0)).otherwise(lit(0.0)).as("y"))

  /** Softsign-logistic score of x under literal weights. */
  private def probeScore(x: Column, w: IndexedSeq[Double]): Column = {
    val z = Vectors.dot(x, array(w.map(lit): _*))
    lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))
  }

  private[graft] def trainProbe(s: SparkSession, d: String): IndexedSeq[Double] = {
    val rows = probeRows(s, d).localCheckpoint()
    val n = rows.count()
    var w: IndexedSeq[Double] = IndexedSeq.fill(65)(0.0)
    for (_ <- 1 to ProbeRounds) {
      val grads = rows
        .select((probeScore(col("x"), w) - col("y")).as("r"), posexplode(col("x")))
        .toDF("r", "dim", "xj")
        .select(col("dim"),
          round(col("r") * col("xj") * ProbeFixed).cast("long").as("g_fixed"))
        .groupBy("dim")
        .agg(sum(col("g_fixed")).as("g"))
        .collect()
        .map(r => r.getAs[Int]("dim") -> r.getAs[Long]("g"))
        .toMap
      w = w.indices.map(j =>
        w(j) - ProbeLr * (grads(j).toDouble / ProbeFixed / n.toDouble))
    }
    w
  }

  private[graft] def probeWeights(s: SparkSession, d: String): IndexedSeq[Double] =
    probeCache.computeIfAbsent(Tables.stageTag(d), _ => trainProbe(s, d))

  def linearProbe(s: SparkSession, d: String): DataFrame = {
    val w = probeWeights(s, d)
    probeRows(s, d).select(
      col("vec_id"),
      probeScore(col("x"), w).as("score"),
      col("y").cast("long").as("is_target"))
      .orderBy("vec_id")
  }

  val linearProbeSql: String = {
    val iterCtes = (1 to ProbeRounds).map { i =>
      val prev = s"w${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT vec_id, x,
         |    (0.5 + 0.5 * (z / (1.0 + abs(z)))) - y AS r
         |  FROM (SELECT e.vec_id, e.x, e.y,
         |      (${Vectors.dotSql("e.x", "w.w")}) AS z
         |    FROM e, $prev w) zz),
         |g$i AS MATERIALIZED (
         |  SELECT g.i AS dim,
         |    SUM(CAST(round(r.r * r.x[g.i] * 1e9) AS BIGINT)) AS gf
         |  FROM r$i r, unnest(generate_series(1, len(r.x))) g(i)
         |  GROUP BY g.i),
         |w$i AS MATERIALIZED (
         |  SELECT list(wj ORDER BY dim) AS w FROM (
         |    SELECT g.dim,
         |      wp.w[g.dim] - 25.0 * (CAST(g.gf AS DOUBLE) / 1e9 / nn.n) AS wj
         |    FROM g$i g, $prev wp, nn) u)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_prepend(1.0::DOUBLE, list_transform(embedding, t -> t::DOUBLE)) AS x,
       |    CASE WHEN label = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y
       |  FROM embeddings),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
       |w0 AS MATERIALIZED (
       |  SELECT list_transform(generate_series(1, 65), i -> 0.0::DOUBLE) AS w),
       |$iterCtes
       |SELECT e.vec_id,
       |  0.5 + 0.5 * (z / (1.0 + abs(z))) AS score,
       |  CAST(e.y AS BIGINT) AS is_target
       |FROM (SELECT e.vec_id, e.y, (${Vectors.dotSql("e.x", "w.w")}) AS z
       |  FROM e, w$ProbeRounds w) e
       |ORDER BY vec_id""".stripMargin
  }

  /** The trained WEIGHT VECTOR itself as a query (the q_tp_bpe_vocab
    * pattern): one row per dimension, hash-pinning the entire GD
    * trajectory — a drifted gradient in ANY round moves some weight
    * bit and breaks the hash, independent of whether the corpus
    * scoring happens to mask it. dim 0 is the bias. */
  def linearProbeWeights(s: SparkSession, d: String): DataFrame = {
    val w = probeWeights(s, d)
    import s.implicits._
    w.zipWithIndex.map { case (v, j) => (j.toLong, v) }
      .toDF("dim", "weight").orderBy("dim")
  }

  val linearProbeWeightsSql: String = {
    val iterCtes = (1 to ProbeRounds).map { i =>
      val prev = s"w${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT vec_id, x,
         |    (0.5 + 0.5 * (z / (1.0 + abs(z)))) - y AS r
         |  FROM (SELECT e.vec_id, e.x, e.y,
         |      (${Vectors.dotSql("e.x", "w.w")}) AS z
         |    FROM e, $prev w) zz),
         |g$i AS MATERIALIZED (
         |  SELECT g.i AS dim,
         |    SUM(CAST(round(r.r * r.x[g.i] * 1e9) AS BIGINT)) AS gf
         |  FROM r$i r, unnest(generate_series(1, len(r.x))) g(i)
         |  GROUP BY g.i),
         |w$i AS MATERIALIZED (
         |  SELECT list(wj ORDER BY dim) AS w FROM (
         |    SELECT g.dim,
         |      wp.w[g.dim] - 25.0 * (CAST(g.gf AS DOUBLE) / 1e9 / nn.n) AS wj
         |    FROM g$i g, $prev wp, nn) u)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_prepend(1.0::DOUBLE, list_transform(embedding, t -> t::DOUBLE)) AS x,
       |    CASE WHEN label = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y
       |  FROM embeddings),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
       |w0 AS MATERIALIZED (
       |  SELECT list_transform(generate_series(1, 65), i -> 0.0::DOUBLE) AS w),
       |$iterCtes
       |SELECT CAST(g.i - 1 AS BIGINT) AS dim, w.w[g.i] AS weight
       |FROM w$ProbeRounds w, unnest(generate_series(1, 65)) g(i)
       |ORDER BY dim""".stripMargin
  }

  /** Shared oracle prefix: the full GD training replay ending in a
    * `scored(vec_id, score, is_target)` CTE — the linearProbeSql body
    * factored so AUC/calibration oracles pin the same trajectory. */
  private lazy val probeScoredCtes: String = {
    val iterCtes = (1 to ProbeRounds).map { i =>
      val prev = s"w${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT vec_id, x,
         |    (0.5 + 0.5 * (z / (1.0 + abs(z)))) - y AS r
         |  FROM (SELECT e.vec_id, e.x, e.y,
         |      (${Vectors.dotSql("e.x", "w.w")}) AS z
         |    FROM e, $prev w) zz),
         |g$i AS MATERIALIZED (
         |  SELECT g.i AS dim,
         |    SUM(CAST(round(r.r * r.x[g.i] * 1e9) AS BIGINT)) AS gf
         |  FROM r$i r, unnest(generate_series(1, len(r.x))) g(i)
         |  GROUP BY g.i),
         |w$i AS MATERIALIZED (
         |  SELECT list(wj ORDER BY dim) AS w FROM (
         |    SELECT g.dim,
         |      wp.w[g.dim] - 25.0 * (CAST(g.gf AS DOUBLE) / 1e9 / nn.n) AS wj
         |    FROM g$i g, $prev wp, nn) u)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_prepend(1.0::DOUBLE, list_transform(embedding, t -> t::DOUBLE)) AS x,
       |    CASE WHEN label = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y
       |  FROM embeddings),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
       |w0 AS MATERIALIZED (
       |  SELECT list_transform(generate_series(1, 65), i -> 0.0::DOUBLE) AS w),
       |$iterCtes,
       |scored AS MATERIALIZED (
       |  SELECT vec_id, 0.5 + 0.5 * (z / (1.0 + abs(z))) AS score,
       |    CAST(y AS BIGINT) AS is_target
       |  FROM (SELECT e.vec_id, e.y, (${Vectors.dotSql("e.x", "w.w")}) AS z
       |    FROM e, w$ProbeRounds w) e)""".stripMargin
  }

  // --- q_sim_auc --------------------------------------------------------
  // ROC AUC OF THE TRAINED PROBE — the one-number eval every scored
  // quality filter ships with: the probability a random target
  // document outranks a random non-target under the probe's score,
  // ties counted half. Ranks are never materialized per row: over the
  // per-SCORE-VALUE (pos, neg) digest, the exclusive running negative
  // total cnb turns the rank-sum into Σ pos·(2·cnb + neg) — the
  // q_ag_mwu doubling discipline, so the ½-credit for ties stays an
  // exact integer; the sum rides DECIMAL(38,0) (per-value product
  // wrap-free to n ≈ 1.5·10⁹ rows) and AUC is ONE double division
  // with fixed operand order ⇒ identical bits in both engines (the
  // scores themselves are bit-identical by the probe's softsign
  // construction — no exp anywhere). Gini = 2·AUC − 1 rides along.
  // Scale: probe scores are near-unique doubles, so the score-value
  // digest is ~row-grain — a single global ORDER BY score window
  // would funnel it through one partition. The exclusive prefix cnb
  // is therefore a RANGE-PARTITIONED TWO-PASS PREFIX SUM: scores
  // (∈ (0,1) by the softsign construction) land in B=1024 fixed range
  // buckets; pass 1 aggregates per-bucket negative totals and windows
  // the ≤B-row digest into exclusive bucket offsets; pass 2
  // broadcasts the offsets back and finishes with a PARTITIONED
  // within-bucket window — every window either runs over a
  // constant-size digest or is partitioned, so no single-node sort at
  // any grain. The cnb longs are identical to the one-window form, so
  // the oracle keeps the simple global-window SQL.
  private val AucBuckets = 1024

  def probeAuc(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = probeWeights(s, d)
    val scored = probeRows(s, d).select(
      probeScore(col("x"), w).as("score"), col("y").cast("long").as("pos"))
    val byVal = scored.groupBy("score")
      .agg(sum(col("pos")).as("pos"), sum(lit(1L) - col("pos")).as("neg"))
      .withColumn("bk", least(floor(col("score") * AucBuckets).cast("long"),
        lit(AucBuckets - 1L)))
    val wBk = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byVal.groupBy("bk").agg(sum(col("neg")).as("bneg"))
      .withColumn("off", coalesce(sum(col("bneg")).over(wBk), lit(0L)))
      .select("bk", "off")
    val wIn = Window.partitionBy("bk").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal.join(broadcast(offsets), Seq("bk"))
      .withColumn("cnb",
        col("off") + coalesce(sum(col("neg")).over(wIn), lit(0L)))
      .groupBy()
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum((col("pos") * (lit(2L) * col("cnb") + col("neg")))
          .cast("decimal(38,0)")).as("a2"))
      .withColumn("auc", col("a2").cast("double") /
        (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
      .select(col("n_pos"), col("n_neg"), col("auc"),
        (lit(2.0) * col("auc") - lit(1.0)).as("gini"))
  }

  lazy val probeAucSql: String =
    s"""WITH $probeScoredCtes,
       |bv AS MATERIALIZED (
       |  SELECT score, CAST(sum(is_target) AS BIGINT) AS pos,
       |    CAST(sum(1 - is_target) AS BIGINT) AS neg
       |  FROM scored GROUP BY score),
       |tt AS MATERIALIZED (
       |  SELECT pos, neg,
       |    CAST(coalesce(sum(neg) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cnb
       |  FROM bv),
       |m AS MATERIALIZED (
       |  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
       |    CAST(sum(neg) AS BIGINT) AS n_neg,
       |    sum(CAST(pos * (2 * cnb + neg) AS DECIMAL(38,0))) AS a2
       |  FROM tt)
       |SELECT n_pos, n_neg,
       |  CAST(a2 AS DOUBLE)
       |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc,
       |  2.0 * (CAST(a2 AS DOUBLE)
       |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) - 1.0
       |    AS gini
       |FROM m""".stripMargin

  // --- q_sim_reliability ------------------------------------------------
  // CALIBRATION RELIABILITY BINS + ECE for the trained probe — "when
  // the filter says 0.8, is it right 80% of the time": scores bucket
  // into 10 fixed-width bins; per bin the hit rate (exact integers)
  // meets the mean score, and the expected calibration error weights
  // the gaps by bin mass. Mean scores are NOT summed as doubles
  // (parallel order would move bits): each score rounds at 1e-9 to a
  // BIGINT once — the probe-gradient fixed-point discipline — sums
  // ride DECIMAL(38,0), and conf is one double division. ECE is exact
  // until its single final division too: Σ_b |1e9·pos_b − s_b| is an
  // exact integer identity for Σ_b n_b·|acc_b − conf_b| · N·1e9, so
  // engines can't drift in the weighting. The global ECE joins back
  // onto the 10-row digest by broadcast. Scale: one aggregation to a
  // 10-row digest; everything after is constant-size.
  def probeReliability(s: SparkSession, d: String): DataFrame = {
    val w = probeWeights(s, d)
    reliabilityBinsOf(probeRows(s, d).select(
      probeScore(col("x"), w).as("score"), col("y").cast("long").as("pos")))
  }

  /** Binning core over any (score ∈ [0,1), pos ∈ {0,1}) frame —
    * exposed so specs can drive a distribution spanning all 10 bins
    * (the trained probe concentrates scores near 0.5 at small SF,
    * leaving most bins empty). */
  private[graft] def reliabilityBinsOf(scored: DataFrame): DataFrame = {
    val bins = scored
      .select(least(floor(col("score") * 10).cast("long"), lit(9L)).as("bin"),
        col("pos"),
        round(col("score") * lit(1.0e9)).cast("long").as("s_fixed"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("s_fixed").cast("decimal(38,0)")).as("s"))
    val ece = bins.groupBy()
      .agg((sum(abs((col("n_pos") * lit(1000000000L)).cast("decimal(38,0)")
          - col("s"))).cast("double")
        / lit(1.0e9) / sum(col("n")).cast("double")).as("ece"))
    bins.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("acc"),
        (col("s").cast("double") / lit(1.0e9) / col("n").cast("double"))
          .as("conf"),
        col("ece"))
      .orderBy("bin")
  }

  lazy val probeReliabilitySql: String =
    s"""WITH $probeScoredCtes,
       |bins AS MATERIALIZED (
       |  SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(is_target) AS BIGINT) AS n_pos,
       |    sum(CAST(CAST(round(score * 1e9) AS BIGINT) AS DECIMAL(38,0))) AS s
       |  FROM scored GROUP BY 1),
       |ece AS MATERIALIZED (
       |  SELECT CAST(sum(abs(CAST(n_pos * 1000000000 AS DECIMAL(38,0)) - s))
       |      AS DOUBLE) / 1e9 / CAST(sum(n) AS DOUBLE) AS ece
       |  FROM bins)
       |SELECT bin, n, n_pos,
       |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc,
       |  CAST(s AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) AS conf,
       |  ece.ece AS ece
       |FROM bins, ece ORDER BY bin""".stripMargin

  // --- q_sim_knn_graph ------------------------------------------------------
  // K-NEAREST-NEIGHBOR GRAPH construction, IVF-blocked — the substrate
  // under SemDedup-style semantic clustering, label-noise screens, and
  // graph-based curation: every vector's top-3 neighbors by cosine
  // among its OWN k-means cell's members (the standard blocked
  // construction — candidates come from the cell equi-join, never an
  // all-pairs cross). Reuses the E-step centroids shared with
  // kmeansAssign/semDedup, so the blocking is the already-verified
  // cluster assignment; the per-vector top-k is a window over cell-mate
  // scores (cells bound the partition size), ties broken by neighbor
  // id on bit-identical cosines. Singleton-cell vectors emit no rows —
  // the documented recall trade of blocked k-NN (multi-probe of
  // adjacent cells is the recall knob, as in q_sim_recall_trained).
  // 100 TB shape: one scan to assign cells, one equi-join shuffle on
  // cell, codegen'd vec_dot per candidate pair, TakeOrdered-style
  // window per vector — no stage touches more than cell-mate pairs.
  private val KnnK = 3

  def knnGraph(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", clusterOf(col("v")))
    val pairs = e.toDF("vec_id", "v", "cell")
      .join(e.toDF("nb_id", "nv", "cell"), "cell")
      .filter(col("vec_id") =!= col("nb_id"))
      .select(col("vec_id"), col("nb_id"),
        Vectors.cosine(col("v"), col("nv")).as("cosine"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("nb_id"))
    pairs.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= KnnK)
      .select(col("vec_id"), col("rank"),
        col("nb_id").as("neighbor_id"), col("cosine"))
      .orderBy("vec_id", "rank")
  }

  lazy val knnGraphSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${clusterOfSql("embedding")} AS cell
       |  FROM embeddings),
       |pairs AS MATERIALIZED (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |    ${Vectors.cosineSql("a.embedding", "b.embedding")} AS cosine
       |  FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
       |SELECT vec_id, rank, neighbor_id, cosine FROM (
       |  SELECT vec_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM pairs)
       |WHERE rank <= $KnnK
       |ORDER BY vec_id, rank""".stripMargin

  // --- q_sim_jl -------------------------------------------------------------
  // JOHNSON–LINDENSTRAUSS random-projection retrieval: project the
  // 64-dim embeddings onto 16 signed-sum dimensions (a ±1 Achlioptas
  // matrix — dense Gaussian is unnecessary, the sign matrix carries
  // the JL guarantee) and measure recall@10 of projected-cosine
  // retrieval against full-dim — the fifth memory/latency knob next
  // to PQ / IVF-PQ / SQ8 / Matryoshka truncation, and the one whose
  // transform is pure codegen arithmetic (16 vec_dot calls against
  // LITERAL sign vectors — constants baked at build time from md5
  // parity, so both engines embed the identical matrix; no runtime
  // randomness, no cross-engine hash). Cosine is scale-invariant, so
  // the 1/√k normalization is dropped. Scale: the projection is a
  // scan-side projection (16 fused dot products/row); everything
  // after is the shared recall harness on the 20 broadcast queries.
  private val JlDims = 32
  private val JlSrcDims = 64 // the fixture's embedding dimensionality

  /** Deterministic ±1 sign matrix: parity of md5("jl_<j>_<i>"). */
  private lazy val jlSigns: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until JlDims).map { j =>
      (0 until JlSrcDims).map { i =>
        md.reset()
        val dg = md.digest(s"jl_${j}_$i".getBytes("UTF-8"))
        if ((dg(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  private def jlProject(v: org.apache.spark.sql.Column) =
    array(jlSigns.map(row => Vectors.dot(v, typedLit(row))): _*)

  private def jlProjectSql(c: String): String =
    "[" + jlSigns.map { row =>
      Vectors.dotSql(c, "[" + row.map(x => s"${x}::DOUBLE").mkString(",") + "]")
    }.mkString(",\n    ") + "]"

  def jl(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("p", jlProject(col("v")))
    val q = e.filter(col("vec_id") < RecallQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("p").as("qp"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Vectors.cosine(col("v"), col("qv")).as("cos_full"),
        Vectors.cosine(col("p"), col("qp")).as("cos_proj"))
      .localCheckpoint() // two rankings read it
    val wf = Window.partitionBy("qid")
      .orderBy(col("cos_full").desc, col("vec_id"))
    val wp = Window.partitionBy("qid")
      .orderBy(col("cos_proj").desc, col("vec_id"))
    val full = scored.withColumn("rk", row_number().over(wf))
      .filter(col("rk") <= K).select("qid", "vec_id")
    val proj = scored.withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= K).select("qid", "vec_id")
    val common = full.join(proj, Seq("qid", "vec_id"))
      .groupBy("qid").agg(count(lit(1)).as("n_common"))
    full.groupBy("qid").agg(count(lit(1)).as("n_full"))
      .join(common, Seq("qid"), "left")
      .select(col("qid"), col("n_full"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          lit(K.toDouble)).as("recall"))
      .orderBy("qid")
  }

  lazy val jlSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding AS emb,
       |    ${jlProjectSql("embedding")} AS p
       |  FROM embeddings),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, emb AS qemb, p AS qp
       |  FROM e WHERE vec_id < $RecallQ),
       |scored AS MATERIALIZED (
       |  SELECT q.qid, e.vec_id,
       |    ${Vectors.cosineSql("e.emb", "q.qemb")} AS cos_full,
       |    ${Vectors.cosineSql("e.p", "q.qp")} AS cos_proj
       |  FROM e, q WHERE e.vec_id <> q.qid),
       |fullr AS MATERIALIZED (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos_full DESC, vec_id) AS rk
       |    FROM scored) WHERE rk <= $K),
       |projr AS MATERIALIZED (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos_proj DESC, vec_id) AS rk
       |    FROM scored) WHERE rk <= $K),
       |common AS MATERIALIZED (
       |  SELECT f.qid, CAST(count(*) AS BIGINT) AS n_common
       |  FROM fullr f JOIN projr p USING (qid, vec_id) GROUP BY f.qid)
       |SELECT f.qid, CAST(count(*) AS BIGINT) AS n_full,
       |  CAST(coalesce(max(c.n_common), 0) AS BIGINT) AS n_common,
       |  CAST(coalesce(max(c.n_common), 0) AS BIGINT)::DOUBLE / ${K}.0
       |    AS recall
       |FROM fullr f LEFT JOIN common c USING (qid)
       |GROUP BY f.qid
       |ORDER BY qid""".stripMargin

  // --- q_sim_mmr ------------------------------------------------------------
  // MAXIMAL MARGINAL RELEVANCE diversified retrieval: greedily re-rank
  // the query's top-C brute candidates so each pick maximizes
  // λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s) — the standard redundancy
  // screen between dense retrieval and a context window (near-
  // duplicate passages burn tokens that a diverse set spends on new
  // evidence). The greedy recursion is inherently sequential in k, so
  // it runs as MmrK bounded relational rounds over the checkpointed
  // C-row candidate frame (exactly the Lloyd-iteration shape): each
  // round one broadcast join against the ≤k selected rows, a per-
  // candidate max-similarity, and a TakeOrdered argmax with vec_id
  // tie-break. All score arithmetic is the same double expression on
  // bit-identical cosines in both engines; the oracle replays the k
  // rounds as chained MATERIALIZED CTEs with correlated max-subqueries.
  // Scale: C bounds every frame after the brute top-C (which itself is
  // TakeOrdered over the scan); rounds cost k tiny joins, nothing
  // data-proportional moves.
  private val MmrC = 12
  private val MmrK = 5
  private val MmrLambda = 0.7

  def mmr(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === QueryId).select(col("v").as("qv"))
    val cands = e.filter(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("v"), Vectors.cosine(col("v"), col("qv")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(MmrC)
      .localCheckpoint() // C rows, reused by every greedy round
    var selected = cands
      .orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), col("v"), col("rel"),
        (lit(MmrLambda) * col("rel")).as("mmr_score"), lit(1L).as("rank"))
    for (j <- 2 to MmrK) {
      val pick = cands
        .join(broadcast(selected.select(col("vec_id").as("s_id"))),
          col("vec_id") === col("s_id"), "left_anti")
        .crossJoin(broadcast(selected.select(col("v").as("sv"))))
        .groupBy(col("vec_id"), col("v"), col("rel"))
        .agg(max(Vectors.cosine(col("v"), col("sv"))).as("pen"))
        .select(col("vec_id"), col("v"), col("rel"),
          (lit(MmrLambda) * col("rel") -
            lit(1.0 - MmrLambda) * col("pen")).as("mmr_score"))
        .orderBy(col("mmr_score").desc, col("vec_id")).limit(1)
        .withColumn("rank", lit(j.toLong))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.select(col("rank"), col("vec_id"), col("rel"), col("mmr_score"))
      .orderBy("rank")
  }

  lazy val mmrSql: String = {
    val lam = s"CAST($MmrLambda AS DOUBLE)"
    val oneMinus = s"CAST(${1.0 - MmrLambda} AS DOUBLE)"
    val rounds = (2 to MmrK).map { j =>
      val prev = s"sel${j - 1}"
      s"""pick$j AS MATERIALIZED (
         |  SELECT vec_id, embedding, rel, mmr_score, CAST($j AS BIGINT) AS rank
         |  FROM (
         |    SELECT c.vec_id, c.embedding, c.rel,
         |      $lam * c.rel - $oneMinus *
         |        (SELECT max(${Vectors.cosineSql("c.embedding", "s.embedding")})
         |         FROM $prev s) AS mmr_score
         |    FROM cands c
         |    WHERE c.vec_id NOT IN (SELECT vec_id FROM $prev))
         |  ORDER BY mmr_score DESC, vec_id LIMIT 1),
         |sel$j AS MATERIALIZED (
         |  SELECT * FROM $prev UNION ALL SELECT * FROM pick$j)""".stripMargin
    }.mkString(",\n")
    s"""WITH cands AS MATERIALIZED (
       |  SELECT b.vec_id, b.embedding,
       |    ${Vectors.cosineSql("b.embedding", "q.embedding")} AS rel
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> $QueryId) b,
       |    (SELECT embedding FROM embeddings WHERE vec_id = $QueryId) q
       |  ORDER BY rel DESC, vec_id LIMIT $MmrC),
       |sel1 AS MATERIALIZED (
       |  SELECT vec_id, embedding, rel, $lam * rel AS mmr_score,
       |    CAST(1 AS BIGINT) AS rank
       |  FROM cands ORDER BY rel DESC, vec_id LIMIT 1),
       |$rounds
       |SELECT rank, vec_id, rel, mmr_score FROM sel$MmrK
       |ORDER BY rank""".stripMargin
  }

  // --- q_sim_hard_neg -------------------------------------------------------
  // HARD-NEGATIVE MINING for contrastive training: for every vector,
  // its top-2 most-cosine-similar CELL-MATES carrying a DIFFERENT
  // label — the "looks like me, isn't me" pairs that dominate the
  // training signal in embedding fine-tuning. Same IVF blocking as
  // the k-NN graph (candidates are the k-means cell equi-join, never
  // an all-pairs cross), plus the label-mismatch predicate pushed
  // into the pair scan so matched-label pairs never reach the window.
  // Ties break by neighbor id on bit-identical cosines. Vectors whose
  // cell holds no other-label member emit no rows — the blocked
  // trade, same as the k-NN graph's singleton cells.
  private val HardNegK = 2

  def hardNegatives(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", clusterOf(col("v")))
    val pairs = e.toDF("vec_id", "label", "v", "cell")
      .join(e.toDF("nb_id", "nb_label", "nv", "cell"), "cell")
      .filter(col("vec_id") =!= col("nb_id") &&
        col("label") =!= col("nb_label"))
      .select(col("vec_id"), col("label"), col("nb_id"), col("nb_label"),
        Vectors.cosine(col("v"), col("nv")).as("cosine"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("nb_id"))
    pairs.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= HardNegK)
      .select(col("vec_id"), col("label"), col("rank"),
        col("nb_id").as("negative_id"), col("nb_label").as("negative_label"),
        col("cosine"))
      .orderBy("vec_id", "rank")
  }

  lazy val hardNegativesSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, label, embedding, ${clusterOfSql("embedding")} AS cell
       |  FROM embeddings),
       |pairs AS MATERIALIZED (
       |  SELECT a.vec_id, a.label, b.vec_id AS negative_id,
       |    b.label AS negative_label,
       |    ${Vectors.cosineSql("a.embedding", "b.embedding")} AS cosine
       |  FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |    AND a.label <> b.label)
       |SELECT vec_id, label, rank, negative_id, negative_label, cosine FROM (
       |  SELECT vec_id, label, negative_id, negative_label, cosine,
       |    CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cosine DESC, negative_id) AS BIGINT) AS rank
       |  FROM pairs)
       |WHERE rank <= $HardNegK
       |ORDER BY vec_id, rank""".stripMargin

  // --- q_sim_pca ------------------------------------------------------------
  // Distributed PCA (top principal component by power iteration): the
  // data-DEPENDENT dimensionality-reduction knob next to the
  // data-independent JL projection above — whitening, drift detection
  // and "is this corpus effectively low-rank" all start here.
  //
  // Split of labor, the markov/kmeans shape:
  //  - CLUSTER: one scan emits the flattened fixed-point outer product
  //    per row (dims² BIGINTs; round(x·y·1e12) is exact in both engines)
  //    plus per-dimension fixed-point sums; both aggregate with map-side
  //    combine to dims²(+dims) groups REGARDLESS of corpus size — the
  //    shuffle is 4096 rows at any SF.
  //  - DRIVER: covariance assembly + [[PcaRounds]] power-iteration
  //    rounds on the dims×dims matrix. Bounded by dims², never by rows
  //    (64² doubles here); [[PcaMaxDims]] guards the collect the same
  //    way markovStationary caps its state matrix.
  //
  // Cross-engine exactness: the gram/mean sums are exact integers in
  // any order; every double that follows (covariance cells, matvec,
  // norm, Rayleigh quotient, trace) is a SEQUENTIAL left-to-right fold
  // over identically-ordered inputs, so DuckDB's replay reproduces the
  // iteration bit-for-bit — no rounding of the output is needed. The
  // eigenvector sign is pinned by making the largest-|component|
  // coordinate positive (first index on exact ties), the standard
  // determinism rule. v0 = 1/8 exactly (1/√dims with dims=64), so both
  // engines start from the same representable double.
  //
  // 100 TB: the scan is the only row-grain pass; PcaProdScale=1e12
  // holds |Σ round(x·y·1e12)| < 2⁶³ up to ~10⁹ rows of unit-scale
  // embeddings — past that, drop the scale a decade per 10× rows (the
  // comment on MarkovMaxStates makes the same knob explicit).
  private[queries] val PcaDims = 64
  private val PcaRounds = 8
  private[queries] val PcaMaxDims = 256
  private val PcaProdScale = 1e12
  private val PcaSumScale = 1e6

  /** Driver-side PCA model shared by [[pca]], [[pcaScores]], [[pca2]]
    * and [[reconErr]], memoized per dataset fingerprint (the in-memory
    * analogue of the Stage.ensure discipline — the result is ~200
    * doubles, so a driver map beats a parquet round-trip; a regenerated
    * dataset gets a new tag and so a fresh derivation). Both
    * eigenvectors are sign-pinned. */
  private case class PcaModel(v1: Array[Double], lambda1: Double,
                              ratio1: Double, v2: Array[Double],
                              lambda2: Double, trace: Double,
                              mu: Array[Double])

  private val eigenCache =
    new java.util.concurrent.ConcurrentHashMap[String, PcaModel]()

  private def pcaEigen(s: SparkSession, d: String): PcaModel =
    eigenCache.computeIfAbsent(Tables.stageTag(d), _ => pcaEigenDerive(s, d))

  private def pcaEigenDerive(s: SparkSession, d: String): PcaModel = {
    require(PcaDims <= PcaMaxDims,
      s"pca: $PcaDims dims exceeds the $PcaMaxDims-dim driver-matrix cap - the dims^2 " +
        "gram digest no longer fits driver arithmetic; block the matrix (per-block gram " +
        "aggregates, dims/B^2 driver tiles) or switch to distributed randomized SVD")
    val e = Tables.embeddings(s, d)
      .select(col("embedding").cast("array<double>").as("v"))
    // two digest jobs over the scan: gram cells + dims mean sums, both
    // exact-integer and map-side combined (groups are data-independent).
    // The gram is symmetric, so only the UPPER TRIANGLE (2080 cells) is
    // accumulated — by the native [[graft.functions.GramTri]] aggregate
    // (one fused multiply-round-add loop per row into a primitive long
    // buffer; ONE digest per partition reaches the exchange, replacing
    // the interpreted-HOF product array + 4M-row explode the first cut
    // paid 3.2 s for). The driver mirrors g(j,i) = g(i,j); the oracle's
    // full (i,j) grid matches because round(x_i*x_j*1e12) is symmetric
    // in IEEE arithmetic.
    val gramTri = e
      .agg(graft.functions.GramTriFunctions.gramTri(col("v"), PcaProdScale).as("g"))
      .head().getSeq[Long](0)
    val sumRows = e.select(posexplode(col("v"))).toDF("dim", "x")
      .groupBy("dim").agg(count(lit(1)).as("n"),
        sum(round(col("x") * lit(PcaSumScale)).cast("long")).as("sx"))
      .collect()
    require(sumRows.nonEmpty, "pca: empty embeddings table")
    val n = sumRows.head.getLong(1)
    val sx = Array.ofDim[Long](PcaDims)
    sumRows.foreach(r => sx(r.getInt(0)) = r.getLong(2))
    // decode the flattened triangle position back to (i, j), mirror
    val g = Array.ofDim[Long](PcaDims * PcaDims)
    val triIdx = (for { i <- 0 until PcaDims; j <- i until PcaDims } yield (i, j)).toArray
    require(gramTri.length == triIdx.length,
      s"pca: gram digest has ${gramTri.length} cells, expected ${triIdx.length}")
    gramTri.indices.foreach { p =>
      val (i, j) = triIdx(p)
      g(i * PcaDims + j) = gramTri(p)
      g(j * PcaDims + i) = gramTri(p)
    }
    val mu = Array.tabulate(PcaDims)(i => sx(i).toDouble / PcaSumScale / n.toDouble)
    val cov = Array.tabulate(PcaDims, PcaDims)((i, j) =>
      g(i * PcaDims + j).toDouble / PcaProdScale / n.toDouble - mu(i) * mu(j))
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var k = 0
      while (k < PcaDims) { acc += a(k) * b(k); k += 1 }
      acc
    }
    var v = Array.fill(PcaDims)(0.125) // 1/sqrt(64), exactly representable
    for (_ <- 1 to PcaRounds) {
      val w = Array.tabulate(PcaDims)(i => dotSeq(cov(i), v))
      val nrm = math.sqrt(dotSeq(w, w))
      v = w.map(_ / nrm)
    }
    val cv = Array.tabulate(PcaDims)(i => dotSeq(cov(i), v))
    val lambda = dotSeq(v, cv)
    var trace = 0.0
    (0 until PcaDims).foreach(i => trace += cov(i)(i))
    var mi = 0
    (1 until PcaDims).foreach(i => if (math.abs(v(i)) > math.abs(v(mi))) mi = i)
    val sgn = if (v(mi) < 0.0) -1.0 else 1.0
    val v1p = v.map(_ * sgn)
    // SECOND component by orthogonalized power iteration: same rounds,
    // same v0; each round applies cov, then removes the v1 component
    // (w − (v1ᵀw)·v1 — sign-invariant, the oracle replays the pinned
    // v1), then normalizes. The fixed operation order keeps every
    // double bit-identical to the DuckDB replay, like the PC1 chain.
    var u = Array.fill(PcaDims)(0.125)
    for (_ <- 1 to PcaRounds) {
      val w = Array.tabulate(PcaDims)(i => dotSeq(cov(i), u))
      val d2 = dotSeq(v1p, w)
      val o = Array.tabulate(PcaDims)(i => w(i) - d2 * v1p(i))
      val nrm = math.sqrt(dotSeq(o, o))
      u = o.map(_ / nrm)
    }
    val cu = Array.tabulate(PcaDims)(i => dotSeq(cov(i), u))
    val lambda2 = dotSeq(u, cu)
    var mi2 = 0
    (1 until PcaDims).foreach(i => if (math.abs(u(i)) > math.abs(u(mi2))) mi2 = i)
    val sgn2 = if (u(mi2) < 0.0) -1.0 else 1.0
    PcaModel(v1p, lambda, lambda / trace, u.map(_ * sgn2), lambda2, trace, mu)
  }

  def pca(s: SparkSession, d: String): DataFrame = {
    val m = pcaEigen(s, d)
    import s.implicits._
    (0 until PcaDims)
      .map(i => (i.toLong, m.v1(i), m.lambda1, m.ratio1))
      .toDF("dim", "loading", "eigenvalue", "var_ratio")
      .orderBy("dim")
  }

  // --- q_sim_pca2 -------------------------------------------------------------
  // SECOND PRINCIPAL COMPONENT via deflation (round-14 verdict item 8):
  // the r14 gram machinery already holds the full covariance, so PC2
  // costs zero extra scans — only more driver arithmetic on the 64x64
  // matrix, replayed exactly by the oracle's CTE chain (orthogonalized
  // power iteration per the [[pcaEigenDerive]] comment). cum_var_ratio
  // is the rank-2 "how low-rank is this corpus" answer.
  def pca2(s: SparkSession, d: String): DataFrame = {
    val m = pcaEigen(s, d)
    import s.implicits._
    (0 until PcaDims)
      .map(i => (i.toLong, m.v2(i), m.lambda2, m.lambda2 / m.trace,
        (m.lambda1 + m.lambda2) / m.trace))
      .toDF("dim", "loading2", "eigenvalue2", "var_ratio2", "cum_var_ratio")
      .orderBy("dim")
  }

  // --- q_sim_recon_err ----------------------------------------------------------
  // PER-VECTOR RANK-2 RECONSTRUCTION ERROR — the outlier screen an
  // embedding-quality audit actually runs: err = ‖x−μ‖² − s1² − s2²
  // (Pythagoras under the orthonormal PC basis), with s_k the centered
  // projections. A vector the top-2 plane can't explain (high
  // err_ratio vs the corpus mean) is a candidate mis-embedding /
  // contamination. Centered vector materialized ONCE per row, three
  // codegen'd sequential-fold vec_dots read it; the mean routes
  // through 1e-9 fixed point so the ratio is order-stable. Scale: one
  // scan + one 1-row digest crossJoined back (no collect).
  def reconErr(s: SparkSession, d: String): DataFrame = {
    val m = pcaEigen(s, d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("c",
        zip_with(col("v"), typedLit(m.mu.toSeq), (a, b) => a - b))
    val s1 = Vectors.dot(col("c"), typedLit(m.v1.toSeq))
    val s2 = Vectors.dot(col("c"), typedLit(m.v2.toSeq))
    val scored = e.select(col("vec_id"), col("label"),
        s1.as("pc1"), s2.as("pc2"),
        (Vectors.dot(col("c"), col("c")) - s1 * s1 - s2 * s2).as("recon_err"))
      .localCheckpoint() // digest + final projection both read it
    val tot = scored.agg(count(lit(1)).as("n"),
      sum(round(col("recon_err") * lit(1e9)).cast("long")).as("se"))
    scored.crossJoin(broadcast(tot))
      .select(col("vec_id"), col("label"), col("pc1"), col("pc2"),
        col("recon_err"),
        (col("recon_err") /
          ((col("se").cast("double") / lit(1e9)) / col("n").cast("double")))
          .as("err_ratio"))
      .orderBy("vec_id")
  }

  /** The shared CTE chain replaying the gram, covariance, power
    * iteration and sign pin — prefix of BOTH pca oracles. */
  private lazy val pcaIterCtes: String = {
    val dot64 = (row: String, vec: String) =>
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, $PcaDims),
         |      j -> $row[j] * $vec[j])), (x, y) -> x + y)""".stripMargin
    val rounds = (1 to PcaRounds).map { r =>
      val prev = s"v${r - 1}"
      s"""w$r AS MATERIALIZED (
         |  SELECT c.i, ${dot64("c.row", s"p.lst")} AS w
         |  FROM cov c, $prev p),
         |wl$r AS MATERIALIZED (
         |  SELECT list(w ORDER BY i) AS lst FROM w$r),
         |nr$r AS MATERIALIZED (
         |  SELECT sqrt(list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, $PcaDims), k -> lst[k] * lst[k])),
         |    (x, y) -> x + y)) AS nrm
         |  FROM wl$r),
         |v$r AS MATERIALIZED (
         |  SELECT list_transform(wl.lst, x -> x / nr.nrm) AS lst
         |  FROM wl$r wl, nr$r nr)""".stripMargin
    }.mkString(",\n")
    s"""gram AS MATERIALIZED (
       |  SELECT gi.i, gj.j,
       |    sum(CAST(round(embedding[gi.i]::DOUBLE * embedding[gj.j]::DOUBLE
       |      * ${PcaProdScale}) AS BIGINT)) AS g
       |  FROM embeddings,
       |    generate_series(1, $PcaDims) gi(i), generate_series(1, $PcaDims) gj(j)
       |  GROUP BY gi.i, gj.j),
       |mu AS MATERIALIZED (
       |  SELECT gi.i, count(embedding[gi.i]) AS n,
       |    (sum(CAST(round(embedding[gi.i]::DOUBLE * ${PcaSumScale}) AS BIGINT))::DOUBLE
       |      / ${PcaSumScale}) / count(embedding[gi.i]) AS mu
       |  FROM embeddings, generate_series(1, $PcaDims) gi(i)
       |  GROUP BY gi.i),
       |cov AS MATERIALIZED (
       |  SELECT g.i, list((g.g::DOUBLE / ${PcaProdScale}) / mi.n - mi.mu * mj.mu
       |    ORDER BY g.j) AS row
       |  FROM gram g
       |  JOIN mu mi ON mi.i = g.i
       |  JOIN mu mj ON mj.i = g.j
       |  GROUP BY g.i),
       |v0 AS MATERIALIZED (
       |  SELECT list_transform(generate_series(1, $PcaDims), i -> 0.125::DOUBLE) AS lst),
       |$rounds,
       |cv AS MATERIALIZED (
       |  SELECT c.i, ${dot64("c.row", "p.lst")} AS w
       |  FROM cov c, v$PcaRounds p),
       |lam AS MATERIALIZED (
       |  SELECT list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, $PcaDims),
       |      i -> p.lst[i] * cvl.lst[i])), (x, y) -> x + y) AS lambda
       |  FROM v$PcaRounds p, (SELECT list(w ORDER BY i) AS lst FROM cv) cvl),
       |tr AS MATERIALIZED (
       |  SELECT list_reduce(list_prepend(0.0::DOUBLE,
       |    list(c.row[c.i] ORDER BY c.i)), (x, y) -> x + y) AS trace
       |  FROM cov c),
       |sg AS MATERIALIZED (
       |  SELECT CASE WHEN p.lst[(
       |      SELECT i FROM generate_series(1, $PcaDims) g(i), v$PcaRounds q
       |      ORDER BY abs(q.lst[i]) DESC, i LIMIT 1)] < 0.0
       |    THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END AS sgn
       |  FROM v$PcaRounds p)""".stripMargin
  }

  lazy val pcaSql: String =
    s"""WITH $pcaIterCtes
       |SELECT (g.i - 1)::BIGINT AS dim, p.lst[g.i] * sg.sgn AS loading,
       |  lam.lambda AS eigenvalue, lam.lambda / tr.trace AS var_ratio
       |FROM generate_series(1, $PcaDims) g(i), v$PcaRounds p, lam, tr, sg
       |ORDER BY dim""".stripMargin

  // --- q_sim_pca_scores -------------------------------------------------------
  // PC1 SCORE DISTRIBUTION PER LABEL — the "does the top principal
  // direction separate my classes" probe run right after [[pca]]:
  // every vector projects onto the sign-pinned top loading and each
  // label reports its score count/mean/variance. The projection is the
  // codegen'd vec_dot against a LITERAL loading vector (the driver
  // eigen result — identical doubles to the oracle's replayed v_rounds
  // by the pca exactness argument), so the scan stays whole-stage
  // codegen; per-label moments route through 1e-9 fixed point (exact
  // integer sums in any order, the kmeansUpdate discipline). Scale:
  // one scan, one map-side-combined label-grain aggregation.
  private val PcaScoreScale = 1e9

  def pcaScores(s: SparkSession, d: String): DataFrame = {
    val p = Vectors.dot(col("v"), typedLit(pcaEigen(s, d).v1.toSeq))
    Tables.embeddings(s, d)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .select(col("label"), p.as("p"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(round(col("p") * lit(PcaScoreScale)).cast("long")).as("sp"),
        sum(round(col("p") * col("p") * lit(PcaScoreScale)).cast("long")).as("spp"))
      .select(col("label"), col("n"),
        ((col("sp").cast("double") / lit(PcaScoreScale)) /
          col("n").cast("double")).as("mean_pc1"),
        ((col("spp").cast("double") / lit(PcaScoreScale)) /
          col("n").cast("double") -
          ((col("sp").cast("double") / lit(PcaScoreScale)) /
            col("n").cast("double")) *
          ((col("sp").cast("double") / lit(PcaScoreScale)) /
            col("n").cast("double"))).as("var_pc1"))
      .orderBy("label")
  }

  lazy val pcaScoresSql: String = {
    val mean = s"(sp::DOUBLE / ${PcaScoreScale}) / n::DOUBLE"
    s"""WITH $pcaIterCtes,
       |vsg AS MATERIALIZED (
       |  SELECT list_transform(p.lst, x -> x * sg.sgn) AS lst
       |  FROM v$PcaRounds p, sg),
       |sc AS MATERIALIZED (
       |  SELECT label, ${Vectors.dotSql("embedding", "vsg.lst")} AS p
       |  FROM embeddings, vsg),
       |agg AS MATERIALIZED (
       |  SELECT label, count(*) AS n,
       |    CAST(sum(CAST(round(p * ${PcaScoreScale}) AS BIGINT)) AS BIGINT) AS sp,
       |    CAST(sum(CAST(round(p * p * ${PcaScoreScale}) AS BIGINT)) AS BIGINT) AS spp
       |  FROM sc GROUP BY label)
       |SELECT label, n, $mean AS mean_pc1,
       |  (spp::DOUBLE / ${PcaScoreScale}) / n::DOUBLE - ($mean) * ($mean) AS var_pc1
       |FROM agg
       |ORDER BY label""".stripMargin
  }

  /** Deflation CTE chain appended after [[pcaIterCtes]]: pinned v1
    * (vs1), orthogonalized power-iteration rounds u1..uR, lam2 and the
    * pinned v2 (vs2) — the oracle twin of the PC2 block in
    * [[pcaEigenDerive]]. */
  private lazy val pca2Ctes: String = {
    val fold = (a: String, b: String) =>
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, $PcaDims),
         |      k -> $a[k] * $b[k])), (x, y) -> x + y)""".stripMargin
    val rounds = (1 to PcaRounds).map { r =>
      val prev = s"u${r - 1}"
      s"""pw$r AS MATERIALIZED (
         |  SELECT c.i, ${fold("c.row", "p.lst")} AS w
         |  FROM cov c, $prev p),
         |pwl$r AS MATERIALIZED (
         |  SELECT list(w ORDER BY i) AS lst FROM pw$r),
         |pd$r AS MATERIALIZED (
         |  SELECT ${fold("v.lst", "w.lst")} AS d FROM vs1 v, pwl$r w),
         |po$r AS MATERIALIZED (
         |  SELECT list_transform(generate_series(1, $PcaDims),
         |    k -> w.lst[k] - d.d * v.lst[k]) AS lst
         |  FROM pwl$r w, pd$r d, vs1 v),
         |pn$r AS MATERIALIZED (
         |  SELECT sqrt(${fold("o.lst", "o.lst")}) AS nrm FROM po$r o),
         |u$r AS MATERIALIZED (
         |  SELECT list_transform(o.lst, x -> x / n.nrm) AS lst
         |  FROM po$r o, pn$r n)""".stripMargin
    }.mkString(",\n")
    s"""vs1 AS MATERIALIZED (
       |  SELECT list_transform(p.lst, x -> x * sg.sgn) AS lst
       |  FROM v$PcaRounds p, sg),
       |u0 AS MATERIALIZED (
       |  SELECT list_transform(generate_series(1, $PcaDims),
       |    i -> 0.125::DOUBLE) AS lst),
       |$rounds,
       |cu2 AS MATERIALIZED (
       |  SELECT c.i, ${fold("c.row", "p.lst")} AS w
       |  FROM cov c, u$PcaRounds p),
       |lam2 AS MATERIALIZED (
       |  SELECT ${fold("p.lst", "cul.lst")} AS lambda2
       |  FROM u$PcaRounds p, (SELECT list(w ORDER BY i) AS lst FROM cu2) cul),
       |sg2 AS MATERIALIZED (
       |  SELECT CASE WHEN p.lst[(
       |      SELECT i FROM generate_series(1, $PcaDims) g(i), u$PcaRounds q
       |      ORDER BY abs(q.lst[i]) DESC, i LIMIT 1)] < 0.0
       |    THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END AS sgn
       |  FROM u$PcaRounds p),
       |vs2 AS MATERIALIZED (
       |  SELECT list_transform(p.lst, x -> x * sg2.sgn) AS lst
       |  FROM u$PcaRounds p, sg2)""".stripMargin
  }

  lazy val pca2Sql: String =
    s"""WITH $pcaIterCtes,
       |$pca2Ctes
       |SELECT (g.i - 1)::BIGINT AS dim, p.lst[g.i] * sg2.sgn AS loading2,
       |  lam2.lambda2 AS eigenvalue2, lam2.lambda2 / tr.trace AS var_ratio2,
       |  (lam.lambda + lam2.lambda2) / tr.trace AS cum_var_ratio
       |FROM generate_series(1, $PcaDims) g(i), u$PcaRounds p, lam, lam2, tr, sg2
       |ORDER BY dim""".stripMargin

  lazy val reconErrSql: String =
    s"""WITH $pcaIterCtes,
       |$pca2Ctes,
       |mul AS MATERIALIZED (SELECT list(mu ORDER BY i) AS lst FROM mu),
       |cent AS MATERIALIZED (
       |  SELECT vec_id, label,
       |    list_transform(generate_series(1, $PcaDims),
       |      k -> embedding[k]::DOUBLE - m.lst[k]) AS c
       |  FROM embeddings, mul m),
       |sc2 AS MATERIALIZED (
       |  SELECT vec_id, label,
       |    ${Vectors.dotSql("c", "v1.lst")} AS pc1,
       |    ${Vectors.dotSql("c", "v2l.lst")} AS pc2,
       |    ${Vectors.dotSql("c", "c")} AS cc
       |  FROM cent, vs1 v1, vs2 v2l),
       |er AS MATERIALIZED (
       |  SELECT vec_id, label, pc1, pc2,
       |    cc - pc1 * pc1 - pc2 * pc2 AS recon_err
       |  FROM sc2),
       |tot AS MATERIALIZED (
       |  SELECT count(*) AS n,
       |    CAST(sum(CAST(round(recon_err * 1e9) AS BIGINT)) AS BIGINT) AS se
       |  FROM er)
       |SELECT vec_id, label, pc1, pc2, recon_err,
       |  recon_err / ((se::DOUBLE / 1e9) / n::DOUBLE) AS err_ratio
       |FROM er, tot
       |ORDER BY vec_id""".stripMargin

  // --- q_sim_quantize_audit -----------------------------------------------------
  // INT8 AFFINE QUANTIZATION AUDIT — the check run before shipping a
  // quantized vector store: per-dimension (min, max) → scale
  // (max−min)/255; each cell quantizes to round((x−min)/scale) and
  // dequantizes to min + q·scale; the audit reports per-label mean/max
  // absolute reconstruction error. Everything is order-stable: per-dim
  // min/max are order-free, the quantize/dequantize chain is a fixed
  // sequence of double ops (round of a NONNEGATIVE argument — Spark
  // HALF_UP and DuckDB half-away agree there), the mean routes through
  // 1e-9 fixed point, max is order-free. Degenerate dims (max = min)
  // quantize to 0 with zero error by the when() guard. Scale: one
  // 64-row dim-stats digest broadcast back into the scan (the
  // train-broadcast-score shape), one label-grain aggregation.
  def quantizeAudit(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")))
      .toDF("vec_id", "label", "dim", "x")
    val stats = cells.groupBy("dim")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .withColumn("sc", (col("mx") - col("mn")) / lit(255.0))
    val q = when(col("sc") === 0.0, lit(0.0))
      .otherwise(round((col("x") - col("mn")) / col("sc")))
    val err = abs(col("x") - (col("mn") + q * col("sc")))
    cells.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("label"), err.as("e"))
      .groupBy("label")
      .agg(countDistinct(col("vec_id")).as("n_vecs"),
        count(lit(1)).as("n_cells"),
        sum(round(col("e") * lit(1e9)).cast("long")).as("se"),
        max(col("e")).as("max_abs_err"))
      .select(col("label"), col("n_vecs"), col("n_cells"),
        ((col("se").cast("double") / lit(1e9)) /
          col("n_cells").cast("double")).as("mean_abs_err"),
        col("max_abs_err"))
      .orderBy("label")
  }

  lazy val quantizeAuditSql: String =
    s"""WITH cells AS MATERIALIZED (
       |  SELECT vec_id, label, u.i AS dim, embedding[u.i]::DOUBLE AS x
       |  FROM embeddings, unnest(generate_series(1, $PcaDims)) u(i)),
       |stats AS MATERIALIZED (
       |  SELECT dim, min(x) AS mn, max(x) AS mx,
       |    (max(x) - min(x)) / 255.0 AS sc
       |  FROM cells GROUP BY dim),
       |er AS MATERIALIZED (
       |  SELECT c.vec_id, c.label,
       |    abs(c.x - (s.mn + (CASE WHEN s.sc = 0.0 THEN 0.0
       |      ELSE round((c.x - s.mn) / s.sc) END) * s.sc)) AS e
       |  FROM cells c JOIN stats s ON c.dim = s.dim)
       |SELECT label, count(DISTINCT vec_id) AS n_vecs,
       |  count(*) AS n_cells,
       |  (CAST(sum(CAST(round(e * 1e9) AS BIGINT)) AS BIGINT)::DOUBLE / 1e9)
       |    / count(*)::DOUBLE AS mean_abs_err,
       |  max(e) AS max_abs_err
       |FROM er
       |GROUP BY label
       |ORDER BY label""".stripMargin

  // --- q_sim_centroid_drift ---------------------------------------------------
  // EMBEDDING-CENTROID DRIFT MONITOR: per-label centroid of snapshot A
  // (even vec_ids) vs snapshot B (odd vec_ids) — cosine and L2 between
  // the two mean vectors, the "did my embedding distribution move
  // between ingest ticks / model versions" check a retrieval pipeline
  // runs before trusting a rebuilt index (q_tx_drift is the token-side
  // twin; this is the vector side). The even/odd split stands in for
  // two snapshot frames; production passes two real frames through the
  // same plan. Means route through 1e-6 fixed point (the kmeansUpdate
  // discipline): per-(label, half, dim) BIGINT sums are exact in any
  // order, so both engines divide identical integers — and the
  // cosine/L2 folds are sequential, making the doubles bit-identical.
  // Scale: posexplode to a (label, half, dim) stream, ONE map-side-
  // combined aggregation to labels×2×dims groups regardless of corpus
  // size; the centroid frames that meet in the join are label-grain.
  def centroidDrift(s: SparkSession, d: String): DataFrame = {
    val sums = Tables.embeddings(s, d)
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding").cast("array<double>")))
      .toDF("label", "half", "dim", "x")
      .groupBy("label", "half", "dim")
      .agg(count(lit(1)).as("n"),
        sum(round(col("x") * 1000000.0).cast("long")).as("sx"))
      .select(col("label"), col("half"), col("dim"), col("n"),
        (col("sx").cast("double") / 1000000.0 / col("n").cast("double")).as("m"))
    val cent = sums.groupBy("label", "half")
      .agg(max(col("n")).as("n"),
        collect_list(struct(col("dim"), col("m"))).as("dm"))
      .select(col("label"), col("half"), col("n"),
        transform(array_sort(col("dm")), x => x.getField("m")).as("c"))
    val joined = cent.filter(col("half") === 0)
      .select(col("label"), col("n").as("n_even"), col("c").as("ce"))
      .join(cent.filter(col("half") === 1)
        .select(col("label"), col("n").as("n_odd"), col("c").as("co")), "label")
      .withColumn("dv", zip_with(col("ce"), col("co"), (a, b) => a - b))
    joined.select(col("label"), col("n_even"), col("n_odd"),
        Vectors.cosine(col("ce"), col("co")).as("cosine"),
        sqrt(Vectors.dot(col("dv"), col("dv"))).as("l2"))
      .orderBy("label")
  }

  lazy val centroidDriftSql: String =
    s"""WITH sums AS MATERIALIZED (
       |  SELECT label, vec_id % 2 AS half, gi.i AS dim,
       |    count(embedding[gi.i]) AS n,
       |    sum(CAST(round(embedding[gi.i]::DOUBLE * 1000000.0) AS BIGINT)) AS sx
       |  FROM embeddings, generate_series(1, $PcaDims) gi(i)
       |  GROUP BY label, vec_id % 2, gi.i),
       |cent AS MATERIALIZED (
       |  SELECT label, half, max(n) AS n,
       |    list(sx::DOUBLE / 1000000.0 / n::DOUBLE ORDER BY dim) AS c
       |  FROM sums GROUP BY label, half),
       |pairs AS MATERIALIZED (
       |  SELECT e.label, e.n AS n_even, o.n AS n_odd, e.c AS ce, o.c AS co,
       |    list_transform(generate_series(1, $PcaDims),
       |      i -> e.c[i] - o.c[i]) AS dv
       |  FROM cent e JOIN cent o ON e.label = o.label
       |  WHERE e.half = 0 AND o.half = 1)
       |SELECT label, CAST(n_even AS BIGINT) AS n_even,
       |  CAST(n_odd AS BIGINT) AS n_odd,
       |  ${Vectors.cosineSql("ce", "co")} AS cosine,
       |  sqrt(${Vectors.dotSql("dv", "dv")}) AS l2
       |FROM pairs
       |ORDER BY label""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_pca" -> (pca _),
    "q_sim_pca2" -> (pca2 _),
    "q_sim_recon_err" -> (reconErr _),
    "q_sim_quantize_audit" -> (quantizeAudit _),
    "q_sim_pca_scores" -> (pcaScores _),
    "q_sim_centroid_drift" -> (centroidDrift _),
    "q_sim_linear_probe" -> (linearProbe _),
    "q_sim_probe_weights" -> (linearProbeWeights _),
    "q_sim_auc" -> (probeAuc _),
    "q_sim_reliability" -> (probeReliability _),
    "q_sim_ivf_pruned" -> (ivfPrunedTopK _),
    "q_sim_ivfpq_residual" -> (ivfPqResidualTopK _),
    "q_sim_ivfpq_full" -> (ivfPqFullTopK _),
    "q_sim_ivfpq_trained" -> (ivfPqTrainedTopK _),
    "q_sim_ivfpq_topk" -> (ivfPqTopK _),
    "q_sim_pq" -> (pqEncode _),
    "q_sim_pq_adc" -> (pqAdcTopK _),
    "q_sim_topk_brute" -> (bruteTopK _),
    "q_sim_knn_graph" -> (knnGraph _),
    "q_sim_hard_neg" -> (hardNegatives _),
    "q_sim_mmr" -> (mmr _),
    "q_sim_jl" -> (jl _),
    "q_sim_matryoshka" -> (matryoshka _),
    "q_sim_sq8" -> (sq8 _),
    "q_sim_recall" -> (recallEval _),
    "q_sim_recall_trained" -> (recallTrained _),
    "q_sim_mips" -> (mipsTopK _),
    "q_sim_ivf_topk" -> (ivfTopK _),
    "q_sim_filtered_topk" -> (filteredTopK _),
    "q_sim_kmeans_assign" -> (kmeansAssign _),
    "q_sim_kmeans_update" -> (kmeansUpdate _),
    "q_sim_silhouette" -> (silhouette _),
    "q_sim_kmeans_lloyd" -> (kmeansLloyd _),
    "q_sim_quantize" -> (quantize _))

  val oracles: Map[String, String] = Map(
    "q_sim_pca" -> pcaSql,
    "q_sim_pca2" -> pca2Sql,
    "q_sim_recon_err" -> reconErrSql,
    "q_sim_quantize_audit" -> quantizeAuditSql,
    "q_sim_pca_scores" -> pcaScoresSql,
    "q_sim_centroid_drift" -> centroidDriftSql,
    "q_sim_linear_probe" -> linearProbeSql,
    "q_sim_probe_weights" -> linearProbeWeightsSql,
    "q_sim_auc" -> probeAucSql,
    "q_sim_reliability" -> probeReliabilitySql,
    "q_sim_ivf_pruned" -> ivfPrunedSql,
    "q_sim_ivfpq_residual" -> ivfPqResidualSql,
    "q_sim_ivfpq_full" -> ivfPqFullSql,
    "q_sim_ivfpq_trained" -> ivfPqTrainedSql,
    "q_sim_ivfpq_topk" -> ivfPqTopKSql,
    "q_sim_pq" -> pqEncodeSql,
    "q_sim_pq_adc" -> pqAdcTopKSql,
    "q_sim_topk_brute" -> bruteTopKSql,
    "q_sim_knn_graph" -> knnGraphSql,
    "q_sim_hard_neg" -> hardNegativesSql,
    "q_sim_mmr" -> mmrSql,
    "q_sim_jl" -> jlSql,
    "q_sim_matryoshka" -> matryoshkaSql,
    "q_sim_sq8" -> sq8Sql,
    "q_sim_recall" -> recallEvalSql,
    "q_sim_recall_trained" -> recallTrainedSql,
    "q_sim_mips" -> mipsTopKSql,
    "q_sim_ivf_topk" -> ivfTopKSql,
    "q_sim_filtered_topk" -> filteredTopKSql,
    "q_sim_kmeans_assign" -> kmeansAssignSql,
    "q_sim_kmeans_update" -> kmeansUpdateSql,
    "q_sim_silhouette" -> silhouetteSql,
    "q_sim_kmeans_lloyd" -> kmeansLloydSql,
    "q_sim_quantize" -> quantizeSql)
}
