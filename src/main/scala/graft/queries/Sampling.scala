package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling and dataset splitting — the selection verbs a
  * training-data pipeline runs after scoring/dedup. Everything derives
  * from a content hash of the row KEY (never `rand()`), so samples are
  * reproducible across runs, engines, retries and scale-ups, and a row's
  * split assignment never changes when the corpus grows — the property
  * that keeps eval sets uncontaminated as data accretes. Pure scan-side
  * projections/filters: no shuffle until the final demo sort/agg.
  */
object Sampling {

  private def bucket(c: org.apache.spark.sql.Column, mod: Int) =
    Hashes.md5Int32(c.cast("string")) % mod

  // --- q_sm_neyman ----------------------------------------------------------
  // NEYMAN-OPTIMAL STRATIFIED ALLOCATION — the estimator-variance-
  // minimizing way to spend a fixed sample budget: stratum h gets
  // n_h ∝ N_h·S_h (big AND noisy strata earn more budget than either
  // alone), the allocation every survey-sampling text derives and the
  // step up from q_sm_stratified's hand-set rates. Per-stratum
  // moments (N, Σc, Σc²) are exact — per-row c² in BIGINT with the
  // SUMS in DECIMAL(38,0) (lineitem cents square to ~10¹⁴ per row, so
  // BIGINT sums wrap near sf0.1 — the linreg accumulator discipline);
  // each moment casts to double once and S_h is the usual exact-int
  // variance tree. The denominator ΣN_h·S_h is a FIXED three-term
  // chain over the known flag values (A, N, R) — never a double-sum
  // aggregate. Realized rows come from the same deterministic
  // md5-uniform the whole sampling family uses, at rate n_h/N_h per
  // stratum — reproducible across runs, engines and scale-ups.
  // Scale: one moment aggregation, a 3-row broadcast of rates, one
  // scan-side filter; nothing data-proportional converges anywhere.
  private val NeymanBudget = 1000L
  private val NeymanSpace = 281474976710656.0 // 2^48

  def neyman(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
      round(col("l_extendedprice") * 100).cast("long").as("c"),
      concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string")).as("key"))
    val m = base.groupBy("g").agg(count(lit(1)).as("nh"),
        sum(col("c").cast("decimal(38,0)")).as("sc"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("q"))
      .withColumn("nhd", col("nh").cast("double"))
      .withColumn("sd", sqrt((col("nhd") * col("q").cast("double")
        - col("sc").cast("double") * col("sc").cast("double"))
        / (col("nhd") * (col("nhd") - 1.0))))
      .withColumn("w", col("nhd") * col("sd"))
    val tot = m.groupBy().agg(
        max(when(col("g") === "A", col("w"))).as("wa"),
        max(when(col("g") === "N", col("w"))).as("wn"),
        max(when(col("g") === "R", col("w"))).as("wr"))
      .select((coalesce(col("wa"), lit(0.0)) + coalesce(col("wn"), lit(0.0))
        + coalesce(col("wr"), lit(0.0))).as("wtot"))
    val rates = m.crossJoin(broadcast(tot))
      .withColumn("alloc",
        round(lit(NeymanBudget.toDouble) * col("w") / col("wtot")).cast("long"))
      .withColumn("rate", col("alloc").cast("double") / col("nhd"))
      .select("g", "nh", "sd", "alloc", "rate")
    val kept = base.join(broadcast(rates.select("g", "rate")), "g")
      .filter(Hashes.md5Int48(concat(col("key"), lit("_ney"))).cast("double")
        / lit(NeymanSpace) < col("rate"))
      .groupBy("g").agg(count(lit(1)).as("realized_n"),
        sum(col("c").cast("decimal(38,0)")).as("rs"))
    rates.join(kept, Seq("g"), "left")
      .select(col("g"), col("nh"), col("sd"), col("alloc"),
        coalesce(col("realized_n"), lit(0L)).as("realized_n"),
        when(col("realized_n") > 0,
          col("rs").cast("double") / col("realized_n").cast("double") / 100.0)
          .as("realized_mean"))
      .orderBy("g")
  }

  lazy val neymanSql: String = {
    val h = Hashes.md5Int48Sql("key || '_ney'")
    s"""WITH base AS MATERIALIZED (
       |  SELECT l_returnflag AS g,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
       |    l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR AS key
       |  FROM lineitem),
       |m AS MATERIALIZED (
       |  SELECT g, CAST(count(*) AS BIGINT) AS nh,
       |    sum(CAST(c AS DECIMAL(38,0))) AS sc,
       |    sum(CAST(c * c AS DECIMAL(38,0))) AS q
       |  FROM base GROUP BY g),
       |sds AS MATERIALIZED (
       |  SELECT g, nh, CAST(nh AS DOUBLE) AS nhd,
       |    sqrt((CAST(nh AS DOUBLE) * CAST(q AS DOUBLE)
       |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
       |      / (CAST(nh AS DOUBLE) * (CAST(nh AS DOUBLE) - 1.0))) AS sd
       |  FROM m),
       |wts AS MATERIALIZED (SELECT g, nh, nhd, sd, nhd * sd AS w FROM sds),
       |tot AS MATERIALIZED (
       |  SELECT coalesce(max(CASE WHEN g = 'A' THEN w END), 0.0)
       |    + coalesce(max(CASE WHEN g = 'N' THEN w END), 0.0)
       |    + coalesce(max(CASE WHEN g = 'R' THEN w END), 0.0) AS wtot
       |  FROM wts),
       |rates AS MATERIALIZED (
       |  SELECT g, nh, sd,
       |    CAST(round($NeymanBudget.0 * w / wtot) AS BIGINT) AS alloc,
       |    CAST(round($NeymanBudget.0 * w / wtot) AS BIGINT)::DOUBLE / nhd AS rate
       |  FROM wts, tot),
       |kept AS MATERIALIZED (
       |  SELECT b.g, CAST(count(*) AS BIGINT) AS realized_n,
       |    sum(CAST(c AS DECIMAL(38,0))) AS rs
       |  FROM base b JOIN rates r ON b.g = r.g
       |  WHERE $h::DOUBLE / $NeymanSpace < r.rate
       |  GROUP BY b.g)
       |SELECT r.g, nh, sd, alloc,
       |  CAST(coalesce(k.realized_n, 0) AS BIGINT) AS realized_n,
       |  CASE WHEN k.realized_n > 0
       |    THEN CAST(k.rs AS DOUBLE) / CAST(k.realized_n AS DOUBLE) / 100.0
       |  END AS realized_mean
       |FROM rates r LEFT JOIN kept k ON r.g = k.g
       |ORDER BY r.g""".stripMargin
  }

  // --- q_sm_hash_sample ---------------------------------------------------
  // Uniform 10% sample by key hash: stable under re-runs and corpus
  // growth (a kept doc stays kept), unlike rand()-based sampling.
  def hashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(bucket(col("doc_id"), 100) < 10)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  val hashSampleSql: String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE ${Hashes.md5Int32Sql("doc_id::VARCHAR")} % 100 < 10
       |ORDER BY doc_id""".stripMargin

  // --- q_sm_stratified ----------------------------------------------------
  // Per-stratum rates (upsample the rare class, downsample the common
  // one): 50% of English docs, 10% of everything else. The hash salts
  // with the stratum so per-stratum buckets are independent.
  def stratified(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket",
        Hashes.md5Int32(concat(col("doc_id").cast("string"), lit("_"), col("lang"))) % 100)
      .filter(when(col("lang") === "en", col("bucket") < 50)
        .otherwise(col("bucket") < 10))
      .select("doc_id", "lang")
      .orderBy("doc_id")

  val stratifiedSql: String = {
    val h = Hashes.md5Int32Sql("doc_id::VARCHAR || '_' || lang")
    s"""SELECT doc_id, lang FROM documents
       |WHERE CASE WHEN lang = 'en' THEN $h % 100 < 50
       |           ELSE $h % 100 < 10 END
       |ORDER BY doc_id""".stripMargin
  }

  // --- q_sm_balanced ----------------------------------------------------------
  // CLASS-BALANCED downsampling — every class capped at the SMALLEST
  // class's size, the standard rebalance before training a classifier
  // on skewed labels (and the deterministic cousin of "undersample the
  // majority class"). Each class keeps its m lowest-hash docs (hash
  // rank, doc_id tie-break), so membership is a pure function of the
  // data: re-runs, engines, and partitionings all agree, and adding
  // documents to OTHER classes never changes this class's picks. m is
  // a one-row digest joined back (never driver state); the rank is one
  // per-class window. Scale: scan + window; the window key is the
  // class label — a salted two-level rank would shard a mega-class,
  // same playbook as every skewed window here.
  def balanced(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val m = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(min(col("c")).as("m"))
    val w = Window.partitionBy("lang")
      .orderBy(Hashes.md5Int32(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(m))
      .filter(col("rk") <= col("m"))
      .select(col("lang"), col("doc_id"), col("rk"))
      .orderBy("lang", "rk")
  }

  val balancedSql: String = {
    val h = Hashes.md5Int32Sql("doc_id::VARCHAR")
    s"""WITH m AS MATERIALIZED (
       |  SELECT CAST(min(c) AS BIGINT) AS m FROM (
       |    SELECT lang, count(*) AS c FROM documents GROUP BY 1)),
       |ranked AS MATERIALIZED (
       |  SELECT lang, doc_id,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY $h, doc_id) AS BIGINT) AS rk
       |  FROM documents)
       |SELECT lang, doc_id, rk FROM ranked, m
       |WHERE rk <= m
       |ORDER BY lang, rk""".stripMargin
  }

  // --- q_sm_split ---------------------------------------------------------
  // Stable train/val/test assignment (80/10/10) + per-(lang, split)
  // counts: the audit query run before training to confirm split sizes
  // and stratum balance.
  def split(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket(col("doc_id"), 100) < 80, "train")
          .when(bucket(col("doc_id"), 100) < 90, "val")
          .otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")

  val splitSql: String = {
    val h = s"${Hashes.md5Int32Sql("doc_id::VARCHAR")} % 100"
    s"""SELECT lang,
       |  CASE WHEN $h < 80 THEN 'train' WHEN $h < 90 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n_docs
       |FROM documents
       |GROUP BY 1, 2
       |ORDER BY lang, split""".stripMargin
  }

  // --- q_sm_group_split -------------------------------------------------------
  // GROUP-DISJOINT train/val/test split: the split key is the SOURCE
  // hash, not the doc hash, so every document from one domain lands in
  // the same split — the standard defense when near-duplicates cluster
  // within a domain (doc-grain splits leak template siblings across
  // the train/test boundary; q_dd_split_leakage measures that leak,
  // this operator removes it by construction). The output carries its
  // own audit: n_leaked_sources counts sources observed in more than
  // one split among the DOC-grain assignments, which proves the
  // assignment was purely source-determined (any per-doc salt sneaking
  // into the hash would light it up) — structurally 0, verified, not
  // assumed. Scale: two map-side-combined aggregations over one scan;
  // the split arithmetic is the same salted-hash bucket as q_sm_split,
  // so adding a source never reshuffles another source's split.
  def groupSplit(s: SparkSession, d: String): DataFrame = {
    val assigned = Tables.documents(s, d)
      .withColumn("split",
        when(bucket(col("source"), 100) < 80, "train")
          .when(bucket(col("source"), 100) < 90, "val")
          .otherwise("test"))
    val leaked = assigned.select("source", "split").distinct()
      .groupBy("source").agg(count(lit(1)).as("n_splits"))
      .filter(col("n_splits") > 1)
      .agg(count(lit(1)).as("n_leaked_sources"))
    assigned.groupBy("split")
      .agg(countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"))
      .crossJoin(broadcast(leaked))
      .orderBy("split")
  }

  val groupSplitSql: String = {
    val h = s"${Hashes.md5Int32Sql("source::VARCHAR")} % 100"
    s"""WITH assigned AS MATERIALIZED (
       |  SELECT source, n_chars,
       |    CASE WHEN $h < 80 THEN 'train' WHEN $h < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |leaked AS MATERIALIZED (
       |  SELECT count(*) AS n_leaked_sources FROM (
       |    SELECT source FROM (SELECT DISTINCT source, split FROM assigned)
       |    GROUP BY source HAVING count(*) > 1))
       |SELECT split, count(DISTINCT source) AS n_sources,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  (SELECT n_leaked_sources FROM leaked) AS n_leaked_sources
       |FROM assigned
       |GROUP BY split
       |ORDER BY split""".stripMargin
  }

  // --- q_sm_kfold -------------------------------------------------------------
  // DETERMINISTIC K-FOLD CROSS-VALIDATION ASSIGNMENT + balance audit:
  // fold = salted content hash mod k, so folds are stable under
  // re-runs, engine swaps and corpus growth (a doc never migrates
  // folds as data accretes — the property that keeps fold-held-out
  // eval numbers comparable across pipeline versions). The audit row
  // per fold reports doc/char mass and the relative deviation from the
  // uniform share — the pre-training check that a hash hot-spot or a
  // skewed upstream filter hasn't unbalanced the protocol. Integer
  // deviation arithmetic (|n·k − total| over total) keeps the
  // cross-engine boundary exact. One scan, one k-group aggregation.
  private val KFolds = 5

  def kfold(s: SparkSession, d: String): DataFrame = {
    val assigned = Tables.documents(s, d)
      .withColumn("fold",
        Hashes.md5Int32(concat(col("doc_id").cast("string"), lit("_fold"))) % KFolds)
    val tot = assigned.agg(count(lit(1)).as("total"))
    assigned.groupBy("fold")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .crossJoin(broadcast(tot))
      .select(col("fold"), col("n_docs"), col("n_chars"),
        (abs(col("n_docs") * KFolds - col("total")).cast("double") /
          col("total").cast("double")).as("dev_pct"))
      .orderBy("fold")
  }

  val kfoldSql: String = {
    val h = s"${Hashes.md5Int32Sql("doc_id::VARCHAR || '_fold'")} % $KFolds"
    s"""WITH assigned AS MATERIALIZED (
       |  SELECT $h AS fold, n_chars FROM documents),
       |tot AS MATERIALIZED (SELECT count(*) AS total FROM assigned)
       |SELECT fold, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  abs(count(*) * $KFolds - tot.total)::DOUBLE / tot.total::DOUBLE AS dev_pct
       |FROM assigned, tot
       |GROUP BY fold, tot.total
       |ORDER BY fold""".stripMargin
  }

  // --- q_sm_mixture ---------------------------------------------------------
  // Balanced domain mixture: downsample every domain to (approximately)
  // the size of the SMALLEST domain — the data-dependent cousin of
  // q_sm_stratified, where the rates come from the corpus instead of a
  // config. The keep threshold is exact integer arithmetic
  // ((min_n * 10000) div n_total — integer division, because
  // floor-of-double-division can round across the boundary in one
  // engine and not the other), and the keep decision is the usual
  // salted content hash. At 100 TB the domain histogram is a digest-
  // only aggregate and the per-domain thresholds broadcast back — the
  // corpus itself is filtered scan-side and never shuffled. The query
  // keys on `lang`, the corpus's genuinely SKEWED dimension (en ≈ 3×
  // fr), so sub-10000 thresholds and the hash filter are load-bearing
  // in the driver row — `source` is uniform and would verify nothing.
  def mixtureOf(docs: DataFrame, keyCol: String): DataFrame = {
    val slim = docs.select(col("doc_id"), col(keyCol).as("domain"))
    val counts = slim.groupBy("domain").agg(count(lit(1)).as("n_total"))
    val rates = counts
      .crossJoin(counts.agg(min(col("n_total")).as("min_n")))
      .withColumn("threshold", expr("(min_n * 10000) div n_total"))
      .select("domain", "n_total", "threshold")
    val kept = slim.join(broadcast(rates), "domain")
      .filter(Hashes.md5Int32(
        concat(col("doc_id").cast("string"), lit("_mix_"), col("domain"))) % 10000
        < col("threshold"))
    kept.groupBy("domain").agg(count(lit(1)).as("n_kept"))
      .join(rates, "domain")
      .select("domain", "n_total", "threshold", "n_kept")
      .orderBy("domain")
  }

  def mixture(s: SparkSession, d: String): DataFrame =
    mixtureOf(Tables.documents(s, d), "lang")

  val mixtureSql: String = {
    val h = Hashes.md5Int32Sql("d.doc_id::VARCHAR || '_mix_' || d.lang")
    s"""WITH counts AS (
       |  SELECT lang AS domain, count(*) AS n_total FROM documents GROUP BY lang),
       |rates AS (
       |  SELECT domain, n_total,
       |    CAST((min(n_total) OVER () * 10000) // n_total AS BIGINT) AS threshold
       |  FROM counts),
       |kept AS (
       |  SELECT d.lang AS domain, count(*) AS n_kept
       |  FROM documents d JOIN rates r ON d.lang = r.domain
       |  WHERE $h % 10000 < r.threshold
       |  GROUP BY d.lang)
       |SELECT r.domain, r.n_total, r.threshold, k.n_kept
       |FROM rates r JOIN kept k ON r.domain = k.domain
       |ORDER BY r.domain""".stripMargin
  }

  // --- q_sm_token_budget ----------------------------------------------------
  // Token-BUDGETED quality selection — "give me the best ~40% of the
  // corpus by token count": the subset-selection step between scoring
  // and training. The naive form sorts the corpus by quality and takes
  // a running-cumsum prefix — a global sort plus a global scan-order
  // dependency, both non-starters at 100 TB. The scale shape: (1) an
  // integer quality bucket per doc (stopword density percent — integer
  // division; any scored signal plugs in), (2) a BUCKET-GRAIN histogram
  // of token mass (≤101 rows — the only thing that ever leaves the
  // scan), (3) an exclusive prefix walk over that tiny table (the same
  // sanctioned single-partition window as q_tp_row_ids' offsets) finds
  // the boundary bucket where the budget runs out, (4) full buckets
  // above the boundary admit wholesale; the boundary bucket admits by
  // salted content hash at an integer threshold sized to the remaining
  // budget. Realized tokens land within the boundary bucket's mass of
  // the budget (spec-bounded); admission is deterministic, reproducible
  // across runs/engines, and stable for already-admitted docs as the
  // corpus grows ONLY above the boundary — the histogram shifts with
  // the corpus, which is the honest semantics of a fixed-fraction
  // budget. The oracle replays the identical integer walk in DuckDB.
  private val BudgetNum = 2L
  private val BudgetDen = 5L
  private val BudgetSeed = 7

  /** The budget walk over any (doc_id, n_tokens, qb) frame: histogram
    * at bucket grain, exclusive prefix to the boundary bucket, salted
    * fractional admission inside it. Factored out so the token MASS can
    * come from any tokenizer ([[tokenBudget]] counts whitespace tokens,
    * [[tokenBudgetBpe]] the trained BPE tokens) while the machinery —
    * the only part with a scale shape — is shared. */
  private def budgetAdmit(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy("qb").agg(sum(col("n_tokens")).as("bucket_tokens"))
    val budgetDf = scored.agg(
      expr(s"(sum(n_tokens) * $BudgetNum) div $BudgetDen").as("budget"))
    val w = Window.orderBy(col("qb").desc).rowsBetween(Window.unboundedPreceding, -1)
    val cutoff = hist
      .withColumn("cum_before", coalesce(sum(col("bucket_tokens")).over(w), lit(0L)))
      .crossJoin(budgetDf)
      .filter(col("cum_before") <= col("budget") &&
        col("cum_before") + col("bucket_tokens") > col("budget"))
      .select(col("qb").as("cut_qb"),
        expr("((budget - cum_before) * 10000) div bucket_tokens").as("cut_threshold"))
    scored.join(broadcast(cutoff), lit(true), "left")
      .select(col("doc_id"), col("qb"), col("n_tokens"),
        (col("cut_qb").isNull || col("qb") > col("cut_qb") ||
          (col("qb") === col("cut_qb") &&
            Hashes.md5Int32Seeded(col("doc_id").cast("string"), BudgetSeed) % 10000
              < col("cut_threshold"))).as("admitted"))
      .orderBy("doc_id")
  }

  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val stopArr = array(TextAnalysis.stopwords.map(lit): _*)
    budgetAdmit(Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => array_contains(stopArr, t))).cast("long").as("n_stop"))
      .withColumn("qb", expr("(n_stop * 100) div greatest(n_tokens, 1)")))
  }

  // --- q_sm_token_budget_bpe ------------------------------------------------
  // The SAME budget walk, but the mass each document charges against
  // the budget is its TRAINED-BPE token count (q_tp_bpe's tokenizer,
  // cached per dataset fingerprint) — budgets in a real pipeline are
  // denominated in MODEL tokens, while the quality signal (stopword
  // density over whitespace tokens) stays whatever the curation stack
  // scores. Same boundary-bucket arithmetic, same determinism; the
  // oracle replays BPE training (the materialized CTE chain), derives
  // per-doc BPE counts vocab-first, and runs the identical walk.
  def tokenBudgetBpe(s: SparkSession, d: String): DataFrame = {
    val merges = TrainPrep.trainedBpe(s, d)
    val toks = TextAnalysis.tokens(col("text"))
    val stopArr = array(TextAnalysis.stopwords.map(lit): _*)
    val docs = Tables.documents(s, d).select(col("doc_id"), toks.as("t"))
    // encode the DISTINCT vocab once and join the per-word token count
    // back — the production amortization (the per-occurrence fold costs
    // occurrences × merges × symbols; the vocab form costs distinct
    // words × the same, orders of magnitude less on natural text). The
    // join is left unhinted: at corpus scale the vocab shuffles or
    // lives as a bucketed code table; AQE broadcasts it when small.
    val wordLens = docs.select(explode(col("t")).as("w")).distinct()
      .select(col("w"),
        size(TrainPrep.bpeEncode(col("w"), merges)).cast("long").as("wlen"))
    val bpeCounts = docs.select(col("doc_id"), explode(col("t")).as("w"))
      .join(wordLens, "w")
      .groupBy("doc_id").agg(sum(col("wlen")).as("n_bpe"))
    val scored = docs
      .select(col("doc_id"), size(col("t")).cast("long").as("n_ws"),
        size(filter(col("t"), t => array_contains(stopArr, t))).cast("long").as("n_stop"))
      .join(bpeCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bpe"), lit(0L)).as("n_tokens"),
        expr("(n_stop * 100) div greatest(n_ws, 1)").as("qb"))
    // budgetAdmit reads `scored` three times (histogram, budget total,
    // final join); materialize the doc-grain digest once instead of
    // re-running the encode per consumer
    budgetAdmit(scored.localCheckpoint())
  }

  val tokenBudgetSql: String = {
    val stopList = TextAnalysis.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    val t = TextAnalysis.tokensSql
    val h = Hashes.md5Int32SeededSql("q.doc_id::VARCHAR", BudgetSeed)
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    len($t)::BIGINT AS n_tokens,
       |    len(list_filter($t, t -> list_contains($stopList, t)))::BIGINT AS n_stop
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, n_tokens,
       |    (n_stop * 100) // greatest(n_tokens, 1) AS qb
       |  FROM scored),
       |hist AS (SELECT qb, sum(n_tokens) AS bucket_tokens FROM q GROUP BY qb),
       |b AS (SELECT (sum(n_tokens) * $BudgetNum) // $BudgetDen AS budget FROM q),
       |walk AS (
       |  SELECT qb, bucket_tokens,
       |    coalesce(sum(bucket_tokens) OVER (
       |      ORDER BY qb DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS cum_before
       |  FROM hist),
       |cutoff AS (
       |  SELECT qb AS cut_qb,
       |    ((budget - cum_before) * 10000) // bucket_tokens AS cut_threshold
       |  FROM walk, b
       |  WHERE cum_before <= budget AND cum_before + bucket_tokens > budget)
       |SELECT q.doc_id, q.qb, q.n_tokens,
       |  (c.cut_qb IS NULL OR q.qb > c.cut_qb
       |    OR (q.qb = c.cut_qb AND $h % 10000 < c.cut_threshold)) AS admitted
       |FROM q LEFT JOIN cutoff c ON TRUE
       |ORDER BY q.doc_id""".stripMargin
  }

  val tokenBudgetBpeSql: String = {
    val stopList = TextAnalysis.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    val h = Hashes.md5Int32SeededSql("q.doc_id::VARCHAR", BudgetSeed)
    s"""WITH ${TrainPrep.bpeCtesSql},
       |dw AS (SELECT doc_id, t[u.i] AS w
       |       FROM toks, unnest(generate_series(1, len(t))) u(i)),
       |nb AS (SELECT dw.doc_id, sum(len(wenc.wtoks))::BIGINT AS n_bpe
       |       FROM dw JOIN wenc USING (w) GROUP BY dw.doc_id),
       |scored AS (
       |  SELECT t.doc_id, COALESCE(nb.n_bpe, 0)::BIGINT AS n_tokens,
       |    len(t.t)::BIGINT AS n_ws,
       |    len(list_filter(t.t, s -> list_contains($stopList, s)))::BIGINT AS n_stop
       |  FROM toks t LEFT JOIN nb ON t.doc_id = nb.doc_id),
       |q AS (
       |  SELECT doc_id, n_tokens,
       |    (n_stop * 100) // greatest(n_ws, 1) AS qb
       |  FROM scored),
       |hist AS (SELECT qb, sum(n_tokens) AS bucket_tokens FROM q GROUP BY qb),
       |b AS (SELECT (sum(n_tokens) * $BudgetNum) // $BudgetDen AS budget FROM q),
       |walk AS (
       |  SELECT qb, bucket_tokens,
       |    coalesce(sum(bucket_tokens) OVER (
       |      ORDER BY qb DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS cum_before
       |  FROM hist),
       |cutoff AS (
       |  SELECT qb AS cut_qb,
       |    ((budget - cum_before) * 10000) // bucket_tokens AS cut_threshold
       |  FROM walk, b
       |  WHERE cum_before <= budget AND cum_before + bucket_tokens > budget)
       |SELECT q.doc_id, q.qb, q.n_tokens,
       |  (c.cut_qb IS NULL OR q.qb > c.cut_qb
       |    OR (q.qb = c.cut_qb AND $h % 10000 < c.cut_threshold)) AS admitted
       |FROM q LEFT JOIN cutoff c ON TRUE
       |ORDER BY q.doc_id""".stripMargin
  }

  // --- q_sm_group_sample ----------------------------------------------------
  // Deterministic per-group inspection sample: the k docs per source
  // with the SMALLEST salted content hash — the "show me 5 random docs
  // from every domain" query a curation team runs after each pipeline
  // change, made reproducible (hash order, not rand()) and bounded (the
  // top_k_by min-heap holds k rows per group with map-side combine — a
  // per-domain sample of a 100 TB corpus costs one scan and a
  // (source, k-array) digest shuffle; the window formulation the oracle
  // uses would sort every domain's full history). Negated (hash,
  // doc_id) structs make largest-k ≡ smallest-hash-k, with the unique
  // id breaking hash-collision ties identically in both engines. The
  // salt includes the source, so adding one domain never perturbs
  // another's sample.
  private val GroupSampleK = 5

  def groupSample(s: SparkSession, d: String): DataFrame = {
    val h = Hashes.md5Int32(
      concat(col("doc_id").cast("string"), lit("_"), col("source")))
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(graft.functions.TopKByFunctions.topKBy(
        struct((-h).as("nh"), (-col("doc_id")).as("nid")), GroupSampleK).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("source"), (col("i") + 1).as("rnk"),
        (-col("t.nid")).cast("long").as("doc_id"),
        (-col("t.nh")).cast("long").as("h"))
      .orderBy("source", "rnk")
  }

  val groupSampleSql: String = {
    val h = Hashes.md5Int32Sql("doc_id::VARCHAR || '_' || source")
    s"""SELECT source, CAST(rnk AS INT) AS rnk, doc_id, h
       |FROM (
       |  SELECT source, doc_id, $h AS h,
       |    row_number() OVER (
       |      PARTITION BY source ORDER BY $h, doc_id) AS rnk
       |  FROM documents)
       |WHERE rnk <= $GroupSampleK
       |ORDER BY source, rnk""".stripMargin
  }

  // --- q_sm_systematic ------------------------------------------------------
  // Systematic sampling proportional to token weight — select every
  // S-th token's document walking the corpus in doc_id order (the
  // exact-integer alternative to weighted A-Res: Efraimidis–Spirakis
  // keys need u^(1/w), a transcendental whose last-ulp differences
  // could flip cross-engine order; stride arithmetic is exact BIGINT
  // in both engines). A doc is selected iff its cumulative-weight
  // interval (cum−w, cum] contains a multiple of the stride
  // S = max(1, total DIV target); a doc heavier than S is selected
  // once (dedup by construction), which systematic sampling handles
  // and independent per-doc coin flips don't.
  //
  // The scalable part is the PREFIX SUM: a single global window is a
  // one-partition sort, so the cumsum runs TWO-LEVEL — per-bucket
  // totals (doc_id DIV 64: an aggregate, map-side combinable), bucket
  // offsets as an exclusive running sum over the TINY bucket table
  // (O(corpus/64) rows), broadcast back, then an in-bucket window
  // partitioned by bucket. At 100 TB the buckets are file/partition
  // ranges and the same two passes hold: nothing global ever sorts.
  // The stride scalar is the Lloyd-style O(1) driver artifact,
  // broadcast into the filter.
  private val SystematicTarget = 40L
  private val SystematicBucket = 64L

  def systematic(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("w"),
        expr(s"doc_id DIV $SystematicBucket").as("bucket"))
    val bsum = docs.groupBy("bucket").agg(sum(col("w")).as("bw"))
    val boff = bsum.withColumn("off",
      coalesce(sum(col("bw")).over(
        Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "off")
    val stride = bsum.agg(
      greatest(lit(1L), expr(s"sum(bw) DIV $SystematicTarget")).as("stride"))
    val iw = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(boff), "bucket")
      .withColumn("cum", col("off") + sum(col("w")).over(iw))
      .crossJoin(broadcast(stride))
      .filter(expr("cum DIV stride") > expr("(cum - w) DIV stride"))
      .select(col("doc_id"), col("w"), col("cum"))
      .orderBy("doc_id")
  }

  val systematicSql: String =
    s"""WITH w AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(${TextAnalysis.tokensSql}) AS BIGINT) AS w,
       |    doc_id // $SystematicBucket AS bucket
       |  FROM documents),
       |bsum AS (
       |  SELECT bucket, CAST(sum(w) AS BIGINT) AS bw FROM w GROUP BY bucket),
       |boff AS (
       |  SELECT bucket, CAST(coalesce(sum(bw) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM bsum),
       |stride AS (
       |  SELECT greatest(1, CAST(sum(bw) AS BIGINT) // $SystematicTarget) AS s
       |  FROM bsum),
       |cum AS (
       |  SELECT w.doc_id, w.w,
       |    b.off + CAST(sum(w.w) OVER (PARTITION BY w.bucket ORDER BY w.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM w JOIN boff b ON w.bucket = b.bucket)
       |SELECT doc_id, w, cum
       |FROM cum, stride
       |WHERE cum // s > (cum - w) // s
       |ORDER BY doc_id""".stripMargin

  // --- q_sm_weighted --------------------------------------------------------
  // WEIGHTED sampling without replacement (Efraimidis–Spirakis A-ES,
  // 2006, public): each row draws u ∈ (0,1] from its content hash and
  // ranks by key = ln(u)/w — the top-k by key IS an exact weighted
  // sample without replacement, fully deterministic under re-runs and
  // retries (no rand()). Here w = n_chars, the "sample long documents
  // proportionally more" mixing step. One scan + one TakeOrdered top-k:
  // no shuffle beyond the k-row reduction; at 100 TB this is the
  // per-partition-heap + driver-merge plan Spark already gives
  // `ORDER BY … LIMIT k`. The double key stays INTERNAL (both engines
  // compute ln/division on identical inputs; the output is the selected
  // id set, so a last-ulp ln() difference would only matter if two keys
  // collided within 1 ulp — keys are spread over (-inf, 0)).
  private val WeightedK = 100
  private val HashSpace = 281474976710656.0 // 2^48

  def weighted(s: SparkSession, d: String): DataFrame = {
    val h = Hashes.md5Int48(concat(col("doc_id").cast("string"), lit("_aes")))
    Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars").cast("bigint").as("w"),
        (log((h + 1).cast("double") / lit(HashSpace)) /
          col("n_chars").cast("double")).as("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(WeightedK)
      .select("doc_id", "w")
      .orderBy("doc_id")
  }

  val weightedSql: String = {
    val h = Hashes.md5Int48Sql("doc_id::VARCHAR || '_aes'")
    s"""SELECT doc_id, w FROM (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
       |    ln(($h + 1)::DOUBLE / $HashSpace) / n_chars::DOUBLE AS key
       |  FROM documents WHERE n_chars > 0
       |  ORDER BY key DESC, doc_id LIMIT $WeightedK)
       |ORDER BY doc_id""".stripMargin
  }

  // --- q_sm_temperature -----------------------------------------------------
  // TEMPERATURE-scaled source mixing (the multilingual/multi-domain
  // rebalancing rule, T = 2 ⇒ sampled mass ∝ n^(1/2)): per-domain keep
  // target = floor(sqrt(n_min · n_s)) — the smallest domain keeps
  // everything, a domain 4× larger keeps 2× the rows (half its mass).
  // Between q_sm_mixture's full flattening and no rebalancing at all.
  // The only float op is sqrt (correctly-rounded IEEE in BOTH engines,
  // so the floor'd target is bit-identical cross-engine at any scale);
  // thresholds are exact integer division out of 1e8 and the keep
  // decision is the salted content hash — scan-side filter, histogram
  // digest + broadcast back, corpus never shuffles.
  def temperature(s: SparkSession, d: String): DataFrame = {
    val slim = Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("domain"))
    val counts = slim.groupBy("domain").agg(count(lit(1)).as("n_total"))
    val rates = counts
      .crossJoin(counts.agg(min(col("n_total")).as("min_n")))
      .withColumn("target",
        floor(sqrt((col("min_n") * col("n_total")).cast("double")))
          .cast("bigint"))
      .withColumn("threshold", expr("(target * 100000000) DIV n_total"))
      .select("domain", "n_total", "target", "threshold")
    val keptCounts = slim.join(broadcast(rates), "domain")
      .filter(Hashes.md5Int48(concat(col("doc_id").cast("string"),
        lit("_temp_"), col("domain"))) % 100000000L < col("threshold"))
      .groupBy("domain").agg(count(lit(1)).as("n_kept"))
    rates.join(keptCounts, Seq("domain"), "left")
      .select(col("domain"), col("n_total"), col("target"), col("threshold"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("domain")
  }

  val temperatureSql: String = {
    val h = Hashes.md5Int48Sql("d.doc_id::VARCHAR || '_temp_' || d.lang")
    s"""WITH counts AS MATERIALIZED (
       |  SELECT lang AS domain, count(*) AS n_total FROM documents GROUP BY 1),
       |rates AS MATERIALIZED (
       |  SELECT domain, n_total,
       |    CAST(floor(sqrt((min_n * n_total)::DOUBLE)) AS BIGINT) AS target,
       |    (CAST(floor(sqrt((min_n * n_total)::DOUBLE)) AS BIGINT)
       |      * 100000000) // n_total AS threshold
       |  FROM counts, (SELECT min(n_total) AS min_n FROM counts)),
       |kept AS MATERIALIZED (
       |  SELECT d.lang AS domain, count(*) AS n_kept
       |  FROM documents d JOIN rates r ON r.domain = d.lang
       |  WHERE $h % 100000000 < r.threshold
       |  GROUP BY 1)
       |SELECT r.domain, r.n_total, r.target, r.threshold,
       |  COALESCE(k.n_kept, 0) AS n_kept
       |FROM rates r LEFT JOIN kept k USING (domain)
       |ORDER BY domain""".stripMargin
  }

  // --- q_sm_kcenter ---------------------------------------------------------
  // GREEDY k-CENTER CORESET over the embedding space — the diversity
  // sampler (farthest-point traversal): each pick is the vector
  // farthest from everything already selected, giving the 2-approx
  // cover that "maximally spread" eval/annotation subsets use where
  // hash sampling would oversample dense regions. Inherently
  // sequential in k, so it runs as k bounded relational rounds (the
  // MMR/Lloyd shape): one scan of the vectors per round, min squared
  // distance to the ≤k broadcast centers via three codegen'd vec_dot
  // terms (d² = aa − 2ab + bb, one fixed operand order in both
  // engines), TakeOrdered argmax with vec_id tie-break. The seed is
  // vec 0 (deterministic, not a rand() draw). d2_nearest records each
  // pick's coverage radius at selection time — the monotone
  // nonincreasing curve the spec gates. Scale: k scans, never a
  // pairwise materialization; centers ride as broadcast literals.
  private val KCenterK = 5

  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Vectors.dot(a, a) - lit(2.0) * Vectors.dot(a, b) + Vectors.dot(b, b)

  private def sqDistSql(a: String, b: String): String =
    s"(${Vectors.dotSql(a, a)}) - CAST(2.0 AS DOUBLE) * (${Vectors.dotSql(a, b)}) + (${Vectors.dotSql(b, b)})"

  def kcenter(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    var selected = e.filter(col("vec_id") === 0L)
      .select(col("vec_id"), col("v"),
        lit(null).cast("double").as("d2_nearest"), lit(1L).as("rank"))
    for (j <- 2 to KCenterK) {
      val pick = e
        .join(broadcast(selected.select(col("vec_id").as("s_id"))),
          col("vec_id") === col("s_id"), "left_anti")
        .crossJoin(broadcast(selected.select(col("v").as("sv"))))
        .groupBy(col("vec_id"), col("v"))
        .agg(min(sqDist(col("v"), col("sv"))).as("d2_nearest"))
        .orderBy(col("d2_nearest").desc, col("vec_id")).limit(1)
        .withColumn("rank", lit(j.toLong))
        .select("vec_id", "v", "d2_nearest", "rank")
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.select(col("rank"), col("vec_id"), col("d2_nearest"))
      .orderBy("rank")
  }

  lazy val kcenterSql: String = {
    val rounds = (2 to KCenterK).map { j =>
      val prev = s"sel${j - 1}"
      s"""pick$j AS MATERIALIZED (
         |  SELECT vec_id, embedding, d2_nearest, CAST($j AS BIGINT) AS rank
         |  FROM (
         |    SELECT e.vec_id, e.embedding,
         |      (SELECT min(${sqDistSql("e.embedding", "s.embedding")})
         |       FROM $prev s) AS d2_nearest
         |    FROM embeddings e
         |    WHERE e.vec_id NOT IN (SELECT vec_id FROM $prev))
         |  ORDER BY d2_nearest DESC, vec_id LIMIT 1),
         |sel$j AS MATERIALIZED (
         |  SELECT * FROM $prev UNION ALL SELECT * FROM pick$j)""".stripMargin
    }.mkString(",\n")
    s"""WITH sel1 AS MATERIALIZED (
       |  SELECT vec_id, embedding, CAST(NULL AS DOUBLE) AS d2_nearest,
       |    CAST(1 AS BIGINT) AS rank
       |  FROM embeddings WHERE vec_id = 0),
       |$rounds
       |SELECT rank, vec_id, d2_nearest FROM sel$KCenterK
       |ORDER BY rank""".stripMargin
  }

  // --- q_sm_soft_dedup ------------------------------------------------------
  // DEDUP-AWARE SAMPLING WEIGHTS (soft dedup): instead of hard-dropping
  // near-duplicates, weight every document by 1/|its near-dup cluster|
  // so each cluster contributes ONE document's worth of probability
  // mass — the reweighting the data-pruning literature applies when
  // duplicates carry signal (popular ≠ redundant) but must not
  // dominate the mixture. Clusters are the SAME capped MinHash-LSH
  // components q_dd_cluster_keeper ships (one derivation, two
  // consumers); unclustered docs form singletons at weight 1. `kept`
  // is the deterministic one-in-expectation sampler over those
  // weights: accept iff md5_32(doc_id) < 2^32/|cluster| — content-
  // hashed like every sampler here (reproducible across runs, engines
  // and scale-ups; E[kept per cluster] = 1), and the comparison is one
  // IEEE division both engines replay bit-identically. Scale: the
  // cluster table is the bounded LSH derivation (no new candidate
  // generator), sizes aggregate at cluster grain, and the acceptance
  // test is a scan-side projection — the only fact-grain shuffle is
  // the one cluster-size join.
  def softDedup(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minhashLsh(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").localCheckpoint()
    val (labels, _) = Dedup.connectedComponents(edges)
    val docs = Tables.documents(s, d).select("doc_id")
    val lab = docs.join(
        labels.select(col("id").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"))
    val sizes = lab.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    lab.join(sizes, "cluster")
      .select(col("doc_id"), col("cluster"), col("cluster_size"),
        (lit(1.0) / col("cluster_size").cast("double")).as("weight"),
        (Hashes.md5Int32(col("doc_id").cast("string")).cast("double") <
          lit(4294967296.0) / col("cluster_size").cast("double")).as("kept"))
      .orderBy("doc_id")
  }

  // lazy: interpolates Dedup.minhashLshSql across objects (init order)
  lazy val softDedupSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (${Dedup.minhashLshSql}) q),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT u FROM edges),
       |reach(u, v) AS (
       |  SELECT u, u FROM nodes
       |  UNION
       |  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
       |lab0 AS (SELECT u AS doc_id, min(v) AS cluster FROM reach GROUP BY u),
       |lab AS (
       |  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN lab0 l ON d.doc_id = l.doc_id),
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM lab GROUP BY cluster)
       |SELECT lab.doc_id, lab.cluster, sz.cluster_size,
       |  1.0 / sz.cluster_size AS weight,
       |  ${Hashes.md5Int32Sql("lab.doc_id::VARCHAR")} < 4294967296.0 / sz.cluster_size AS kept
       |FROM lab JOIN sz USING (cluster)
       |ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sm_soft_dedup" -> (softDedup _),
    "q_sm_kcenter" -> (kcenter _),
    "q_sm_weighted" -> (weighted _),
    "q_sm_temperature" -> (temperature _),
    "q_sm_systematic" -> (systematic _),
    "q_sm_group_sample" -> (groupSample _),
    "q_sm_hash_sample" -> (hashSample _),
    "q_sm_stratified" -> (stratified _),
    "q_sm_balanced" -> (balanced _),
    "q_sm_neyman" -> (neyman _),
    "q_sm_split" -> (split _),
    "q_sm_group_split" -> (groupSplit _),
    "q_sm_kfold" -> (kfold _),
    "q_sm_mixture" -> (mixture _),
    "q_sm_token_budget" -> (tokenBudget _),
    "q_sm_token_budget_bpe" -> (tokenBudgetBpe _))

  val oracles: Map[String, String] = Map(
    "q_sm_soft_dedup" -> softDedupSql,
    "q_sm_kcenter" -> kcenterSql,
    "q_sm_weighted" -> weightedSql,
    "q_sm_temperature" -> temperatureSql,
    "q_sm_systematic" -> systematicSql,
    "q_sm_group_sample" -> groupSampleSql,
    "q_sm_hash_sample" -> hashSampleSql,
    "q_sm_stratified" -> stratifiedSql,
    "q_sm_balanced" -> balancedSql,
    "q_sm_neyman" -> neymanSql,
    "q_sm_split" -> splitSql,
    "q_sm_group_split" -> groupSplitSql,
    "q_sm_kfold" -> kfoldSql,
    "q_sm_mixture" -> mixtureSql,
    "q_sm_token_budget" -> tokenBudgetSql,
    "q_sm_token_budget_bpe" -> tokenBudgetBpeSql)
}
