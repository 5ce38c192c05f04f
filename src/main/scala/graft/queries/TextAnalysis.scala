package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over the `documents` table — the per-document
  * scoring a training-data pipeline runs before filtering/dedup: token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  *
  * All pure column expressions (whole-stage codegen, no UDFs), so at
  * 100 TB they run as a single scan projection: no shuffle at all until
  * an aggregation/sort asks for one. Every query has an exact DuckDB
  * oracle; hash-sensitive arithmetic uses sequential `aggregate` folds
  * which both engines evaluate in identical order.
  */
object TextAnalysis {

  /** Whitespace tokenizer shared by the operators. Empty text → empty
    * array (a bare split would yield `[""]`). */
  private[queries] def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** The DuckDB twin parameterized by the column expression — callers
    * must never rewrite the constant via string replace (a future 'text'
    * substring elsewhere in the SQL would get silently mangled). */
  private[queries] def tokensSqlOf(colExpr: String): String =
    s"CASE WHEN length(trim($colExpr)) = 0 THEN [] ELSE string_split_regex(trim($colExpr), '\\s+') END"

  private[queries] val tokensSql = tokensSqlOf("text")

  // --- q_tx_token_count ---------------------------------------------------
  // Whitespace + BPE-ish subword counting. The BPE-ish estimate is
  // ceil(chars/4) per token summed — the standard "~4 chars per token"
  // proxy, computed without a tokenizer model.
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        aggregate(
          tokens(col("text")),
          lit(0L),
          (acc, t) => acc + ceil(length(t).cast("double") / 4).cast("long")
        ).as("n_subwords"),
        length(col("text")).as("len_chars"))
      .orderBy("doc_id")

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |  len($tokensSql) AS n_tokens,
       |  list_reduce(list_prepend(0::BIGINT, list_transform($tokensSql,
       |      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))), (acc, x) -> acc + x) AS n_subwords,
       |  length(text) AS len_chars
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // --- q_tx_quality -------------------------------------------------------
  // Length / punctuation / stopword-ratio quality scoring. Ratios are
  // double divisions of integer counts — deterministic across engines.
  private[queries] val stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("lang"),
        size(toks).as("n_tokens"),
        (length(col("text")).cast("double") / greatest(size(toks), lit(1)))
          .as("avg_token_len"),
        (size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
          greatest(size(toks), lit(1))).as("stopword_ratio"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
          greatest(length(col("text")), lit(1))).as("punct_ratio"))
      .orderBy("doc_id")
  }

  val qualityScoreSql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id, lang,
       |  len($tokensSql) AS n_tokens,
       |  length(text) / greatest(len($tokensSql), 1)::DOUBLE AS avg_token_len,
       |  len(list_filter($tokensSql, t -> list_contains($stopList, t)))
       |    / greatest(len($tokensSql), 1)::DOUBLE AS stopword_ratio,
       |  length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
       |    / greatest(length(text), 1)::DOUBLE AS punct_ratio
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // --- q_tx_langid --------------------------------------------------------
  // Character-n-gram language ID: score = occurrence count of marker
  // n-grams per language; argmax wins, ties broken by language name.
  // Occurrence counting via length-difference (needs no regex engine
  // agreement between Spark and DuckDB).
  private[queries] val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "er"),
    "de" -> Seq("sch", "ein"),
    "es" -> Seq("ción", "que"),
    "fr" -> Seq("eau", "oux"),
    "zh" -> Seq("的", "是"))

  private def occurrences(text: Column, pat: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(pat), ""))) /
      lit(pat.length)).cast("long")

  /** The langid argmax as a reusable column expression — the single
    * source of truth the kappa/eval queries and the curation funnel
    * (TrainPrep) all classify with. */
  private[queries] def langIdPred(text: Column): Column =
    array_max(array(markers.map { case (lang, pats) =>
      struct(
        pats.map(p => occurrences(text, p)).reduce(_ + _).as("score"),
        lit(lang).as("lang"))
    }: _*)).getField("lang")

  /** The DuckDB twin of [[langIdPred]] over an arbitrary text expr. */
  private[queries] def langIdPredSqlOf(t: String): String = {
    def occ(p: String) =
      s"(length($t) - length(replace($t, '$p', ''))) // ${p.length}"
    val structs = markers.map { case (lang, pats) =>
      s"{'score': ${pats.map(occ).mkString(" + ")}, 'lang': '$lang'}"
    }.mkString("[", ", ", "]")
    s"list_max($structs).lang"
  }

  /** [[langIdPredSqlOf]] over the `text` column (the common case). */
  private[queries] lazy val langIdPredSql: String = langIdPredSqlOf("text")

  def langId(s: SparkSession, d: String): DataFrame = {
    val scores = markers.map { case (lang, pats) =>
      struct(
        pats.map(p => occurrences(col("text"), p)).reduce(_ + _).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct(score, lang) = argmax with lexicographic
    // tie-break on the language code — same rule the oracle applies.
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("lang").as("true_lang"),
        array_max(array(scores: _*)).getField("lang").as("pred_lang"))
      .orderBy("doc_id")
  }

  val langIdSql: String = {
    def occ(p: String) =
      s"(length(text) - length(replace(text, '$p', ''))) // ${p.length}"
    val structs = markers.map { case (lang, pats) =>
      s"{'score': ${pats.map(occ).mkString(" + ")}, 'lang': '$lang'}"
    }.mkString("[", ", ", "]")
    s"""SELECT doc_id, lang AS true_lang,
       |  list_max($structs).lang AS pred_lang
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // --- q_tx_ctfidf ------------------------------------------------------------
  // CLASS-BASED TF-IDF (the BERTopic c-TF-IDF formulation): the top-5
  // tokens that CHARACTERIZE each source — tf_{s,w} · ln(1 + A/cf_w),
  // where cf_w is the token's corpus frequency and A the average
  // per-source token mass, so corpus-ubiquitous tokens are damped and
  // source-specific ones surface. This is the automatic topic-labeling
  // table a curation pipeline prints next to each crawl. Token counts
  // are ONE map-side-combinable aggregation; cf and A live at
  // vocabulary/corpus grain; ln quantizes at 1e-6 (the zipf/bm25
  // discipline) so the score is an exact integer product tf·l6 and the
  // per-source top-5 is a window over vocabulary-grain rows with a
  // deterministic (score, token) tie-break.
  def ctfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
    val tf = tok.groupBy("source", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // cf, A, and the scoring pass all read it
    val cf = tf.groupBy("w").agg(sum(col("tf")).as("cf"))
    val a = tf.groupBy("source").agg(sum(col("tf")).as("m"))
      .agg((sum(col("m")).cast("double") / count(lit(1)).cast("double"))
        .as("a"))
    val scored = tf.join(broadcast(cf), "w").crossJoin(broadcast(a))
      .withColumn("l6",
        round(log(lit(1.0) + col("a") / col("cf").cast("double")) * 1e6)
          .cast("long"))
      .withColumn("score_fixed", col("tf") * col("l6"))
    val w = Window.partitionBy("source")
      .orderBy(col("score_fixed").desc, col("w"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank"), col("w").as("token"), col("tf"),
        (col("score_fixed").cast("double") / 1e6).as("ctfidf"))
      .orderBy("source", "rank")
  }

  lazy val ctfidfSql: String =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT source, unnest($tokensSql) AS w FROM documents),
       |tf AS MATERIALIZED (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY 1, 2),
       |cf AS MATERIALIZED (
       |  SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
       |a AS MATERIALIZED (
       |  SELECT CAST(sum(m) AS BIGINT)::DOUBLE / count(*)::DOUBLE AS a
       |  FROM (SELECT source, CAST(sum(tf) AS BIGINT) AS m
       |        FROM tf GROUP BY 1)),
       |scored AS MATERIALIZED (
       |  SELECT tf.source, tf.w, tf.tf,
       |    tf.tf * CAST(round(ln(1.0 + a.a / cf.cf::DOUBLE) * 1e6) AS BIGINT)
       |      AS score_fixed
       |  FROM tf JOIN cf USING (w), a)
       |SELECT source, rank, w AS token, tf,
       |  score_fixed::DOUBLE / 1e6 AS ctfidf
       |FROM (
       |  SELECT source, w, tf, score_fixed,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY score_fixed DESC, w) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= 5
       |ORDER BY source, rank""".stripMargin

  // --- q_tx_burstiness --------------------------------------------------------
  // TOKEN BURSTINESS (Church–Gale): the Fano factor var/mean of a
  // token's per-document counts, zeros included — content words burst
  // (F ≫ 1: absent from most docs, repeated where present) while
  // function words stay near-Poisson (F ≈ 1). The dataset-card screen
  // that separates topical vocabulary from glue. Per-doc counts reduce
  // to the (token, doc) digest once; moments fold in N (the corpus doc
  // count) algebraically so zero-rows are never materialized:
  // F = (N·Q − S²)/(N·S) over exact BIGINTs with ONE double division.
  // Top-50 by corpus frequency via a TakeOrderedAndProject heap.
  def burstiness(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).as("nd"))
    val perDoc = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
    perDoc.groupBy("w")
      .agg(sum(col("c")).as("total"), count(lit(1)).as("df"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("q"))
      .crossJoin(broadcast(n))
      .select(col("w").as("token"), col("total"), col("df"),
        ((col("nd") * col("q") -
          (col("total").cast("decimal(38,0)") * col("total")))
          .cast("double") /
          (col("nd").cast("decimal(38,0)") * col("total")).cast("double"))
          .as("fano"))
      .orderBy(col("total").desc, col("token"))
      .limit(50)
  }

  lazy val burstinessSql: String =
    s"""WITH nd AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |per_doc AS MATERIALIZED (
       |  SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, unnest($tokensSql) AS w FROM documents)
       |  GROUP BY 1, 2),
       |m AS MATERIALIZED (
       |  SELECT w, CAST(sum(c) AS BIGINT) AS total,
       |    CAST(count(*) AS BIGINT) AS df,
       |    sum(CAST(c * c AS DECIMAL(38,0))) AS q
       |  FROM per_doc GROUP BY 1)
       |SELECT w AS token, total, df,
       |  CAST(nd.nd * m.q - CAST(m.total AS DECIMAL(38,0)) * m.total
       |    AS DOUBLE) /
       |  CAST(CAST(nd.nd AS DECIMAL(38,0)) * m.total AS DOUBLE) AS fano
       |FROM m, nd
       |ORDER BY total DESC, token
       |LIMIT 50""".stripMargin

  // --- q_tx_langid_eval -----------------------------------------------------
  // CONFUSION MATRIX + ACCURACY for the language-ID classifier against
  // the labeled corpus — the eval table every classifier in the
  // pipeline ships with (the probe has AUC/calibration; the langid
  // heuristic gets its cells here). One doc-grain aggregation to the
  // ≤|langs|² cell digest; accuracy is exact-integer correct/total
  // divided once and broadcast back onto the cells (every row carries
  // it, the q_sim_reliability ECE shape). Scale: scan + digest.
  def langIdEval(s: SparkSession, d: String): DataFrame = {
    val scores = markers.map { case (lang, pats) =>
      struct(
        pats.map(p => occurrences(col("text"), p)).reduce(_ + _).as("score"),
        lit(lang).as("lang"))
    }
    val pred = Tables.documents(s, d)
      .select(col("lang").as("true_lang"),
        array_max(array(scores: _*)).getField("lang").as("pred_lang"))
    val cells = pred.groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
    val acc = cells.agg(
      (sum(when(col("true_lang") === col("pred_lang"), col("n"))
        .otherwise(0L)).cast("double") / sum(col("n")).cast("double"))
        .as("accuracy"))
    cells.crossJoin(broadcast(acc))
      .select(col("true_lang"), col("pred_lang"), col("n"), col("accuracy"))
      .orderBy("true_lang", "pred_lang")
  }

  val langIdEvalSql: String = {
    def occ(p: String) =
      s"(length(text) - length(replace(text, '$p', ''))) // ${p.length}"
    val structs = markers.map { case (lang, pats) =>
      s"{'score': ${pats.map(occ).mkString(" + ")}, 'lang': '$lang'}"
    }.mkString("[", ", ", "]")
    s"""WITH pred AS MATERIALIZED (
       |  SELECT lang AS true_lang, list_max($structs).lang AS pred_lang
       |  FROM documents),
       |cells AS MATERIALIZED (
       |  SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM pred GROUP BY 1, 2),
       |acc AS MATERIALIZED (
       |  SELECT CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
       |      AS BIGINT)::DOUBLE
       |    / CAST(sum(n) AS BIGINT)::DOUBLE AS accuracy
       |  FROM cells)
       |SELECT true_lang, pred_lang, n, acc.accuracy AS accuracy
       |FROM cells, acc
       |ORDER BY true_lang, pred_lang""".stripMargin
  }

  // --- q_tx_diversity ----------------------------------------------------------
  // LEXICAL DIVERSITY per source — type-token ratio and Simpson's
  // repeat rate D = Σ n_w(n_w−1) / (N(N−1)): the probability two
  // randomly drawn tokens are the same type. The dataset-card pair
  // that separates template-stamped crawls (low TTR, high D) from
  // genuinely varied prose — the corpus-level complement of
  // q_tx_repetition's per-document screen. One explode + one
  // vocabulary-grain aggregation; the pair counts ride DECIMAL(38,0)
  // (n_w(n_w−1) is quadratic in token frequency) and each statistic is
  // a single fixed-order double division over exact integers.
  def diversity(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("n"))
    tf.groupBy("source")
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum((col("n") * (col("n") - 1)).cast("decimal(38,0)")).as("rep"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        (col("vocab").cast("double") / col("n_tokens").cast("double")).as("ttr"),
        when(col("n_tokens") > 1,
          col("rep").cast("double") /
            (col("n_tokens").cast("decimal(38,0)") * (col("n_tokens") - 1))
              .cast("double"))
          .otherwise(lit(0.0)).as("simpson"))
      .orderBy("source")
  }

  lazy val diversitySql: String =
    s"""WITH tf AS MATERIALIZED (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT source, unnest($tokensSql) AS w FROM documents)
       |  GROUP BY 1, 2),
       |m AS MATERIALIZED (
       |  SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS vocab,
       |    sum(CAST(n * (n - 1) AS DECIMAL(38,0))) AS rep
       |  FROM tf GROUP BY 1)
       |SELECT source, n_tokens, vocab,
       |  CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
       |  CASE WHEN n_tokens > 1
       |    THEN CAST(rep AS DOUBLE)
       |      / CAST(CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1) AS DOUBLE)
       |    ELSE 0.0 END AS simpson
       |FROM m
       |ORDER BY source""".stripMargin

  // --- q_tx_kappa -------------------------------------------------------------
  // COHEN'S KAPPA for the langid classifier — the chance-corrected
  // agreement scalar that complements q_tx_langid_eval's confusion
  // cells: accuracy alone flatters any classifier on a skewed label
  // mix, κ subtracts the agreement the marginals produce by chance.
  // po = Σ diag / n; pe = Σ_l row_l·col_l / n²; κ = (po − pe)/(1 − pe),
  // with the pe = 1 degenerate case (all mass in one cell) reported as
  // κ = 0 in both engines. Every count is an exact BIGINT from ONE
  // doc-grain aggregation to the ≤|langs|² digest; the marginal
  // product sum rides DECIMAL(38,0) so n ~ 10¹² corpora cannot
  // overflow; the three doubles are built with one fixed operand
  // order. Scale: scan + digest, like the eval table.
  def kappa(s: SparkSession, d: String): DataFrame = {
    val scores = markers.map { case (lang, pats) =>
      struct(
        pats.map(p => occurrences(col("text"), p)).reduce(_ + _).as("score"),
        lit(lang).as("lang"))
    }
    val cells = Tables.documents(s, d)
      .select(col("lang").as("true_lang"),
        array_max(array(scores: _*)).getField("lang").as("pred_lang"))
      .groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // totals, marginals, and the product read it
    val tot = cells.agg(sum(col("n")).as("nn"),
      sum(when(col("true_lang") === col("pred_lang"), col("n"))
        .otherwise(0L)).as("diag"))
    val rows = cells.groupBy("true_lang").agg(sum(col("n")).as("r"))
    val colsM = cells.groupBy("pred_lang").agg(sum(col("n")).as("c"))
    val pe = rows.join(colsM, rows("true_lang") === colsM("pred_lang"))
      .agg(coalesce(sum((col("r") * col("c")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("pec"))
    tot.crossJoin(pe)
      .select(col("nn").as("n"),
        (col("diag").cast("double") / col("nn").cast("double")).as("po"),
        (col("pec").cast("double") /
          (col("nn").cast("decimal(38,0)") * col("nn")).cast("double"))
          .as("pe"))
      .select(col("n"), col("po"), col("pe"),
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .otherwise(lit(0.0)).as("kappa"))
  }

  val kappaSql: String = {
    def occ(p: String) =
      s"(length(text) - length(replace(text, '$p', ''))) // ${p.length}"
    val structs = markers.map { case (lang, pats) =>
      s"{'score': ${pats.map(occ).mkString(" + ")}, 'lang': '$lang'}"
    }.mkString("[", ", ", "]")
    s"""WITH cells AS MATERIALIZED (
       |  SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT lang AS true_lang, list_max($structs).lang AS pred_lang
       |        FROM documents)
       |  GROUP BY 1, 2),
       |tot AS MATERIALIZED (
       |  SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
       |      AS BIGINT) AS diag
       |  FROM cells),
       |marg AS MATERIALIZED (
       |  SELECT coalesce(sum(CAST(r.r * c.c AS DECIMAL(38,0))),
       |      CAST(0 AS DECIMAL(38,0))) AS pec
       |  FROM (SELECT true_lang, CAST(sum(n) AS BIGINT) AS r
       |        FROM cells GROUP BY 1) r
       |  JOIN (SELECT pred_lang, CAST(sum(n) AS BIGINT) AS c
       |        FROM cells GROUP BY 1) c
       |    ON r.true_lang = c.pred_lang),
       |s AS MATERIALIZED (
       |  SELECT nn AS n,
       |    CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE) AS po,
       |    CAST(pec AS DOUBLE)
       |      / CAST(CAST(nn AS DECIMAL(38,0)) * nn AS DOUBLE) AS pe
       |  FROM tot, marg)
       |SELECT n, po, pe,
       |  CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe) ELSE 0.0 END AS kappa
       |FROM s""".stripMargin
  }

  // --- q_tx_textrank ------------------------------------------------------------
  // TEXTRANK keyword extraction (Mihalcea & Tarau 2004 — public): the
  // graph-centrality companion of RAKE. Content tokens (length ≥ 4)
  // become nodes; ADJACENT content-token pairs become undirected
  // weighted edges (corpus co-occurrence counts); 3 damped power-
  // iteration rounds over the weighted graph score each word, top-20
  // win. Unlike tf/c-TF-IDF, a word scores high for being adjacent to
  // OTHER high-scoring words — the recommendation-by-association that
  // makes TextRank robust to raw frequency skew. Numerics follow the
  // PageRank discipline exactly: contributions quantize at 1e12 into
  // exact integers, sum in DECIMAL(38,0), rebuild as doubles with one
  // fixed operand order, and the DuckDB twin replays every round as a
  // MATERIALIZED CTE chain. Scale: adjacency derives from one lead()
  // window over token positions (no self-join), rounds are edge-grain
  // joins against the vocabulary-grain rank vector, and the top-20 is
  // a TakeOrderedAndProject heap.
  private val TrRounds = 3
  private val TrMinLen = 4

  def textrank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "w")
    val wd0 = Window.partitionBy("doc_id").orderBy("pos")
    val adj = tk.withColumn("w2", lead(col("w"), 1).over(wd0))
      .filter(col("w2").isNotNull &&
        length(col("w")) >= TrMinLen && length(col("w2")) >= TrMinLen &&
        col("w") =!= col("w2"))
    val und = adj
      .groupBy(least(col("w"), col("w2")).as("lo"),
        greatest(col("w"), col("w2")).as("hi"))
      .agg(count(lit(1)).as("wt"))
    val e = und.select(col("lo").as("src"), col("hi").as("dst"), col("wt"))
      .unionAll(und.select(col("hi").as("src"), col("lo").as("dst"), col("wt")))
      .localCheckpoint()
    val wdeg = e.groupBy("src").agg(sum(col("wt")).as("wdg"))
      .localCheckpoint()
    // The rank vector and degree table are VOCABULARY-grain — sublinear
    // in corpus size (Heaps' law), so broadcasting them into the
    // edge-grain round joins is the correct strategy at every scale,
    // and the explicit hint makes it plan-DETERMINISTIC: left to AQE
    // the demotion happened at runtime and whether the state-side
    // exchange had already been submitted was a scheduling race (the
    // fingerprint flipped 12↔13 exchanges run to run). Each round now
    // statically plans exactly one exchange, the dst-grain aggregation.
    var r = wdeg.select(col("src").as("word"), lit(1.0).as("v"))
    for (_ <- 1 to TrRounds) {
      val contrib = e.join(broadcast(wdeg), "src")
        .join(broadcast(r), e("src") === r("word"))
        .select(col("dst"),
          round(col("v") * (col("wt").cast("double") / col("wdg").cast("double"))
            * lit(1e12)).cast("long").cast("decimal(38,0)").as("q"))
        .groupBy("dst").agg(sum(col("q")).as("sq"))
      r = wdeg.select(col("src").as("word"))
        .join(broadcast(contrib), col("word") === col("dst"), "left")
        .select(col("word"),
          (lit(0.15) + lit(0.85) *
            (coalesce(col("sq"), lit(0).cast("decimal(38,0)")).cast("double")
              / lit(1e12))).as("v"))
        .localCheckpoint()
    }
    r.orderBy(col("v").desc, col("word")).limit(20)
      .select(col("word"), col("v").as("score"))
  }

  lazy val textrankSql: String = {
    val rounds = (1 to TrRounds).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS MATERIALIZED (
         |  SELECT e.dst,
         |    sum(CAST(CAST(round(r.v * (e.wt::DOUBLE / w.wdg::DOUBLE) * 1e12)
         |      AS BIGINT) AS DECIMAL(38,0))) AS sq
         |  FROM e JOIN wdeg w USING (src) JOIN $prev r ON r.word = e.src
         |  GROUP BY e.dst),
         |r$i AS MATERIALIZED (
         |  SELECT w.src AS word,
         |    0.15 + 0.85 * (CAST(coalesce(c.sq, CAST(0 AS DECIMAL(38,0)))
         |      AS DOUBLE) / 1e12) AS v
         |  FROM wdeg w LEFT JOIN c$i c ON c.dst = w.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT unnest(list_zip(toks, toks[2:])) AS p
       |  FROM (SELECT $tokensSql AS toks FROM documents)),
       |adj AS MATERIALIZED (
       |  SELECT struct_extract(p, 1) AS w, struct_extract(p, 2) AS w2
       |  FROM pairs
       |  WHERE struct_extract(p, 2) IS NOT NULL
       |    AND length(struct_extract(p, 1)) >= $TrMinLen
       |    AND length(struct_extract(p, 2)) >= $TrMinLen
       |    AND struct_extract(p, 1) <> struct_extract(p, 2)),
       |und AS MATERIALIZED (
       |  SELECT least(w, w2) AS lo, greatest(w, w2) AS hi,
       |    CAST(count(*) AS BIGINT) AS wt
       |  FROM adj GROUP BY 1, 2),
       |e AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst, wt FROM und
       |  UNION ALL SELECT hi AS src, lo AS dst, wt FROM und),
       |wdeg AS MATERIALIZED (
       |  SELECT src, CAST(sum(wt) AS BIGINT) AS wdg FROM e GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT src AS word, 1.0 AS v FROM wdeg),
       |$rounds
       |SELECT word, v AS score FROM r$TrRounds
       |ORDER BY score DESC, word LIMIT 20""".stripMargin
  }

  // --- q_tx_fingerprint ---------------------------------------------------
  // Polynomial rolling hash over token stream (content-defined document
  // fingerprint): h = fold(h*31 + md5_32(token) mod p). Token-level, so
  // whitespace-normalization-invariant; sequential fold in both engines.
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        aggregate(
          tokens(col("text")),
          lit(0L),
          (acc, t) => pmod(acc * 31 + Hashes.md5Int32(t), lit(2147483647L)))
          .as("fingerprint"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    s"""SELECT doc_id,
       |  list_reduce(list_prepend(0::BIGINT, list_transform($tokensSql,
       |      t -> ${Hashes.md5Int32Sql("t")})),
       |    (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // --- q_tx_clean ---------------------------------------------------------
  // Canonical text normalization before dedup/tokenization: lowercase,
  // strip non-alphanumerics to spaces, collapse runs, trim. Regexes use
  // only character classes that Java (Spark) and RE2 (DuckDB) interpret
  // identically. Pure projection — at 100 TB this is IO-bound.
  def clean(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("clean_text"))
      .withColumn("clean_len", length(col("clean_text")))
      .orderBy("doc_id")

  val cleanSql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |       ' +', ' ', 'g')) AS clean_text,
      |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |       ' +', ' ', 'g'))) AS clean_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // --- q_tx_redact --------------------------------------------------------
  // PII scrubbing: mask email-like and long-digit-run (phone/account)
  // patterns, and count what was masked per doc — the audit metric a
  // redaction stage must emit. Patterns stick to RE2-safe syntax (no
  // backrefs/lookaround) so both engines match identical spans.
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val DigitsRe = "[0-9]{7,}"

  def redact(s: SparkSession, d: String): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(col("text"), EmailRe, "<EMAIL>"), DigitsRe, "<NUM>")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        redacted.as("redacted_text"),
        (size(split(col("text"), EmailRe, -1)) - 1).as("n_emails"),
        (size(split(regexp_replace(col("text"), EmailRe, "<EMAIL>"), DigitsRe, -1)) - 1)
          .as("n_numbers"))
      .orderBy("doc_id")
  }

  val redactSql: String = {
    val email = EmailRe // RE2-safe; same literal works in both dialects
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
       |    '$DigitsRe', '<NUM>', 'g') AS redacted_text,
       |  len(string_split_regex(text, '$email')) - 1 AS n_emails,
       |  len(string_split_regex(regexp_replace(text, '$email', '<EMAIL>', 'g'),
       |    '$DigitsRe')) - 1 AS n_numbers
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // --- q_tx_repetition ----------------------------------------------------
  // Repetition-based quality signals (the Gopher/MassiveText family):
  // fraction of bigram OCCURRENCES that are repeats of an earlier bigram
  // in the same doc, and the share of the single most frequent bigram.
  // Templated/boilerplate/spam docs score high on both; a filter stage
  // thresholds them. Docs with < 2 tokens have no bigrams and drop out.
  //
  // Fully relational: posexplode + one per-doc window builds the bigram
  // stream (same shape as the shingle pipeline), then two nested
  // map-side-combinable aggregations — no collected lists, no HOFs on
  // the hot path, so the shape survives arbitrarily large corpora.
  def repetition(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bi = tok
      .withColumn("nxt", lead("tok", 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("s"))
    bi.groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("total"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
      .select(col("doc_id"),
        col("total").as("n_bigrams"),
        ((col("total") - col("n_distinct")).cast("double") / col("total"))
          .as("dup_bigram_frac"),
        (col("top_c").cast("double") / col("total")).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  val repetitionSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |bi AS (
       |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS s
       |  FROM t, unnest(generate_series(1, len(toks) - 1)) g(i)),
       |pg AS (SELECT doc_id, s, count(*) AS c FROM bi GROUP BY doc_id, s)
       |SELECT doc_id,
       |  sum(c)::BIGINT AS n_bigrams,
       |  (sum(c) - count(*)) / sum(c)::DOUBLE AS dup_bigram_frac,
       |  max(c) / sum(c)::DOUBLE AS top_bigram_frac
       |FROM pg GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // --- q_tx_drift -----------------------------------------------------------
  // TOKEN-DISTRIBUTION DRIFT between two corpus slices — the monitoring
  // screen a pipeline runs between ingest batches ("did the vocabulary
  // shift?"). Slices are the stable halves (doc_id parity — in
  // production, yesterday vs today). Per token the two-sample
  // chi-square-style statistic (c1·N2 − c2·N1)² / ((c1+c2)·N1·N2)
  // compares relative frequencies without ever forming them: the
  // cross-product difference is an EXACT integer (the
  // cross-multiplication discipline), cast to double ONCE and only
  // then squared — squaring in BIGINT would overflow Long at
  // |diff| > ~3e9 (Spark wraps silently, DuckDB raises, engines
  // diverge), whereas the double square of the same exact integer is
  // bit-identical in both engines. Headroom after the fix is the
  // inner products themselves: exact while n1·n2 < 2^63, i.e. each
  // half-corpus under ~3e9 total tokens. Tokens below a df floor are
  // dropped (rare-token noise dominates chi-square), the top 50
  // drifted tokens emit with dense ranks tie-broken on token. One
  // token-grain aggregation, one top-k — no joins wider than the
  // vocabulary.
  private val DriftMinCount = 5L
  private val DriftTopK = 50

  def drift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val counts = tok
      .groupBy("w")
      .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("c2"))
      .filter(col("c1") + col("c2") >= DriftMinCount)
    val tot = counts.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val diff =
      (col("c1") * col("n2") - col("c2") * col("n1")).cast("double")
    val scored = counts.crossJoin(broadcast(tot))
      .select(col("w"), col("c1"), col("c2"),
        (diff * diff /
          ((col("c1") + col("c2")) * col("n1") * col("n2")).cast("double"))
          .as("drift_stat"))
    // top-k FIRST (TakeOrderedAndProject — per-partition heaps + driver
    // merge, never a single-partition global window over the vocabulary);
    // the dense rank is then a window over the k surviving rows only
    val topk = scored
      .orderBy(col("drift_stat").desc, col("w"))
      .limit(DriftTopK)
    topk
      .withColumn("rank", row_number().over(
        Window.orderBy(col("drift_stat").desc, col("w"))).cast("bigint"))
      .select("rank", "w", "c1", "c2", "drift_stat")
      .orderBy("rank")
  }

  val driftSql: String =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, unnest($tokensSql) AS w FROM documents),
       |counts AS MATERIALIZED (
       |  SELECT w,
       |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
       |  FROM tok GROUP BY w
       |  HAVING c1 + c2 >= $DriftMinCount),
       |tot AS MATERIALIZED (
       |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
       |  FROM counts),
       |scored AS MATERIALIZED (
       |  SELECT w, c1, c2,
       |    ((c1 * n2 - c2 * n1)::DOUBLE * (c1 * n2 - c2 * n1)::DOUBLE)
       |      / ((c1 + c2) * n1 * n2)::DOUBLE AS drift_stat
       |  FROM counts, tot)
       |SELECT rank, w, c1, c2, drift_stat FROM (
       |  SELECT w, c1, c2, drift_stat,
       |    CAST(row_number() OVER (ORDER BY drift_stat DESC, w) AS BIGINT)
       |      AS rank
       |  FROM scored)
       |WHERE rank <= $DriftTopK
       |ORDER BY rank""".stripMargin

  // --- q_tx_corpus_stats --------------------------------------------------
  // Dataset-card rollup per (lang, source) slice: doc and distinct-text
  // counts (the exact-dup rate), token and char totals, mean doc size.
  // Every published corpus ships this table; at 100 TB it is one
  // map-side-combinable aggregation pass — the only heavyweight column
  // is the exact distinct-text count, which shuffles 16-byte digests
  // (never the texts); swap approx_count_distinct for its sketch when an
  // estimate is acceptable. Ratios are double divisions of exact BIGINTs
  // — deterministic across engines.
  def corpusStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        sum(size(tokens(col("text")))).as("total_tokens"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_docs"))
          .as("dup_frac"),
        col("total_tokens"), col("total_chars"),
        (col("total_chars").cast("double") / col("n_docs")).as("avg_chars"))
      .orderBy("lang", "source")

  val corpusStatsSql: String =
    s"""SELECT lang, source,
       |  count(*) AS n_docs,
       |  count(DISTINCT md5(text)) AS n_distinct,
       |  1.0 - count(DISTINCT md5(text)) / count(*)::DOUBLE AS dup_frac,
       |  sum(len($tokensSql))::BIGINT AS total_tokens,
       |  sum(length(text))::BIGINT AS total_chars,
       |  sum(length(text)) / count(*)::DOUBLE AS avg_chars
       |FROM documents
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin

  // --- q_tx_quality_trim --------------------------------------------------
  // Percentile-threshold curation: drop the worst decile per language by
  // punctuation ratio — the standard "trim the tail of the quality
  // distribution" step, expressed with percent_rank so the cut adapts to
  // each language's own distribution instead of a global magic constant.
  // The (ratio, doc_id) ordering makes ranks tie-free and the cut
  // deterministic in both engines (percent_rank = (rank-1)/(n-1) in
  // each). One window over a lang-keyed shuffle; at 100 TB this is the
  // same shape as any per-key ranking — no global sort, no collect.
  def qualityTrim(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val punct =
      (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
        greatest(length(col("text")), lit(1))).as("punct_ratio")
    val w = Window.partitionBy("lang").orderBy(col("punct_ratio"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), punct)
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= 0.9)
      .select(col("doc_id"), col("lang"), col("punct_ratio"), col("pr"))
      .orderBy("doc_id")
  }

  val qualityTrimSql: String =
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
      |      / greatest(length(text), 1)::DOUBLE AS punct_ratio
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, lang, punct_ratio,
      |    percent_rank() OVER (PARTITION BY lang ORDER BY punct_ratio, doc_id) AS pr
      |  FROM scored)
      |SELECT doc_id, lang, punct_ratio, pr
      |FROM ranked WHERE pr <= 0.9
      |ORDER BY doc_id""".stripMargin

  // --- q_tx_phrase ----------------------------------------------------------
  // EXACT PHRASE SEARCH over a positional token stream — the retrieval
  // primitive BM25 term matching cannot express (BM25 sees bags of
  // words; "new york times" ≠ {new, york, times}). The positional
  // inverted index is the relational posexplode + window-lead trigram
  // stream WITHOUT the distinct (every occurrence, overlapping
  // included); the query set is the corpus's own top-5 trigrams by
  // document frequency, read from the STAGED distinct shingle table
  // (tie-broken by phrase text — deterministic at every SF). Matching
  // is a broadcast semi-pattern: 5 phrases join the occurrence stream
  // scan-side, then one (phrase, doc) count. At 100 TB the index build
  // is the same scan-shaped pass the shingle stage already pays, the
  // phrase probe touches only colliding trigrams, and nothing shuffles
  // except the matched (phrase, doc) digest rows. Oracle: DuckDB
  // rebuilds trigram occurrences via list subscripts.
  private val PhraseTopK = 5

  def phrase(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = Text.shingleRows(s, d)
      .groupBy("s").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("s")).limit(PhraseTopK)
      .select("s")
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val occurrences = tok
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("s"))
    occurrences.join(broadcast(top), "s")
      .groupBy("s", "doc_id").agg(count(lit(1)).as("occurrences"))
      .select(col("s").as("phrase"), col("doc_id"), col("occurrences"))
      .orderBy("phrase", "doc_id")
  }

  lazy val phraseSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, $tokensSql AS t FROM documents),
       |tri AS MATERIALIZED (
       |  SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS s
       |  FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)),
       |dfq AS MATERIALIZED (
       |  SELECT s, count(*) AS df
       |  FROM (SELECT DISTINCT doc_id, s FROM tri) GROUP BY s),
       |top AS MATERIALIZED (
       |  SELECT s FROM dfq ORDER BY df DESC, s LIMIT $PhraseTopK)
       |SELECT t.s AS phrase, t.doc_id,
       |  CAST(count(*) AS BIGINT) AS occurrences
       |FROM tri t JOIN top USING (s)
       |GROUP BY 1, 2
       |ORDER BY phrase, doc_id""".stripMargin

  // --- q_tx_rake ------------------------------------------------------------
  // RAKE KEYPHRASE EXTRACTION (Rose et al. 2010, public) — the
  // unsupervised keyword step of a curation pipeline: candidate
  // phrases are the maximal stopword-free token runs (the corpus's
  // own 'a'/'the' function words are the delimiters), each word
  // scores deg/freq over the candidate-phrase co-occurrence graph,
  // and a phrase scores the sum of its member words. The one numeric
  // subtlety: RAKE's phrase score is a SUM of word ratios, and a sum
  // of doubles is aggregation-order-dependent — so word scores are
  // QUANTIZED to exact integer micros (deg·10⁶ DIV freq, truncating
  // — floor ≡ truncate for positive operands in both engines) and
  // the phrase sum is a BIGINT, order-free and bit-identical
  // cross-engine. Phrase identity is its text (same words ⇒ same
  // score), so the corpus-level rollup is a hash aggregation and the
  // top-20 is a TakeOrderedAndProject, never a global sort. Scale:
  // phrase ids are per-doc windows (doc-partitioned), word stats are
  // vocabulary-sized and broadcast back; the members digest is
  // checkpointed once for its three consumers.
  private val RakeStops = Seq("a", "the")
  private val RakeTopK = 20

  def rake(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("is_stop", col("w").isin(RakeStops: _*))
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    // clustered ONCE on the phrase key and pinned with cache() — an
    // InMemoryRelation PRESERVES hash partitioning where localCheckpoint
    // erases it (the labelprop lesson), so the two (doc_id, pid)
    // aggregations and both phrase-key joins below plan ZERO exchanges:
    // the word-grain rows shuffle once here instead of four times.
    val members = tk
      .withColumn("pid", sum(when(col("is_stop"), 1L).otherwise(0L)).over(wDoc))
      .filter(!col("is_stop"))
      .select("doc_id", "pid", "pos", "w")
      .repartition(col("doc_id"), col("pid"))
      .cache()
    val phrases = members.groupBy("doc_id", "pid")
      .agg(count(lit(1)).as("plen"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"))
    // both phrase-key joins are MERGE-hinted: the sides are already
    // co-partitioned off the cached repartition (zero exchange, local
    // sorts only), and phrase-grain data GROWS with the corpus — AQE
    // would happily demote these to runtime broadcasts at this SF,
    // which is the wrong 100× plan AND a per-pass fingerprint coin-flip
    // (the same static-say-what-you-mean lesson as the pagerank fix)
    val wordScores = members
      .join(phrases.select("doc_id", "pid", "plen").hint("merge"),
        Seq("doc_id", "pid"))
      .groupBy("w").agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("score_u", expr("deg * 1000000 DIV freq"))
    val phraseScores = members
      .join(broadcast(wordScores.select("w", "score_u")), "w")
      .groupBy("doc_id", "pid").agg(sum(col("score_u")).as("score_micros"))
    phrases.join(phraseScores.hint("merge"), Seq("doc_id", "pid"))
      .groupBy("phrase")
      .agg(max(col("plen")).as("n_words"), count(lit(1)).as("n_occurrences"),
        max(col("score_micros")).as("score_micros"))
      .withColumn("score", col("score_micros").cast("double") / 1000000.0)
      .orderBy(col("score_micros").desc, col("phrase"))
      .limit(RakeTopK)
  }

  lazy val rakeSql: String = {
    val stops = RakeStops.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, $tokensSql AS t FROM documents),
       |tk AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, t[i] AS w,
       |    CASE WHEN t[i] IN ($stops) THEN 1 ELSE 0 END AS is_stop
       |  FROM toks, unnest(generate_series(1, len(t))) g(i)),
       |mem AS MATERIALIZED (
       |  SELECT doc_id, pos, w, pid FROM (
       |    SELECT doc_id, pos, w, is_stop,
       |      sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
       |    FROM tk) WHERE is_stop = 0),
       |ph AS MATERIALIZED (
       |  SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen,
       |    string_agg(w, ' ' ORDER BY pos) AS phrase
       |  FROM mem GROUP BY doc_id, pid),
       |ws AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |    CAST(sum(plen) AS BIGINT) AS deg
       |  FROM mem JOIN ph USING (doc_id, pid) GROUP BY w),
       |wsc AS MATERIALIZED (
       |  SELECT w, CAST(deg * 1000000 // freq AS BIGINT) AS score_u FROM ws),
       |ps AS MATERIALIZED (
       |  SELECT doc_id, pid, CAST(sum(score_u) AS BIGINT) AS score_micros
       |  FROM mem JOIN wsc USING (w) GROUP BY doc_id, pid)
       |SELECT ph.phrase, max(ph.plen) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  max(score_micros) AS score_micros,
       |  CAST(max(score_micros) AS DOUBLE) / 1000000.0 AS score
       |FROM ph JOIN ps USING (doc_id, pid)
       |GROUP BY ph.phrase
       |ORDER BY score_micros DESC, phrase LIMIT $RakeTopK""".stripMargin
  }

  // --- q_tx_heaps -----------------------------------------------------------
  // VOCABULARY GROWTH CURVE (Heaps'-law table): cumulative distinct
  // token types vs cumulative token occurrences at 10 doc_id-range
  // checkpoints — the table behind "how much new vocabulary does the
  // next corpus slice buy", i.e. tokenizer vocab sizing and corpus
  // saturation checks. Everything is one exact-integer shape: a
  // token's contribution point is its FIRST document (min doc_id per
  // type — one aggregation, no cumulative-distinct scan), checkpoint
  // buckets are integer range arithmetic off the max doc_id (no global
  // row_number), and the cumulative sums run over the 10-row checkpoint
  // digest. The type-token ratio divides exact integers in double
  // space. Scale: two scan-shaped aggregations (per-type min, per-
  // bucket counts) — the corpus text never reaches an exchange.
  def heaps(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val mx = docs.agg(max(col("doc_id")).as("maxd"))
    val base = docs.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("(doc_id * 10) DIV (maxd + 1) + 1"))
    val bucketAgg = base.groupBy("bucket")
      .agg(count(lit(1)).as("docs"), sum(size(col("toks"))).as("toks_n"))
    val newTypes = base.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("tok").agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(mx))
      .select(expr("(fd * 10) DIV (maxd + 1) + 1").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketAgg.join(newTypes, Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .select(col("bucket"),
        sum(col("docs")).over(w).as("docs_cum"),
        sum(col("toks_n")).over(w).as("tokens_cum"),
        sum(col("new_types")).over(w).as("types_cum"),
        col("new_types"))
      .withColumn("ttr",
        col("types_cum").cast("double") / col("tokens_cum").cast("double"))
      .orderBy("bucket")
  }

  lazy val heapsSql: String =
    s"""WITH docs AS MATERIALIZED (
       |  SELECT doc_id, $tokensSql AS toks FROM documents),
       |mx AS MATERIALIZED (SELECT max(doc_id) AS maxd FROM docs),
       |base AS MATERIALIZED (
       |  SELECT doc_id, toks, (doc_id * 10) // (maxd + 1) + 1 AS bucket
       |  FROM docs, mx),
       |bucket_agg AS MATERIALIZED (
       |  SELECT bucket, count(*) AS docs,
       |    CAST(sum(len(toks)) AS BIGINT) AS toks_n
       |  FROM base GROUP BY 1),
       |occ AS MATERIALIZED (
       |  SELECT unnest(toks) AS tok, doc_id FROM base),
       |first_occ AS MATERIALIZED (
       |  SELECT tok, min(doc_id) AS fd FROM occ GROUP BY 1),
       |new_t AS MATERIALIZED (
       |  SELECT (fd * 10) // (maxd + 1) + 1 AS bucket,
       |    CAST(count(*) AS BIGINT) AS new_types
       |  FROM first_occ, mx GROUP BY 1),
       |cum AS MATERIALIZED (
       |  SELECT b.bucket,
       |    CAST(sum(b.docs) OVER (ORDER BY b.bucket) AS BIGINT) AS docs_cum,
       |    CAST(sum(b.toks_n) OVER (ORDER BY b.bucket) AS BIGINT) AS tokens_cum,
       |    CAST(sum(coalesce(n.new_types, 0)) OVER (ORDER BY b.bucket) AS BIGINT)
       |      AS types_cum,
       |    CAST(coalesce(n.new_types, 0) AS BIGINT) AS new_types
       |  FROM bucket_agg b LEFT JOIN new_t n USING (bucket))
       |SELECT bucket, docs_cum, tokens_cum, types_cum, new_types,
       |  types_cum::DOUBLE / tokens_cum::DOUBLE AS ttr
       |FROM cum ORDER BY bucket""".stripMargin

  // --- q_tx_ngram_top -----------------------------------------------------
  // Corpus-wide top-k vocabulary extraction: the 100 most frequent word
  // bigrams with document frequencies — the table behind tokenizer
  // audits and boilerplate detection. The bigram stream is the same
  // relational posexplode+lead shape as the shingle pipeline; both
  // counts map-side combine, and the final top-k is a
  // TakeOrderedAndProject heap over the aggregated vocabulary (never a
  // global sort of all n-grams). Ordering (count desc, bigram) is
  // tie-free per bigram.
  def ngramTop(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    tok
      .withColumn("nxt", lead("tok", 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("bigram"))
      .limit(100)
  }

  // --- q_tx_npmi ------------------------------------------------------------
  // NPMI COLLOCATIONS — the statistically-principled upgrade of
  // q_tx_ngram_top: raw bigram counts surface "of the"; normalized
  // pointwise mutual information surfaces pairs that co-occur FAR more
  // than their unigram frequencies predict (the standard collocation /
  // multi-word-expression extractor for tokenizer and vocab work).
  // npmi(x,y) = ln(N·c_xy / (c_x·c_y)) / −ln(c_xy / N) over the bigram
  // table's own marginals, support-filtered (c_xy ≥ 5 kills the
  // one-off noise PMI is notorious for). Cross-engine exactness: both
  // ln() results quantize at 1e-6 into exact integers (the
  // theil/zipf discipline), so npmi is ONE division of two exact
  // longs. All digest grain after the bigram count: marginals and
  // total derive from the bigram digest itself, joined back broadcast.
  private val NpmiMinSupport = 5L

  def npmi(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bi = tok
      .withColumn("nxt", lead("tok", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("tok").as("x"), col("nxt").as("y"))
      .agg(count(lit(1)).as("c_xy"))
      .localCheckpoint() // marginals + total + the scored rows read it
    val mx = bi.groupBy("x").agg(sum(col("c_xy")).cast("long").as("c_x"))
    val my = bi.groupBy("y").agg(sum(col("c_xy")).cast("long").as("c_y"))
    val n = bi.agg(sum(col("c_xy")).cast("long").as("n_bigrams"))
    // cast BEFORE the multiply (matching the oracle): c_xy·N and
    // c_x·c_y are corpus-squared grain — long×long overflows under ANSI
    val pmiQ = round(log(
      (col("c_xy").cast("decimal(38,0)") * col("n_bigrams")).cast("double") /
        (col("c_x").cast("decimal(38,0)") * col("c_y")).cast("double")) * 1e6)
      .cast("long")
    val selfQ = round(log(col("c_xy").cast("double") /
      col("n_bigrams").cast("double")) * 1e6).cast("long")
    bi.filter(col("c_xy") >= NpmiMinSupport)
      .join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(n))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        (pmiQ.cast("double") / -selfQ.cast("double")).as("npmi"))
      .orderBy(col("npmi").desc, col("x"), col("y"))
      .limit(50)
  }

  val npmiSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |bi AS MATERIALIZED (
       |  SELECT toks[i] AS x, toks[i+1] AS y, CAST(count(*) AS BIGINT) AS c_xy
       |  FROM t, unnest(generate_series(1, len(toks) - 1)) g(i)
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM bi GROUP BY 1),
       |my AS MATERIALIZED (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y FROM bi GROUP BY 1),
       |n AS MATERIALIZED (SELECT CAST(sum(c_xy) AS BIGINT) AS n_bigrams FROM bi),
       |scored AS MATERIALIZED (
       |  SELECT bi.x, bi.y, bi.c_xy, mx.c_x, my.c_y,
       |    CAST(round(ln(CAST(CAST(bi.c_xy AS DECIMAL(38,0)) * n.n_bigrams AS DOUBLE)
       |        / CAST(CAST(mx.c_x AS DECIMAL(38,0)) * my.c_y AS DOUBLE)) * 1e6) AS BIGINT)::DOUBLE
       |    / -CAST(round(ln(CAST(bi.c_xy AS DOUBLE)
       |        / CAST(n.n_bigrams AS DOUBLE)) * 1e6) AS BIGINT)::DOUBLE AS npmi
       |  FROM bi
       |  JOIN mx ON mx.x = bi.x
       |  JOIN my ON my.y = bi.y
       |  CROSS JOIN n
       |  WHERE bi.c_xy >= $NpmiMinSupport)
       |SELECT x, y, c_xy, c_x, c_y, npmi
       |FROM scored
       |ORDER BY npmi DESC, x, y
       |LIMIT 50""".stripMargin

  val ngramTopSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |bi AS (
       |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
       |  FROM t, unnest(generate_series(1, len(toks) - 1)) g(i))
       |SELECT bigram, count(*) AS n_occurrences,
       |  count(DISTINCT doc_id) AS n_docs
       |FROM bi
       |GROUP BY bigram
       |ORDER BY n_occurrences DESC, bigram
       |LIMIT 100""".stripMargin

  // --- q_tx_nfc -------------------------------------------------------------
  // Unicode NFC normalization through the custom codegen expression
  // (`functions/TextExpressions.NfcNormalize` — the §2.10 answer to a
  // scalar op Spark lacks: a native Expression, not a boxing UDF). The
  // corpus is ASCII, where NFC is the identity, so the row DIRTIES a
  // deterministic third of the docs with decomposed sequences
  // (e + U+0301 combining acute) before normalizing; NFC composes them
  // back to precomposed é, shrinking char length by one per mark. The
  // oracle runs DuckDB's nfc_normalize over the identically-dirtied
  // text — both engines implement the same Unicode canonical
  // composition, so prefix strings and char counts hash-match exactly;
  // a pass-through (or over-eager) implementation breaks pre/post
  // lengths, a wrong composition breaks the prefix bytes.
  def nfc(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions
    val dirty = when(col("doc_id") % 3 === 0,
      regexp_replace(col("text"), "e", "e\u0301"))
      .otherwise(col("text"))
    Tables.documents(s, d)
      .withColumn("dirty", dirty)
      .withColumn("norm", TextFunctions.nfcNormalize(col("dirty")))
      .select(col("doc_id"),
        length(col("dirty")).as("pre_chars"),
        length(col("norm")).as("post_chars"),
        substring(col("norm"), 1, 40).as("norm_prefix"))
      .orderBy("doc_id")
  }

  val nfcSql: String =
    """WITH dirtied AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0
      |      THEN regexp_replace(text, 'e', 'e' || chr(769), 'g')
      |      ELSE text END AS dirty
      |  FROM documents)
      |SELECT doc_id,
      |  length(dirty)::INT AS pre_chars,
      |  length(nfc_normalize(dirty))::INT AS post_chars,
      |  substr(nfc_normalize(dirty), 1, 40) AS norm_prefix
      |FROM dirtied
      |ORDER BY doc_id""".stripMargin

  // --- q_tx_cdc_chunks ------------------------------------------------------
  // Content-defined chunking + cross-doc shared-passage detection: a
  // token closes a chunk when its hash lands in 1/16 of the hash space
  // (avg ~16-token chunks), so chunk boundaries depend only on CONTENT —
  // insert a sentence at the front and every later boundary re-aligns,
  // which fixed-size windows cannot do. The passage-level complement of
  // whole-doc dedup: a copy-pasted paragraph inside otherwise-different
  // docs shows up as a shared chunk digest. Chunking is per-document
  // LOCAL and runs as one scan-side HOF fold (struct accumulator:
  // completed chunks + current run) — no window, no token shuffle; only
  // (doc, chunk_fp) digests reach the exchange, and the final aggregate
  // is digest-grain. The oracle replays the identical boundary rule via
  // a windowed cumulative boundary count — different formulation, same
  // semantics, which is the point of the cross-engine check.
  private val CdcMod = 16

  /** The per-document chunk array (scan-side HOF fold) — shared by the
    * driver row and the insertion-stability property spec. */
  private[graft] def cdcChunkArray(text: Column): Column = {
    val zero = struct(
      array().cast("array<string>").as("done"),
      array().cast("array<string>").as("cur"))
    aggregate(
      tokens(text),
      zero,
      (acc, t) => {
        val cur2 = concat(acc.getField("cur"), array(t))
        when(Hashes.md5Int32(t) % CdcMod === 0,
          struct(
            concat(acc.getField("done"), array(concat_ws(" ", cur2))).as("done"),
            array().cast("array<string>").as("cur")))
          .otherwise(struct(acc.getField("done").as("done"), cur2.as("cur")))
      },
      acc => when(size(acc.getField("cur")) > 0,
        concat(acc.getField("done"), array(concat_ws(" ", acc.getField("cur")))))
        .otherwise(acc.getField("done")))
  }

  def cdcChunks(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"), explode(cdcChunkArray(col("text"))).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("chunk_fp"))
      .groupBy("chunk_fp")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy("chunk_fp")
  }

  val cdcChunksSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, i, toks[i] AS t
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents),
       |       unnest(generate_series(1, len(toks))) g(i)),
       |marked AS (
       |  SELECT doc_id, i, t,
       |    CASE WHEN ${Hashes.md5Int32Sql("t")} % $CdcMod = 0 THEN 1 ELSE 0 END AS b
       |  FROM tok),
       |chunked AS (
       |  SELECT doc_id, i, t,
       |    COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
       |  FROM marked),
       |chunks AS (
       |  SELECT doc_id, md5(string_agg(t, ' ' ORDER BY i)) AS chunk_fp
       |  FROM chunked GROUP BY doc_id, chunk_id)
       |SELECT chunk_fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM chunks
       |GROUP BY chunk_fp
       |HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY chunk_fp""".stripMargin

  // --- q_tx_bigram_coherence ------------------------------------------------
  // Statistical quality scoring — the relational analog of the
  // perplexity filter every LLM curation pipeline runs (CCNet-style):
  // score each document by how PREDICTABLE its word sequence is under a
  // bigram model trained on the corpus itself. Per document, coherence =
  // the average conditional probability P(w2|w1) = C(w1,w2)/C(w1·) over
  // its bigram OCCURRENCES (prefix mass C(w1·) sums bigram counts, so
  // probabilities per prefix sum to exactly 1). Gibberish and boilerplate
  // separate cleanly: random token soup scores near 1/vocab, templated
  // text near 1. Cross-engine determinism: each probability is one exact
  // int/int division (bit-identical), rounded to 1e-6 fixed point so the
  // per-doc SUM is exact integer arithmetic in any order (the k-means
  // M-step convention); the final mean divides exact ints in double
  // space.
  //
  // 100 TB shape: the bigram stream is a scan-side Generate (posexplode
  // + lead, doc-grain window); the model tables are VOCABULARY-sized
  // (Zipf: ≪ corpus — C(w1,w2) and its w1 rollup), so the two
  // probability joins shuffle the bigram stream on short token keys,
  // never documents; at larger scale the join keys become 8-byte token
  // digests and the model broadcasts when it fits. In production the
  // model trains ONCE on a clean held-out corpus and is a broadcast
  // artifact; training it on the scored corpus itself (done here) is
  // the bootstrap round.
  def bigramCoherence(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "w1")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val big = tok
      .withColumn("w2", lead("w1", 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w1"), col("w2"))
    val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val pc = bc.groupBy("w1").agg(sum(col("c12")).as("c1"))
    big.join(bc, Seq("w1", "w2")).join(pc, Seq("w1"))
      .select(col("doc_id"),
        round(col("c12").cast("double") / col("c1").cast("double") * 1000000.0)
          .cast("long").as("p_fixed"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_fixed").cast("decimal(38,0)")).as("sum_fixed"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_fixed").cast("double") / 1000000.0
          / col("n_bigrams").cast("double")).as("coherence"))
      .orderBy("doc_id")
  }

  val bigramCoherenceSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, g.i AS pos, t[g.i] AS w1, t[g.i + 1] AS w2
       |  FROM (SELECT doc_id, ${tokensSqlOf("text")} AS t FROM documents),
       |       unnest(generate_series(1, len(t) - 1)) g(i)),
       |big AS (SELECT doc_id, w1, w2 FROM tok),
       |bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
       |pc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1),
       |px AS (
       |  SELECT b.doc_id,
       |    CAST(round(bc.c12::DOUBLE / pc.c1::DOUBLE * 1000000.0) AS BIGINT) AS p_fixed
       |  FROM big b
       |  JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
       |  JOIN pc ON b.w1 = pc.w1)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  sum(p_fixed)::DOUBLE / 1000000.0 / count(*)::DOUBLE AS coherence
       |FROM px
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // --- q_tx_bigram_broadcast ------------------------------------------------
  // The SKEW-HARDENED form of q_tx_bigram_coherence, and CCNet's actual
  // model shape: the vocabulary truncates to the top [[VocabTopK]]
  // tokens (ties broken by token — a total order), everything else maps
  // to <unk>, and the conditional-probability model over the truncated
  // vocab BROADCASTS into the scoring join. The coherence row's
  // full-vocab design shuffle-joins the bigram stream on w1 — on a web
  // corpus that key is stop-word-skewed ("the" carries percent-level
  // mass) and the join partition for it hot-spots; here the model is
  // bounded by (K+1)² rows by construction, so BOTH scoring joins (the
  // vocab membership probe and the probability lookup) are broadcast
  // hash joins: the bigram stream never shuffles on a token key at
  // all. Remaining exchanges are the doc-grain window/aggregation and
  // the map-side-combined model build (≤ (K+1)² rows per partition
  // reach the wire). Training on the scored corpus itself is the same
  // bootstrap round as the coherence row; the model trains once and is
  // a broadcast artifact in production. Same fixed-point arithmetic,
  // so the oracle — which models the same truncation — hash-matches.
  private val VocabTopK = 64

  def bigramBroadcast(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "w")
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(VocabTopK)
      .select(col("w"), lit(true).as("in_vocab"))
    val mapped = tok
      .join(broadcast(vocab), Seq("w"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("in_vocab").isNotNull, col("w")).otherwise(lit("<unk>")).as("wm"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    // localCheckpoint: the bigram stream feeds BOTH the model build and
    // the scoring join — without pinning, the tokenize + explode +
    // window stage recomputes per consumer (the q_dd_ngram_jaccard
    // checkpointed-shingle-reuse pattern)
    val big = mapped
      .withColumn("w2m", lead("wm", 1).over(win))
      .filter(col("w2m").isNotNull)
      .select(col("doc_id"), col("wm").as("w1m"), col("w2m"))
      .localCheckpoint()
    val bc = big.groupBy("w1m", "w2m").agg(count(lit(1)).as("c12"))
    val pc = bc.groupBy("w1m").agg(sum(col("c12")).as("c1"))
    val model = bc.join(broadcast(pc), Seq("w1m"))
      .select(col("w1m"), col("w2m"),
        round(col("c12").cast("double") / col("c1").cast("double") * 1000000.0)
          .cast("long").as("p_fixed"))
    big.join(broadcast(model), Seq("w1m", "w2m"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_fixed").cast("decimal(38,0)")).as("sum_fixed"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_fixed").cast("double") / 1000000.0
          / col("n_bigrams").cast("double")).as("coherence"))
      .orderBy("doc_id")
  }

  // --- q_tx_trigram_backoff -------------------------------------------------
  // A TRIGRAM language model with STUPID BACKOFF (Brants et al. 2007) —
  // the web-scale LM quality filter: score = trigram relative frequency
  // when the trigram was seen in training, else 0.4 × the bigram
  // relative frequency, else 0.4² × the unigram frequency. The model
  // TRAINS on half the corpus (even doc_ids) and SCORES the other half
  // — the split is what makes the backoff branches load-bearing (a
  // same-corpus bootstrap would hit the trigram level on every token
  // and the backoff chain would be dead code). All three model levels
  // are bounded by the truncated vocab ((K+1)³/(K+1)²/(K+1) rows) so
  // every scoring join BROADCASTS — the token stream never shuffles on
  // a token key (the q_tx_bigram_broadcast skew lesson); remaining
  // exchanges are doc-grain windows/aggregations and the map-side-
  // combined model builds. Ratios divide exact integer counts; the 0.4
  // backoff factors multiply as doubles in one order on both engines;
  // per-token scores fix at 1e6 before the doc-grain sum. Per-level
  // hit counts ride the output, pinning branch routing in the hash.
  def trigramBackoff(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "w")
    val trainTok = tok.filter(col("doc_id") % 2 === 0)
    val vocab = trainTok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(VocabTopK)
      .select(col("w"), lit(true).as("in_vocab"))
    def mapped(t: DataFrame) = t.join(broadcast(vocab), Seq("w"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("in_vocab").isNotNull, col("w")).otherwise(lit("<unk>")).as("wm"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    // the training token stream feeds three model levels — pin it once
    val trainMapped = mapped(trainTok).localCheckpoint()
    val c123 = trainMapped
      .withColumn("w2", lead("wm", 1).over(win))
      .withColumn("w3", lead("wm", 2).over(win))
      .filter(col("w3").isNotNull)
      .groupBy(col("wm").as("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))
    val c12 = c123.groupBy("w1", "w2").agg(sum("c123").as("c12"))
    val triM = c123.join(broadcast(c12), Seq("w1", "w2"))
      .select(col("w1").as("t1"), col("w2").as("t2"), col("w3").as("t3"),
        (col("c123").cast("double") / col("c12").cast("double")).as("tri_r"))
    val cb12 = trainMapped
      .withColumn("w2", lead("wm", 1).over(win))
      .filter(col("w2").isNotNull)
      .groupBy(col("wm").as("w1"), col("w2"))
      .agg(count(lit(1)).as("cb12"))
    val cb1 = cb12.groupBy("w1").agg(sum("cb12").as("cb1"))
    val biM = cb12.join(broadcast(cb1), Seq("w1"))
      .select(col("w1").as("b1"), col("w2").as("b2"),
        (col("cb12").cast("double") / col("cb1").cast("double")).as("bi_r"))
    val cuTotal = trainMapped.count()
    val uniM = trainMapped.groupBy(col("wm").as("u1"))
      .agg(count(lit(1)).as("cu"))
      .select(col("u1"),
        (col("cu").cast("double") / lit(cuTotal.toDouble)).as("uni_r"))
    val scoreTris = mapped(tok.filter(col("doc_id") % 2 === 1))
      .withColumn("w2", lead("wm", 1).over(win))
      .withColumn("w3", lead("wm", 2).over(win))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"), col("wm").as("w1"), col("w2"), col("w3"))
    val lvl = when(col("tri_r").isNotNull, lit(3))
      .when(col("bi_r").isNotNull, lit(2)).otherwise(lit(1))
    val score = when(col("tri_r").isNotNull, col("tri_r"))
      .when(col("bi_r").isNotNull, lit(0.4) * col("bi_r"))
      .otherwise(lit(0.4) * lit(0.4) * coalesce(col("uni_r"), lit(0.0)))
    scoreTris
      .join(broadcast(triM), col("w1") === col("t1") &&
        col("w2") === col("t2") && col("w3") === col("t3"), "left")
      .join(broadcast(biM), col("w2") === col("b1") &&
        col("w3") === col("b2"), "left")
      .join(broadcast(uniM), col("w3") === col("u1"), "left")
      .select(col("doc_id"), lvl.as("lvl"),
        round(score * 1000000.0).cast("long").as("s_fixed"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_hit3"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_hit2"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_hit1"),
        sum(col("s_fixed").cast("decimal(38,0)")).as("sum_fixed"))
      .select(col("doc_id"), col("n_tri"), col("n_hit3"), col("n_hit2"),
        col("n_hit1"),
        (col("sum_fixed").cast("double") / 1000000.0
          / col("n_tri").cast("double")).as("lm_score"))
      .orderBy("doc_id")
  }

  // --- q_tx_lm_filter -------------------------------------------------------
  // CCNet-style PERPLEXITY BUCKETING (Wenzek et al. 2020, public): the
  // trained trigram stupid-backoff LM scores the held-out half, and
  // docs split per LANGUAGE into head/middle/tail TERTILES of LM score
  // — the standard "keep head+middle, drop tail" web-curation gate,
  // here emitted with the bucket label so the downstream mix can
  // weight tiers. Composes q_tx_trigram_backoff unchanged (same model,
  // same scores — one pipeline, two serving shapes). Tertiles use the
  // explicit integer formula (rn−1)·3 div n_lang over a per-lang
  // window (NOT ntile, whose remainder-distribution rules would have
  // to be trusted to match across engines) — partitioned by lang, so
  // the sort is shard-local at scale.
  def lmFilter(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = trigramBackoff(s, d)
      .select(col("doc_id"), col("lm_score"))
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy("lang")
      .orderBy(col("lm_score").desc, col("doc_id"))
    val wn = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("n_lang", count(lit(1)).over(wn))
      .withColumn("tier", expr("(rn - 1) * 3 DIV n_lang + 1"))
      .select(col("doc_id"), col("lang"), col("lm_score"),
        col("tier"),
        when(col("tier") === 1L, "head").when(col("tier") === 2L, "middle")
          .otherwise("tail").as("bucket"),
        (col("tier") < 3L).as("admitted"))
      .orderBy("doc_id")
  }

  lazy val lmFilterSql: String =
    s"""WITH lm AS MATERIALIZED (${trigramBackoffSql.replace("ORDER BY doc_id", "")}),
       |scored AS MATERIALIZED (
       |  SELECT lm.doc_id, lm.lm_score, d.lang
       |  FROM lm JOIN documents d USING (doc_id)),
       |ranked AS MATERIALIZED (
       |  SELECT doc_id, lang, lm_score,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY lm_score DESC, doc_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
       |  FROM scored)
       |SELECT doc_id, lang, lm_score,
       |  (rn - 1) * 3 // n_lang + 1 AS tier,
       |  CASE (rn - 1) * 3 // n_lang + 1 WHEN 1 THEN 'head'
       |       WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       |  (rn - 1) * 3 // n_lang + 1 < 3 AS admitted
       |FROM ranked
       |ORDER BY doc_id""".stripMargin

  val trigramBackoffSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, g.i AS pos, t[g.i] AS w
       |  FROM (SELECT doc_id, ${tokensSqlOf("text")} AS t FROM documents),
       |       unnest(generate_series(1, len(t))) g(i)),
       |vocab AS (
       |  SELECT w FROM (
       |    SELECT w, count(*) AS c FROM tok WHERE doc_id % 2 = 0 GROUP BY w
       |    ORDER BY c DESC, w LIMIT $VocabTopK)),
       |tm AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN w IN (SELECT w FROM vocab) THEN w ELSE '<unk>' END AS wm
       |  FROM tok WHERE doc_id % 2 = 0),
       |tri AS (
       |  SELECT w1, w2, w3, count(*) AS c123 FROM (
       |    SELECT wm AS w1,
       |      lead(wm, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
       |      lead(wm, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
       |    FROM tm) WHERE w3 IS NOT NULL GROUP BY 1, 2, 3),
       |tri12 AS (SELECT w1, w2, sum(c123) AS c12 FROM tri GROUP BY 1, 2),
       |trim_ AS (
       |  SELECT t.w1 AS t1, t.w2 AS t2, t.w3 AS t3,
       |    t.c123::DOUBLE / p.c12::DOUBLE AS tri_r
       |  FROM tri t JOIN tri12 p ON t.w1 = p.w1 AND t.w2 = p.w2),
       |bi AS (
       |  SELECT w1, w2, count(*) AS cb12 FROM (
       |    SELECT wm AS w1,
       |      lead(wm, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |    FROM tm) WHERE w2 IS NOT NULL GROUP BY 1, 2),
       |bi1 AS (SELECT w1, sum(cb12) AS cb1 FROM bi GROUP BY 1),
       |bim AS (
       |  SELECT b.w1 AS b1, b.w2 AS b2, b.cb12::DOUBLE / p.cb1::DOUBLE AS bi_r
       |  FROM bi b JOIN bi1 p ON b.w1 = p.w1),
       |unim AS (
       |  SELECT wm AS u1,
       |    count(*)::DOUBLE / (SELECT count(*)::DOUBLE FROM tm) AS uni_r
       |  FROM tm GROUP BY wm),
       |sc AS (
       |  SELECT doc_id, w1, w2, w3 FROM (
       |    SELECT doc_id, wm AS w1,
       |      lead(wm, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
       |      lead(wm, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
       |    FROM (
       |      SELECT doc_id, pos,
       |        CASE WHEN w IN (SELECT w FROM vocab) THEN w ELSE '<unk>' END AS wm
       |      FROM tok WHERE doc_id % 2 = 1)) WHERE w3 IS NOT NULL),
       |px AS (
       |  SELECT s.doc_id,
       |    CASE WHEN t.tri_r IS NOT NULL THEN 3
       |         WHEN b.bi_r IS NOT NULL THEN 2 ELSE 1 END AS lvl,
       |    CAST(round((CASE WHEN t.tri_r IS NOT NULL THEN t.tri_r
       |      WHEN b.bi_r IS NOT NULL THEN 0.4::DOUBLE * b.bi_r
       |      ELSE 0.4::DOUBLE * 0.4::DOUBLE * COALESCE(u.uni_r, 0.0::DOUBLE)
       |      END) * 1000000.0) AS BIGINT) AS s_fixed
       |  FROM sc s
       |  LEFT JOIN trim_ t ON s.w1 = t.t1 AND s.w2 = t.t2 AND s.w3 = t.t3
       |  LEFT JOIN bim b ON s.w2 = b.b1 AND s.w3 = b.b2
       |  LEFT JOIN unim u ON s.w3 = u.u1)
       |SELECT doc_id, count(*) AS n_tri,
       |  CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit3,
       |  CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit2,
       |  CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit1,
       |  sum(s_fixed)::DOUBLE / 1000000.0 / count(*)::DOUBLE AS lm_score
       |FROM px
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  val bigramBroadcastSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, g.i AS pos, t[g.i] AS w
       |  FROM (SELECT doc_id, ${tokensSqlOf("text")} AS t FROM documents),
       |       unnest(generate_series(1, len(t))) g(i)),
       |vocab AS (
       |  SELECT w FROM (
       |    SELECT w, count(*) AS c FROM tok GROUP BY w
       |    ORDER BY c DESC, w LIMIT $VocabTopK)),
       |m AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN w IN (SELECT w FROM vocab) THEN w ELSE '<unk>' END AS wm
       |  FROM tok),
       |big AS (
       |  SELECT doc_id, w1m, w2m FROM (
       |    SELECT doc_id, wm AS w1m,
       |      lead(wm) OVER (PARTITION BY doc_id ORDER BY pos) AS w2m
       |    FROM m) WHERE w2m IS NOT NULL),
       |bc AS (SELECT w1m, w2m, count(*) AS c12 FROM big GROUP BY 1, 2),
       |pc AS (SELECT w1m, sum(c12) AS c1 FROM bc GROUP BY 1),
       |px AS (
       |  SELECT b.doc_id,
       |    CAST(round(bc.c12::DOUBLE / pc.c1::DOUBLE * 1000000.0) AS BIGINT) AS p_fixed
       |  FROM big b
       |  JOIN bc ON b.w1m = bc.w1m AND b.w2m = bc.w2m
       |  JOIN pc ON b.w1m = pc.w1m)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  sum(p_fixed)::DOUBLE / 1000000.0 / count(*)::DOUBLE AS coherence
       |FROM px
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // --- q_tx_heavy_hitters ---------------------------------------------------
  // Vocabulary heavy hitters by SKETCH — the 100 TB form of
  // q_tx_ngram_top: the exact row aggregates the FULL vocabulary
  // (every distinct token is a group) before truncating, which is
  // exactly the thing that doesn't fit at web scale. The Misra–Gries
  // aggregate ([[graft.functions.HeavyHitters]]) holds HhK counters
  // total — O(k) state per stage, map-side combinable, merge-safe —
  // and guarantees every token with true frequency > N/HhK surfaces,
  // each estimate within [true − N/HhK, true]. The estimates themselves
  // depend on merge order by construction (no cross-engine oracle), so
  // the verified surface is the GUARANTEE: for every token whose exact
  // count exceeds N/HhK, it surfaced in the sketch AND its estimate
  // sits inside the Misra–Gries envelope — two booleans a literal-TRUE
  // DuckDB twin turns into hash breaks on any violation (the r13
  // `no_oracle` exemption tightened into a bounded pass; the planted-
  // key property stays in BoundedCollectSpec). The exact counts ride
  // along as the cross-engine-verified anchor, and it's the SKETCH
  // side (≤ HhK rows) that broadcasts into the audit join, never the
  // full-vocabulary exact side.
  private val HhK = 64

  def heavyHittersQ(s: SparkSession, d: String): DataFrame = {
    import graft.functions.HeavyHittersFunctions.heavyHitters
    val tok = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .localCheckpoint() // sketch + exact both read the token stream
    // one pass builds (N, sketch); N rides a 1-row crossJoin so a heavy
    // token the sketch MISSED still carries it (a left-join n_total
    // would null out exactly the rows the coverage check must catch)
    val agg1 = tok
      .agg(count(lit(1)).as("n_total"), heavyHitters(col("tok"), HhK).as("hh"))
      .localCheckpoint()
    val sketch = agg1.select(explode(col("hh")).as("e"))
      .select(col("e.item").as("token"), col("e.est").as("est_count"))
    val exact = tok.groupBy(col("tok").as("token"))
      .agg(count(lit(1)).as("exact_count"))
    exact.crossJoin(broadcast(agg1.select(col("n_total"))))
      .join(broadcast(sketch), Seq("token"), "left")
      .filter(col("exact_count") * HhK > col("n_total"))
      .select(col("token"), col("exact_count"),
        col("est_count").isNotNull.as("surfaced"),
        (col("est_count").isNotNull &&
          col("est_count") <= col("exact_count") &&
          col("est_count") * HhK >= col("exact_count") * HhK - col("n_total"))
          .as("within_bound"))
      .orderBy("token")
  }

  val heavyHittersSql: String =
    s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |tok AS (SELECT unnest(toks) AS token FROM t),
       |e AS (SELECT token, count(*) AS exact_count FROM tok GROUP BY token),
       |n AS (SELECT count(*) AS n_total FROM tok)
       |SELECT token, exact_count, true AS surfaced, true AS within_bound
       |FROM e, n
       |WHERE exact_count * $HhK > n_total
       |ORDER BY token""".stripMargin

  // --- q_tx_bm25 ----------------------------------------------------------
  // Lexical retrieval — the missing modality next to the vector-ANN
  // family (Similarity.scala): BM25 (Robertson et al., the public
  // Okapi formula) scoring a query SET against the corpus, top-10 docs
  // per query. The relational shape is the inverted-index probe: tf /
  // doc-length / df are one-scan digests of the exploded term stream,
  // the query-term list is a BROADCAST dimension (queries are always
  // dimension-sized), so scoring touches only the candidate postings
  // (rows of tf whose term appears in some query) — never all
  // (doc × query) pairs — and the per-query top-10 is a bounded
  // window. At 100 TB: one corpus scan to build digests (amortized
  // across every query batch if staged), then work proportional to
  // postings-of-query-terms. (On a natural corpus the postings of a
  // query term are a sliver of the corpus; this synthetic corpus has a
  // ~31-term vocabulary so every posting list is dense — the plan
  // shape, not the selectivity, is what transfers.)
  //
  // Cross-engine parity: BM25's IDF needs ln(), whose BITS are not
  // portable across engines (the HLL lesson, Analytics.scala). Both
  // sides quantize idf AND the rational tf-saturation to 1e6 quanta
  // (round-to-long), then rank on the EXACT integer sum of products —
  // a last-ulp ln() disagreement flips a quantum only if the true
  // value sits within ~1e-10 of a rounding boundary. Query terms are
  // data-derived (the 9 highest-df terms, 3 terms per query — a total
  // (df desc, term) order), so both engines construct identical
  // queries with no literal corpus knowledge baked in.
  private val BmK1 = 1.2
  private val BmB = 0.75

  def bm25(s: SparkSession, d: String): DataFrame =
    bm25Ranked(s, d)
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"),
        (col("score_fixed").cast("double") / lit(1e12)).as("score"))
      .orderBy("query_id", "rank")

  /** The ranked BM25 spine shared by [[bm25]] and [[hybridRrf]]:
    * (query_id, doc_id, score_fixed, n_terms, rank), unlimited. */
  private def bm25Ranked(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // pinned: tf feeds df/stats here plus dl and the scoring join in
    // bm25Score — five consumers; unpinned, each re-ran the token
    // explode + (doc, term) aggregation over the raw text
    val tf = bm25Tf(docs).localCheckpoint()
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = tf.agg(sum("tf").as("tok_total"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
    bm25Score(tf, dfT, stats)
  }

  /** Per-(doc, term) frequency digest — the only stage that touches raw
    * text. */
  private def bm25Tf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** BM25 scoring off the index DIGESTS (tf + df + corpus stats) — the
    * consumer both the full build and the incremental merge feed. `dl`
    * derives from tf (one digest-grain aggregation). */
  private def bm25Score(tf: DataFrame, dfT: DataFrame,
                        stats: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val band = dfT.crossJoin(broadcast(stats))
    val wq = Window.orderBy(col("df").desc, col("term"))
    val qt = band.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= 9)
      .withColumn("query_id", expr("CAST((rn - 1) DIV 3 AS BIGINT)"))
      .select("query_id", "term", "df", "n_docs", "tok_total")
    val avgdl = col("tok_total").cast("double") / col("n_docs").cast("double")
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val sat = (tfD * lit(1.0 + BmK1)) /
      (tfD + lit(BmK1) *
        (lit(1.0) - lit(BmB) + lit(BmB) * (col("dl").cast("double") / avgdl)))
    val contrib = round(idf * lit(1e6)).cast("long") *
      round(sat * lit(1e6)).cast("long")
    val agg = tf.join(broadcast(qt), "term").join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"), contrib.as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score_fixed"), count(lit(1)).as("n_terms"))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("score_fixed").desc, col("doc_id"))
    agg.withColumn("rank", row_number().over(wr))
  }

  /** The BM25 CTE spine (through ranked `rk`), shared by the bm25 and
    * hybrid oracles. */
  private val bm25CtesSql: String =
    s"""terms AS MATERIALIZED (
       |  SELECT doc_id, unnest(${tokensSqlOf("lower(text)")}) AS term
       |  FROM documents),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |dl AS MATERIALIZED (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |dft AS MATERIALIZED (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |st AS MATERIALIZED (
       |  SELECT (SELECT sum(tf) FROM tf) AS tok_total,
       |         (SELECT count(*) FROM documents) AS n_docs),
       |band AS MATERIALIZED (
       |  SELECT term, df, n_docs, tok_total FROM dft, st),
       |qt AS MATERIALIZED (
       |  SELECT CAST((rn - 1) // 3 AS BIGINT) AS query_id, term, df,
       |    n_docs, tok_total
       |  FROM (SELECT term, df, n_docs, tok_total,
       |          row_number() OVER (ORDER BY df DESC, term) AS rn FROM band)
       |  WHERE rn <= 9),
       |sc AS MATERIALIZED (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(round(ln(1.0 + (CAST(q.n_docs AS DOUBLE) - CAST(q.df AS DOUBLE)
       |        + 0.5) / (CAST(q.df AS DOUBLE) + 0.5)) * 1e6) AS BIGINT)
       |    * CAST(round((CAST(tf.tf AS DOUBLE) * ${1.0 + BmK1}) /
       |        (CAST(tf.tf AS DOUBLE) + $BmK1 * (1.0 - $BmB + $BmB *
       |          (CAST(dl.dl AS DOUBLE) /
       |            (CAST(q.tok_total AS DOUBLE) / CAST(q.n_docs AS DOUBLE)))))
       |        * 1e6) AS BIGINT) AS contrib
       |  FROM tf JOIN qt q USING (term) JOIN dl USING (doc_id)),
       |agg AS MATERIALIZED (
       |  SELECT query_id, doc_id, sum(contrib) AS score_fixed,
       |    count(*) AS n_terms
       |  FROM sc GROUP BY 1, 2),
       |rk AS MATERIALIZED (SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score_fixed DESC, doc_id) AS rank
       |  FROM agg)""".stripMargin

  val bm25Sql: String =
    s"""WITH $bm25CtesSql
       |SELECT query_id, rank, doc_id, n_terms,
       |  CAST(score_fixed AS DOUBLE) / 1e12 AS score
       |FROM rk WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // --- q_tx_bm25_incr -----------------------------------------------------
  // INCREMENTAL index maintenance for the BM25 digests — the production
  // update path: when a tick lands new documents, only THEIR text is
  // tokenized; the standing index merges relationally — tf/dl append
  // (per-doc digests of disjoint doc sets), df adds term-wise (one
  // full-outer join + sum at term grain), corpus totals add as scalars.
  // Scoring then runs off the merged digests through the exact same
  // arithmetic as q_tx_bm25, and the ORACLE is the full recompute
  // (bm25Sql verbatim) — the hash match IS the proof that
  // merge(old, tick) ≡ rebuild(corpus), the q_ag_incr_merge contract
  // applied to a retrieval index. At 100 TB this is the difference
  // between re-tokenizing the corpus per tick and O(tick) work plus
  // digest-grain merges.
  def bm25Incr(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val oldDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 5 === 0) // the landed tick
    // pinned like bm25Ranked's tf: each digest has three consumers
    // below (tf union, df add, corpus totals) plus bm25Score's reads
    val tfOld = bm25Tf(oldDocs).localCheckpoint()
    val tfNew = bm25Tf(newDocs).localCheckpoint()
    // tf: pure append (doc sets disjoint by construction)
    val tf = tfOld.unionByName(tfNew)
    // df: term-wise add of the two digests — never re-derived from tf
    val dfM = tfOld.groupBy("term").agg(count(lit(1)).as("df_o"))
      .join(tfNew.groupBy("term").agg(count(lit(1)).as("df_n")),
        Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_o"), lit(0L)) + coalesce(col("df_n"), lit(0L)))
          .as("df"))
    // corpus totals: scalar adds
    val stats = tfOld.agg(sum("tf").as("to_o"))
      .crossJoin(tfNew.agg(sum("tf").as("to_n")))
      .crossJoin(oldDocs.agg(count(lit(1)).as("nd_o")))
      .crossJoin(newDocs.agg(count(lit(1)).as("nd_n")))
      .select(
        (coalesce(col("to_o"), lit(0L)) + coalesce(col("to_n"), lit(0L)))
          .as("tok_total"),
        (col("nd_o") + col("nd_n")).as("n_docs"))
    bm25Score(tf, dfM, stats)
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"),
        (col("score_fixed").cast("double") / lit(1e12)).as("score"))
      .orderBy("query_id", "rank")
  }

  // --- q_tx_hybrid_rrf ----------------------------------------------------
  // Hybrid retrieval: the lexical (BM25) and semantic (embedding
  // cosine) lists fused with reciprocal-rank fusion (Cormack et al.
  // 2009, the public RRF formula, k = 60). The semantic query vector
  // has no model in this corpus, so it is built by PSEUDO-RELEVANCE
  // FEEDBACK — the elementwise mean of the BM25 top-3 docs' embeddings
  // (Rocchio's classic trick): fully data-derived, so both engines
  // construct identical query vectors. Shapes at 100 TB: the BM25 spine
  // is digest-grain; the 3-vector centroid build is three
  // dimension-sized joins; the cosine pass is the brute-ANN scan with
  // the centroid BROADCAST (swap in the IVF path for selectivity); RRF
  // itself is a full-outer join of two top-10 lists per query —
  // dimension-sized by construction. Parity: centroid arithmetic is a
  // fixed-order elementwise fold, cosine the sequential dot fold, and
  // the RRF sum two coalesced divisions in fixed order — bit-identical
  // in both engines; ties break on doc_id everywhere.
  private val RrfK = 60.0

  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = bm25Ranked(s, d).localCheckpoint()
    val lex = ranked.filter(col("rank") <= 10)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def prfVec(r: Int) = ranked.filter(col("rank") === r)
      .join(e, col("doc_id") === col("vec_id"))
      .select(col("query_id"), col("v").as(s"v$r"))
    val cent = prfVec(1).join(prfVec(2), "query_id").join(prfVec(3), "query_id")
      .select(col("query_id"),
        transform(
          zip_with(zip_with(col("v1"), col("v2"), _ + _), col("v3"), _ + _),
          x => x / lit(3.0)).as("qv"))
    val ws = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("doc_id"))
    val sem = e.crossJoin(broadcast(cent))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        graft.queries.Vectors.cosine(col("v"), col("qv")).as("cos"))
      .withColumn("sem_rank", row_number().over(ws))
      .filter(col("sem_rank") <= 10)
      .select("query_id", "doc_id", "sem_rank")
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank").cast("double")), lit(0.0)))
    val wf = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= 10)
      .select("query_id", "rank", "doc_id", "lex_rank", "sem_rank", "rrf")
      .orderBy("query_id", "rank")
  }

  val hybridRrfSql: String =
    s"""WITH $bm25CtesSql,
       |lex AS MATERIALIZED (
       |  SELECT query_id, doc_id, rank AS lex_rank FROM rk WHERE rank <= 10),
       |e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |c1 AS MATERIALIZED (SELECT query_id, embedding AS v1
       |  FROM rk JOIN e ON doc_id = vec_id WHERE rank = 1),
       |c2 AS MATERIALIZED (SELECT query_id, embedding AS v2
       |  FROM rk JOIN e ON doc_id = vec_id WHERE rank = 2),
       |c3 AS MATERIALIZED (SELECT query_id, embedding AS v3
       |  FROM rk JOIN e ON doc_id = vec_id WHERE rank = 3),
       |cent AS MATERIALIZED (
       |  SELECT c1.query_id,
       |    list_transform(generate_series(1, len(v1)),
       |      i -> (v1[i]::DOUBLE + v2[i]::DOUBLE + v3[i]::DOUBLE) / 3.0) AS qv
       |  FROM c1 JOIN c2 USING (query_id) JOIN c3 USING (query_id)),
       |sem AS MATERIALIZED (
       |  SELECT query_id, doc_id, sem_rank FROM (
       |    SELECT cent.query_id, e.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY cent.query_id ORDER BY
       |        ${graft.queries.Vectors.cosineSql("e.embedding", "cent.qv")} DESC,
       |        e.vec_id) AS sem_rank
       |    FROM e, cent)
       |  WHERE sem_rank <= 10),
       |fused AS MATERIALIZED (
       |  SELECT query_id, doc_id, lex_rank, sem_rank,
       |    COALESCE(1.0 / ($RrfK + CAST(lex_rank AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / ($RrfK + CAST(sem_rank AS DOUBLE)), 0.0) AS rrf
       |  FROM lex FULL OUTER JOIN sem USING (query_id, doc_id))
       |SELECT query_id, rank, doc_id, lex_rank, sem_rank, rrf FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
       |  FROM fused)
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // --- q_tx_dsir ----------------------------------------------------------
  // DSIR-STYLE IMPORTANCE RESAMPLING (Xie et al. 2023, public paper) —
  // select raw-corpus documents whose hashed-unigram distribution
  // looks most like a TARGET domain: the standard domain-targeted
  // data-selection operator beside the perplexity filter
  // (q_tx_lm_filter ranks by fluency under ONE model; this ranks by
  // the LIKELIHOOD RATIO between two). Features are md5-hashed
  // unigram buckets (B = 4096, the portable md5Int32 both engines
  // share); the per-bucket add-one log ratio
  // ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)) quantizes at 1e-6 into
  // BIGINT — the q_tx_bm25 ln discipline — so each document's
  // importance weight is an EXACT integer sum of its tokens' bucket
  // scores (wrap-free to ~10¹² tokens per document) and the top-K cut
  // is bit-stable. The normalizers stay inside the per-bucket ln (not
  // factored out): they weight by document LENGTH, which is the
  // paper's actual ratio. Scale: one token-grain aggregation to the
  // 4096-bucket table (broadcast back to the token stream — the
  // model is bucket-grain, never joined by shuffle), one map-side
  // combinable per-doc sum, TakeOrderedAndProject for the cut.
  private val DsirBuckets = 4096L
  private val DsirTopK = 100
  private val DsirTargetSrcs = Seq("src0", "src1")

  def dsir(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("w"))
      .withColumn("b", Hashes.md5Int32(col("w")) % DsirBuckets)
    val isT = col("source").isin(DsirTargetSrcs: _*)
    val counts = tok.groupBy("b")
      .agg(sum(when(isT, 1L).otherwise(0L)).as("ct"),
        sum(when(isT, 0L).otherwise(1L)).as("cr"))
    val tot = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lr = counts.crossJoin(broadcast(tot))
      .select(col("b"),
        round((log((col("ct") + lit(1L)).cast("double") /
            (col("nt") + lit(DsirBuckets)).cast("double"))
          - log((col("cr") + lit(1L)).cast("double") /
            (col("nr") + lit(DsirBuckets)).cast("double"))) * 1e6)
          .cast("long").as("lr"))
    tok.filter(!isT)
      .join(broadcast(lr), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("lw"))
      .orderBy(col("lw").desc, col("doc_id")).limit(DsirTopK)
      .select(col("doc_id"), col("n_tokens"), col("lw"),
        (col("lw").cast("double") / 1e6).as("log_ratio"))
      .orderBy(col("lw").desc, col("doc_id"))
  }

  lazy val dsirSql: String = {
    val targets = DsirTargetSrcs.map(s => s"'$s'").mkString(", ")
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, source, unnest($tokensSql) AS w FROM documents),
       |tb AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    ${Hashes.md5Int32Sql("w")} % $DsirBuckets AS b
       |  FROM tok),
       |counts AS MATERIALIZED (
       |  SELECT b,
       |    CAST(sum(CASE WHEN source IN ($targets) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ct,
       |    CAST(sum(CASE WHEN source IN ($targets) THEN 0 ELSE 1 END)
       |      AS BIGINT) AS cr
       |  FROM tb GROUP BY b),
       |tot AS MATERIALIZED (
       |  SELECT CAST(sum(ct) AS BIGINT) AS nt,
       |    CAST(sum(cr) AS BIGINT) AS nr FROM counts),
       |lr AS MATERIALIZED (
       |  SELECT b,
       |    CAST(round((ln(CAST(ct + 1 AS DOUBLE)
       |        / CAST(nt + $DsirBuckets AS DOUBLE))
       |      - ln(CAST(cr + 1 AS DOUBLE)
       |        / CAST(nr + $DsirBuckets AS DOUBLE))) * 1e6) AS BIGINT) AS lr
       |  FROM counts, tot),
       |cand AS MATERIALIZED (
       |  SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(lr.lr) AS BIGINT) AS lw
       |  FROM tb JOIN lr USING (b)
       |  WHERE tb.source NOT IN ($targets)
       |  GROUP BY tb.doc_id)
       |SELECT doc_id, n_tokens, lw, CAST(lw AS DOUBLE) / 1e6 AS log_ratio
       |FROM cand ORDER BY lw DESC, doc_id LIMIT $DsirTopK""".stripMargin
  }

  // --- q_tx_zipf ----------------------------------------------------------
  // ZIPF SLOPE of the corpus — the log-log OLS fit of frequency
  // against rank over the top-K tokens, the dataset-card statistic
  // that flags template/boilerplate corpora (slope far from −1) and
  // complements q_tx_heaps' vocabulary-growth curve. Ranks come from
  // ONE TakeOrderedAndProject top-K (per-partition heaps, never a
  // global sort of the vocabulary), and the window that numbers them
  // runs over the K surviving rows only (the q_tx_drift shape). Both
  // log axes quantize at 1e-6 into BIGINT — the q_tx_bm25 ln
  // discipline, absorbing cross-engine ulp drift in ln() — so the
  // five OLS moments are exact integers in DECIMAL(38,0) and the
  // slope/intercept/r² tree is fixed-order doubles ⇒ identical bits.
  // Slope and r² are invariant to the common 1e6 axis scaling; the
  // intercept divides it back out once. Scale: one token-grain
  // aggregation + a K-row digest; K is constant.
  private val ZipfTopK = 1000

  def zipf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val topk = counts.orderBy(col("f").desc, col("w")).limit(ZipfTopK)
      .withColumn("r", row_number()
        .over(Window.orderBy(col("f").desc, col("w"))).cast("long"))
    val m = topk.select(
        round(log(col("r").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("f").cast("double")) * 1e6).cast("long").as("y"))
      .groupBy()
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    m.withColumn("nd", col("n").cast("double"))
      .withColumn("sxd", col("sx").cast("double"))
      .withColumn("syd", col("sy").cast("double"))
      .withColumn("cxy",
        col("nd") * col("sxy").cast("double") - col("sxd") * col("syd"))
      .withColumn("cxx",
        col("nd") * col("sxx").cast("double") - col("sxd") * col("sxd"))
      .withColumn("cyy",
        col("nd") * col("syy").cast("double") - col("syd") * col("syd"))
      // Degenerate-corpus guards (the linreg/spearman discipline): a
      // single-rank or all-equal-frequency top-K makes cxx or cyy
      // zero, and the unguarded ratios would emit NaN — define slope/
      // intercept as the flat fit and r² as 0 there instead.
      .select(col("n").as("n_tokens"),
        when(col("cxx") > 0, col("cxy") / col("cxx"))
          .otherwise(lit(0.0)).as("slope"),
        when(col("cxx") > 0,
          (col("syd") - col("cxy") / col("cxx") * col("sxd")) / col("nd")
            / lit(1.0e6))
          .otherwise(col("syd") / col("nd") / lit(1.0e6)).as("intercept"),
        when(col("cxx") > 0 && col("cyy") > 0,
          col("cxy") * col("cxy") / (col("cxx") * col("cyy")))
          .otherwise(lit(0.0)).as("r2"))
  }

  val zipfSql: String =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT unnest($tokensSql) AS w FROM documents),
       |counts AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
       |topk AS MATERIALIZED (
       |  SELECT w, f, CAST(rn AS BIGINT) AS r FROM (
       |    SELECT w, f, row_number() OVER (ORDER BY f DESC, w) AS rn
       |    FROM counts)
       |  WHERE rn <= $ZipfTopK),
       |xy AS MATERIALIZED (
       |  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
       |    CAST(round(ln(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS y
       |  FROM topk),
       |m AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
       |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
       |    sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
       |    sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
       |    sum(CAST(y * y AS DECIMAL(38,0))) AS syy
       |  FROM xy),
       |c_ AS MATERIALIZED (
       |  SELECT n, CAST(n AS DOUBLE) AS nd,
       |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
       |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
       |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
       |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy
       |  FROM m)
       |SELECT n AS n_tokens,
       |  CASE WHEN cxx > 0 THEN cxy / cxx ELSE 0.0 END AS slope,
       |  CASE WHEN cxx > 0 THEN (syd - cxy / cxx * sxd) / nd / 1e6
       |       ELSE syd / nd / 1e6 END AS intercept,
       |  CASE WHEN cxx > 0 AND cyy > 0 THEN cxy * cxy / (cxx * cyy)
       |       ELSE 0.0 END AS r2
       |FROM c_""".stripMargin

  // --- q_tx_source_overlap --------------------------------------------------
  // PAIRWISE SOURCE VOCABULARY OVERLAP — the dataset-card matrix behind
  // "are these two crawls the same corpus wearing different names":
  // Jaccard similarity of the distinct-token vocabularies of every
  // source pair. The corpus reduces to the (source, token) DISTINCT
  // digest first (vocabulary-grain — bounded by |vocab|·|sources|, not
  // by corpus rows); intersections come from the digest self-join on
  // the token key (per-token fan-out bounded by |sources|²), sizes
  // broadcast back, and jaccard divides exact integers once. The s1 <
  // s2 guard emits each unordered pair exactly once. Scale: one
  // doc-grain explode + distinct, then everything is vocabulary-grain.
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .distinct().localCheckpoint() // sizes + both join sides read it
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("sz"))
    vocab.as("a").join(vocab.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("source").as("s1"),
        col("sz").as("sz1"))), "s1")
      .join(broadcast(sizes.select(col("source").as("s2"),
        col("sz").as("sz2"))), "s2")
      .select(col("s1"), col("s2"), col("sz1"), col("sz2"), col("n_common"),
        (col("n_common").cast("double") /
          (col("sz1") + col("sz2") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy("s1", "s2")
  }

  lazy val sourceOverlapSql: String =
    s"""WITH vocab AS MATERIALIZED (
       |  SELECT DISTINCT source, w
       |  FROM (SELECT source, unnest($tokensSql) AS w FROM documents)),
       |sizes AS MATERIALIZED (
       |  SELECT source, CAST(count(*) AS BIGINT) AS sz FROM vocab GROUP BY 1),
       |pairs AS MATERIALIZED (
       |  SELECT a.source AS s1, b.source AS s2,
       |    CAST(count(*) AS BIGINT) AS n_common
       |  FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT s1, s2, z1.sz AS sz1, z2.sz AS sz2, n_common,
       |  n_common::DOUBLE / (z1.sz + z2.sz - n_common)::DOUBLE AS jaccard
       |FROM pairs JOIN sizes z1 ON pairs.s1 = z1.source
       |JOIN sizes z2 ON pairs.s2 = z2.source
       |ORDER BY s1, s2""".stripMargin

  // --- q_tx_boilerplate -----------------------------------------------------
  // Corpus-frequent n-gram boilerplate screen (the RefinedWeb/CCNet
  // "remove lines shared across many pages" filter, re-grained to
  // n-grams because this corpus has no line structure): an n-gram is
  // boilerplate when it appears in >= max(3, ceil(5% of docs)) DISTINCT
  // documents, and each doc reports how much of it is made of such
  // grams — the signal that downweights navigation chrome, license
  // headers and template text before training.
  //
  // Shape: one explode to (doc, gram), df via distinct+count, and the
  // boilerplate SET joined back by BROADCAST — the set is bounded by
  // the threshold (each member needs >= 5% of all docs, so there are at
  // most 20/0.05 = den/1 such grams per doc slot; in practice vocab-
  // bounded), never corpus-sized, so the per-doc aggregation stays a
  // map-side-combined scan. Docs shorter than the window keep a row
  // (LEFT join from documents) with ratio 0 — silently dropping them
  // would make the downstream keep-filter see a biased population.
  // Integer threshold arithmetic ((n_docs + 19) div 20) keeps the two
  // engines' boundary identical (double ceil could round apart).
  private val BoilerWin = 2
  private val BoilerMinDf = 3
  private val BoilerDen = 20 // threshold = max(3, ceil(n_docs/20))

  def boilerplate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
    // Occurrence-grain (doc_id, gram) via the relational shingle
    // derivation (posexplode + window lead, the Text.shingleRows shape
    // minus its distinct): the HOF explode(shingles(...)) re-evaluates
    // the free token array per element and falls out of whole-stage
    // codegen — Text.shingles' own doc flags it as not-for-hot-path.
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val nexts = (1 until BoilerWin).map(i => lead("tok", i).over(w))
    val grams = docs
      .select(col("doc_id"), posexplode(col("t")))
      .toDF("doc_id", "pos", "tok")
      .withColumn("g", concat_ws(" ", (col("tok") +: nexts): _*))
      .withColumn("last", nexts.last)
      .filter(col("last").isNotNull) // only complete n-grams
      .select(col("doc_id"), col("g"))
      .localCheckpoint() // df pass and occurrence pass both read it
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val boiler = grams.distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >=
        greatest(lit(BoilerMinDf.toLong), expr(s"(n_docs + ${BoilerDen - 1}) div $BoilerDen")))
      .select(col("g"), lit(1L).as("b"))
    val perDoc = grams
      .join(broadcast(boiler), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("b"), lit(0L))).as("n_boiler"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        coalesce(col("n_boiler").cast("double") /
          nullif(col("n_grams"), lit(0L)), lit(0.0)).as("boiler_ratio"))
      .orderBy("doc_id")
  }

  lazy val boilerplateSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, $tokensSql AS t FROM documents),
       |grams AS MATERIALIZED (
       |  SELECT doc_id, unnest(CASE WHEN len(t) < $BoilerWin THEN []
       |    ELSE list_transform(generate_series(1, len(t) - ${BoilerWin - 1}),
       |      i -> array_to_string(t[i:i + ${BoilerWin - 1}], ' ')) END) AS g
       |  FROM toks),
       |nd AS MATERIALIZED (SELECT count(*) AS n_docs FROM documents),
       |dfc AS MATERIALIZED (
       |  SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g),
       |boiler AS MATERIALIZED (
       |  SELECT g FROM dfc, nd
       |  WHERE df >= greatest($BoilerMinDf, (n_docs + ${BoilerDen - 1}) // $BoilerDen)),
       |pd AS MATERIALIZED (
       |  SELECT gr.doc_id, count(*) AS n_grams,
       |    CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
       |  FROM grams gr LEFT JOIN boiler b ON b.g = gr.g
       |  GROUP BY gr.doc_id)
       |SELECT d.doc_id,
       |  coalesce(pd.n_grams, 0) AS n_grams,
       |  coalesce(pd.n_boiler, 0) AS n_boiler,
       |  coalesce(pd.n_boiler::DOUBLE / nullif(pd.n_grams, 0), 0.0) AS boiler_ratio
       |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // --- q_tx_template_prefix ---------------------------------------------------
  // PER-SOURCE TEMPLATE-PREFIX DETECTION: the longest common prefix of
  // ALL documents in a source — scraped corpora carry per-site
  // headers/banners that depress downstream diversity, and the cheap
  // exact detector is an order-statistics trick: over a lexicographically
  // sorted set, LCP(min, max) = LCP of the whole set, so one min/max
  // aggregation per source replaces any pairwise comparison — O(1)
  // state per group at any corpus size (the same reason sorted SSTables
  // store block-prefix deltas). The LCP itself counts positions i where
  // the two i-char prefixes still agree (prefix equality is monotone in
  // i, so the count IS the longest prefix length) — a few hundred
  // substring compares on TWO strings per source, never per doc.
  def templatePrefix(s: SparkSession, d: String): DataFrame = {
    val mm = Tables.documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        min(col("text")).as("lo"), max(col("text")).as("hi"))
    // empty-min guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]),
    // and the i=0 probe compares "" == "" — an empty lo/hi must report 0
    mm.withColumn("lcp_len",
        when(least(length(col("lo")), length(col("hi"))) === 0, lit(0L))
          .otherwise(size(filter(
            sequence(lit(1), least(length(col("lo")), length(col("hi")))),
            i => col("lo").substr(lit(1), i) === col("hi").substr(lit(1), i)))
            .cast("long")))
      .select(col("source"), col("n_docs"), col("lcp_len"),
        col("lo").substr(lit(1), col("lcp_len").cast("int")).as("template"),
        // all-empty-text source: mean chars is 0 and 0.0/0.0 is NaN in
        // Spark but NULL in DuckDB — nullif/coalesce like boiler_ratio
        coalesce(col("lcp_len").cast("double") /
          nullif(col("sum_chars").cast("double") / col("n_docs").cast("double"),
            lit(0.0)), lit(0.0))
          .as("template_ratio"))
      .orderBy("source")
  }

  lazy val templatePrefixSql: String =
    s"""WITH mm AS MATERIALIZED (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       |    min(text) AS lo, max(text) AS hi
       |  FROM documents GROUP BY source),
       |lcp AS MATERIALIZED (
       |  SELECT source, n_docs, sum_chars, lo,
       |    CAST(len(list_filter(generate_series(1, least(length(lo), length(hi))),
       |      i -> lo[1:i] = hi[1:i])) AS BIGINT) AS lcp_len
       |  FROM mm)
       |SELECT source, n_docs, lcp_len, lo[1:lcp_len] AS template,
       |  coalesce(lcp_len::DOUBLE
       |    / nullif(sum_chars::DOUBLE / n_docs::DOUBLE, 0.0), 0.0)
       |    AS template_ratio
       |FROM lcp
       |ORDER BY source""".stripMargin

  // --- q_tx_lang_mix ------------------------------------------------------------
  // CODE-SWITCHING / MIXED-LANGUAGE SCREEN: langid the FIRST and SECOND
  // halves of each document independently and flag disagreement — the
  // cheap detector for concatenation artifacts and mid-document
  // language switches that a whole-doc langid averages away (a mixed
  // doc pollutes monolingual training shards in both directions). Both
  // halves classify with the SAME langIdPred single source of truth;
  // the halving is integer character arithmetic, identical in both
  // engines. Scale: two scan-side classifier projections, zero
  // shuffles before the presentation sort.
  def langMix(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h1", expr("substring(text, 1, length(text) div 2)"))
      .withColumn("h2",
        expr("substring(text, length(text) div 2 + 1, length(text))"))
      .select(col("doc_id"), col("lang"),
        langIdPred(col("h1")).as("lang_first"),
        langIdPred(col("h2")).as("lang_second"))
      .withColumn("mixed", col("lang_first") =!= col("lang_second"))
      .orderBy("doc_id")

  lazy val langMixSql: String =
    s"""WITH h AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    substr(text, 1, length(text) // 2) AS h1,
       |    substr(text, length(text) // 2 + 1, length(text)) AS h2
       |  FROM documents),
       |cls AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    ${langIdPredSqlOf("h1")} AS lang_first,
       |    ${langIdPredSqlOf("h2")} AS lang_second
       |  FROM h)
       |SELECT doc_id, lang, lang_first, lang_second,
       |  (lang_first <> lang_second) AS mixed
       |FROM cls
       |ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tx_template_prefix" -> (templatePrefix _),
    "q_tx_boilerplate" -> (boilerplate _),
    "q_tx_source_overlap" -> (sourceOverlap _),
    "q_tx_langid_eval" -> (langIdEval _),
    "q_tx_lang_mix" -> (langMix _),
    "q_tx_kappa" -> (kappa _),
    "q_tx_diversity" -> (diversity _),
    "q_tx_textrank" -> (textrank _),
    "q_tx_ctfidf" -> (ctfidf _),
    "q_tx_burstiness" -> (burstiness _),
    "q_tx_bm25" -> (bm25 _),
    "q_tx_zipf" -> (zipf _),
    "q_tx_dsir" -> (dsir _),
    "q_tx_hybrid_rrf" -> (hybridRrf _),
    "q_tx_bm25_incr" -> (bm25Incr _),
    "q_tx_heavy_hitters" -> (heavyHittersQ _),
    "q_tx_trigram_backoff" -> (trigramBackoff _),
    "q_tx_bigram_broadcast" -> (bigramBroadcast _),
    "q_tx_bigram_coherence" -> (bigramCoherence _),
    "q_tx_cdc_chunks" -> (cdcChunks _),
    "q_tx_nfc" -> (nfc _),
    "q_tx_repetition" -> (repetition _),
    "q_tx_ngram_top" -> (ngramTop _),
    "q_tx_npmi" -> (npmi _),
    "q_tx_phrase" -> (phrase _),
    "q_tx_rake" -> (rake _),
    "q_tx_heaps" -> (heaps _),
    "q_tx_corpus_stats" -> (corpusStats _),
    "q_tx_drift" -> (drift _),
    "q_tx_lm_filter" -> (lmFilter _),
    "q_tx_quality_trim" -> (qualityTrim _),
    "q_tx_token_count" -> (tokenCount _),
    "q_tx_quality" -> (qualityScore _),
    "q_tx_langid" -> (langId _),
    "q_tx_fingerprint" -> (fingerprint _),
    "q_tx_clean" -> (clean _),
    "q_tx_redact" -> (redact _))

  val oracles: Map[String, String] = Map(
    "q_tx_boilerplate" -> boilerplateSql,
    "q_tx_template_prefix" -> templatePrefixSql,
    "q_tx_source_overlap" -> sourceOverlapSql,
    "q_tx_langid_eval" -> langIdEvalSql,
    "q_tx_lang_mix" -> langMixSql,
    "q_tx_kappa" -> kappaSql,
    "q_tx_diversity" -> diversitySql,
    "q_tx_textrank" -> textrankSql,
    "q_tx_ctfidf" -> ctfidfSql,
    "q_tx_burstiness" -> burstinessSql,
    "q_tx_bm25" -> bm25Sql,
    "q_tx_zipf" -> zipfSql,
    "q_tx_dsir" -> dsirSql,
    "q_tx_hybrid_rrf" -> hybridRrfSql,
    "q_tx_bm25_incr" -> bm25Sql, // oracle = FULL recompute: merge ≡ rebuild
    "q_tx_trigram_backoff" -> trigramBackoffSql,
    "q_tx_bigram_broadcast" -> bigramBroadcastSql,
    "q_tx_bigram_coherence" -> bigramCoherenceSql,
    "q_tx_cdc_chunks" -> cdcChunksSql,
    "q_tx_repetition" -> repetitionSql,
    "q_tx_ngram_top" -> ngramTopSql,
    "q_tx_npmi" -> npmiSql,
    "q_tx_heavy_hitters" -> heavyHittersSql,
    "q_tx_phrase" -> phraseSql,
    "q_tx_rake" -> rakeSql,
    "q_tx_heaps" -> heapsSql,
    "q_tx_corpus_stats" -> corpusStatsSql,
    "q_tx_drift" -> driftSql,
    "q_tx_lm_filter" -> lmFilterSql,
    "q_tx_quality_trim" -> qualityTrimSql,
    "q_tx_token_count" -> tokenCountSql,
    "q_tx_quality" -> qualityScoreSql,
    "q_tx_langid" -> langIdSql,
    "q_tx_fingerprint" -> fingerprintSql,
    "q_tx_clean" -> cleanSql,
    "q_tx_redact" -> redactSql,
    "q_tx_nfc" -> nfcSql)
}

/** Cross-engine deterministic hashing: both Spark and DuckDB expose md5
  * over strings with identical output, so a 32-bit integer hash derived
  * from the first 8 hex chars is reproducible in both engines — the
  * foundation for MinHash/SimHash oracles. (Spark's native hash/xxhash64
  * would be faster but has no DuckDB twin; swap in xxhash64 for
  * production once oracle parity is no longer needed.)
  */
object Hashes {
  /** 32-bit unsigned int from md5, as a non-negative long column. */
  def md5Int32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Same hash in DuckDB SQL, for oracle queries. */
  def md5Int32Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 8))::BIGINT"

  /** 48-bit unsigned int from md5 (12 hex chars) — wide enough that
    * order-statistic sketches (KMV) see essentially no ties. */
  def md5Int48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  def md5Int48Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 12))::BIGINT"

  /** Seeded variant: hash of (seed ++ value). */
  def md5Int32Seeded(c: Column, seed: Int): Column =
    md5Int32(concat(lit(seed.toString), lit("_"), c))

  def md5Int32SeededSql(expr: String, seed: Int): String =
    md5Int32Sql(s"'${seed}_' || $expr")
}
