package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-set preparation operators — the steps between a cleaned
  * corpus and a token stream: packing documents into fixed context
  * windows and surfacing the corpus-weighted keywords that drive
  * curriculum/quality decisions. Both are shard-parallel by
  * construction: nothing here ever orders, windows, or collects the
  * corpus globally, because a global anything is the first casualty of
  * a 100 TB scale-up.
  */
object TrainPrep {

  // --- q_tp_curation_funnel -----------------------------------------------------
  // THE CURATION FUNNEL REPORT — how many documents survive each stage
  // of a standard training-data cleanup (raw → length bounds → langid
  // agreement → exact dedup → punctuation screen), the first table any
  // dataset audit asks for and the one that catches a filter silently
  // eating the corpus. Computed as ONE scan with cumulative pass
  // flags, not five passes: stages 1–2 are row-local predicates;
  // stage 3 (exact dedup among stage-2 survivors, keep min doc_id) is
  // a single row_number window over the content hash with survivors
  // ordered first — so the rank-1 row of a hash group is a survivor
  // iff any survivor exists, and `pass2 ∧ rn = 1` IS the kept set;
  // stage 4 reuses q_tx_quality's punctuation ratio. The five counts
  // fold in one aggregation and unpivot via stack into the report
  // rows. Scale: one text scan + one hash-keyed window (the exact-dup
  // family's shuffle), aggregation map-side combinable — the funnel
  // costs no more than the dedup it contains.
  def curationFunnel(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .withColumn("pass1",
        col("n_chars") >= 50 && col("n_chars") <= 5000)
      .withColumn("pass2",
        col("pass1") && TextAnalysis.langIdPred(col("text")) === col("lang"))
      .withColumn("h", md5(col("text")))
    val w = Window.partitionBy("h")
      .orderBy(when(col("pass2"), lit(0)).otherwise(lit(1)), col("doc_id"))
    val flagged = base
      .withColumn("rn", row_number().over(w))
      .withColumn("pass3", col("pass2") && col("rn") === 1)
      .withColumn("punct",
        length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
          .cast("double") /
          greatest(length(col("text")), lit(1)).cast("double"))
      .withColumn("pass4", col("pass3") && col("punct") <= 0.1)
    flagged.agg(
        count(lit(1)).as("s0"),
        sum(col("pass1").cast("long")).as("s1"),
        sum(col("pass2").cast("long")).as("s2"),
        sum(col("pass3").cast("long")).as("s3"),
        sum(col("pass4").cast("long")).as("s4"))
      .select(expr(
        """stack(5,
          |  0, 'raw', s0,
          |  1, 'length_bounds', s1,
          |  2, 'langid_agree', s2,
          |  3, 'exact_dedup', s3,
          |  4, 'punct_screen', s4) AS (stage_idx, stage, n_docs)"""
          .stripMargin))
      .select(col("stage_idx").cast("long"), col("stage"), col("n_docs"))
      .orderBy("stage_idx")
  }

  lazy val curationFunnelSql: String =
    s"""WITH base AS MATERIALIZED (
       |  SELECT doc_id, lang, text, n_chars,
       |    (n_chars >= 50 AND n_chars <= 5000) AS pass1,
       |    ((n_chars >= 50 AND n_chars <= 5000)
       |      AND ${TextAnalysis.langIdPredSql} = lang) AS pass2,
       |    md5(text) AS h
       |  FROM documents),
       |flagged AS MATERIALIZED (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY h
       |      ORDER BY CASE WHEN pass2 THEN 0 ELSE 1 END, doc_id) AS rn,
       |    length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE
       |      / greatest(length(text), 1)::DOUBLE AS punct
       |  FROM base),
       |agg AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS s0,
       |    CAST(sum(CASE WHEN pass1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN pass2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
       |    CAST(sum(CASE WHEN pass2 AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS s3,
       |    CAST(sum(CASE WHEN pass2 AND rn = 1 AND punct <= 0.1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS s4
       |  FROM flagged)
       |SELECT CAST(0 AS BIGINT) AS stage_idx, 'raw' AS stage, s0 AS n_docs FROM agg
       |UNION ALL SELECT 1, 'length_bounds', s1 FROM agg
       |UNION ALL SELECT 2, 'langid_agree', s2 FROM agg
       |UNION ALL SELECT 3, 'exact_dedup', s3 FROM agg
       |UNION ALL SELECT 4, 'punct_screen', s4 FROM agg
       |ORDER BY stage_idx""".stripMargin

  // --- q_tp_dataset_card ----------------------------------------------------
  // PER-SOURCE DATASET CARD — the one-row-per-shard summary a corpus
  // release ships (and that mixture/epoch decisions read): doc and
  // token volumes, length spread, duplicate pressure, and the dominant
  // language with its share. All counts exact integers from TWO
  // scan-shaped aggregations (doc grain → source grain); the exact-dup
  // rate reuses the corpus-wide md5 group (a doc is "duplicated" iff
  // its content hash occurs more than once ANYWHERE — cross-source
  // duplication must count, it is the interesting kind) via a
  // digest-grain join, never a second text pass. The dominant language
  // is a (count DESC, lang) struct-max over the per-(source, lang)
  // digest — the q_ag_mode argmax with a total tie-break. Ratios are
  // exact-int divisions, one per output column. Scale: the widest
  // thing shuffled is the (hash, doc_id) digest the exact-dedup family
  // already stages; every aggregation is map-side combinable.
  def datasetCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        md5(col("text")).as("h"),
        length(col("text")).cast("long").as("n_chars"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val dupHashes = docs.groupBy("h").agg(count(lit(1)).as("nh"))
      .filter(col("nh") > 1).select("h")
    val flagged = docs.join(dupHashes, Seq("h"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_dup_docs"))
    val base = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
    val langTop = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("nl"))
      .groupBy("source")
      .agg(max(struct(col("nl"), col("lang"))).as("m"))
      .select(col("source"), col("m.lang").as("top_lang"),
        col("m.nl").as("top_lang_docs"))
    base
      .join(flagged, Seq("source"), "left")
      .withColumn("n_dup_docs", coalesce(col("n_dup_docs"), lit(0L)))
      .join(langTop, "source")
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("total_tokens"), col("min_tokens"), col("max_tokens"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tokens"),
        col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
          .as("dup_rate"),
        col("top_lang"), col("top_lang_docs"),
        (col("top_lang_docs").cast("double") / col("n_docs").cast("double"))
          .as("top_lang_share"))
      .orderBy("source")
  }

  lazy val datasetCardSql: String = {
    val toks = TextAnalysis.tokensSql
    s"""WITH docs AS MATERIALIZED (
       |  SELECT doc_id, source, lang, md5(text) AS h,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len($toks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |dup_h AS MATERIALIZED (
       |  SELECT h FROM docs GROUP BY h HAVING count(*) > 1),
       |flagged AS MATERIALIZED (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_dup_docs
       |  FROM docs WHERE h IN (SELECT h FROM dup_h) GROUP BY source),
       |base AS MATERIALIZED (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(min(n_tokens) AS BIGINT) AS min_tokens,
       |    CAST(max(n_tokens) AS BIGINT) AS max_tokens
       |  FROM docs GROUP BY source),
       |lt AS MATERIALIZED (
       |  SELECT source, max({'nl': nl, 'lang': lang}) AS m FROM (
       |    SELECT source, lang, CAST(count(*) AS BIGINT) AS nl
       |    FROM docs GROUP BY source, lang)
       |  GROUP BY source)
       |SELECT b.source, n_docs, total_chars, total_tokens, min_tokens,
       |  max_tokens,
       |  CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_tokens,
       |  CAST(coalesce(f.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
       |  CAST(coalesce(f.n_dup_docs, 0) AS DOUBLE)
       |    / CAST(n_docs AS DOUBLE) AS dup_rate,
       |  lt.m.lang AS top_lang, lt.m.nl AS top_lang_docs,
       |  CAST(lt.m.nl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_lang_share
       |FROM base b
       |LEFT JOIN flagged f ON b.source = f.source
       |JOIN lt ON b.source = lt.source
       |ORDER BY b.source""".stripMargin
  }

  // --- q_tp_pack ------------------------------------------------------------
  // Concat-and-chunk sequence packing: documents are concatenated in a
  // stable order and cut into fixed token-budget chunks (the layout GPT
  //-style pretraining actually feeds; a straddling doc continues in the
  // next chunk). Packing is PER SHARD (source) — the window cumsum
  // partitions on the shard key, so 1000 shards pack on 1000 executors
  // and no global sort exists. The projection keeps only (doc_id,
  // source, n_tokens) before the window: the shuffle moves 24-byte
  // digests, never text. Chunk ids are exact integer arithmetic —
  // exclusive prefix sum of token counts, integer-divided by the
  // budget — so the DuckDB window twin agrees bit-for-bit.
  private val ChunkBudget = 512L

  /** Core packing over any (doc_id, source, text) frame — split out so
    * specs can drive it with constructed corpora and budgets. */
  def packDocs(docs: DataFrame, budget: Long = ChunkBudget): DataFrame = {
    val slim = docs
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    slim
      .withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"tok_offset div $budget"))
      .select("source", "doc_id", "n_tokens", "tok_offset", "chunk_id")
      .orderBy("source", "doc_id")
  }

  def pack(s: SparkSession, d: String): DataFrame =
    packDocs(Tables.documents(s, d))

  // DuckDB's windowed sum over BIGINT returns HUGEINT (float64 once it
  // reaches the driver compare) — cast back to BIGINT or the hash
  // mismatches on equal values, the q_t4 red-row mechanism.
  val packSql: String =
    s"""WITH slim AS (
       |  SELECT source, doc_id, len(${TextAnalysis.tokensSql})::BIGINT AS n_tokens
       |  FROM documents),
       |packed AS (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (
       |      PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
       |  FROM slim)
       |SELECT source, doc_id, n_tokens, tok_offset,
       |  CAST(tok_offset // $ChunkBudget AS BIGINT) AS chunk_id
       |FROM packed
       |ORDER BY source, doc_id""".stripMargin

  // --- q_tp_tfidf -----------------------------------------------------------
  // Corpus-weighted keyword extraction: per-document top-3 terms by
  // TF-IDF. The score is the RATIONAL form tf * N / df — rank-equivalent
  // to the log form per document (log(N/df) is monotone in N/df and tf
  // scales it positively) without a transcendental: one exact integer
  // product and one correctly-rounded division are bit-identical across
  // engines, where libm log() is not. Two aggregation passes, both over
  // (doc_id, term) digests: tf = count per (doc, term), df = count of
  // docs per term derived FROM the tf table (one scan of the exploded
  // terms, no second corpus read). The per-doc top-3 is a bounded
  // window; ties break on the term so the cut is total-ordered.
  def tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val terms = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(nDocs)
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "term", "tf", "df", "score")
      .orderBy("doc_id", "rank")
  }

  val tfidfSql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, unnest(${TextAnalysis.tokensSqlOf("lower(text)")}) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    (tf.tf * n.n_docs)::DOUBLE / df.df::DOUBLE AS score
       |  FROM tf JOIN df USING (term), n),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, rank, term, tf, df, score
       |FROM ranked WHERE rank <= 3
       |ORDER BY doc_id, rank""".stripMargin

  // --- q_tp_shard_manifest --------------------------------------------------
  // Training-export sharding + manifest: every doc lands in one of
  // NumShards output shards by CONTENT-HASH of its id (md5-derived, like
  // every sample/salt in this repo — never rand(), so the assignment is
  // identical across runs, engines, retries, and corpus growth), and the
  // manifest row per shard carries what a downstream trainer reads
  // before opening any file: doc count, token/char totals, source
  // spread, id range. One scan feeding aggregation at digest grain:
  // the exact distinct-source count makes it a two-phase aggregate
  // ((shard, source) expansion, then shard) — both at key-cardinality
  // grain, never corpus grain — plus the NumShards-row presentation
  // sort. Manifest cost is O(corpus) scan and O(shards) output
  // regardless of scale, and the same shard expression is the
  // write-time partition key (partitionBy("shard")), so the manifest
  // provably describes the physical files.
  private val NumShards = 16

  def shardManifest(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("shard",
        (Hashes.md5Int32(col("doc_id").cast("string")) % NumShards).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy("shard")

  val shardManifestSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source,
       |    len(${TextAnalysis.tokensSql})::BIGINT AS n_tokens,
       |    length(text)::BIGINT AS n_chars,
       |    (${Hashes.md5Int32Sql("doc_id::VARCHAR")} % $NumShards)::BIGINT AS shard
       |  FROM documents)
       |SELECT shard, count(*) AS n_docs,
       |  count(DISTINCT source) AS n_sources,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       |FROM docs
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  // --- q_tp_chunk_overlap ---------------------------------------------------
  // Overlapping token-window chunking — the other window layout next to
  // pack's concat-and-chunk: each doc is cut into fixed windows with a
  // stride smaller than the window, the shape RAG indexing and long-doc
  // pretraining use so no boundary context is lost. Window enumeration
  // is a scan-side Generate (sequence + explode) per doc —
  // embarrassingly parallel, zero shuffles before the presentation
  // sort, and the token ARRAY is dropped before that sort so no
  // exchange ever carries doc content. Window count/offsets are exact
  // integer arithmetic (div, greatest, least) — bit-identical across
  // engines. Docs with zero tokens emit no windows; a doc shorter than
  // one window emits exactly one. The driver row runs 32/24 because the
  // test corpus tops out near 100 tokens/doc — that exercises 3-4
  // overlapping windows and the short tail PER DOC in both engines
  // (128/96-style production geometry is the same formula; the golden
  // spec pins the straddle/boundary cases on a constructed corpus).
  private val WinTokens = 32L
  private val WinStride = 24L

  /** Core windowing over any (doc_id, text) frame — split out so specs
    * can drive constructed corpora and geometries. */
  def chunkDocs(docs: DataFrame, win: Long = WinTokens,
                stride: Long = WinStride): DataFrame = {
    require(win > 0 && stride > 0 && stride <= win, s"bad geometry $win/$stride")
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("n_windows", expr(
        s"1L + (greatest(n_tokens - $win, 0L) + ${stride - 1}) div $stride"))
      .select(col("doc_id"), col("n_tokens"), col("toks"),
        explode(sequence(lit(0L), col("n_windows") - 1)).as("window_idx"))
      .withColumn("tok_start", col("window_idx") * stride)
      .select(col("doc_id"), col("window_idx"), col("tok_start"),
        least(lit(win), col("n_tokens") - col("tok_start")).as("win_len"),
        element_at(col("toks"), (col("tok_start") + 1).cast("int")).as("first_tok"))
      .orderBy("doc_id", "window_idx")
  }

  def chunkOverlap(s: SparkSession, d: String): DataFrame =
    chunkDocs(Tables.documents(s, d))

  val chunkOverlapSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextAnalysis.tokensSql} AS toks FROM documents),
       |n AS (
       |  SELECT doc_id, toks, len(toks)::BIGINT AS n_tokens
       |  FROM t WHERE len(toks) > 0),
       |w AS (
       |  SELECT doc_id, toks, n_tokens,
       |    1 + (greatest(n_tokens - $WinTokens, 0) + ${WinStride - 1}) // $WinStride
       |      AS n_windows
       |  FROM n),
       |ex AS (
       |  SELECT doc_id, toks, n_tokens,
       |    unnest(generate_series(0, n_windows - 1)) AS window_idx
       |  FROM w)
       |SELECT doc_id, window_idx::BIGINT AS window_idx,
       |  (window_idx * $WinStride)::BIGINT AS tok_start,
       |  least($WinTokens, n_tokens - window_idx * $WinStride)::BIGINT AS win_len,
       |  toks[(window_idx * $WinStride + 1)::INT] AS first_tok
       |FROM ex
       |ORDER BY doc_id, window_idx""".stripMargin

  // --- q_tp_shuffle ---------------------------------------------------------
  // Deterministic global training-order shuffle — the step every trainer
  // runs between curation and consumption, and a classic scale trap: the
  // naive form is ORDER BY random() (non-reproducible AND a global sort).
  // The scale-correct shape: (1) shard by content hash (the SAME shard
  // expression as q_tp_shard_manifest — the write partition key), (2)
  // order WITHIN each shard by a second, independent content hash
  // (seeded md5 — decorrelated from the shard hash, so no stripe
  // patterns), (3) readers consume shards in shard order. Result: a
  // reproducible permutation with NO global sort — the only exchange is
  // the shard hash-partitioning, the sort is partition-local, and
  // epoch reshuffles just bump the seed. Ties cannot happen (doc_id is
  // the final key), so the permutation is total and engine-exact.
  private val ShuffleSeed = 1

  def shuffleOrder(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("ord_hash", "doc_id")
    Tables.documents(s, d)
      .select(col("doc_id"),
        (Hashes.md5Int32(col("doc_id").cast("string")) % NumShards)
          .cast("long").as("shard"),
        Hashes.md5Int32Seeded(col("doc_id").cast("string"), ShuffleSeed)
          .as("ord_hash"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  val shuffleOrderSql: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    (${Hashes.md5Int32Sql("doc_id::VARCHAR")} % $NumShards)::BIGINT AS shard,
       |    ${Hashes.md5Int32SeededSql("doc_id::VARCHAR", ShuffleSeed)} AS ord_hash
       |  FROM documents)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ord_hash, doc_id) AS BIGINT) AS pos
       |FROM h
       |ORDER BY shard, pos""".stripMargin

  // --- q_tp_row_ids ---------------------------------------------------------
  // Contiguous global example ids over the training order — samplers and
  // resume-from-step logic want `global_id IN [a, b)`, and the naive
  // row_number() OVER (ORDER BY ...) is a single-partition global sort.
  // Scale shape: per-shard positions are partition-local (the q_tp_shuffle
  // window), per-shard counts are one map-side-combined aggregate, and
  // the exclusive prefix sum over counts runs on a SHARD-GRAIN table
  // (NumShards rows — the one place a single-partition window is correct
  // by construction). global_id = shard offset + local pos, attached by
  // a broadcast join; no row ever moves for the numbering itself. The
  // oracle computes the same ids with a flat global row_number(), so the
  // hash pins offset+pos == global numbering exactly.
  def rowIds(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("ord_hash", "doc_id")
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        (Hashes.md5Int32(col("doc_id").cast("string")) % NumShards)
          .cast("long").as("shard"),
        Hashes.md5Int32Seeded(col("doc_id").cast("string"), ShuffleSeed)
          .as("ord_hash"))
      .withColumn("pos", row_number().over(w).cast("long"))
    val offsets = base.groupBy("shard").agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("shard", "offset")
    base.join(broadcast(offsets), Seq("shard"))
      .select(col("doc_id"), col("shard"), col("pos"),
        (col("offset") + col("pos")).as("global_id"))
      .orderBy("global_id")
  }

  val rowIdsSql: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    (${Hashes.md5Int32Sql("doc_id::VARCHAR")} % $NumShards)::BIGINT AS shard,
       |    ${Hashes.md5Int32SeededSql("doc_id::VARCHAR", ShuffleSeed)} AS ord_hash
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, shard,
       |    CAST(row_number() OVER (PARTITION BY shard ORDER BY ord_hash, doc_id) AS BIGINT) AS pos
       |  FROM h)
       |SELECT doc_id, shard, pos,
       |  CAST(row_number() OVER (ORDER BY shard, pos) AS BIGINT) AS global_id
       |FROM p
       |ORDER BY global_id""".stripMargin

  // --- q_tp_bpe -------------------------------------------------------------
  // BPE TOKENIZATION AS A RELATIONAL OPERATOR — the tokenizer an LLM
  // pipeline actually counts tokens with, trained and applied in-engine:
  //
  //  TRAIN (Sennrich-style, bounded rounds): per round, encode the WORD
  //  VOCABULARY (distinct words × corpus counts — the classic BPE
  //  training compression: pair statistics ride on the vocab, never the
  //  corpus) with the merges so far, count adjacent symbol pairs
  //  weighted by word count in ONE map-side-combinable aggregation, and
  //  collect only the ARGMAX pair (count DESC, then lexicographic — a
  //  2-string driver artifact per round, the Lloyd-centroid pattern:
  //  lineage resets each round because the merges enter the next plan
  //  as literals).
  //
  //  ENCODE: per word, fold the merge list over the character sequence
  //  — ONE nested aggregate() HOF (outer fold over merges, inner
  //  leftmost-nonoverlapping merge pass over symbols; chained
  //  per-merge columns would re-trigger the alias-substitution blowup).
  //  Applying merges exhaustively in rank order is the original BPE
  //  encoder definition, so the DuckDB twin REPLAYS training (R CTE
  //  rounds off the same vocab, same tie-breaks) and encoding
  //  (struct-wrapped list_reduce folds) bit-for-bit: a drift anywhere
  //  in vocab, pair counts, tie-breaks, or the merge pass breaks the
  //  hash.
  //
  //  100 TB shape: training touches the corpus once (the vocab
  //  aggregation); each round is one aggregation over the VOCAB with an
  //  8-byte-pair driver collect. Encoding is a zero-shuffle scan
  //  projection; production would encode the distinct vocab once and
  //  broadcast-join the code table instead of re-folding every
  //  occurrence — same results, amortized fold.
  private val BpeRounds = 12

  /** Leftmost-nonoverlapping application of `merges` (in rank order) to
    * the character sequence of `w` — one nested aggregate() fold. */
  private[graft] def bpeEncode(w: Column, merges: Seq[(String, String)]): Column = {
    val chars = filter(split(w, ""), s => s =!= "")
    if (merges.isEmpty) chars
    else {
      val ms = array(merges.map { case (a, b) =>
        struct(lit(a).as("a"), lit(b).as("b")) }: _*)
      aggregate(ms, chars, (syms, m) =>
        aggregate(syms, array().cast("array<string>"), (acc, s) =>
          when(size(acc) > 0 &&
            element_at(acc, -1) === m.getField("a") && s === m.getField("b"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(m.getField("a"), m.getField("b")))))
            .otherwise(concat(acc, array(s)))))
    }
  }

  /** Adjacent-pair structs of a symbol array (empty when < 2 symbols —
    * sequence(1,0) would DESCEND in Spark, so the guard is load-bearing). */
  private def pairsOf(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b"))))

  /** Train `rounds` merges on the word vocabulary of `d`'s documents.
    * Throws if a round finds no pairs (the oracle replays a FIXED round
    * count; silent early-stop would desync the engines). */
  private[graft] def trainBpeMerges(s: SparkSession, d: String,
      rounds: Int): Seq[(String, String)] = {
    val vocab = Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .cache() // reused every round; freed below
    try {
      var merges = Vector.empty[(String, String)]
      for (r <- 1 to rounds) {
        val best = vocab
          .select(explode(pairsOf(bpeEncode(col("w"), merges))).as("p"), col("cnt"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("a"), col("b"))
          .limit(1).collect()
        require(best.nonEmpty, s"BPE round $r found no pairs — corpus too small")
        merges :+= ((best(0).getString(0), best(0).getString(1)))
      }
      merges
    } finally vocab.unpersist()
  }

  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  /** Trained merge table, cached per dataset fingerprint (a tokenizer is
    * a train-once artifact; composed queries must not retrain). */
  private[graft] def trainedBpe(s: SparkSession, d: String): Seq[(String, String)] =
    bpeCache.computeIfAbsent(Tables.stageTag(d),
      _ => trainBpeMerges(s, d, BpeRounds))

  def bpe(s: SparkSession, d: String): DataFrame = {
    val merges = trainedBpe(s, d)
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_ws"),
        flatten(transform(col("t"), w => bpeEncode(w, merges))).as("toks"))
      .select(col("doc_id"), col("n_ws"),
        size(col("toks")).cast("long").as("n_bpe"),
        concat_ws(" ", slice(col("toks"), 1, 8)).as("preview"))
      .orderBy("doc_id")
  }

  /** The nested encode fold in DuckDB 1.0 form: list_reduce has no
    * initial-value arg, so the accumulator is prepended and both folds
    * wrap elements to match its type (chars → single-element lists,
    * merges → a struct carrying the symbol array through). */
  private def bpeEncodeSql(w: String, ms: String): String =
    s"""list_reduce(
       |  list_prepend({'s': string_split($w, ''), 'a': CAST(NULL AS VARCHAR), 'b': CAST(NULL AS VARCHAR)},
       |    list_transform($ms, m -> {'s': CAST(NULL AS VARCHAR[]), 'a': m.a, 'b': m.b})),
       |  (acc, x) -> {'s':
       |    list_reduce(
       |      list_prepend(CAST([] AS VARCHAR[]), list_transform(acc.s, s -> [s])),
       |      (a2, x2) -> CASE WHEN len(a2) > 0 AND a2[len(a2)] = x.a AND x2[1] = x.b
       |                  THEN list_append(a2[1:len(a2)-1], x.a || x.b)
       |                  ELSE list_append(a2, x2[1]) END),
       |    'a': CAST(NULL AS VARCHAR), 'b': CAST(NULL AS VARCHAR)}).s"""
      .stripMargin.replace("\n", " ")

  /** Shared oracle CTE prefix: toks (doc_id, word array), vocab, the
    * 12 training rounds, and wenc (distinct word → BPE tokens). Every
    * CTE is MATERIALIZED: DuckDB inlines CTEs by default, and each
    * round references all previous merge CTEs — inlining re-executes
    * the whole chain prefix per reference (exponential in rounds;
    * observed as a never-finishing oracle at 12). Doc-level encoding
    * goes vocab-first: encode each DISTINCT word once and join back —
    * the production amortization, and it keeps the lambdas 2 deep (a
    * third level segfaults DuckDB 1.0). Shared with the BPE-fed
    * token-budget oracle ([[Sampling.tokenBudgetBpeSql]]). */
  private[queries] val bpeCtesSql: String = {
    def msLit(k: Int): String = // merges m1..mk as a struct list
      (1 to k).map(i => s"{'a': m$i.a, 'b': m$i.b}").mkString("[", ", ", "]")
    def msFrom(k: Int): String = (1 to k).map(i => s"m$i").mkString(", ")
    val rounds = (1 to BpeRounds).map { k =>
      val enc =
        if (k == 1)
          s"e1 AS MATERIALIZED (SELECT w, cnt, string_split(w, '') AS syms FROM vocab)"
        else
          s"""e$k AS MATERIALIZED (SELECT w, cnt, ${bpeEncodeSql("w", msLit(k - 1))} AS syms
             |  FROM vocab, ${msFrom(k - 1)})""".stripMargin
      s"""$enc,
         |p$k AS MATERIALIZED (
         |  SELECT t.pr.a AS a, t.pr.b AS b, sum(cnt)::BIGINT AS c
         |  FROM e$k, unnest(list_transform(generate_series(1, len(syms) - 1),
         |    i -> {'a': syms[i], 'b': syms[i + 1]})) t(pr)
         |  GROUP BY t.pr.a, t.pr.b),
         |m$k AS MATERIALIZED (SELECT a, b FROM p$k ORDER BY c DESC, a, b LIMIT 1)""".stripMargin
    }.mkString(",\n")
    s"""toks AS MATERIALIZED (SELECT doc_id, ${TextAnalysis.tokensSql} AS t FROM documents),
       |vocab AS MATERIALIZED (
       |  SELECT u.w AS w, count(*)::BIGINT AS cnt
       |  FROM toks, unnest(t) u(w) GROUP BY u.w),
       |$rounds,
       |wenc AS MATERIALIZED (
       |  SELECT w, ${bpeEncodeSql("w", msLit(BpeRounds))} AS wtoks
       |  FROM vocab, ${msFrom(BpeRounds)})""".stripMargin
  }

  val bpeSql: String =
    s"""WITH $bpeCtesSql,
       |dw AS (SELECT doc_id, u.i AS pos, t[u.i] AS w
       |       FROM toks, unnest(generate_series(1, len(t))) u(i)),
       |joined AS (SELECT dw.doc_id, dw.pos, wenc.wtoks FROM dw JOIN wenc USING (w)),
       |enc AS (SELECT doc_id, flatten(list(wtoks ORDER BY pos)) AS toks
       |        FROM joined GROUP BY doc_id)
       |SELECT d.doc_id, len(d.t)::BIGINT AS n_ws,
       |  COALESCE(len(e.toks), 0)::BIGINT AS n_bpe,
       |  array_to_string(COALESCE(e.toks, CAST([] AS VARCHAR[]))[1:8], ' ') AS preview
       |FROM toks d LEFT JOIN enc e USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // --- q_tp_bpe_vocab -------------------------------------------------------
  // The TOKENIZER ARTIFACT as a query: the trained merge table itself
  // (rank, pair, merged symbol) — what a pipeline ships alongside the
  // model, and the row that hash-pins TRAINING end-to-end directly
  // (q_tp_bpe pins it through the encode; this pins each round's argmax
  // pair verbatim). The Spark side emits the driver-trained literals —
  // the merge table IS a driver artifact, like the Lloyd centroids —
  // and the oracle replays all rounds and selects each round's winner.
  def bpeVocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainedBpe(s, d).zipWithIndex
      .map { case ((a, b), i) => ((i + 1).toLong, a, b, a + b) }
      .toDF("rank", "a", "b", "merged")
      .orderBy("rank")
  }

  val bpeVocabSql: String = {
    val rows = (1 to BpeRounds)
      .map(k => s"SELECT CAST($k AS BIGINT) AS rank, a, b, a || b AS merged FROM m$k")
      .mkString("\nUNION ALL ")
    s"""WITH $bpeCtesSql
       |$rows
       |ORDER BY rank""".stripMargin
  }

  // --- q_tp_bpe_roundtrip -----------------------------------------------------
  // THE DECODE HALF OF THE TOKENIZER CONTRACT: detokenize the encoded
  // stream and hash-verify decode(encode(w)) == w over the real corpus
  // vocabulary. A bare concat of the emitted token STRINGS would pass
  // for any segmentation (merges only ever concatenate adjacent
  // symbols), so the round-trip goes through the CLOSED ID VOCABULARY
  // instead — base characters of the corpus plus the trained merge
  // symbols, each assigned an id by sort order (what a tokenizer
  // ships): encode → token → id (LEFT join: a boundary bug that emits
  // a symbol outside the closed vocabulary surfaces as an OOV null,
  // not a silent pass) → id back to string → positional reassembly.
  // q_tp_fertility and the token-budget samplers CONSUME encode; this
  // row is what makes a count-preserving boundary corruption visible.
  //
  // 100 TB shape: vocab-first like q_tp_bpe (each DISTINCT word encodes
  // once); the id table is alphabet+merges-sized, broadcast on both
  // sides of the trip; the only shuffle is the word-grain groupBy. The
  // row_number id assignment is a single-partition window over that
  // token table — legal precisely because the token vocabulary is a
  // model artifact (≤ alphabet + BpeRounds rows), never data-grain.
  def bpeRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merges = trainedBpe(s, d)
    val words = Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w")).distinct()
    val baseToks = words
      .select(explode(filter(split(col("w"), ""), c => c =!= "")).as("tok"))
      .distinct()
    val tokTable = baseToks
      .unionByName(merges.map { case (a, b) => a + b }.distinct.toDF("tok"))
      .distinct()
      .withColumn("tok_id", row_number().over(Window.orderBy("tok")))
      .localCheckpoint() // tiny model artifact, read twice below
    val stream = words
      .select(col("w"), posexplode(bpeEncode(col("w"), merges)))
      .toDF("w", "pos", "tok")
    stream
      .join(broadcast(tokTable), Seq("tok"), "left")
      .drop("tok") // decode must go THROUGH the id, never the string
      .join(broadcast(tokTable.select(col("tok_id"), col("tok").as("dtok"))),
        Seq("tok_id"), "left")
      .groupBy("w")
      .agg(count(lit(1)).as("n_toks"),
        count(when(col("tok_id").isNull, 1)).as("n_oov"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("pos"), col("dtok")))),
          x => x.getField("dtok"))).as("decoded"))
      .select(col("w"), col("n_toks"), col("n_oov"),
        (col("n_oov") === 0 && col("decoded") === col("w")).as("ok"))
      .orderBy("w")
  }

  lazy val bpeRoundtripSql: String = {
    val mergeUnion = (1 to BpeRounds)
      .map(k => s"SELECT a || b AS tok FROM m$k").mkString(" UNION ALL ")
    s"""WITH $bpeCtesSql,
       |base AS (SELECT DISTINCT u.c AS tok
       |         FROM vocab, unnest(string_split(w, '')) u(c)),
       |toktable AS (
       |  SELECT tok, row_number() OVER (ORDER BY tok) AS tok_id FROM (
       |    SELECT DISTINCT tok FROM (
       |      SELECT tok FROM base UNION ALL $mergeUnion))),
       |stream AS (
       |  SELECT w, u.i AS pos, wtoks[u.i] AS tok
       |  FROM wenc, unnest(generate_series(1, len(wtoks))) u(i)),
       |withid AS (
       |  SELECT s.w, s.pos, t.tok_id FROM stream s
       |  LEFT JOIN toktable t USING (tok)),
       |dec AS (
       |  SELECT i.w, count(*)::BIGINT AS n_toks,
       |    count(CASE WHEN i.tok_id IS NULL THEN 1 END)::BIGINT AS n_oov,
       |    string_agg(t.tok, '' ORDER BY i.pos) AS decoded
       |  FROM withid i LEFT JOIN toktable t USING (tok_id)
       |  GROUP BY i.w)
       |SELECT w, n_toks, n_oov,
       |  (n_oov = 0 AND decoded = w) AS ok
       |FROM dec ORDER BY w""".stripMargin
  }

  // --- q_tp_sft_pack ----------------------------------------------------------
  // SFT / INSTRUCTION-TUNING ASSEMBLY — the step between a curated
  // corpus and a supervised fine-tune batch: pack each conversation
  // into ONE chat-templated training sequence and emit the per-turn
  // TOKEN AND CHARACTER SPANS plus the LOSS MASK the trainer consumes
  // (loss only on assistant turns — the standard SFT masking rule;
  // masking is span arithmetic over the token stream, so the spans ARE
  // the operator, not the rendered string, which never materializes).
  //
  // Conversations are the `source` groups, turns the documents in
  // doc_id order, roles alternating user/assistant. The template
  // contributes fixed-width specials per turn — a role marker
  // ("<|user|>\n" = 9 chars / "<|assistant|>\n" = 14) and a trailer
  // ("\n<|end|>\n" = 9), each ONE token in the stream — so a turn
  // occupies n_toks + 2 tokens, and every span is a prefix sum over
  // the conversation's turns. The loss span opens AFTER the role
  // marker and includes the end token (the model must learn to stop).
  //
  // 100 TB shape: one shuffle on the conversation key, then pure
  // intra-partition window prefix sums — conversations are bounded
  // (dialogue length), so partition skew is structurally capped; no
  // global window, no collect, no string assembly at scale.
  def sftPack(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy("source").orderBy("doc_id")
    val wCum = Window.partitionBy("source").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val turns = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("n_chars_t"))
      .withColumn("turn_idx", (row_number().over(wOrd) - 1).cast("long"))
      .withColumn("role",
        when(col("turn_idx") % 2 === 0, lit("user")).otherwise(lit("assistant")))
    val hdrLen = when(col("role") === "user", lit(9L)).otherwise(lit(14L))
    turns
      .withColumn("tok_start",
        coalesce(sum(col("n_toks") + lit(2L)).over(wCum), lit(0L)))
      .withColumn("char_start",
        coalesce(sum(hdrLen + col("n_chars_t") + lit(9L)).over(wCum), lit(0L)))
      .select(col("source"), col("turn_idx"), col("doc_id"), col("role"),
        col("n_toks"),
        col("tok_start"),
        (col("tok_start") + col("n_toks") + lit(2L)).as("tok_end"),
        col("char_start"),
        (col("char_start") + hdrLen + col("n_chars_t") + lit(9L)).as("char_end"),
        (col("role") === "assistant").as("loss"))
      .orderBy("source", "turn_idx")
  }

  lazy val sftPackSql: String =
    s"""WITH t AS MATERIALIZED (
       |  SELECT source, doc_id, len(${TextAnalysis.tokensSql}) AS n_toks,
       |    length(text) AS n_chars_t,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS turn_idx
       |  FROM documents),
       |r AS (SELECT *,
       |    CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    CASE WHEN turn_idx % 2 = 0 THEN 9 ELSE 14 END AS hdr FROM t)
       |SELECT source, turn_idx::BIGINT AS turn_idx, doc_id, role,
       |  n_toks::BIGINT AS n_toks,
       |  COALESCE(CAST(sum(n_toks + 2) OVER w AS BIGINT), 0) AS tok_start,
       |  COALESCE(CAST(sum(n_toks + 2) OVER w AS BIGINT), 0) + n_toks + 2
       |    AS tok_end,
       |  COALESCE(CAST(sum(hdr + n_chars_t + 9) OVER w AS BIGINT), 0)
       |    AS char_start,
       |  COALESCE(CAST(sum(hdr + n_chars_t + 9) OVER w AS BIGINT), 0)
       |    + hdr + n_chars_t + 9 AS char_end,
       |  role = 'assistant' AS loss
       |FROM r
       |WINDOW w AS (PARTITION BY source ORDER BY turn_idx
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |ORDER BY source, turn_idx""".stripMargin

  // --- q_llm_e2e ------------------------------------------------------------
  // The WHOLE curation pipeline composed, with per-document FATE
  // attribution — the q_wp_ingest_e2e of the LLM-data side: every doc
  // flows eval-holdout → quality trim → exact dedup → near-dup →
  // contamination, each stage operating on the SURVIVORS of the
  // previous ones (the sequential semantics a production pipeline
  // has), and the output names each doc's first failing stage or its
  // shard + token count if kept. Stage rules are the verified
  // operators REUSED, not re-derivations: the quality percentile is
  // q_tx_quality_trim's rule scoped to the corpus (non-eval) docs,
  // exact dedup is q_dd_exact's keep-lowest-id among quality
  // survivors, near-dup reuses Dedup.minhashLsh's verified pair
  // generation verbatim (bands, caps, jaccard ≥ 0.5) with the
  // order-free drop rule (drop the higher id where the lower id
  // survived the EARLIER stages — the q_dd_semdedup relaxation, so
  // the stage stays one join instead of a sequential sweep), and
  // contamination is q_dd_contamination's broadcast eval-shingle
  // probe unchanged. A drift in ANY stage's semantics moves some
  // doc's fate and breaks the hash — the composition is what's
  // verified here, the pieces already are individually. At 100 TB
  // every stage keeps its own scale story; the composition adds only
  // doc-grain flag joins. (The synthetic corpus has no VERBATIM
  // duplicates at any SF — q_dd_exact shows one group per doc — so
  // the exact_dup fate is structurally dead here; its rule is
  // exercised by q_dd_exact's own oracle, and the five live fates at
  // sf0.01 are kept 411 / quality 49 / eval_holdout 20 / near_dup 19
  // / contaminated 1.)
  def llmPipeline(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % Dedup.EvalMod =!= 0)
    val punct =
      (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
        greatest(length(col("text")), lit(1))).as("punct_ratio")
    val w = Window.partitionBy("lang").orderBy(col("punct_ratio"), col("doc_id"))
    val quality = corpus.select(col("doc_id"), col("lang"), punct)
      .withColumn("pr", percent_rank().over(w))
      .select(col("doc_id"), (col("pr") <= 0.9).as("q_keep"))
    val qs = corpus.join(quality, "doc_id").filter(col("q_keep"))
    val keepers = qs
      .withColumn("keeper",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .select(col("doc_id"), (col("doc_id") === col("keeper")).as("e_keep"))
    val surv12 = keepers.filter(col("e_keep")).select(col("doc_id"))
    val ndDrop = Dedup.minhashLsh(s, d)
      .select(col("doc_a"), col("doc_b"))
      .join(surv12.select(col("doc_id").as("doc_a")), "doc_a")
      .join(surv12.select(col("doc_id").as("doc_b")), "doc_b")
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("nd_drop", lit(true))
    val contam = Dedup.contamination(s, d)
      .select(col("doc_id"), col("contaminated"))
    val fate = docs
      .join(quality, Seq("doc_id"), "left")
      .join(keepers.select("doc_id", "e_keep"), Seq("doc_id"), "left")
      .join(broadcast(ndDrop), Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % Dedup.EvalMod === 0, "eval_holdout")
          .when(!col("q_keep"), "quality")
          .when(!col("e_keep"), "exact_dup")
          .when(col("nd_drop").isNotNull, "near_dup")
          .when(col("contaminated"), "contaminated")
          .otherwise("kept").as("fate"))
    fate.select(col("doc_id"), col("fate"),
      when(col("fate") === "kept",
        (Hashes.md5Int32(col("doc_id").cast("string")) % NumShards).cast("long"))
        .as("shard"),
      when(col("fate") === "kept",
        size(TextAnalysis.tokens(col("text"))).cast("long")).as("n_tokens"))
      .orderBy("doc_id")
  }

  val llmPipelineSql: String =
    s"""WITH corpus AS (
       |  SELECT * FROM documents WHERE doc_id % ${Dedup.EvalMod} <> 0),
       |quality AS (
       |  SELECT doc_id, pr <= 0.9 AS q_keep FROM (
       |    SELECT doc_id,
       |      percent_rank() OVER (PARTITION BY lang
       |        ORDER BY length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
       |          / greatest(length(text), 1)::DOUBLE, doc_id) AS pr
       |    FROM corpus)),
       |qs AS (
       |  SELECT c.* FROM corpus c JOIN quality q ON c.doc_id = q.doc_id
       |  WHERE q.q_keep),
       |keepers AS (
       |  SELECT doc_id,
       |    doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS e_keep
       |  FROM qs),
       |surv12 AS (SELECT doc_id FROM keepers WHERE e_keep),
       |nd AS (
       |  SELECT DISTINCT p.doc_b AS doc_id FROM (
       |    SELECT doc_a, doc_b FROM ($minhashLshInner)) p
       |  JOIN surv12 a ON p.doc_a = a.doc_id
       |  JOIN surv12 b ON p.doc_b = b.doc_id),
       |contam AS (
       |  SELECT doc_id, contaminated FROM (${Dedup.contaminationSql})),
       |fate AS (
       |  SELECT d.doc_id, d.text,
       |    CASE WHEN d.doc_id % ${Dedup.EvalMod} = 0 THEN 'eval_holdout'
       |      WHEN NOT q.q_keep THEN 'quality'
       |      WHEN NOT k.e_keep THEN 'exact_dup'
       |      WHEN n.doc_id IS NOT NULL THEN 'near_dup'
       |      WHEN c.contaminated THEN 'contaminated'
       |      ELSE 'kept' END AS fate
       |  FROM documents d
       |  LEFT JOIN quality q ON d.doc_id = q.doc_id
       |  LEFT JOIN keepers k ON d.doc_id = k.doc_id
       |  LEFT JOIN nd n ON d.doc_id = n.doc_id
       |  LEFT JOIN contam c ON d.doc_id = c.doc_id)
       |SELECT doc_id, fate,
       |  CASE WHEN fate = 'kept'
       |    THEN (${Hashes.md5Int32Sql("doc_id::VARCHAR")} % $NumShards)::BIGINT
       |    END AS shard,
       |  CASE WHEN fate = 'kept'
       |    THEN len(${TextAnalysis.tokensSql})::BIGINT END AS n_tokens
       |FROM fate
       |ORDER BY doc_id""".stripMargin

  /** The verified minhash pair SQL, stripped of its trailing ORDER BY
    * so it can sit inside the pipeline CTE (a bare subquery keeps the
    * sort but DuckDB then forbids further set operations on it). */
  private def minhashLshInner: String =
    Dedup.minhashLshSql.stripSuffix("\nORDER BY doc_a, doc_b")

  // --- q_tp_epochs ----------------------------------------------------------
  // QUALITY-TIERED EPOCH UPSAMPLING — the "repeat good data" mixing
  // rule (public recipe in e.g. Llama/Gopher data notes: high-quality
  // slices see 2–4 epochs while bulk web text sees one). Docs score by
  // an integer quality proxy (stopword occurrences — natural prose
  // carries more function words), split into value-based quartiles, and
  // quartile q is materialized q times (epoch replicas) with a
  // hash-derived shuffle position per replica so epochs interleave
  // instead of repeating back-to-back. NO global sort anywhere and NO
  // driver state: the score domain is small-integer (a count, bounded
  // by the longest doc), so quartile THRESHOLDS come from a score
  // histogram (value-domain-bounded rows) prefix-summed by a window
  // over (score) — single-partition, but over histogram BUCKETS, never
  // docs — reduced to a one-row frame q_i = min score with 4·cum ≥ i·n
  // that broadcast-joins back; docs bucket scan-side against the 3
  // thresholds. Replication is an explode(sequence) — linear,
  // shard-parallel.
  def epochs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopArr = array(TextAnalysis.stopwords.map(lit): _*)
    val scored = Tables.documents(s, d)
      .select(col("doc_id"),
        size(filter(TextAnalysis.tokens(col("text")),
          t => array_contains(stopArr, t))).cast("bigint").as("score"))
      .localCheckpoint() // histogram + assignment read it
    val wcum = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val th = scored.groupBy("score").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wcum))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("n"))))
      .agg(
        min(when(col("cum") * 4 >= col("n"), col("score"))).as("q1"),
        min(when(col("cum") * 4 >= col("n") * 2, col("score"))).as("q2"),
        min(when(col("cum") * 4 >= col("n") * 3, col("score"))).as("q3"))
    scored
      .crossJoin(broadcast(th))
      .withColumn("quartile",
        when(col("score") <= col("q1"), 1L)
          .when(col("score") <= col("q2"), 2L)
          .when(col("score") <= col("q3"), 3L).otherwise(4L))
      .withColumn("epoch", explode(sequence(lit(1L), col("quartile"))))
      .withColumn("ord", Hashes.md5Int48(concat(col("doc_id").cast("string"),
        lit("_ep_"), col("epoch").cast("string"))))
      .select("doc_id", "score", "quartile", "epoch", "ord")
      .orderBy("doc_id", "epoch")
  }

  lazy val epochsSql: String = {
    val stopList = TextAnalysis.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    val h = Hashes.md5Int48Sql("s.doc_id::VARCHAR || '_ep_' || e.epoch::VARCHAR")
    s"""WITH scored AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(list_filter(${TextAnalysis.tokensSql},
       |      t -> list_contains($stopList, t))) AS BIGINT) AS score
       |  FROM documents),
       |hist AS MATERIALIZED (
       |  SELECT score, count(*) AS c FROM scored GROUP BY score),
       |cum AS MATERIALIZED (
       |  SELECT score,
       |    CAST(sum(c) OVER (ORDER BY score) AS BIGINT) AS cum,
       |    (SELECT count(*) FROM scored) AS n
       |  FROM hist),
       |th AS MATERIALIZED (
       |  SELECT
       |    min(CASE WHEN 4 * cum >= 1 * n THEN score END) AS q1,
       |    min(CASE WHEN 4 * cum >= 2 * n THEN score END) AS q2,
       |    min(CASE WHEN 4 * cum >= 3 * n THEN score END) AS q3
       |  FROM cum),
       |qt AS MATERIALIZED (
       |  SELECT doc_id, score,
       |    CASE WHEN score <= q1 THEN 1 WHEN score <= q2 THEN 2
       |         WHEN score <= q3 THEN 3 ELSE 4 END AS quartile
       |  FROM scored, th)
       |SELECT s.doc_id, s.score, CAST(s.quartile AS BIGINT) AS quartile,
       |  CAST(e.epoch AS BIGINT) AS epoch, $h AS ord
       |FROM qt s, unnest(generate_series(1, s.quartile)) e(epoch)
       |ORDER BY doc_id, epoch""".stripMargin
  }

  // --- q_tp_span_corruption ---------------------------------------------------
  // T5-STYLE SPAN CORRUPTION PLAN (Raffel et al. 2020, public):
  // deterministic noise-span selection for denoising objectives. Each
  // token position draws a salted content hash; positions under
  // [[SpanStartPct]]% START a [[SpanLen]]-token masked span, and
  // overlapping spans merge — the per-doc output is the corruption
  // plan digest (token count, merged span count, masked-token count,
  // realized mask ratio), which is what a training run audits before
  // committing to a (rate, mean-span-length) config. Hash-derived,
  // not rand(): re-runs, retries and engine swaps mask the SAME spans,
  // so eval perplexity deltas are attributable to the model, never the
  // mask draw. Pure per-doc array arithmetic — one scan, no shuffle
  // until the demo sort; the expected mask rate is pct×len = 15%.
  private val SpanStartPct = 5
  private val SpanLen = 3

  def spanCorruption(s: SparkSession, d: String): DataFrame = {
    // zero-token docs are dropped HERE, not by the trailing n_tokens
    // filter: sequence(1, 0) is descending ([1, 0]) and would hand the
    // transform lambdas an i=0 probe — an always-throwing array index
    // that only optimizer pushdown was rescuing
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
    // starts(i): position i (1-based) opens a span; masked(i): any of
    // the previous SpanLen-1 positions (or i itself) opened one
    val withStarts = toks.withColumn("starts",
      transform(sequence(lit(1), size(col("t"))),
        i => Hashes.md5Int32(concat(col("doc_id").cast("string"),
          lit("_span_"), i.cast("string"))) % 100 < SpanStartPct))
    // when()-guarded lookbacks: element_at(_, 0) is an ANSI error, so
    // the i<=k positions must never evaluate the shifted index
    val withMask = withStarts.withColumn("masked",
      transform(sequence(lit(1), size(col("t"))), i =>
        element_at(col("starts"), i) ||
          when(i > lit(1), element_at(col("starts"), i - 1)).otherwise(lit(false)) ||
          when(i > lit(2), element_at(col("starts"), i - 2)).otherwise(lit(false))))
    withMask.select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(filter(col("masked"), x => x)).cast("long").as("n_masked"),
        size(filter(sequence(lit(1), size(col("t"))), i =>
          element_at(col("masked"), i) &&
            when(i > lit(1), !element_at(col("masked"), i - 1)).otherwise(lit(true))))
          .cast("long").as("n_spans"))
      .withColumn("mask_ratio",
        col("n_masked").cast("double") / col("n_tokens").cast("double"))
      .orderBy("doc_id")
  }

  lazy val spanCorruptionSql: String = {
    val h = Hashes.md5Int32Sql("doc_id::VARCHAR || '_span_' || i::VARCHAR")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, ${TextAnalysis.tokensSql} AS t FROM documents),
       |st AS MATERIALIZED (
       |  SELECT doc_id, len(t) AS n,
       |    list_transform(generate_series(1, len(t)),
       |      i -> $h % 100 < $SpanStartPct) AS starts
       |  FROM toks WHERE len(t) > 0),
       |mk AS MATERIALIZED (
       |  SELECT doc_id, n,
       |    list_transform(generate_series(1, n), i -> starts[i]
       |      OR (i > 1 AND starts[i - 1])
       |      OR (i > 2 AND starts[i - 2])) AS masked
       |  FROM st)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(masked, x -> x)) AS BIGINT) AS n_masked,
       |  CAST(len(list_filter(generate_series(1, n), i -> masked[i]
       |    AND (i = 1 OR NOT masked[i - 1]))) AS BIGINT) AS n_spans,
       |  len(list_filter(masked, x -> x))::DOUBLE / n::DOUBLE AS mask_ratio
       |FROM mk
       |ORDER BY doc_id""".stripMargin
  }

  // --- q_tp_curation_e2e ------------------------------------------------------
  // THE TRAINING-PREP CONTINUATION of the curation story (round-14
  // verdict item 3): where q_llm_e2e attributes each doc's FATE through
  // the filter stages, this DAG carries the SURVIVORS all the way into
  // trainer-ready layout — near-dup removal → quality screen →
  // group-disjoint split → token-budget pack → shard manifest — each
  // stage the verified operator REUSED on the previous stage's output:
  // near-dup pairs are Dedup.minhashLsh verbatim (bands, caps,
  // jaccard ≥ 0.5; drop the higher id of each pair), the quality screen
  // is the funnel's length-bounds + punctuation rule, the split is
  // q_sm_group_split's source-hash bucketing (so template siblings
  // never straddle train/test), packing is q_tp_pack's exclusive
  // prefix-sum chunking scoped per (split, source), and the manifest is
  // q_tp_shard_manifest's content-hash sharding. The FUNNEL COUNTS ride
  // every output row (n_raw / n_nd_kept / n_q_kept) — each counts the
  // survivors of a stage applied to the PREVIOUS stage's output, so
  // swapping any two stages moves a constant and breaks the hash: the
  // stage ORDERING is what this query verifies, the pieces already are.
  // pack_digest folds every doc's chunk assignment into an exact
  // integer (Σ chunk_id·doc_id mod p, DECIMAL-accumulated), pinning the
  // packing inside the composition without emitting doc-grain rows.
  // n_leaked_sources is the group-split audit — structurally 0, proved
  // not assumed. Scale: each stage keeps its own verified scale story;
  // the composition adds one doc-grain anti-join and constant-size
  // broadcast funnel joins.
  def curationE2e(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // stage 1: near-dup removal (drop the higher doc_id of each pair)
    val dupB = Dedup.minhashLsh(s, d).select(col("doc_b").as("doc_id")).distinct()
    val nd = docs.join(dupB, Seq("doc_id"), "left_anti")
    // stage 2: quality screen — the funnel's length + punctuation rules
    val q = nd.filter(col("n_chars") >= 50 && col("n_chars") <= 5000 &&
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
        greatest(length(col("text")), lit(1)).cast("double") <= 0.1)
    // stage 3: group-disjoint split on the SOURCE hash
    val srcBucket = Hashes.md5Int32(col("source").cast("string")) % 100
    val assigned = q
      .withColumn("split",
        when(srcBucket < 80, "train").when(srcBucket < 90, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("source"), col("split"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    // stage 4: token-budget pack within (split, source)
    val w = Window.partitionBy("split", "source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = assigned
      .withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"tok_offset div $ChunkBudget"))
      .withColumn("shard",
        (Hashes.md5Int32(col("doc_id").cast("string")) % NumShards).cast("long"))
    // funnel constants + the group-split leakage audit ride every row
    val funnel = docs.agg(count(lit(1)).as("n_raw"))
      .crossJoin(nd.agg(count(lit(1)).as("n_nd_kept")))
      .crossJoin(q.agg(count(lit(1)).as("n_q_kept")))
      .crossJoin(packed.select("source", "split").distinct()
        .groupBy("source").agg(count(lit(1)).as("ns"))
        .filter(col("ns") > 1)
        .agg(count(lit(1)).as("n_leaked_sources")))
    packed.groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_tokens")).as("sum_tokens"),
        (sum((col("chunk_id") * col("doc_id")).cast("decimal(38,0)"))
          % lit(1000000007L)).cast("long").as("pack_digest"))
      .crossJoin(broadcast(funnel))
      .orderBy("split", "shard")
  }

  lazy val curationE2eSql: String = {
    val h = s"${Hashes.md5Int32Sql("source::VARCHAR")} % 100"
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT doc_b FROM (${Dedup.minhashLshSql}) z),
       |nd AS MATERIALIZED (
       |  SELECT * FROM documents
       |  WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
       |q AS MATERIALIZED (
       |  SELECT doc_id, source, text FROM nd
       |  WHERE n_chars >= 50 AND n_chars <= 5000
       |    AND length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE
       |      / greatest(length(text), 1)::DOUBLE <= 0.1),
       |asg AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    CASE WHEN $h < 80 THEN 'train' WHEN $h < 90 THEN 'val'
       |         ELSE 'test' END AS split,
       |    len(${TextAnalysis.tokensSql})::BIGINT AS n_tokens
       |  FROM q),
       |packed AS MATERIALIZED (
       |  SELECT doc_id, source, split, n_tokens,
       |    CAST(CAST(coalesce(sum(n_tokens) OVER (
       |      PARTITION BY split, source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      // $ChunkBudget AS BIGINT) AS chunk_id,
       |    (${Hashes.md5Int32Sql("doc_id::VARCHAR")} % $NumShards)::BIGINT AS shard
       |  FROM asg),
       |funnel AS MATERIALIZED (
       |  SELECT
       |    (SELECT count(*) FROM documents) AS n_raw,
       |    (SELECT count(*) FROM nd) AS n_nd_kept,
       |    (SELECT count(*) FROM q) AS n_q_kept,
       |    (SELECT count(*) FROM (
       |       SELECT source FROM (SELECT DISTINCT source, split FROM packed)
       |       GROUP BY source HAVING count(*) > 1)) AS n_leaked_sources)
       |SELECT split, shard, count(*) AS n_docs,
       |  count(DISTINCT source) AS n_sources,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(CAST(chunk_id * doc_id AS DECIMAL(38,0))) % 1000000007
       |    AS BIGINT) AS pack_digest,
       |  funnel.n_raw, funnel.n_nd_kept, funnel.n_q_kept,
       |  funnel.n_leaked_sources
       |FROM packed, funnel
       |GROUP BY split, shard, funnel.n_raw, funnel.n_nd_kept,
       |  funnel.n_q_kept, funnel.n_leaked_sources
       |ORDER BY split, shard""".stripMargin
  }

  // --- q_tp_fertility -----------------------------------------------------------
  // TOKENIZER FERTILITY / COMPRESSION AUDIT — the per-language readout
  // every tokenizer change ships with: BPE tokens per whitespace word
  // (fertility; a language the vocab under-serves fragments into more
  // pieces) and characters per BPE token (compression). Uses the SAME
  // trained, fingerprint-cached tokenizer as q_tp_bpe and the
  // vocab-first encode amortization (encode DISTINCT words once, join
  // counts back — the production shape; per-occurrence folds cost
  // occurrences x merges x symbols). Exact integer masses, one double
  // division per ratio with nullif guards on both engines. Scale: the
  // vocab encode + one doc-grain join + one lang-grain aggregation.
  def fertility(s: SparkSession, d: String): DataFrame = {
    val merges = trainedBpe(s, d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        TextAnalysis.tokens(col("text")).as("t"))
    val wordLens = docs.select(explode(col("t")).as("w")).distinct()
      .select(col("w"), size(bpeEncode(col("w"), merges)).cast("long").as("wlen"))
    val perDoc = docs.select(col("doc_id"), explode(col("t")).as("w"))
      .join(wordLens, "w")
      .groupBy("doc_id").agg(sum(col("wlen")).as("n_bpe"))
    docs.join(perDoc, Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("t")).cast("long")).as("n_ws"),
        sum(coalesce(col("n_bpe"), lit(0L))).as("n_bpe"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_ws"), col("n_bpe"),
        col("n_chars"),
        coalesce(col("n_bpe").cast("double") /
          nullif(col("n_ws").cast("double"), lit(0.0)), lit(0.0)).as("fertility"),
        coalesce(col("n_chars").cast("double") /
          nullif(col("n_bpe").cast("double"), lit(0.0)), lit(0.0))
          .as("chars_per_token"))
      .orderBy("lang")
  }

  lazy val fertilitySql: String =
    s"""WITH $bpeCtesSql,
       |dw AS (SELECT doc_id, t[u.i] AS w
       |       FROM toks, unnest(generate_series(1, len(t))) u(i)),
       |nb AS (SELECT dw.doc_id, sum(len(wenc.wtoks))::BIGINT AS n_bpe
       |       FROM dw JOIN wenc USING (w) GROUP BY dw.doc_id),
       |agg AS (
       |  SELECT d.lang, count(*) AS n_docs,
       |    CAST(sum(len(t.t)) AS BIGINT) AS n_ws,
       |    CAST(sum(coalesce(nb.n_bpe, 0)) AS BIGINT) AS n_bpe,
       |    CAST(sum(length(d.text)) AS BIGINT) AS n_chars
       |  FROM documents d
       |  JOIN toks t ON d.doc_id = t.doc_id
       |  LEFT JOIN nb ON d.doc_id = nb.doc_id
       |  GROUP BY d.lang)
       |SELECT lang, n_docs, n_ws, n_bpe, n_chars,
       |  coalesce(n_bpe::DOUBLE / nullif(n_ws::DOUBLE, 0.0), 0.0) AS fertility,
       |  coalesce(n_chars::DOUBLE / nullif(n_bpe::DOUBLE, 0.0), 0.0)
       |    AS chars_per_token
       |FROM agg
       |ORDER BY lang""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tp_curation_e2e" -> (curationE2e _),
    "q_tp_span_corruption" -> (spanCorruption _),
    "q_tp_epochs" -> (epochs _),
    "q_tp_dataset_card" -> (datasetCard _),
    "q_tp_curation_funnel" -> (curationFunnel _),
    "q_llm_e2e" -> (llmPipeline _),
    "q_tp_bpe_vocab" -> (bpeVocab _),
    "q_tp_bpe_roundtrip" -> (bpeRoundtrip _),
    "q_tp_sft_pack" -> (sftPack _),
    "q_tp_fertility" -> (fertility _),
    "q_tp_pack" -> (pack _),
    "q_tp_tfidf" -> (tfidf _),
    "q_tp_shard_manifest" -> (shardManifest _),
    "q_tp_chunk_overlap" -> (chunkOverlap _),
    "q_tp_shuffle" -> (shuffleOrder _),
    "q_tp_bpe" -> (bpe _),
    "q_tp_row_ids" -> (rowIds _))

  val oracles: Map[String, String] = Map(
    "q_tp_curation_e2e" -> curationE2eSql,
    "q_tp_span_corruption" -> spanCorruptionSql,
    "q_tp_epochs" -> epochsSql,
    "q_tp_dataset_card" -> datasetCardSql,
    "q_tp_curation_funnel" -> curationFunnelSql,
    "q_llm_e2e" -> llmPipelineSql,
    "q_tp_bpe_vocab" -> bpeVocabSql,
    "q_tp_bpe_roundtrip" -> bpeRoundtripSql,
    "q_tp_sft_pack" -> sftPackSql,
    "q_tp_fertility" -> fertilitySql,
    "q_tp_pack" -> packSql,
    "q_tp_tfidf" -> tfidfSql,
    "q_tp_shard_manifest" -> shardManifestSql,
    "q_tp_chunk_overlap" -> chunkOverlapSql,
    "q_tp_shuffle" -> shuffleOrderSql,
    "q_tp_bpe" -> bpeSql,
    "q_tp_row_ids" -> rowIdsSql)
}
