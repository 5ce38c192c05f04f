package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY §2 appears as a named entry in
  * [[queries]]; where the semantics are SQL-expressible the matching
  * DuckDB oracle is in [[oracleSql]] (same column names, total ordering).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.flagshipPage(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.queries.Relational.all ++
      _root_.graft.queries.TextAnalysis.all ++
      _root_.graft.queries.Dedup.all ++
      _root_.graft.queries.Similarity.all ++
      _root_.graft.queries.Discovery.all ++
      _root_.graft.queries.Temporal.all ++
      _root_.graft.queries.Analytics.all ++
      _root_.graft.queries.Subqueries.all ++
      _root_.graft.queries.Sampling.all ++
      _root_.graft.queries.TrainPrep.all ++
      _root_.graft.queries.LayoutQueries.all ++
      _root_.graft.queries.Graph.all ++
      _root_.graft.queries.Parity.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    _root_.graft.queries.Relational.oracles ++
      _root_.graft.queries.TextAnalysis.oracles ++
      _root_.graft.queries.Dedup.oracles ++
      _root_.graft.queries.Similarity.oracles ++
      _root_.graft.queries.Discovery.oracles ++
      _root_.graft.queries.Temporal.oracles ++
      _root_.graft.queries.Analytics.oracles ++
      _root_.graft.queries.Subqueries.oracles ++
      _root_.graft.queries.Sampling.oracles ++
      _root_.graft.queries.TrainPrep.oracles ++
      _root_.graft.queries.LayoutQueries.oracles ++
      _root_.graft.queries.Graph.oracles ++
      _root_.graft.queries.Parity.oracles
}
