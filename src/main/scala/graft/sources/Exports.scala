package graft.sources

import org.apache.spark.sql.DataFrame

/** Serving-edge exports (SURVEY §2.2 W5/W6, `app/api/v2/export.py`).
  *
  * The reference streams ≤50k rows as CSV/JSON from the API process; the
  * Spark analog writes through the cluster. `coalesce(1)` mirrors the
  * single-file attachment semantics — safe ONLY because the export cap
  * bounds the row count (the reference caps at 50 000); uncapped exports
  * must keep the natural partitioning and ship a directory.
  */
object Exports {

  val MaxExportRows = 50000 // export.py:16,38

  /** Default page size when the caller omits `limit` — the single
    * source for QueryServer's serving edges AND the cap registry's
    * `cap_export_page_rows` live value (so a serving-default change
    * can never leave the registry reporting a stale number). */
  val DefaultPageRows = 1000 // routes.py:21 / export.py:17 default limit

  /** CSV export with header, reference-capped. */
  def csv(df: DataFrame, path: String, limit: Int = DefaultPageRows): Unit =
    df.limit(math.min(limit, MaxExportRows))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** JSON-lines export, reference-capped. */
  def json(df: DataFrame, path: String, limit: Int = DefaultPageRows): Unit =
    df.limit(math.min(limit, MaxExportRows))
      .coalesce(1)
      .write.mode("overwrite").json(path)

  /** In-process JSON array (the API-edge `top-N raw payloads` shape,
    * export.py:13-31) — bounded by the same cap, collected at the edge. */
  def jsonArray(df: DataFrame, limit: Int = DefaultPageRows): Seq[String] =
    df.limit(math.min(limit, MaxExportRows)).toJSON.collect().toSeq
}
