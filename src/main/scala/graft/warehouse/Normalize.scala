package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Set-oriented normalization: the reference's per-series Python loops
  * (fetch wide frame → per-series filter → per-row emit,
  * `app/ingestion/run_all.py:91-108` × `transformer.py:14-39`) expressed
  * as single DataFrame transformations. One pass over the input,
  * whatever the series count — the reference re-scans the frame once per
  * series (O(series × rows)).
  */
object Normalize {

  /** Series-id slug — `make_series_id` (`series_autoregister.py:7-16`):
    * uppercase, strip `,()`, spaces→`_`, join parts, prefix `NG_{dataset}`.
    * A pure column expression: codegen'd, usable in joins and filters, and
    * the single source of truth the reference lacked (its transformers
    * re-parse ids by hand, `transformer.py:17-24`).
    */
  def makeSeriesId(dataset: Column, parts: Column*): Column = {
    val slugged = parts.map(p =>
      regexp_replace(regexp_replace(upper(trim(p)), "[,()]", ""), "\\s+", "_"))
    concat_ws("_", (lit("NG") +: dataset +: slugged): _*)
  }

  /** The reference's NULL-like value set (`gie/constants.py:19`,
    * `transformer.py:80`): empty/blank strings become real nulls. */
  def nullIfBlank(c: Column): Column =
    when(trim(c) === "" || c.isNull, lit(null)).otherwise(c)

  /** Strict-skip numeric parse (`transformer.py:83-86`: `try/except
    * ValueError: continue`): non-numeric → null, to be filtered.
    * `try_cast`, not `cast` — ANSI mode (Spark 4 default) makes a plain
    * cast throw on unparseable input instead of yielding null. */
  def safeDouble(c: Column): Column = nullIfBlank(c).try_cast("double")

  /** Wide→long unpivot of every numeric metric column (SURVEY §2.5 A7):
    * the GAS_QUALITY transform. `idCols` ride along; each numeric,
    * non-excluded column becomes one (metric, value) row.
    * Metric selection mirrors `series_autoregister.py:26-30` (numeric
    * dtypes minus id/time columns).
    */
  def unpivotNumeric(df: DataFrame, idCols: Seq[String],
                     exclude: Set[String] = Set.empty): DataFrame = {
    val metricCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] &&
        !idCols.contains(f.name) && !exclude.contains(f.name) => f.name
    }.toSeq
    df.unpivot(
      idCols.map(col).toArray,
      metricCols.map(c => col(c).cast("double").as(c)).toArray,
      "metric", "value")
  }

  /** Observation assembly: slug + UTC timestamp + value filter — the
    * narrow (series_id, observation_time, value) fact rows
    * (`transformer.py:26-39`), with unparseable values dropped the way
    * the reference's try/except-continue does.
    *
    * If the input carries a `raw_payload` column it rides through to the
    * fact rows — the reference attaches each source row's JSON to every
    * observation it yields (`transformer.py:36`:
    * `clean_json_payload(row.to_dict())`), which is what `GET /v2/data
    * ?include_raw=true` serves back per point (`routes.py:57`).
    */
  def toObservations(unpivoted: DataFrame, dataset: String,
                     timeCol: String, partCols: Seq[String]): DataFrame = {
    val carry =
      if (unpivoted.columns.contains("raw_payload")) Seq("raw_payload") else Nil
    unpivoted
      .withColumn("series_id",
        makeSeriesId(lit(dataset), (partCols.map(col) :+ col("metric")): _*))
      // try_to_timestamp: lenient parse (errors="coerce", transformer.py:70)
      // — and under ANSI (Spark 4 default) a plain to_timestamp would throw.
      .withColumn("observation_time", try_to_timestamp(col(timeCol)))
      .withColumn("value", safeDouble(col("value")))
      .filter(col("value").isNotNull && !isnan(col("value")) &&
        col("observation_time").isNotNull)
      .select(("series_id" +: "observation_time" +: "value" +: carry).map(col): _*)
  }
}
