package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** JSON source operators (SURVEY §2.1 S1-S6): the reference's REST→JSON
  * ingestion, Spark-first. HTTP fetching stays driver-side (a handful of
  * small API calls — not cluster work); everything after the payload
  * lands is distributed:
  *
  *  - `pd.json_normalize` ≡ `spark.read.json(Dataset[String])` with
  *    schema inference, then struct flattening.
  *  - the reference's 3-level Python unnest loops
  *    (`instantaneousFlow[] → sites[] → siteGasDetail[]`,
  *    `national_gas_client.py:193-222`) ≡ a chain of `explode`s —
  *    set-oriented, one pass, no row-at-a-time work.
  *  - the 2-day date-chunk generator (`_daterange_chunks`,
  *    `national_gas_client.py:61-66`) ≡ `sequence` + `explode`, so the
  *    fetch plan itself is a DataFrame the scheduler can partition.
  */
object JsonIngest {

  /** Parse a dataset of raw JSON documents with schema inference —
    * the `json_normalize` entry point. */
  def readJson(spark: SparkSession, raw: Dataset[String]): DataFrame =
    spark.read.json(raw)

  /** Flatten one struct column into top-level `prefix_field` columns
    * (json_normalize's dotted-path flattening, underscore-joined like the
    * GIE transformer's `f"{key}_{subkey}"`, `gie/transformer.py:36-42`). */
  def flattenStruct(df: DataFrame, structCol: String, sep: String = "_"): DataFrame = {
    val fields = df.schema(structCol).dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
      case other => throw new IllegalArgumentException(
        s"$structCol is ${other.simpleString}, expected struct")
    }
    val flattened = fields.map(f => col(s"`$structCol`.`$f`").as(s"$structCol$sep$f"))
    df.select((df.columns.filterNot(_ == structCol).map(c => col(s"`$c`")) ++ flattened): _*)
  }

  /** Explode a nested array path like "instantaneousFlow.sites.detail":
    * each segment is exploded in turn, parent columns riding along —
    * the multi-level unnest (S3/S5) as one declarative chain. */
  def explodePath(df: DataFrame, path: String): DataFrame = {
    val segs = path.split("\\.")
    segs.zipWithIndex.foldLeft(df) { case (acc, (seg, i)) =>
      // after the first hop, the next array lives inside the just-exploded
      // struct (e.g. flows.detail); it surfaces as a top-level column named
      // by its own segment, parents riding along
      val ref = if (i == 0) col(seg) else col(s"`${segs(i - 1)}`.`$seg`")
      acc.withColumn(seg, explode(ref))
    }
  }

  /** 2-day (configurable) fetch-window chunks as rows — `sequence` +
    * `explode`, so chunking is part of the plan, not a driver loop. */
  def dateChunks(spark: SparkSession, start: String, end: String,
                 days: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DateType
    spark.range(1).select(
      explode(sequence(
        lit(start).cast(DateType),
        lit(end).cast(DateType),
        expr(s"INTERVAL $days DAYS"))).as("chunk_start"))
      .withColumn("chunk_end",
        least(date_add(col("chunk_start"), days), lit(end).cast(DateType)))
      .filter(col("chunk_start") < lit(end).cast(DateType))
  }

  /** Zero-loss raw landing (W1, `raw_ingestor.py:8-54`): every input row
    * serialized whole into a JSON payload column with lineage metadata.
    * NaN→null sanitization comes free from `to_json`.
    *
    * `payloadCol` names an ALREADY-SERIALIZED payload column to reuse:
    * the ingest DAG consumes the same batch's JSON three times (raw
    * landing, field discovery, per-observation payload), and without
    * the reuse each consumer re-ran the full-row `to_json` per pass
    * over the cached batch — serialize once, reference thereafter. */
  def landRaw(df: DataFrame, datasetId: String, seriesHintCol: Option[String] = None,
              payloadCol: Option[String] = None): DataFrame =
    df.select(
      uuid().as("event_id"),
      lit(datasetId).as("dataset_id"),
      seriesHintCol.map(col).getOrElse(lit(null).cast("string")).as("series_hint"),
      payloadCol.map(col).getOrElse(
        to_json(struct(df.columns.map(col): _*))).as("raw_payload"),
      current_timestamp().as("ingested_at"))
}
