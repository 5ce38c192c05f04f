package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Incremental schema inference over raw JSON payloads — the reference's
  * `discover_fields` (`field_discovery.py:19-64`), which re-scans the
  * *entire* dataset history on every ingest (O(history)). Here discovery
  * is an aggregation over whatever batch it is handed, and [[merge]]
  * folds a batch increment into the standing catalog — O(batch) per
  * ingest, the difference that matters at 100 TB.
  */
object FieldDiscovery {

  /** Python-ish type lattice (`infer_type`, `field_discovery.py:5-16`):
    * null / boolean / integer / float / string (JSON objects arrive
    * stringified upstream and classify as string). */
  def inferType(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(v.isNull, "null")
      .when(v.isin("true", "false"), "boolean")
      .when(v.rlike("^-?[0-9]+$"), "integer")
      .when(v.rlike("^-?[0-9]+\\.[0-9]+([eE][+-]?[0-9]+)?$"), "float")
      .otherwise("string")

  /** Per (dataset_id, field_name): sorted comma-joined type set
    * (`field_discovery.py:47`), nullability, deterministic example
    * (min value, truncated to 200 chars like `field_discovery.py:62`). */
  def discover(rawEvents: DataFrame): DataFrame =
    rawEvents
      .select(col("dataset_id"),
        explode(from_json(col("raw_payload"), MapType(StringType, StringType)))
          .as(Seq("field_name", "v")))
      .groupBy("dataset_id", "field_name")
      .agg(
        concat_ws(",", array_sort(collect_set(inferType(col("v")))))
          .as("inferred_type"),
        max(col("v").isNull).as("nullable"),
        substring(min(col("v")), 1, 200).as("example_value"))

  /** Fold a batch increment into the standing catalog: union the type
    * sets, OR the nullability, keep the first example seen. */
  def merge(catalog: DataFrame, increment: DataFrame): DataFrame =
    catalog.unionByName(increment)
      .groupBy("dataset_id", "field_name")
      .agg(
        concat_ws(",", array_sort(array_distinct(
          flatten(collect_list(split(col("inferred_type"), ","))))))
          .as("inferred_type"),
        max(col("nullable")).as("nullable"),
        min(col("example_value")).as("example_value"))
}
