package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed-upsert and refresh semantics over plain parquet — the
  * reference's `INSERT … ON CONFLICT` family re-expressed without a
  * lakehouse format (none on this classpath).
  *
  * Semantics preserved exactly:
  *  - last-write-wins on the key (`loader.py:13-18` dict overwrite, then
  *    `ON CONFLICT DO UPDATE`, `loader.py:20-30`)
  *  - insert-if-absent for catalogs (`ON CONFLICT DO NOTHING`,
  *    `series_autoregister.py:55-56`)
  *  - delete-then-reload refresh scoped by a dimension predicate
  *    (`gie/service.py:35-76`)
  *
  * Scale notes: merge work is proportional to |existing ∩ touched
  * partitions| + |incoming|, not table size, once the table is
  * date-partitioned and `partitionOverwriteMode=dynamic` rewrites only
  * touched partitions. The dedup window shuffles on the upsert key —
  * the same key the table is laid out on, so AQE coalesces it against
  * the scan partitioning.
  */
object Upsert {

  /** Last-write-wins dedup: newest `versionCol` row per key; remaining
    * ties broken by the tieBreaker columns for full determinism. */
  def latestWins(df: DataFrame, keys: Seq[String], versionCol: String,
                 tieBreakers: Seq[String] = Nil): DataFrame = {
    val order = (col(versionCol).desc +: tieBreakers.map(col(_).desc)) :+ monotonically_increasing_id().asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Upsert `incoming` into the parquet table at `path`: union existing
    * with incoming, keep the newest row per key, rewrite. Idempotent —
    * re-upserting the same batch is a no-op (property-tested).
    */
  def upsert(spark: SparkSession, path: String, incoming: DataFrame,
             keys: Seq[String], versionCol: String): Unit = {
    val merged =
      if (tableExists(spark, path)) {
        val existing = spark.read.parquet(path)
        latestWins(existing.unionByName(incoming, allowMissingColumns = true),
          keys, versionCol)
      } else latestWins(incoming, keys, versionCol)
    overwriteInPlace(spark, path, merged)
  }

  /** Insert-if-absent (ON CONFLICT DO NOTHING): append only rows whose
    * key is not already present. Set-oriented — one anti-join instead of
    * the reference's per-row SELECT-then-INSERT (`series_builder.py:5-61`). */
  def insertIfAbsent(spark: SparkSession, path: String, incoming: DataFrame,
                     keys: Seq[String]): Unit = {
    val deduped = incoming.dropDuplicates(keys)
    if (!tableExists(spark, path)) {
      deduped.write.mode(SaveMode.Overwrite).parquet(path)
    } else {
      val existing = spark.read.parquet(path).select(keys.map(col): _*)
      deduped.join(broadcast(existing), keys, "left_anti")
        .write.mode(SaveMode.Append).parquet(path)
    }
  }

  /** Delete-then-reload refresh (`gie/service.py:35-76`): drop every fact
    * row whose key appears in `deleteKeys`, then union the replacement
    * rows. The delete is a broadcast anti-join (the delete key set is a
    * dimension slice, small by construction). */
  def deleteRefresh(spark: SparkSession, path: String, deleteKeys: DataFrame,
                    keys: Seq[String], replacement: DataFrame): Unit = {
    val merged =
      if (tableExists(spark, path)) {
        spark.read.parquet(path)
          .join(broadcast(deleteKeys.select(keys.map(col): _*).distinct()),
            keys, "left_anti")
          .unionByName(replacement, allowMissingColumns = true)
      } else replacement
    overwriteInPlace(spark, path, merged)
  }

  /** Overwrite `path` with `df` safely: the plan reads from `path`, so
    * write to a staging dir first, then swap. (With a real catalog this
    * is `INSERT OVERWRITE` + dynamic partition overwrite; the swap keeps
    * plain-parquet tests honest.) */
  private def overwriteInPlace(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val staging = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
  }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(path))
  }
}
