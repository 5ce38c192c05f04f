package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.warehouse.{FieldDiscovery, Normalize, Upsert}

/** Unit + property coverage for the warehouse layer, on literal frames
  * mirroring reference fixtures (SURVEY §5).
  */
class WarehouseSpec extends SparkSpec {
  import ss.implicits._

  test("makeSeriesId matches the reference slug rules") {
    // series_autoregister.py:7-16: upper, strip ,(), spaces→_, NG_ prefix
    val df = Seq(("GAS_QUALITY", "St Fergus, (North)", "WOBBE"))
      .toDF("ds", "site", "metric")
      .select(Normalize.makeSeriesId(col("ds"), col("site"), col("metric")).as("sid"))
    assert(df.head.getString(0) == "NG_GAS_QUALITY_ST_FERGUS_NORTH_WOBBE")
  }

  test("nullIfBlank applies the reference NULL-like set") {
    val df = Seq("", " ", "x", "  y  ").toDF("v")
      .select(Normalize.nullIfBlank(col("v")).as("v"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, None, Some("x"), Some("  y  ")))
  }

  test("safeDouble parses like try/except-continue") {
    val df = Seq("1.5", "abc", "", " ", "-2", "1e3").toDF("v")
      .select(Normalize.safeDouble(col("v")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1.5), None, None, None, Some(-2.0), Some(1000.0)))
  }

  test("unpivotNumeric melts every numeric metric column") {
    val wide = Seq((1L, "a", 2.0, 3.0, "x"), (2L, "b", 4.0, 5.0, "y"))
      .toDF("id", "site", "co2", "wobbe", "note")
    val long = Normalize.unpivotNumeric(wide, Seq("id", "site"))
    assert(long.count() == 4)
    assert(long.select("metric").distinct().collect().map(_.getString(0)).toSet ==
      Set("co2", "wobbe"))
  }

  test("toObservations builds slug, filters unparseable, keeps parseable") {
    val wide = Seq(
      ("2024-01-01 00:00:00", "SiteA", 1.25, 2.0),
      ("not-a-time", "SiteA", 9.0, 9.0), // dropped: bad timestamp
      ("2024-01-02 00:00:00", "SiteB", Double.NaN, 3.5))
      .toDF("ts", "site", "co2", "wobbe")
    val obs = Normalize.toObservations(
      Normalize.unpivotNumeric(wide, Seq("ts", "site")),
      "GAS_QUALITY", "ts", Seq("site"))
    val rows = obs.collect()
    assert(rows.map(_.getString(0)).forall(_.startsWith("NG_GAS_QUALITY_SITE")))
    // 2 rows from line 1; line 3 contributes only wobbe (NaN co2 dropped,
    // matching the reference's pd.isna skip at raw_ingestor.py:14-18)
    assert(rows.length == 3)
  }

  private def tmp(): String =
    Files.createTempDirectory("graft-upsert").resolve("t").toString

  private def obsBatch(rows: Seq[(String, String, Double, String)]) =
    rows.toDF("series_id", "observation_time", "value", "ingestion_time")
      .select(col("series_id"),
        to_timestamp(col("observation_time")).as("observation_time"),
        col("value"),
        to_timestamp(col("ingestion_time")).as("ingestion_time"))

  test("upsert is idempotent and last-write-wins") {
    val path = tmp()
    val keys = Seq("series_id", "observation_time")
    val b1 = obsBatch(Seq(
      ("s1", "2024-01-01 00:00:00", 1.0, "2024-02-01 00:00:00"),
      ("s1", "2024-01-02 00:00:00", 2.0, "2024-02-01 00:00:00")))
    Upsert.upsert(spark, path, b1, keys, "ingestion_time")
    Upsert.upsert(spark, path, b1, keys, "ingestion_time") // re-ingest: no-op
    assert(spark.read.parquet(path).count() == 2)

    // newer ingestion_time wins; older write is ignored
    val b2 = obsBatch(Seq(
      ("s1", "2024-01-01 00:00:00", 10.0, "2024-02-02 00:00:00"),
      ("s1", "2024-01-02 00:00:00", -1.0, "2024-01-15 00:00:00")))
    Upsert.upsert(spark, path, b2, keys, "ingestion_time")
    val out = spark.read.parquet(path).orderBy("observation_time").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("value") == 10.0) // updated
    assert(out(1).getAs[Double]("value") == 2.0)  // stale write ignored
  }

  test("insertIfAbsent appends only new keys") {
    val path = tmp()
    val c1 = Seq(("s1", "m"), ("s2", "m")).toDF("series_id", "unit")
    Upsert.insertIfAbsent(spark, path, c1, Seq("series_id"))
    val c2 = Seq(("s2", "CHANGED"), ("s3", "m")).toDF("series_id", "unit")
    Upsert.insertIfAbsent(spark, path, c2, Seq("series_id"))
    val out = spark.read.parquet(path).orderBy("series_id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("s1", "s2", "s3"))
    assert(out(1).getString(1) == "m") // existing row untouched (DO NOTHING)
  }

  test("deleteRefresh drops scoped keys and loads replacements") {
    val path = tmp()
    val keys = Seq("series_id", "observation_time")
    Upsert.upsert(spark, path, obsBatch(Seq(
      ("gie_1", "2024-01-01 00:00:00", 1.0, "2024-02-01 00:00:00"),
      ("other", "2024-01-01 00:00:00", 5.0, "2024-02-01 00:00:00"))),
      keys, "ingestion_time")
    val replacement = obsBatch(Seq(
      ("gie_1", "2024-01-01 00:00:00", 42.0, "2024-02-03 00:00:00")))
    Upsert.deleteRefresh(spark, path,
      Seq("gie_1").toDF("series_id"), Seq("series_id"), replacement)
    val out = spark.read.parquet(path).orderBy("series_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("value") == 42.0) // reloaded
    assert(out(1).getAs[Double]("value") == 5.0)  // other source untouched
  }

  test("atomic-swap crash consistency: every interrupted-swap state recovers, no data lost") {
    // The StageSpec contract applied to the warehouse swap: simulate the
    // three crash states overwriteInPlace can leave behind and assert
    // the next warehouse operation self-heals (recoverSwap runs at the
    // head of tableExists and overwriteInPlace).
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val keys = Seq("series_id", "observation_time")
    def mkTable(path: String, v: Double): Unit =
      Upsert.upsert(spark, path, obsBatch(Seq(
        ("s1", "2024-01-01 00:00:00", v, "2024-02-01 00:00:00"))),
        keys, "ingestion_time")
    def values(path: String): Seq[Double] =
      spark.read.parquet(path).collect().map(_.getAs[Double]("value")).toSeq

    // (A) stale .staging next to an intact table (crash after the
    // staging write, before any rename): the next refresh overwrites it
    // and publishes cleanly, no leftovers
    val a = tmp()
    mkTable(a, 1.0)
    JFiles.createDirectories(Paths.get(a + ".staging"))
    JFiles.writeString(Paths.get(a + ".staging/garbage"), "partial")
    Upsert.deleteRefresh(spark, a, Seq("s1").toDF("series_id"),
      Seq("series_id"), obsBatch(Seq(("s1", "2024-01-01 00:00:00", 2.0,
        "2024-02-02 00:00:00"))))
    assert(values(a) === Seq(2.0))
    assert(!JFiles.exists(Paths.get(a + ".staging")) &&
      !JFiles.exists(Paths.get(a + ".backup")))

    // (B) crash BETWEEN the two renames with a COMMITTED staging
    // (_SUCCESS present): table dir missing, old bytes in .backup, new
    // bytes in .staging → recovery rolls FORWARD to the staged table
    val b = tmp()
    mkTable(b, 1.0)
    // build a committed "new" table in .staging, then move the live
    // table to .backup — exactly the interrupted-swap layout
    obsBatch(Seq(("s1", "2024-01-01 00:00:00", 9.0, "2024-02-03 00:00:00")))
      .write.parquet(b + ".staging")
    JFiles.move(Paths.get(b), Paths.get(b + ".backup"),
      StandardCopyOption.ATOMIC_MOVE)
    assert(Upsert.tableExists(spark, b), "probe must self-heal the swap")
    assert(values(b) === Seq(9.0), "committed staging must roll forward")
    assert(!JFiles.exists(Paths.get(b + ".staging")) &&
      !JFiles.exists(Paths.get(b + ".backup")))

    // (C) the same window with an UNCOMMITTED staging (no _SUCCESS):
    // recovery rolls BACK to the backup — the table is never lost
    val c = tmp()
    mkTable(c, 1.0)
    JFiles.move(Paths.get(c), Paths.get(c + ".backup"),
      StandardCopyOption.ATOMIC_MOVE)
    JFiles.createDirectories(Paths.get(c + ".staging"))
    JFiles.writeString(Paths.get(c + ".staging/part-00000"), "torn write")
    assert(Upsert.tableExists(spark, c))
    assert(values(c) === Seq(1.0), "uncommitted staging must roll back")
    assert(!JFiles.exists(Paths.get(c + ".staging")) &&
      !JFiles.exists(Paths.get(c + ".backup")))

    // and a subsequent read-modify-write over the healed table works
    Upsert.upsert(spark, c, obsBatch(Seq(
      ("s2", "2024-01-02 00:00:00", 3.0, "2024-02-04 00:00:00"))),
      keys, "ingestion_time")
    assert(values(c).sorted === Seq(1.0, 3.0))
  }

  test("field discovery infers the reference type lattice and merges incrementally") {
    val raw1 = Seq(
      ("ds1", """{"a": 1, "b": "x"}"""),
      ("ds1", """{"a": 2.5, "b": null}""")).toDF("dataset_id", "raw_payload")
    val raw2 = Seq(
      ("ds1", """{"a": true, "c": 7}""")).toDF("dataset_id", "raw_payload")
    val cat1 = FieldDiscovery.discover(raw1)
    val m = FieldDiscovery.merge(cat1, FieldDiscovery.discover(raw2))
      .orderBy("field_name").collect()
    val byField = m.map(r => r.getString(1) -> r).toMap
    assert(byField("a").getAs[String]("inferred_type") == "boolean,float,integer")
    assert(byField("b").getAs[String]("inferred_type") == "null,string")
    assert(byField("b").getAs[Boolean]("nullable"))
    assert(byField("c").getAs[String]("inferred_type") == "integer")
  }
}
