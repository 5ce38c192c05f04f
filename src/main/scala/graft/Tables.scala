package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries read through here so that schema assumptions and
  * scan-level tuning (pushdown verification, maxPartitionBytes at real
  * scale) live in one place. At 100 TB these would be catalog tables
  * partitioned by date / bucketed by join key; on the test harness they
  * are single parquet files.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale
    * (region/nation are bounded by geography; supplier/customer/part grow
    * with SF but stay orders of magnitude below the fact tables).
    */
  val broadcastableDims: Set[String] = Set("region", "nation", "supplier")

  /** Engine functions ride along with the tables: every query path goes
    * through a table accessor, so vec_dot etc. are always resolvable
    * (sessions built with GraftExtensions get them at construction
    * instead). Idempotent. */
  private[graft] def registerFunctions(spark: SparkSession): Unit = {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.BoundedCollectFunctions.register(spark)
    graft.functions.TopKByFunctions.register(spark)
    graft.functions.TextFunctions.register(spark)
    graft.functions.HeavyHittersFunctions.register(spark)
    graft.functions.MinhashFunctions.register(spark)
    graft.functions.GramTriFunctions.register(spark)
    graft.functions.ByteFunctions.register(spark)
    graft.functions.DibFunctions.register(spark)
  }

  /** Staged-artifact tag for SF dir `d`: the sanitized path plus a
    * 12-hex content fingerprint (MD5 over the sorted recursive file
    * listing — path, size, mtime; no data read, O(#files)). Every
    * derived artifact staged under java.io.tmpdir keys its path on this,
    * so a regenerated dataset under the same path — or two distinct dirs
    * whose sanitized names collide (`sf0.1` vs `sf0_1`) — can never
    * silently reuse a stale base and fail its oracle confusingly. */
  def stageTag(d: String): String = stageTagCache.computeIfAbsent(d, { dir =>
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(f: java.io.File): Unit =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName).foreach(walk)
      else md.update(s"${f.getPath}|${f.length}|${f.lastModified}\n".getBytes("UTF-8"))
    walk(new java.io.File(dir))
    val fp = md.digest().map("%02x".format(_)).mkString.take(12)
    dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + fp
  })
  private val stageTagCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    registerFunctions(spark)
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.parquet vintage shim. Early driver datasets stored `ts` as
    * parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects that
    * outright ([PARQUET_TYPE_ILLEGAL]) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
    * construction, [[Sessions.configure]]) reads the raw nanos long,
    * which we truncate to microseconds like DuckDB does. Current driver
    * datasets store TIMESTAMP(MICROS), which reads natively as
    * TIMESTAMP_NTZ; we cast that to TimestampType so every downstream
    * consumer (watermarks, window frames, java.sql.Timestamp decoders)
    * sees the one timestamp type the engine is written against — with
    * the session pinned to UTC ([[Sessions.configure]]) the cast is an
    * identity on the stored microseconds, exactly how DuckDB reads the
    * same file. Dispatch on the LOADED type, not the path: the same code
    * serves both vintages, and a regenerated dataset can never resurrect
    * the [DATATYPE_MISMATCH] breakage.
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    try spark.read.parquet(s"$sfDir/events.parquet")
    catch {
      case e: Throwable if Option(e.getMessage).exists(_.contains("PARQUET_TYPE_ILLEGAL")) =>
        throw new IllegalStateException(
          s"events.parquet at $sfDir uses parquet TIMESTAMP(NANOS); this session " +
            "was not built with spark.sql.legacy.parquet.nanosAsLong=true. Build the " +
            "session via graft.Sessions.configure, which sets it.", e)
    }

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    registerFunctions(spark)
    val raw = eventsRaw(spark, d)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long vintage
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType => // MICROS vintage
        // Explicit TimestampType (LTZ), independent of spark.sql.timestampType:
        // with the session pinned to UTC the cast is exact on the stored micros.
        raw.withColumn("ts", raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts column loaded as unsupported type $other; supported " +
            "vintages are TIMESTAMP(NANOS)-as-long (needs Sessions.configure) and " +
            "TIMESTAMP(MICROS)/TIMESTAMP_LTZ")
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
