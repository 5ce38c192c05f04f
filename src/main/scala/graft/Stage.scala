package graft

/** Atomic stage-once protocol for derived artifacts under
  * java.io.tmpdir (shingle/prefix indexes, graph substrates, layout
  * fixtures — everything keyed on [[Tables.stageTag]]).
  *
  * The original idiom — check `root/_SUCCESS`, else overwrite `root`
  * in place — is not atomic: two sessions sharing a tmpdir and a
  * dataset fingerprint could interleave (one reads a half-written
  * stage, or both overwrite concurrently). This helper closes both
  * races:
  *
  *   - IN-PROCESS: builds of the same `root` serialize on a per-root
  *     monitor (the lloydCache/cbCache ConcurrentHashMap discipline),
  *     so concurrent queries sharing a substrate build it once.
  *   - CROSS-PROCESS: the build lands in a fresh temp sibling
  *     (`root.tmp.<uuid>`) and is renamed into place with
  *     ATOMIC_MOVE (one rename(2) on the same filesystem). Readers
  *     either see no `root` or a complete one — never a partial
  *     write. A race loser's rename fails on the existing target; it
  *     verifies the winner's marker and discards its own temp.
  *
  * At 100 TB the same protocol is the standard object-store staging
  * commit: write to a job-scoped prefix, then one atomic
  * manifest/rename publishes it.
  */
object Stage {

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `build(tmpDir)` once per `root` and atomically publish the
    * temp dir at `root`. No-op when `root/<marker>` already exists.
    * `build` must write ALL of the artifact under the temp dir it is
    * given, including the completeness marker (Spark's parquet
    * committer writes `_SUCCESS` at the write root, so a plain
    * `df.write.parquet(tmp)` satisfies the default marker).
    */
  def ensure(root: String, marker: String = "_SUCCESS")(build: String => Unit): Unit = {
    def done = new java.io.File(s"$root/$marker").exists()
    if (done) return
    val lock = locks.computeIfAbsent(root, _ => new Object)
    lock.synchronized {
      if (done) return
      // A root without its marker is a crashed or foreign partial
      // build — clear it so the rename target is free.
      deleteRecursively(new java.io.File(root))
      val tmp = s"$root.tmp.${java.util.UUID.randomUUID.toString.take(8)}"
      try {
        build(tmp)
        if (!new java.io.File(s"$tmp/$marker").exists())
          throw new IllegalStateException(
            s"stage build for $root produced no $marker under $tmp")
        try
          java.nio.file.Files.move(
            java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(root),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case e: java.nio.file.FileSystemException =>
            // rename target appeared: a concurrent process published
            // first. Their artifact is keyed on the same content
            // fingerprint, so keep it — but only if it is complete.
            if (!done) throw new IllegalStateException(
              s"lost the publish race for $root to an incomplete build", e)
        }
      } finally deleteRecursively(new java.io.File(tmp))
    }
  }

  /** [[ensure]] for a BUCKETED parquet artifact. The build writes
    * bucket-id-named files (Spark's bucketBy committer, via a
    * throwaway external table name) under the staged temp dir; the
    * dir publishes atomically as `root` exactly like [[ensure]]; each
    * JVM then registers `table` as an EXTERNAL bucketed table over
    * `root`, so every reader's scan reports the bucket hash
    * distribution — and, because the frame is pre-partitioned on the
    * bucket hash (one file per bucket) and written sorted, the sort
    * order too. Joins and aggregations clustered on `bucketCol` then
    * plan ZERO exchanges over this artifact: the shuffle happened
    * once at stage time. This welds [[graft.core.Layout.writeBucketed]]
    * ("pay the shuffle once at write, join shuffle-free forever
    * after") to the cross-process staging protocol above — at 100 TB
    * the ingest tick publishes the clustered materialization and
    * every analytic joins it co-located.
    *
    * Cross-JVM note: the FILES are shared through `root` like every
    * staged artifact; only the catalog registration (metadata, no
    * data motion) repeats per session. Bucket file names carry the
    * bucket id, which is how a fresh session's scan re-derives row
    * placement from the shared files. */
  def ensureBucketedTable(spark: org.apache.spark.sql.SparkSession,
                          root: String, table: String, schemaDdl: String,
                          bucketCol: String, buckets: Int)
                         (frame: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    ensure(root) { tmp =>
      val bld = s"${table}_build_${java.util.UUID.randomUUID.toString.take(8)}"
      frame
        .repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
        .write.bucketBy(buckets, bucketCol).sortBy(bucketCol)
        .option("path", tmp).saveAsTable(bld)
      spark.sql(s"DROP TABLE $bld"): Unit // external: files stay for the publish
    }
    val lock = locks.computeIfAbsent(s"table:$table", _ => new Object)
    lock.synchronized {
      if (!spark.catalog.tableExists(table))
        spark.sql(s"CREATE TABLE $table ($schemaDdl) USING parquet " +
          s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) " +
          s"INTO $buckets BUCKETS LOCATION '$root'"): Unit
    }
    spark.table(table)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    if (f.exists()) f.delete(): Unit
  }
}
