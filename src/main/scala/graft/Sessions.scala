package graft

import org.apache.spark.sql.SparkSession

/** One place for session-construction config shared by Bench, Verify and
  * the test suite, so session-wide semantics (UTC, legacy nanos parquet
  * reads) are set exactly once at construction — never mutated at read
  * time inside a loader, which would leak into concurrent queries.
  */
object Sessions {
  /** Engine configs every graft session needs. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    // events.parquet carries TIMESTAMP(NANOS); the vectorized reader
    // refuses it unless nanos are surfaced as raw longs (Tables.events
    // truncates them to micros, matching DuckDB's read of the same file).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // keep catalog artifacts (bucketed-table demos) out of the repo tree
    .config("spark.sql.warehouse.dir",
      s"${sys.props("java.io.tmpdir")}/graft-warehouse")
    .config("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=${sys.props("java.io.tmpdir")}/graft-metastore;create=true")
    .config("spark.ui.enabled", "false")

  /** Standard local session: `local[cpus]`, shuffle.partitions = cpus. */
  def local(cpus: String, appName: String): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    graft.functions.VectorFunctions.register(s)
    s
  }
}
