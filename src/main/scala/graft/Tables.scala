package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Central loader for the driver-generated parquet tables.
  *
  * Mirrors the reference's dataset-directory scan
  * (`trainer/flax_model.py:99-115` globs `*.npz` and loads each archive) as a
  * DataSourceV2 parquet scan per table. Tables are cached per
  * (session, sfDir) so a whole `Verify`/`Bench` run over the ~50 declared
  * queries scans each parquet file once — the moral equivalent of the
  * reference's load-once-then-slice policy (`trainer/flax_model.py:118-120`).
  *
  * Scale note: at 100 TB the `.cache()` here becomes a per-executor
  * memory-and-disk cache of the hot dimension tables only; the fact tables
  * (`lineitem`, `events`) flow straight from the columnar scan with
  * pushed-down filters. Caching small dims keeps every dim join
  * broadcast-able without re-reading the source.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val cache = TrieMap.empty[(String, String, String), DataFrame]

  /** Diagnostic switch (graft.Plans): bypass the in-memory cache so plan
    * dumps show the real parquet scans (PushedFilters / ReadSchema) instead
    * of InMemoryTableScan.
    */
  @volatile var noCache: Boolean = false

  /** Cached DataFrame for one table of one scale-factor directory.
    *
    * `events.parquet` has shipped with three `ts` physical encodings across
    * driver generations, so normalization branches on the SCANNED dtype
    * rather than assuming one:
    *   - parquet TIMESTAMP(NANOS): Spark 4 refuses to read it natively; with
    *     `spark.sql.legacy.parquet.nanosAsLong` it scans as a nano-of-epoch
    *     LONG. The driver data is µs-aligned (`epoch_ns(ts) % 1000 == 0` at
    *     every sf), so `timestamp_micros(ts div 1000)` is lossless and
    *     matches DuckDB's native nanos read bit-for-bit.
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): with NTZ
    *     inference DISABLED (set below) the scan itself produces
    *     TimestampType — the session is pinned UTC, so that relabel is
    *     lossless, and doing it AT THE SCAN (rather than a cast on top)
    *     keeps `ts` predicates eligible for parquet row-group pushdown:
    *     `cast(ts)` over the attribute would block PushedFilters, which at
    *     100 TB is the difference between pruning row groups and reading
    *     the whole fact table. A TimestampNTZType branch remains as a
    *     belt-and-braces fallback should the conf ever not apply.
    *   - TimestampType already: pass through.
    */
  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Scope NTZ-off to the events read: other tables (lineitem dates) must
    // keep their naive NTZ reading — the oracle compares them naive-to-naive.
    // The schema is resolved eagerly at spark.read time, so restoring the
    // conf right after does not affect the returned DataFrame.
    val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prevNtz = spark.conf.get(ntzKey, "true")
    if (name == "events") spark.conf.set(ntzKey, "false")
    val raw =
      try spark.read.parquet(s"$sfDir/$name.parquet")
      finally spark.conf.set(ntzKey, prevNtz)
    if (name == "events") {
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType => raw
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported parquet dtype $other (expected LONG nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
      }
    } else raw
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Every query path goes through here first — register the native
    // function surface (graft_dsum & co., idempotent) so the Fns dialect
    // helpers resolve in any session without a per-pack register call.
    graft.functions.Native.register(spark)
    if (noCache) load(spark, sfDir, name)
    else cache.getOrElseUpdate(
      (org.apache.spark.sql.graft.GraftSqlBridge.sessionUUID(spark), sfDir, name),
      load(spark, sfDir, name).cache())
  }
}
