package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator row from SURVEY.md §2 is one entry in [[queries]], built in
  * `graft.queries.*` packs and collected by [[Registry]]. Oracle-checked rows
  * additionally publish DuckDB-runnable ANSI SQL in [[oracleSql]]; column
  * names are aliased identically on both sides (the driver sorts columns by
  * name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byId("join_star_multiway").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.id -> (q.run _)).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.id -> sql)).toMap

  /** Full oracle map against a concrete data dir: the static SQL plus the
    * data-dependent oracles (learned-quantizer ANN) generated with their
    * trained parameters inlined as literals. Verify dumps THIS map.
    */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    Registry.all.flatMap(q => q.oracleFor(spark, sfDir).map(q.id -> _)).toMap
}
