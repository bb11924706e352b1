package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator from SURVEY.md §2: a DataFrame implementation plus
  * (when SQL-expressible) the ANSI-SQL oracle the driver runs in DuckDB on the
  * same parquet tables. Column names/aliases MUST match between the two — the
  * driver sorts columns by name before hashing values.
  */
final case class Q(
    id: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

trait QueryPack {
  def queries: Seq[Q]
}

/** Flat registry of every implemented operator, in SURVEY.md §2 order. */
object Registry {
  def packs: Seq[QueryPack] = Seq(
    queries.Scans,
    queries.Cleaning,
    queries.Joins,
    queries.Aggregations,
    queries.Windows,
    queries.SortLimit,
    queries.SetOps,
    queries.Scalars,
    queries.StreamingQueries,
    queries.MLOps,
    queries.TextOps,
    queries.TextAnalysis,
    queries.DedupOps,
    queries.SimOps)

  lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.queries)
    require(qs.map(_.id).distinct.size == qs.size, "duplicate query ids")
    qs
  }

  def byId(id: String): Q =
    all.find(_.id == id).getOrElse(sys.error(s"unknown query: $id"))
}
