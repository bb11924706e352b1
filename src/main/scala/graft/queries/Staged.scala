package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dir, key) memoized staging of deterministic derived
  * tables — the indexes and model tables a production deployment builds
  * ONCE and then queries many times (an ANN graph's adjacency, an LSH
  * model's hash tables, a smoothing model's continuation counts). The
  * build runs at most once per session per data dir and lands as a
  * localCheckpoint (truncated lineage, in-memory blocks); every later
  * invocation reads the staged table.
  *
  * Same discipline as the other session-keyed caches ([[graft.Tables]],
  * GraphOps.edgeCache, StreamingQueries.spools, Joins.cboStaged): key on
  * session identity so a fresh session re-stages, and on the data dir so
  * scale factors never cross. Only STAGING may live here — a query's own
  * iterative state or final answer must never be memoized.
  */
private[queries] object Staged {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]

  def apply(s: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame =
    cache.getOrElseUpdate(
      (System.identityHashCode(s), dir, key), build.localCheckpoint())
}
