package graft.queries

import java.lang.ref.WeakReference

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
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
  *
  * Hygiene (VERDICT r17 item 7 / ADVICE r17):
  *   - Keys use `sessionUUID` (stable, collision-free), never
  *     `identityHashCode` — a GC'd session's hash could alias a new one
  *     and serve checkpointed blocks of a stopped context.
  *   - Entries EVICT: every `apply` sweeps entries whose session is dead
  *     (context stopped, or the session object itself was collected), and
  *     an application-end listener sweeps when a context stops without
  *     another staging call ever happening. Evicted entries unpersist
  *     their checkpointed blocks — a retired child `newSession` no longer
  *     pins blocks in the shared live context forever.
  *   - The build thunk runs AT MOST ONCE per key even under concurrent
  *     first access: the map stores a holder whose `lazy val` guards the
  *     build, so a losing racer shares the winner's checkpoint instead of
  *     materializing a second one that nothing ever unpersists.
  */
private[graft] object Staged {

  /** One staged artifact. The session is held weakly so the holder itself
    * never keeps a retired session reachable; the built frame is released
    * on eviction via its checkpointed RDD (best-effort — on a stopped
    * context the blocks are already gone).
    */
  private final class Holder(s: SparkSession, build: () => DataFrame) {
    val session = new WeakReference[SparkSession](s)
    @volatile private var built: DataFrame = _
    lazy val df: DataFrame = { val d = build().localCheckpoint(); built = d; d }
    def dead: Boolean = session.get match {
      case null => true
      case ss => ss.sparkContext.isStopped
    }
    def release(): Unit = {
      val d = built
      if (d != null)
        try d.queryExecution.toRdd.unpersist(blocking = false)
        catch { case _: Throwable => () } // stopped context: already freed
    }
  }

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(String, String, String), Holder]

  /** Contexts that already carry the application-end sweep listener. */
  private val listening = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def uuidOf(s: SparkSession): String =
    org.apache.spark.sql.graft.GraftSqlBridge.sessionUUID(s)

  /** Evict every entry whose session is dead; returns how many dropped. */
  private[graft] def sweep(): Int = {
    var n = 0
    cache.foreach { case (k, h) =>
      if (h.dead && cache.remove(k, h)) { h.release(); n += 1 }
    }
    n
  }

  /** Deterministic eviction of one session's entries — the hook an
    * embedding application (or StagedSpec) uses to retire a child
    * `newSession` whose shared context stays live.
    */
  private[graft] def invalidate(s: SparkSession): Int = {
    val uuid = uuidOf(s)
    var n = 0
    cache.foreach { case (k, h) =>
      if (k._1 == uuid && cache.remove(k, h)) { h.release(); n += 1 }
    }
    n
  }

  private[graft] def size: Int = cache.size

  def apply(s: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    sweep()
    val sc = s.sparkContext
    listening.putIfAbsent(sc.applicationId, ()) match {
      case None =>
        sc.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
            sweep(); listening.remove(sc.applicationId)
          }
        })
      case Some(_) => ()
    }
    val k = (uuidOf(s), dir, key)
    val h = cache.get(k) match {
      case Some(h0) => h0
      case None =>
        val h0 = new Holder(s, () => build)
        cache.putIfAbsent(k, h0).getOrElse(h0)
    }
    h.df
  }
}
