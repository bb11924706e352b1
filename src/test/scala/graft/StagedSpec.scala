package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** VERDICT r17 item 7 / ADVICE r17 — [[graft.queries.Staged]] hygiene:
  * session-identity keying with eviction, and at-most-once builds under
  * concurrent first access.
  */
class StagedSpec extends SparkSpec {

  import graft.queries.Staged

  private def frame(tag: Int) =
    spark.range(3).select(col("id"), lit(tag).as("tag"))

  test("two sessions never share a staged frame") {
    val builds = new AtomicInteger(0)
    val child = spark.newSession()
    val a = Staged(spark, sf, "spec_share") { builds.incrementAndGet(); frame(1) }
    val b = Staged(child, sf, "spec_share") { builds.incrementAndGet(); frame(2) }
    // One build per session — the child never reads the parent's artifact.
    assert(builds.get() == 2, s"expected 2 builds, got ${builds.get()}")
    assert(a.select("tag").head().getInt(0) == 1)
    assert(b.select("tag").head().getInt(0) == 2)
    // And re-reads hit the memo (no third build).
    Staged(spark, sf, "spec_share")(frame(9)).collect()
    Staged(child, sf, "spec_share")(frame(9)).collect()
    assert(builds.get() == 2, "re-read rebuilt a memoized artifact")
    Staged.invalidate(child)
  }

  test("retired sessions evict and a later staging rebuilds") {
    val builds = new AtomicInteger(0)
    val child = spark.newSession()
    Staged(child, sf, "spec_evict") { builds.incrementAndGet(); frame(1) }
      .collect()
    val before = Staged.size
    assert(Staged.invalidate(child) == 1, "expected exactly one entry evicted")
    assert(Staged.size == before - 1)
    // A new staging under the same (dir, key) on a fresh session rebuilds —
    // nothing of the retired session's state is served.
    val again = spark.newSession()
    val df = Staged(again, sf, "spec_evict") { builds.incrementAndGet(); frame(7) }
    assert(builds.get() == 2, "eviction did not force a rebuild")
    assert(df.select("tag").head().getInt(0) == 7)
    Staged.invalidate(again)
  }

  test("concurrent first access builds the artifact exactly once") {
    val builds = new AtomicInteger(0)
    val child = spark.newSession()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val races = (1 to 8).map { _ =>
      Future {
        gate.await()
        Staged(child, sf, "spec_race") { builds.incrementAndGet(); frame(3) }
          .count()
      }
    }
    gate.countDown()
    val counts = Await.result(Future.sequence(races), 60.seconds)
    assert(counts.forall(_ == 3L))
    assert(builds.get() == 1,
      s"concurrent first access ran the build ${builds.get()} times")
    Staged.invalidate(child)
  }
}
