package graft

import graft.plans.Cusum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the custom Cusum whole-operator (SURVEY §4.3(c)): physical
  * plan shape, exact agreement with a driver-side reference fold, partition
  * invariance, and the clamp semantics on a literal micro-fixture.
  */
class CusumSpec extends SparkSpec {

  private val k = 60.0

  private def input: DataFrame =
    Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))

  private def cusumRows(df: DataFrame): Seq[(Long, Long, Double)] =
    Cusum.applied(df, k, Seq("user_id"), Seq("ts", "event_id"), "value")
      .select("user_id", "event_id", "cusum")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
      .sortBy(t => (t._1, t._2))

  /** Reference semantics: sequential clamped fold per user. */
  private def referenceFold(): Seq[(Long, Long, Double)] = {
    val rows = input.collect().map { r =>
      val ts = r.getTimestamp(1)
      val micros = math.floorDiv(ts.getTime, 1000L) * 1000000L +
        ts.getNanos / 1000L
      (r.getLong(0), micros, r.getLong(2), r.getDouble(3))
    }
    rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      var s = 0.0
      var first = true
      rs.sortBy(r => (r._2, r._3)).map { case (_, _, eid, v) =>
        s = if (first) { first = false; math.max(0.0, v - k) }
            else math.max(0.0, s + (v - k))
        (u, eid, s)
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("plan contains the custom exec with one exchange+sort below it") {
    val df = Cusum.applied(input, k, Seq("user_id"), Seq("ts", "event_id"), "value")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Cusum 60.0"), p)
    assert(p.contains("Exchange hashpartitioning(user_id"), p)
    assert(p.contains("Sort [user_id"), p)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
  }

  test("cusum equals the sequential clamped reference fold, bit-exact") {
    assert(cusumRows(input) == referenceFold())
  }

  test("result is invariant to input partitioning") {
    assert(cusumRows(input.repartition(7)) == cusumRows(input.coalesce(1)))
  }

  test("clamp floors at zero and resets state across group borders") {
    import spark.implicits._
    // user 1: 70 (S=10), 20 (S=max(0,10-40)=0), 90 (S=30)
    // user 2 starts fresh: 50 -> S=0 (50-60 clamped)
    val tiny = Seq(
      (1L, 1L, 1L, 70.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 90.0),
      (2L, 4L, 4L, 50.0))
      .toDF("user_id", "tsl", "event_id", "value")
      .select(col("user_id"),
        timestamp_micros(col("tsl")).as("ts"), col("event_id"), col("value"))
    val got = Cusum.applied(tiny, k, Seq("user_id"), Seq("ts", "event_id"), "value")
      .select("user_id", "event_id", "cusum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == Seq((1L, 1L, 10.0), (1L, 2L, 0.0), (1L, 3L, 30.0),
      (2L, 4L, 0.0)))
  }
}
