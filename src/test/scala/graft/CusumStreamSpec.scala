package graft

import org.apache.spark.sql.functions._

/** Emitted-set pin for `stream_cusum_alert` (VERDICT r18 item 8): the
  * flatMapGroupsWithState online CUSUM must emit exactly the alarm ONSETS
  * the batch custom operator (`graft.plans.Cusum`, already proven bit-exact
  * against a sequential fold in CusumSpec) derives declaratively — the
  * batch/streaming duality the sessionizer family has. Also pins
  * state-store-parallelism invariance via the `graft.stream.partitions`
  * knob (the PartitionInvarianceSpec discipline).
  */
class CusumStreamSpec extends SparkSpec {

  private def streamed(): Seq[(Long, Long, Double)] =
    Registry.byId("stream_cusum_alert").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  /** Batch twin: the custom Cusum operator + a lag window picks the
    * rows where S crosses the threshold from at-or-below.
    */
  private def batchOnsets(): Seq[(Long, Long, Double)] = {
    import org.apache.spark.sql.expressions.Window
    val withS = graft.plans.Cusum.applied(
      Tables(spark, sf, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      k = graft.streaming.CusumAlert.K,
      group = Seq("user_id"), order = Seq("ts", "event_id"),
      valueCol = "value")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val h = graft.streaming.CusumAlert.H
    withS
      .withColumn("sp", lag(col("cusum"), 1, 0.0).over(w))
      .filter(col("cusum") > h && col("sp") <= h)
      .select(col("user_id"), col("event_id"),
        round(col("cusum"), 6).as("cusum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  test("streaming onsets equal the batch custom-operator onsets") {
    val b = batchOnsets()
    assert(b.nonEmpty, "fixture must produce at least one alarm onset")
    assert(streamed() == b)
  }

  test("emitted set is invariant to state-store parallelism") {
    def at(n: Int): Seq[(Long, Long, Double)] = {
      spark.conf.set("graft.stream.partitions", n.toString)
      try streamed()
      finally spark.conf.unset("graft.stream.partitions")
    }
    assert(at(1) == at(3))
  }
}
