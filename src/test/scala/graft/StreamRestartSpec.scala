package graft

import org.apache.spark.sql.functions._

/** Exactly-once across a stream RESTART — the operational twin of
  * CheckpointSpec's batch-side resume (reference: the TensorBoard reader
  * surviving trainer restarts, trainer/tensorboard.ipynb:36-55).
  *
  * The `stream_restart_exactly_once` query runs two legs against one shared
  * checkpoint dir: leg 1 tails three metrics-log generations then stops;
  * generation 4 lands; leg 2 restarts. This spec asserts the recovery
  * contract beyond the oracle's row check:
  *   - leg 2 ingested EXACTLY the one new file's rows (the distinct metric
  *     key count), i.e. the file-source checkpoint log replayed nothing;
  *   - the restored serving view equals the batch compaction of all four
  *     generations (same rows as `sink_metrics_compact_serve` with one
  *     extra version per key).
  */
class StreamRestartSpec extends SparkSpec {

  test("restarted stream processes only the new file and restores state") {
    val out = Registry.byId("stream_restart_exactly_once").run(spark, sf)
      .cache()
    val keyCount = Tables(spark, sf, "events")
      .select(col("event_type"), date_trunc("month", col("ts")))
      .distinct().count()

    // Leg 2 input == the single new generation file (one row per key).
    val run2 = out.select("run2_input_rows").distinct().collect()
    assert(run2.length == 1)
    assert(run2.head.getLong(0) == keyCount,
      s"leg 2 ingested ${run2.head.getLong(0)} rows, expected $keyCount " +
        "(reprocessed old generations or missed the new one)")

    // Restored view == batch compaction; n_versions gains exactly 1 (the
    // 4th generation re-emits every key).
    val batchTwin = Registry.byId("sink_metrics_compact_serve").run(spark, sf)
      .select(col("name"), col("bucket"), col("value"),
        (col("n_versions") + 1).as("n_versions"))
      .collect().toSet
    val streamed = out
      .select("name", "bucket", "value", "n_versions")
      .collect().toSet
    assert(streamed == batchTwin,
      s"missing=${(batchTwin -- streamed).take(3)} " +
        s"extra=${(streamed -- batchTwin).take(3)}")
  }
}
