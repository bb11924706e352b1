package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** flatMapGroupsWithState sessionizer vs the oracle-checked batch twin.
  *
  * In a single AvailableNow data batch the sessionizer closes-and-emits every
  * session but each user's last; the trailing no-data micro-batch advances
  * the watermark to maxTs and times out those last sessions whose
  * end + gap <= maxTs. Expected emitted set = batch sessions minus each
  * user's final session when it ends within the gap of stream end.
  */
class CustomStateSpec extends SparkSpec {

  test("custom-state emitted sessions == batch sessions (mod watermark tail)") {
    val batch = Registry.byId("stream_session_windows").run(spark, sf)
      .select("user_id", "s_start", "s_end", "n")
    val maxTs = Tables(spark, sf, "events")
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    val gapUs = graft.streaming.Sessionize.GapMicros
    val cutoff = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(
        (maxTs - gapUs) / 1000000, (maxTs - gapUs) % 1000000 * 1000))
    val w = Window.partitionBy("user_id").orderBy(col("s_end").desc)
    val expected = batch
      .withColumn("rn", row_number().over(w))
      .filter(!(col("rn") === 1 && col("s_end") > cutoff))
      .drop("rn")
      .collect().toSet
    val emitted = Registry.byId("stream_custom_state_sessions").run(spark, sf)
      .select("user_id", "s_start", "s_end", "n")
      .collect().toSet
    assert(emitted.nonEmpty)
    assert(emitted == expected,
      s"emitted ${emitted.size} vs expected ${expected.size}; " +
        s"missing=${(expected -- emitted).take(3)} extra=${(emitted -- expected).take(3)}")
  }

  test("session_window native batch form matches gaps-and-islands twin") {
    val native = Registry.byId("stream_session_window_native").run(spark, sf)
      .collect().toSeq
    val gi = Registry.byId("stream_session_windows").run(spark, sf)
      .select("user_id", "s_start", "s_end", "n")
      .orderBy("user_id", "s_start")
      .collect().toSeq
    assert(native == gi)
  }
}
