package graft

import org.apache.spark.sql.functions._

/** Mergeable DataSketches HLL contract for `agg_hll_sketch_union`: the
  * union of per-group sketches must land within 5% of the exact distinct
  * count (mergeability — the property that makes sketch rollups free at
  * scale). At this spec's small sf the sketch is still in coupon/exact
  * mode, so union == direct equality also holds and is asserted; past
  * ~1500 distinct the union and direct estimates legitimately diverge
  * (both stay within the error band), which is why the registry oracle
  * checks the band, not equality.
  */
class HllSketchSpec extends SparkSpec {

  test("union of per-type sketches == direct sketch, within 5% of exact") {
    val e = Tables(spark, sf, "events")
    val exact = e.select(countDistinct("user_id")).collect().head.getLong(0)
    val direct = e
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().head.getLong(0)
    val merged = e
      .groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0)
    assert(merged == direct, s"merged $merged != direct $direct")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged $merged vs exact $exact")
  }

  test("registry query reports exact count with both band flags true") {
    val e = Tables(spark, sf, "events")
    val exact = e.select(countDistinct("user_id")).collect().head.getLong(0)
    val row = Registry.byId("agg_hll_sketch_union").run(spark, sf)
      .collect().head
    assert(row.getLong(0) == exact)
    assert(row.getBoolean(1), "union estimate out of 5% band")
    assert(row.getBoolean(2), "direct estimate out of 5% band")
  }
}
