package graft

import org.apache.spark.sql.functions._

/** Mergeable DataSketches HLL contract for `agg_hll_sketch_union`: the
  * union of per-group sketches must equal the single direct sketch over
  * all data (mergeability — the property that makes sketch rollups free at
  * scale) and land within 5% of the exact distinct count.
  */
class HllSketchSpec extends SparkSpec {

  test("union of per-type sketches == direct sketch, within 5% of exact") {
    val e = Tables(spark, sf, "events")
    val exact = e.select(countDistinct("user_id")).collect().head.getLong(0)
    val direct = e
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().head.getLong(0)
    val merged = Registry.byId("agg_hll_sketch_union").run(spark, sf)
      .collect().head.getLong(0)
    assert(merged == direct, s"merged $merged != direct $direct")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged $merged vs exact $exact")
  }
}
