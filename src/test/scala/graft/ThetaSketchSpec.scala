package graft

import org.apache.spark.sql.functions._

/** Theta set-operation contract for `agg_theta_sketch_setops`: in exact
  * mode (distinct << 2^lgK at every test scale) the estimates are exact
  * integers, so full set algebra must hold, and the sketch pipeline must
  * be invariant to physical partitioning (the mergeability property scale
  * rollups rely on).
  */
class ThetaSketchSpec extends SparkSpec {

  test("exact-mode set algebra: inclusion-exclusion and bounds hold") {
    val r = Registry.byId("agg_theta_sketch_setops").run(spark, sf)
      .collect().head
    val (a, b, u, i) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(u == a + b - i, s"inclusion-exclusion: $u != $a + $b - $i")
    assert(i <= math.min(a, b) && u >= math.max(a, b), s"bounds: a=$a b=$b u=$u i=$i")
    assert(i > 0, "degenerate: empty intersection")
  }

  test("empty segment: missing side estimates 0 and the intersection is 0") {
    // The shipped events table always has both segments, so exercise the
    // hardened path on a frame with clicks only — same agg shape as the
    // registry query.
    import graft.functions.ThetaSketch
    import spark.implicits._
    val segs = Seq(("click", 1L), ("click", 2L)).toDF("seg", "user_id")
    val sk = segs.groupBy("seg")
      .agg(ThetaSketch.sketch(col("user_id")).as("sk"))
    val r = sk.agg(
      coalesce(max(when(col("seg") === "purchase",
        ThetaSketch.estimate(col("sk")))), lit(0.0)).as("e_purchase"),
      ThetaSketch.estimate(ThetaSketch.intersect(col("sk"))).as("e_int_raw"),
      count(lit(1)).as("n_segs"))
      .select(col("e_purchase"),
        when(col("n_segs") < 2, 0.0).otherwise(col("e_int_raw")).as("e_int"))
      .collect().head
    assert(r.getDouble(0) == 0.0, "missing segment must estimate 0")
    assert(r.getDouble(1) == 0.0, "single-segment intersection must be 0")
  }

  test("sketch build is invariant to repartitioning") {
    import graft.functions.ThetaSketch
    def run(parts: Int): Long =
      Tables(spark, sf, "events")
        .filter(col("event_type") === "click" && col("value") > 90)
        .repartition(parts)
        .agg(ThetaSketch.estimate(
          ThetaSketch.sketch(col("user_id").cast("long"))).as("e"))
        .collect().head.getDouble(0).toLong
    assert(run(1) == run(17))
  }
}
