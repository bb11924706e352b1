package graft

import org.apache.spark.sql.functions._

/** Mergeable DataSketches KLL contract for `agg_kll_quantile_sketch`:
  * every estimated quantile must land inside the exact value band implied
  * by the sketch's rank-error bound (k=200 => ~1.65% at 99% confidence;
  * gate at ±3% rank to keep the randomized compaction from flaking).
  * Unlike HLL, KLL compaction is randomized, so merged == direct equality
  * does NOT hold — the mergeability contract is that the rollup stays
  * inside the same rank-error band, which is what scale rollups rely on.
  */
class KllSketchSpec extends SparkSpec {

  test("sketch p50/p90/p99 land within the ±3% rank band of exact") {
    import graft.functions.KllQuantile
    val e = Tables(spark, sf, "events")
    val est = e.groupBy("event_type")
      .agg(KllQuantile.sketch(col("value").cast("double")).as("sk"))
      .agg(KllQuantile.union(col("sk")).as("m"))
      .select(
        KllQuantile.quantile(col("m"), 0.5).as("p50"),
        KllQuantile.quantile(col("m"), 0.9).as("p90"),
        KllQuantile.quantile(col("m"), 0.99).as("p99"))
      .collect().head
    for ((rank, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val lo = math.max(0.0, rank - 0.03)
      val hi = math.min(1.0, rank + 0.03)
      val band = e.select(
        expr(s"percentile(value, $lo)").as("lo"),
        expr(s"percentile(value, $hi)").as("hi"))
        .collect().head
      val q = est.getDouble(i)
      assert(q >= band.getDouble(0) && q <= band.getDouble(1),
        s"rank $rank: est $q outside [${band.getDouble(0)}, ${band.getDouble(1)}]")
    }
  }

  test("registry query reports every level in-band with the exact row count") {
    val rows = Registry.byId("agg_kll_quantile_sketch").run(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("p50", "p90", "p99"))
    val n = Tables(spark, sf, "events").count()
    rows.foreach { r =>
      assert(r.getLong(1) == n, s"${r.getString(0)}: n_values ${r.getLong(1)} != $n")
      assert(r.getBoolean(2), s"${r.getString(0)}: estimate out of band")
    }
  }

  test("rollup of per-group sketches stays in-band under repartitioning") {
    import graft.functions.KllQuantile
    val e = Tables(spark, sf, "events").repartition(13)
    val est = e.groupBy("event_type")
      .agg(KllQuantile.sketch(col("value").cast("double")).as("sk"))
      .agg(KllQuantile.union(col("sk")).as("m"))
      .select(KllQuantile.quantile(col("m"), 0.5).as("p50"))
      .collect().head.getDouble(0)
    val band = Tables(spark, sf, "events").select(
      expr("percentile(value, 0.47)").as("lo"),
      expr("percentile(value, 0.53)").as("hi")).collect().head
    assert(est >= band.getDouble(0) && est <= band.getDouble(1),
      s"p50 $est outside [${band.getDouble(0)}, ${band.getDouble(1)}]")
  }
}
