package graft

import org.apache.spark.sql.functions._

/** Algebraic invariants (SURVEY.md §5.2.4) over the deterministic testdata. */
class PropertySpec extends SparkSpec {

  test("filter-then-union counts == union-then-filter") {
    val ev = Tables(spark, sf, "events")
    val p = col("value") > 50
    val a = ev.filter(p).unionAll(ev.filter(p)).count()
    val b = ev.unionAll(ev).filter(p).count()
    assert(a == b)
  }

  test("except + intersect partition the distinct key space") {
    val cust = Tables(spark, sf, "customer").select("c_custkey")
    val withOrders = Tables(spark, sf, "orders")
      .select(col("o_custkey").as("c_custkey")).distinct()
    val ex = cust.except(withOrders).count()
    val in = cust.intersect(withOrders).count()
    assert(ex + in == cust.distinct().count())
  }

  test("running sum's last row per customer equals the group total") {
    // o_totalprice > 0, so the max of the running sum is its final value.
    val rs = Registry.byId("window_running_sum").run(spark, sf)
      .groupBy("o_custkey").agg(max(col("running")).as("run_last"))
    val tot = Tables(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("tot"))
    val bad = rs.join(tot, "o_custkey")
      .filter(abs(col("run_last") - col("tot")) > 1e-4)
    assert(bad.count() == 0)
  }

  test("z-score output has mean ~0 and stddev ~1 per group") {
    val stats = Registry.byId("ml_zscore_standardize").run(spark, sf)
      .groupBy("seg")
      .agg(avg(col("z")).as("m"), stddev_samp(col("z")).as("s"))
      .filter(abs(col("m")) > 1e-3 || abs(col("s") - 1) > 1e-3)
    assert(stats.count() == 0)
  }

  test("dedup is idempotent") {
    val ev = Tables(spark, sf, "events")
    val once = ev.unionAll(ev).dropDuplicates("event_id")
    assert(once.count() == once.dropDuplicates("event_id").count())
    assert(once.count() == ev.count())
  }

  test("moving average of a constant series is that constant") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, 5.0)).toDF("i", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy("i").rowsBetween(-1, 1)
    val bad = df.select(avg("v").over(w).as("ma")).filter(col("ma") =!= 5.0)
    assert(bad.count() == 0)
  }

  test("minhash LSH output is well-formed: ordered pairs, est in [0,1]") {
    val lsh = Registry.byId("dedup_minhash_lsh").run(spark, sf)
    val bad = lsh.filter(
      col("da") >= col("db") ||
        col("est_jaccard") < 0 || col("est_jaccard") > 1)
    assert(bad.count() == 0)
    // Sharing a band == agreeing on 4 of 16 minima => est >= 4/16.
    assert(lsh.filter(col("est_jaccard") < 0.25).count() == 0)
  }
}
