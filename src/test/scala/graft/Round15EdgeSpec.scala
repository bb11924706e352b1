package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Micro-fixture edge cases for the round-15 wave-2 operator dialects. */
class Round15EdgeSpec extends SparkSpec {
  import spark.implicits._

  test("ROUND(sum/n, 6) string-vs-binary midpoint hazard (why rollups emit SUMS)") {
    // 2.094530 / 4 = 0.5236325 exactly — a 7-dp decimal ending in 5. The
    // double nearest 2.09453 divided by 4 (exact: a power-of-two divide)
    // is a double whose SHORTEST DECIMAL REPR is "0.5236325": Spark's
    // round() goes through BigDecimal.valueOf (= that string) and HALF_UP
    // rounds it UP, while an engine rounding the BINARY value sees it
    // BELOW the decimal midpoint and rounds DOWN. Pin both facts; new
    // rollups therefore emit exact decimal sums, never rounded averages
    // (see ml_moe_route_top2, hit live at sf0.001 by its (7,5) group).
    val q = 2.09453 / 4.0
    assert(q.toString == "0.5236325") // shortest repr IS the midpoint
    assert(new java.math.BigDecimal(q).compareTo(
      new java.math.BigDecimal("0.5236325")) < 0) // binary value is BELOW it
    val sparkRound = Seq(q).toDF("x").select(round(col("x"), 6)).head.getDouble(0)
    assert(sparkRound == 0.523633) // string HALF_UP: up
    // The sum path is immune: the decimal sum is exact and cast-stable.
    val s = Seq(0.548093, 0.533678, 0.508166, 0.504593).toDF("w")
      .select(sum(col("w").cast(DecimalType(18, 6))).cast("double")).head.getDouble(0)
    assert(s == 2.09453)
  }

  test("DP-Laplace uniform is strictly inside (-1/2, 1/2): ln never sees 0") {
    // The +0.5/2^20 offset keeps |u| <= (1048574.5/1048576 - 0.5) < 0.5,
    // so ln(1 - 2|u|) >= ln(2^-20-ish) stays finite even at the modular
    // extremes h % 1048575 = 0 and = 1048574.
    for (hmod <- Seq(0L, 1L, 524287L, 1048574L)) {
      val uu = (hmod + 0.5) / 1048576.0 - 0.5
      assert(math.abs(uu) < 0.5)
      val arg = 1.0 - 2.0 * math.abs(uu)
      assert(arg > 0 && java.lang.Double.isFinite(math.log(arg)), s"hmod $hmod")
    }
  }

  test("int4 codes stay in [-7, 7] at the amax extremes without a clamp") {
    // x = ±amax maps to floor(±7 + 0.5) = {7, -7}; the +0.5 spelling
    // cannot reach 8 because |x*7/amax| <= 7 exactly.
    assert(math.floor(7.0 + 0.5) == 7.0)
    assert(math.floor(-7.0 + 0.5) == -7.0)
    val vec = Array(1.0f, -1.0f, 0.5f, -0.25f) ++ Array.fill(60)(0.1f)
    val got = Seq((1L, vec)).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("xd"))
      .withColumn("amax", array_max(transform(col("xd"), x => abs(x))))
      .select(transform(col("xd"),
        x => floor(x * 7.0 / col("amax") + 0.5)).as("qv"))
      .head.getSeq[Long](0)
    assert(got.take(4) == Seq(7L, -7L, 4L, -2L))
    assert(got.forall(c => c >= -7 && c <= 7))
  }

  test("nucleus keep rule includes the crossing token and always keeps rank 1") {
    // weights .5 .3 .15 .05 at p=.8: prev-cum 0 | .5 | .8 | .95 ->
    // kept = {.5, .3} plus the CROSSING token .15? prev=.8 NOT < .8 ->
    // exactly the inclusive-boundary semantics: the token that crosses p
    // is kept only while the PRECEDING mass is < p. rank 1 always kept
    // (prev mass 0).
    val ws = Seq(0.5, 0.3, 0.15, 0.05)
    val prev = ws.scanLeft(0.0)(_ + _).dropRight(1)
    val kept = prev.takeWhile(_ < 0.8)
    assert(kept.length == 2)
    assert(prev.head == 0.0) // rank 1 unconditionally kept
  }

  test("bollinger Σc² decimal path holds magnitudes the long path overflows") {
    // 30x-probe daily cents ~6e10; c² ~3.6e21 > Long.MaxValue (9.2e18).
    // The (19,0)×(19,0) decimal product + window sum must carry it exactly
    // and the VARCHAR-route double conversion must round correctly.
    val c = 60000000000L // 6e10 cents
    val row = Seq(c).toDF("c")
      .select((col("c").cast(DecimalType(19, 0)) * col("c").cast(DecimalType(19, 0)))
        .as("c2"))
      .select(col("c2"), col("c2").cast("string").cast("double").as("c2d"))
      .head
    assert(row.getDecimal(0).toBigInteger.toString == "3600000000000000000000")
    assert(row.getDouble(1) == 3.6e21)
  }

  test("transformer block: token 1 attends only itself with weight exactly 1") {
    val got = Registry.byId("ml_transformer_block_forward").run(spark, sf)
    // qpos=1 exists and its per-position count equals the sequence count —
    // the causal mask admits exactly the self pair for the first token.
    val rows = got.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.contains(1) && rows(1) >= rows.values.max)
    // and softmax of a single score is exactly 1 under the dialect:
    // ROUND(exp(s - s), 8) = 1, 1/1 = 1.
    assert(BigDecimal(math.exp(0.0)).setScale(8, BigDecimal.RoundingMode.HALF_UP) == BigDecimal(1))
  }
}
