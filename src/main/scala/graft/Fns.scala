package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Determinism helpers (SURVEY.md §7.3).
  *
  * Cross-engine hash-equality with DuckDB requires every aggregate to be
  * order-independent: doubles are summed as exact DECIMALs and only converted
  * back to DOUBLE at the very end (decimal addition is exact, so partial
  * aggregation / shuffle merge order cannot change the result — this is also
  * what makes the same query stable across a 1000-executor run vs local[4]).
  */
object Fns {
  /** Exact order-independent sum of a double measure — semantics of
    * `SUM(CAST(x AS DECIMAL(18,6)))` cast back to DOUBLE, computed by the
    * typed mutable aggregate `graft.functions.DecSum` (bit-equal by
    * construction, DecSumSpec; ~2x faster than the declarative decimal sum,
    * whose per-row unsafe-buffer round-trip made every exactness-dialect
    * aggregate scan-bound). DuckDB twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = dsumP(c, 18, 6)

  /** Exact sum with wider integral part (squares etc.). DuckDB twin uses the
    * same DECIMAL(30,10).
    */
  def dsumWide(c: Column): Column = dsumP(c, 30, 10)

  /** Exact decimal sum at an explicit (precision, scale). */
  def dsumP(c: Column, p: Int, s: Int): Column =
    call_function("graft_dsum", c.cast("double"), lit(p), lit(s))

  /** The declarative decimal forms (kept for the callers whose plan must
    * stay a pure whole-stage-codegen HashAggregate pipeline, e.g. the
    * flagship star join's pinned shape).
    */
  def dsumDecl(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** COUNT(*) as BIGINT in both engines. */
  def cnt: Column = count(lit(1)).cast(LongType)

  /** Exact integer cents of an exact-2-dp double column (price, discount,
    * events.value in this dataset): the true value ·100 is an integer and
    * the double product's error is ≪ 0.5, so rint recovers it exactly.
    * Long sums of cents (or of cents products) ARE the decimal-exact sums
    * as long as they stay under 2^53 for the final double cast — one
    * correctly-rounded division then reproduces `SUM(CAST(x AS
    * DECIMAL(p,s))) :: DOUBLE` bit-for-bit, ~6x cheaper than the per-row
    * decimal cast (see ml_kfold_cv / window_rolling_corr).
    *
    * ROW-COUNT CEILING (concrete, for this dataset's magnitudes): plain
    * price cents are ~1e7/row (extendedprice ≲ 1e5), so a per-group sum's
    * closing long→double cast crosses 2^53 (~9.0e15) near ~9e8
    * rows/group; a cents·(100−dcents) product term is ~1e9/row and
    * crosses near ~9e6 rows/group. Past those scales a bare
    * `sum(cents(x)).cast("double")` is silently wrong — sum unit columns
    * through [[lsumUnits]] instead (split-long codegen partials, exact
    * decimal recombine; no 2^53 ceiling), or the DECIMAL(38,0) pattern
    * for squared terms (window_bollinger_bands' Σc²).
    */
  def cents(c: Column): Column = rint(c * 100).cast(LongType)

  /** Exact sum of a LONG integer-unit column (cents, 1e-4 "product units",
    * …) divided by 10^divPow, with NO 2^53 cast cliff and a pure
    * whole-stage-codegen hot path.
    *
    * The naive fast path `sum(units).cast("double") / 10^p` silently
    * rounds once the long sum passes 2^53 (~9e6 rows/group for
    * 1e9-magnitude cents·(100−dcents) product terms — within reach of a
    * 100x scale-up of this dataset). Summing the units as DECIMAL would be
    * exact but pays the per-row unsafe-buffer decimal round-trip that made
    * decimal aggregates scan-bound (see [[graft.functions.DecSum]]).
    *
    * Instead the value is split PER ROW with floor-div semantics into
    * hi = v >> 20 and lo = v & (2^20−1) (exact for negatives too:
    * arithmetic shift is floorDiv(v, 2^20) and the masked low bits are the
    * nonnegative remainder), each summed as a plain codegen long. The
    * group result is recombined EXACTLY in decimal space over the handful
    * of output rows: hi·2^20 + lo as DECIMAL(38,0) (exact — both partials
    * are exact longs), one decimal division by 10^divPow (HALF_UP at
    * scale ≥ 6, exact whenever the true value has ≤ 6 dp, which every
    * cents/1e-4-unit measure does), then ONE correctly-rounded
    * decimal→double conversion. Exact while the hi partial fits a long:
    * ~2^63/(maxUnit/2^20) ≈ 1e16 rows/group at 1e9-unit rows — beyond any
    * storable dataset (and ANSI sum would raise, not wrap, past it).
    */
  def lsumUnits(v: Column, divPow: Int): Column = {
    val dec38 = DecimalType(38, 0)
    val hi = sum(shiftright(v, 20)).cast(dec38)
    val lo = sum(v.bitwiseAND(lit((1L << 20) - 1))).cast(dec38)
    val div = (0 until divPow).foldLeft(1L)((a, _) => a * 10L)
    ((hi * lit(1L << 20) + lo) / lit(div)).cast("double")
  }

  /** `SUM(CAST(x AS DECIMAL(18,6)))::DOUBLE` for an exact-2-dp column,
    * on the split-long fast path (exact at any realizable row count —
    * see [[lsumUnits]]).
    */
  def dsumCents(c: Column): Column = lsumUnits(cents(c), 2)

  /** Deterministic mean: exact decimal sum / count, both in double space. */
  def davg(c: Column): Column = dsum(c) / cnt

  /** Sample stddev from exact decimal sums: sqrt((S2 - S1^2/n)/(n-1)).
    * Written with the identical formula in the DuckDB oracle; avoids
    * engine-specific Welford/merge orders.
    */
  def dstddev(c: Column): Column = {
    val s1 = dsum(c)
    val s2 = dsumWide(c * c)
    val n = cnt
    sqrt((s2 - s1 * s1 / n) / (n - lit(1)))
  }

}
