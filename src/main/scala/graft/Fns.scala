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
    * price cents are ~1e7/row (extendedprice ≲ 1e5), so a per-group sum
    * crosses 2^53 (~9.0e15) near ~9e8 rows/group; a cents·(100−dcents)
    * product term is ~1e9/row and crosses near ~9e6 rows/group. Past
    * those scales the long sum is silently wrong — route such sums
    * through the DECIMAL(38,0) integer-unit pattern instead (see
    * window_bollinger_bands, which sums Σc² that way), which is exact to
    * 38 digits and merge-order-free at any row count.
    */
  def cents(c: Column): Column = rint(c * 100).cast(LongType)

  /** `SUM(CAST(x AS DECIMAL(18,6)))::DOUBLE` for an exact-2-dp column,
    * on the long fast path.
    */
  def dsumCents(c: Column): Column = sum(cents(c)).cast("double") / 100.0

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
