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
