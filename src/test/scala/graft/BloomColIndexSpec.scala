package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The bloom + column-index layout must actually SKIP. Both structures are
  * pinned by toggling the parquet READER flag on the SAME staged files and
  * asserting strictly more rows surface with the structure disabled:
  * - `parquet.filter.bloom.enabled`: a custkey point probe (row-group
  *   min/max span the full custkey range — only the bloom can skip groups);
  * - `parquet.filter.columnindex.enabled`: an orderkey range probe (the
  *   column index skips pages INSIDE the boundary row group, finer than the
  *   group-level footer stats that remain active with the flag off).
  */
class BloomColIndexSpec extends SparkSpec {

  /** sf0.001's 1500 rows give one PAGE per row group (nothing sub-group to
    * skip), so this spec reads the next size up, where groups hold ~4 pages.
    */
  private val sfDir = "/root/testdata/sf0.01"

  private def rowsRead(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect {
      case a: AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case s: FileSourceScanExec => s }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    assert(scans.nonEmpty, plan.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  private def probe(flag: String, enabled: Boolean, pred: Column): Long =
    rowsRead(
      spark.read
        .option(flag, enabled.toString)
        .parquet(queries.Scans.bloomIndexedPath(spark, sfDir))
        .filter(pred))

  test("bloom filter skips row groups the point key provably misses") {
    val pred = col("o_custkey") === queries.Scans.bloomPointKey
    val on = probe("parquet.filter.bloom.enabled", enabled = true, pred)
    val off = probe("parquet.filter.bloom.enabled", enabled = false, pred)
    assert(on < off, s"bloom on=$on off=$off")
    info(s"rows surfaced: bloom on=$on, bloom off=$off")
  }

  test("column index skips pages inside the boundary row group") {
    val (lo, hi) = queries.Scans.indexRange
    val pred = col("o_orderkey").between(lo, hi)
    val on = probe("parquet.filter.columnindex.enabled", enabled = true, pred)
    val off = probe("parquet.filter.columnindex.enabled", enabled = false, pred)
    assert(on < off, s"colindex on=$on off=$off")
    info(s"rows surfaced: column index on=$on, column index off=$off")
  }

  test("both probes agree with the unstaged table") {
    val staged = spark.read.parquet(queries.Scans.bloomIndexedPath(spark, sfDir))
    val base = Tables(spark, sfDir, "orders")
    assert(
      staged.filter(col("o_custkey") === queries.Scans.bloomPointKey).count() ==
        base.filter(col("o_custkey") === queries.Scans.bloomPointKey).count())
    val (lo, hi) = queries.Scans.indexRange
    assert(
      staged.filter(col("o_orderkey").between(lo, hi)).count() ==
        base.filter(col("o_orderkey").between(lo, hi)).count())
  }
}
