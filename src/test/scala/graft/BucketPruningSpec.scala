package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** `sink_bucket_pruning`'s pin: an equality predicate on the bucketing key
  * must plan as a one-bucket scan ("SelectedBucketsCount: 1 out of 8") and
  * surface ~1/8 of the rows the same filter surfaces off an unbucketed
  * copy of the data (parquet row-group stats can't prune a scattered key).
  */
class BucketPruningSpec extends SparkSpec {

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect {
      case a: AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case s: FileSourceScanExec => s }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    assert(scans.nonEmpty, plan.toString)
    scans.head
  }

  test("custkey point predicate reads 1 of 8 buckets") {
    val t = queries.Scans.bucketedTable(spark, sf)
    val pred = col("o_custkey") === queries.Scans.bloomPointKey
    val bucketed = spark.table(t).filter(pred)
    val scan = scanOf(bucketed)
    assert(scan.optionalBucketSet.exists(_.cardinality() == 1),
      s"expected a 1-bucket scan: ${scan.simpleString(10)}")

    // Execution-level proof needs parquet's DICTIONARY filter off on both
    // sides: each bucket file's dictionary answers exact containment, so
    // with it on, the unbucketed read of the same files surfaces the same
    // rows and masks the differential. With it off (and min/max stats
    // useless on a hash-scattered key), rows surfaced = rows in files
    // actually READ: the selected bucket vs everything.
    val bucketRows = scan.metrics("numOutputRows").value
    val loc = spark.sql(s"DESC FORMATTED $t")
      .filter(col("col_name") === "Location").head().getString(1)
    val flat = spark.read
      .option("parquet.filter.dictionary.enabled", "false")
      .parquet(loc).filter(pred)
    val flatRows = scanOf(flat).metrics("numOutputRows").value
    info(s"rows read: bucketed=$bucketRows unbucketed=$flatRows " +
      "(flat side with dictionary filter off)")
    assert(bucketRows * 4 <= flatRows,
      s"bucket pruning should cut the read >=4x: " +
        s"bucketed=$bucketRows flat=$flatRows")
    assert(spark.table(t).filter(pred).count() == flat.count())
  }
}
