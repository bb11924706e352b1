package graft

import graft.ml.SeededSplit
import org.apache.spark.sql.functions._

/** Property tests for the seeded split (reference: seeded permutation +
  * prefix, flax_model.py:125-131): exact disjointness/coverage, ratio near
  * the target, reproducibility at a fixed seed, seed sensitivity, and
  * invariance to physical partitioning (the property a permutation-based
  * split does NOT have on a cluster).
  */
class SeededSplitSpec extends SparkSpec {

  private lazy val orders = Tables(spark, sf, "orders")

  private def assignment(seed: Long, df: org.apache.spark.sql.DataFrame = orders) =
    df.select(col("o_orderkey"), SeededSplit.assign(col("o_orderkey"), seed).as("split"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap

  test("split is exhaustive and disjoint with ratio near 90/10") {
    val counts = orders
      .groupBy(SeededSplit.assign(col("o_orderkey"), 42L).as("split"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = orders.count()
    assert(counts.keySet == Set("train", "test"))
    assert(counts.values.sum == n)
    val ratio = counts("train").toDouble / n
    assert(ratio > 0.85 && ratio < 0.95, s"train ratio $ratio")
  }

  test("same seed reproduces the identical row-level assignment") {
    assert(assignment(42L) == assignment(42L))
  }

  test("assignment is invariant to physical partitioning") {
    assert(assignment(42L) == assignment(42L, orders.repartition(7)))
  }

  test("a different seed produces a different split") {
    val a = assignment(42L)
    val b = assignment(43L)
    assert(a != b)
    // ...but both keep the ratio: independence of the seeds.
    assert(b.values.count(_ == "train").toDouble / b.size > 0.85)
  }
}
