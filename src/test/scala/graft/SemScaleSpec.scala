package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.Quantizers

/** SemDeDup scale contract: `dedup_semantic_embcluster`'s quantizer size
  * k = max(8, ceil(n/64)) grows with the corpus, so the within-cluster
  * quadratic pair scan is bounded — the paper's reason for clustering
  * first. Probed at 5x (synthetic replication of sf0.01 — every vector
  * duplicated verbatim, the adversarial case where all copies land in one
  * cluster) and at 10x (the real sf0.1 table). The bound asserted is on
  * the EXACT pair count the query's join produces: sum over clusters of
  * m*(m-1)/2, measured on the same assignment the query runs
  * (SimOps.semAssign with semTrain centroids).
  */
class SemScaleSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"
  private val sf01 = "/root/testdata/sf0.1"

  /** (k, n, within-cluster pair count) for a corpus frame. */
  private def pairWork(e: DataFrame): (Int, Long, Long) = {
    val n = e.count()
    val cents = Quantizers.semTrain(e)
    assert(cents.length == Quantizers.semK(n),
      s"trained k ${cents.length} != semK($n)")
    val sizes = graft.queries.SimOps.semAssign(spark, e, cents)
      .groupBy("cid").count().collect().map(_.getLong(1))
    (cents.length, n, sizes.map(m => m * (m - 1) / 2).sum)
  }

  test("semK grows linearly with n above the floor") {
    assert(Quantizers.semK(500) == 8) // floor: sf0.01 coincides with IVF
    assert(Quantizers.semK(2500) == 40)
    assert(Quantizers.semK(5000) == 79)
    assert(Quantizers.semK(5000000) == 78125)
  }

  test("5x duplicated corpus: pair work stays linear in n") {
    val e = Tables(spark, sf001, "embeddings").select("vec_id", "embedding")
    val e5 = (0 until 5)
      .map(r => e.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ union _)
    val (k, n, pairs) = pairWork(e5)
    assert(n == 2500 && k == 40)
    // Mean cluster ~64 => ~n*32 pairs; 256*n leaves ~8x skew headroom and
    // is still ~12x under the all-pairs n(n-1)/2 the clustering avoids.
    assert(pairs <= 256L * n, s"pair work $pairs exceeds 256*n=${256L * n}")
    assert(pairs * 10 < n * (n - 1) / 2, s"pair work $pairs not << all-pairs")
  }

  test("real sf0.1 corpus: pair work stays linear in n") {
    val e = Tables(spark, sf01, "embeddings").select("vec_id", "embedding")
    val (k, n, pairs) = pairWork(e)
    assert(n == 2000 && k == 32) // 4x sf0.01's rows, real (non-replicated) data
    assert(pairs <= 256L * n, s"pair work $pairs exceeds 256*n=${256L * n}")
    assert(pairs * 10 < n * (n - 1) / 2, s"pair work $pairs not << all-pairs")
  }
}
