package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN quality gate: each index must recover a meaningful share of the
  * exact top-3 neighbors while scanning well under the full pairwise space.
  * Measured on sf0.001: LSH 52% (~32% of data scanned, 4 tables x 4
  * planes), IVF 77% (k-means-learned centroids, probe 2 of 8 lists), PQ
  * 72% (learned 4x16 codebook, ADC shortlist 64 + exact re-rank). The
  * round-2 fixed-quantizer IVF/PQ measured 40%/5% — the learned quantizers
  * are what lift the floor to 0.6.
  */
class AnnRecallSpec extends SparkSpec {

  private lazy val exactTop3 = {
    import graft.queries.SimOps.{dot, norm}
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qa"), col("embedding").as("ea"))
    val all = e.select(col("vec_id").as("qb"), col("embedding").as("eb"))
    val w = Window.partitionBy("qa").orderBy(col("cos").desc, col("qb"))
    broadcast(q).crossJoin(all)
      .filter(col("qa") =!= col("qb"))
      .select(col("qa"), col("qb"),
        (dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb")))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("qa", "qb")
      .cache()
  }

  private def recallOf(id: String): Double = {
    val ann = Registry.byId(id).run(spark, sf).select("qa", "qb")
    val nExact = exactTop3.count()
    val overlap = exactTop3.intersect(ann).count()
    val recall = overlap.toDouble / nExact
    info(f"$id recall@3 = $recall%.3f ($overlap of $nExact)")
    recall
  }

  test("LSH ANN recall@3 >= 0.4 vs exact top-3") {
    assert(recallOf("sim_ann_lsh_topk") >= 0.4)
  }

  test("IVF ANN recall@3 >= 0.6 vs exact top-3") {
    assert(recallOf("sim_ann_ivf_topk") >= 0.6)
  }

  test("PQ ANN recall@3 >= 0.6 vs exact top-3") {
    assert(recallOf("sim_ann_pq_topk") >= 0.6)
  }

  // The whole point of the rotation: OPQ must not lose recall vs plain PQ
  // on the same geometry (4x16 codebook, shortlist 64). Measured on
  // sf0.001: PQ 0.72, OPQ strictly above.
  test("OPQ ANN recall@3 >= plain PQ recall vs exact top-3") {
    assert(recallOf("sim_ann_opq_topk") >= recallOf("sim_ann_pq_topk"))
  }

  // The composed index prunes TWICE (probe-2 lists, then ADC shortlist), so
  // its recall is bounded above by IVF's; the gate asserts the composition
  // doesn't collapse below the useful floor.
  test("IVF+PQ composed ANN recall@3 >= 0.5 vs exact top-3") {
    assert(recallOf("sim_ann_ivfpq_topk") >= 0.5)
  }
}
