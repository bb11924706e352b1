package graft

import org.apache.spark.sql.functions._

/** Sequential/parquet-direct twins for the round-19 breadth rows:
  * `scan_xml_roundtrip` (the XML leg must be invisible in the result) and
  * `curation_quality_drift_psi` (the distributed bin folds must equal a
  * driver-side recount, and the PSI chain must equal a sequential
  * replay of the identical arithmetic).
  */
class Round19OpsSpec extends SparkSpec {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scan_xml_roundtrip equals the parquet-direct aggregate") {
    val viaXml = Registry.byId("scan_xml_roundtrip").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = Tables(spark, sf, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("c_nationkey").cast("long").as("natsum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(viaXml == direct)
  }

  test("curation_quality_drift_psi equals a sequential recount + replay") {
    val Seq(bins, width) = Seq(10, 200)
    val chars = Tables(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def binCounts(p: ((Long, Long)) => Boolean): Map[Long, Long] =
      chars.filter(p).groupBy { case (_, c) => math.min(bins - 1L, c / width) }
        .map { case (b, g) => b -> g.size.toLong }
    val ref = binCounts { case (id, _) => id % 5 != 4 }
    val nw = binCounts { case (id, _) => id % 5 == 4 }
    val allBins = (ref.keySet ++ nw.keySet).toSeq.sorted
    val (totR, totN) = (ref.values.sum, nw.values.sum)
    // The identical arithmetic chain: int/int double divisions, per-term
    // ROUND 9dp, exact decimal sum (replayed here as BigDecimal), ROUND 6.
    val psi = round6(allBins.map { b =>
      val p = (ref.getOrElse(b, 0L) + 1).toDouble / (totR + bins)
      val q = (nw.getOrElse(b, 0L) + 1).toDouble / (totN + bins)
      BigDecimal(round9((q - p) * math.log(q / p)))
    }.sum.toDouble)
    val row = Registry.byId("curation_quality_drift_psi").run(spark, sf).head()
    assert(row.getLong(0) == allBins.size.toLong)
    assert(row.getLong(1) == totR)
    assert(row.getLong(2) == totN)
    assert(row.getDouble(3) == psi)
  }
}
