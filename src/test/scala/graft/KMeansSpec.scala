package graft

/** Lloyd's algorithm invariants for ml_kmeans_iterations. */
class KMeansSpec extends SparkSpec {

  test("WCSS is non-increasing over iterations and all clusters survive") {
    val hist = Registry.byId("ml_kmeans_iterations").run(spark, sf)
      .orderBy("iter").collect()
    assert(hist.length == 3)
    val wcss = hist.map(_.getDouble(1))
    assert(wcss.zip(wcss.tail).forall { case (a, b) => b <= a + 1e-6 },
      s"WCSS not monotone: ${wcss.mkString(", ")}")
    assert(hist.map(_.getInt(2)).forall(_ > 0))
  }
}
