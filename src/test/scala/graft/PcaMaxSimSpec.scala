package graft

import org.apache.spark.sql.functions._

/** Numeric contracts of the two relational linear-algebra operators added
  * in round 13: `ml_pca_power_iteration` (power iteration over the exact
  * Gram) and `sim_maxsim_multivector` (ColBERT-style late-interaction
  * scoring). Each is replicated in plain driver-side Scala from the raw
  * embeddings and compared at the oracle's rounding — the same
  * brute-force-twin discipline as BruteForceTwinSpec.
  */
class PcaMaxSimSpec extends SparkSpec {

  private def embeddings(): Array[(Long, Array[Float])] =
    Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  test("pca: unit-norm loadings, positive eigval, sign convention") {
    val rows = Registry.byId("ml_pca_power_iteration").run(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 64))
    val loadings = rows.map(_.getDouble(1))
    val n2 = loadings.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-4, s"loading norm^2 $n2 != 1")
    val eig = rows.map(_.getDouble(2)).distinct
    assert(eig.length == 1 && eig.head > 0.0)
    val firstNonzero = loadings.find(math.abs(_) > 1e-6).get
    assert(firstNonzero > 0.0, "sign convention: first non-negligible loading positive")
  }

  test("pca: trace matches a driver-side replication of the 3 power steps") {
    val embs = embeddings()
    val d = 64
    // Gram with per-cell BigDecimal(30,10)-rounded sums, like dsumWide.
    val gram = Array.ofDim[java.math.BigDecimal](d, d)
    for (i <- 0 until d; j <- 0 until d)
      gram(i)(j) = java.math.BigDecimal.ZERO
    for ((_, e) <- embs; i <- 0 until d; j <- 0 until d) {
      val p = new java.math.BigDecimal(e(i).toDouble * e(j).toDouble)
        .setScale(10, java.math.RoundingMode.HALF_UP)
      gram(i)(j) = gram(i)(j).add(p)
    }
    val g = gram.map(_.map(_.doubleValue))
    var v = Array.fill(d)(0.125)
    var nrm = 0.0
    for (_ <- 1 to 3) {
      val w = Array.tabulate(d) { i =>
        var acc = java.math.BigDecimal.ZERO
        for (j <- 0 until d)
          acc = acc.add(new java.math.BigDecimal(g(i)(j) * v(j))
            .setScale(10, java.math.RoundingMode.HALF_UP))
        acc.doubleValue
      }
      var s2 = java.math.BigDecimal.ZERO
      for (i <- 0 until d)
        s2 = s2.add(new java.math.BigDecimal(w(i) * w(i))
          .setScale(10, java.math.RoundingMode.HALF_UP))
      nrm = math.sqrt(s2.doubleValue)
      v = w.map(_ / nrm)
    }
    val sgn = if (v.find(math.abs(_) > 1e-9).get < 0) -1.0 else 1.0
    val want = v.map(x => BigDecimal(x * sgn)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val got = Registry.byId("ml_pca_power_iteration").run(spark, sf)
      .collect().sortBy(_.getInt(0))
    for (i <- 0 until d)
      assert(got(i).getDouble(1) == want(i),
        s"dim ${i + 1}: engine ${got(i).getDouble(1)} vs replication ${want(i)}")
    val wantEig = BigDecimal(nrm)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head.getDouble(2) == wantEig)
  }

  test("pca project: matches driver-side dots against the learned direction") {
    val (v, _) = graft.queries.MLOps.pcaDirection(spark, sf)
    val want = embeddings().map { case (id, e) =>
      var acc = 0.0
      for (k <- e.indices) acc += e(k).toDouble * v(k)
      id -> BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Registry.byId("ml_pca_project").run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    for ((k, x) <- want) assert(got(k) == x, s"vec $k: ${got(k)} vs $x")
  }

  test("ewma: matches the driver-side truncated decay kernel") {
    val rows = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("tsl"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val want = rows.groupBy(_._1).flatMap { case (_, es) =>
      val ord = es.sortBy { case (_, eid, _, tsl) => (tsl, eid) }
      ord.indices.map { i =>
        val wts = Seq(1.0, 0.5, 0.25, 0.125, 0.0625)
        var num = 0.0; var den = 0.0
        for (k <- 0 to 4 if i - k >= 0) {
          num += wts(k) * ord(i - k)._3
          den += wts(k)
        }
        ord(i)._2 -> BigDecimal(num / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val got = Registry.byId("window_ewma_decay").run(spark, sf).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    for ((k, x) <- want) assert(got(k) == x, s"event $k: ${got(k)} vs $x")
  }

  test("maxsim: matches the brute-force late-interaction scores") {
    val embs = embeddings()
    val bags = embs.groupBy { case (id, _) => id / 8 }
      .map { case (g, vs) => g -> vs.sortBy(_._1).map(_._2) }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      for (k <- a.indices) acc += a(k).toDouble * b(k).toDouble
      acc
    }
    val want = for {
      qd <- bags.keys.filter(_ < 3)
      dd <- bags.keys.filter(_ != qd)
    } yield {
      var score = java.math.BigDecimal.ZERO
      for (qv <- bags(qd)) {
        val m = bags(dd).map(dv => dot(qv, dv)).max
        score = score.add(new java.math.BigDecimal(m)
          .setScale(10, java.math.RoundingMode.HALF_UP))
      }
      (qd, dd) -> score.doubleValue
    }
    val top = want.toSeq.groupBy(_._1._1).flatMap { case (qd, xs) =>
      xs.sortBy { case ((_, dd), s) => (-s, dd) }.take(5).zipWithIndex
        .map { case (((_, dd), s), i) =>
          (qd, dd) -> (BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, i + 1)
        }
    }
    val got = Registry.byId("sim_maxsim_multivector").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    assert(got.keySet == top.keySet, "top-5 pair sets differ")
    for ((k, v) <- top)
      assert(got(k) == v, s"$k: engine ${got(k)} vs brute force $v")
  }
}
