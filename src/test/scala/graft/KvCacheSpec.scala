package graft

import org.apache.spark.sql.functions._

/** `ml_kv_cache_decode`'s pins: (1) the decode step actually READS the
  * materialized cache (an ExistingRDD scan in the plan — positions 1..7
  * are never rederived from the corpus); (2) incremental attention equals
  * a full driver-side recompute from raw embeddings, row for row.
  */
class KvCacheSpec extends SparkSpec {

  test("decode plan reads the cache as an ExistingRDD scan") {
    val df = Registry.byId("ml_kv_cache_decode").run(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("LogicalRDD"),
      s"expected the K/V cache scan in the plan:\n$plan")
  }

  test("incremental decode equals a full recompute per group") {
    val got = Registry.byId("ml_kv_cache_decode").run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4))).toMap

    val rows = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val byGid = rows.groupBy(_._1 / 8)
    def r8(x: Double) =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val perGid = byGid.toSeq.flatMap { case (gid, toks) =>
      val byPos = toks.map { case (id, e) => ((id % 8) + 1).toInt -> e }.toMap
      byPos.get(8).map { qe =>
        val ks = (1 to 8).flatMap(p => byPos.get(p).map(p -> _))
        val s = ks.map { case (p, k) =>
          p -> r8(qe.zip(k).map { case (a, b) => a.toDouble * b.toDouble }.sum * 4.0)
        }
        val mx = s.map(_._2).max
        val ex = s.map { case (p, v) => p -> r8(math.exp(v - mx)) }
        val denom = ex.map { case (_, e) =>
          BigDecimal(e).setScale(8, BigDecimal.RoundingMode.HALF_UP) }.sum
        val w = ex.map { case (p, e) => p -> r6(e / denom.toDouble) }
        val vsum = ks.map { case (p, k) =>
          p -> r8(k.map(_.toDouble).sum) }.toMap
        val ychk = r6(w.map { case (p, wv) =>
          BigDecimal(r8(wv * vsum(p))).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble)
        val maxw = w.map(_._2).max
        (gid, ychk, w.find(_._1 == 8).get._2, w.filter(_._2 == maxw).map(_._1).min)
      }
    }
    val want = perGid.groupBy { case (gid, _, _, _) => (gid % 16).toInt }
      .map { case (b, xs) =>
        b -> (xs.size.toLong,
          r6(xs.map(x => BigDecimal(x._2).setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble),
          r6(xs.map(x => BigDecimal(x._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble),
          xs.map(_._4.toLong).sum)
      }
    assert(got.keySet == want.keySet)
    want.foreach { case (b, w) =>
      assert(got(b) == w, s"bucket $b: got ${got(b)} want $w")
    }
  }
}
