package graft

import graft.functions.{MinHashAgg, MinHashParams}

/** MinHash unit + property + UDAF/declarative equivalence tests. */
class MinHashSpec extends SparkSpec {
  import MinHashParams._

  private def reference(hashes: Seq[Long]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    for (h <- hashes; i <- 0 until NumHashes) {
      val v = (a(i) * (h % P) + b(i)) % P
      if (v < sig(i)) sig(i) = v
    }
    sig
  }

  test("reduce matches the closed-form minimum") {
    val agg = new MinHashAgg
    val hs = Seq(12345L, 987654321L, 42L, 0L, P - 1)
    val buf = hs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).toSeq == reference(hs).toSeq)
  }

  test("merge is order-insensitive (partial aggregation safe)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val xs = Seq.fill(rnd.nextInt(20))(rnd.nextLong().abs)
      val ys = Seq.fill(rnd.nextInt(20))(rnd.nextLong().abs)
      val agg = new MinHashAgg
      val ab = agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
      val ba = (new MinHashAgg).merge(
        ys.foldLeft(agg.zero)(agg.reduce), xs.foldLeft(agg.zero)(agg.reduce))
      val whole = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
      assert(ab.toSeq == ba.toSeq && ab.toSeq == whole.toSeq)
    }
  }

  test("UDAF signature equals the declarative groupBy-min signature") {
    import org.apache.spark.sql.functions._
    val udafSig = Registry.byId("dedup_minhash_udaf").run(spark, sf)
    val declarative = {
      val t = Tables(spark, sf, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
        .select(col("doc_id"),
          (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % P).as("hm"))
      t.groupBy("doc_id")
        .agg(
          min((col("hm") * a(0) + b(0)) % P).as("m0"),
          min((col("hm") * a(NumHashes - 1) + b(NumHashes - 1)) % P)
            .as(s"m${NumHashes - 1}"))
        .orderBy("doc_id")
    }
    // NOTE the UDAF feeds the FULL hash (mod P applied inside reduce) while
    // the declarative side pre-mods; (a*(h%P)+b)%P == (a*h+b)%P only because
    // reduce mods first -- both paths mod before multiplying.
    assert(udafSig.collect().toSeq == declarative.collect().toSeq)
  }

  test("estimated Jaccard of identical docs is 1") {
    val agg = new MinHashAgg
    val hs = Seq(7L, 13L, 29L, 1L << 50)
    val s1 = (new MinHashAgg).finish(hs.foldLeft(agg.zero)(agg.reduce))
    val s2 = (new MinHashAgg).finish(hs.reverse.foldLeft(agg.zero)(agg.reduce))
    assert(s1.toSeq == s2.toSeq)
  }
}
