package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

/** Round-18 operator twins: independent sequential reimplementations
  * checked bit-for-bit against the distributed results (the Round17OpsSpec
  * discipline).
  */
class Round18OpsSpec extends SparkSpec {

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("unigram-LM trainer matches a sequential seed -> EM -> prune -> EM run") {
    val got = Registry.byId("text_unigram_train").run(spark, sf).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2))).toSeq

    // Word-frequency table over the trained class (en, ^[a-z]{2,12}$).
    val wf: Map[String, Long] = Tables(spark, sf, "documents")
      .filter(col("lang") === "en")
      .select(lower(col("text"))).collect().map(_.getString(0))
      .flatMap(_.split(" "))
      .filter(w => w.length >= 2 && w.length <= 12 && w.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

    // Seed: all substrings of length 1..4 weighted by f; chars + top-40.
    val scnt = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- wf; i <- 0 until w.length;
         l <- 1 to 4 if i + l <= w.length)
      scnt(w.substring(i, i + l)) += f
    val chars = scnt.filter(_._1.length == 1).toSeq
    val v0keep = chars ++ scnt.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(40)
    val tot0 = v0keep.map(_._2).sum
    val v0 = v0keep
      .map { case (p, c) => p -> r(math.log(c.toDouble / tot0), 9) }.toMap

    // Viterbi with the engine's tie-break: longer piece wins equal scores.
    def viterbi(w: String, v: Map[String, Double]): Seq[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val bl = Array.fill(n + 1)(0)
      best(0) = 0.0
      for (i <- 1 to n; l <- 1 to math.min(4, i))
        v.get(w.substring(i - l, i)).foreach { lp =>
          val sc = best(i - l) + lp
          if (sc > best(i) || (sc == best(i) && l > bl(i))) {
            best(i) = sc; bl(i) = l
          }
        }
      var pos = n
      val out = mutable.ListBuffer.empty[String]
      while (pos > 0) { out.prepend(w.substring(pos - bl(pos), pos)); pos -= bl(pos) }
      out.toSeq
    }
    def emCounts(v: Map[String, Double]): Map[String, Long] = {
      val c = mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, f) <- wf; p <- viterbi(w, v)) c(p) += f
      c.toMap
    }

    val cnt1 = emCounts(v0)
    val v1keep: Seq[(String, Long)] =
      chars.map { case (p, _) => p -> cnt1.getOrElse(p, 0L) } ++
        cnt1.filter(_._1.length > 1).toSeq
          .sortBy { case (p, c) => (-c, p) }.take(24)
    val tot1 = v1keep.map(_._2).sum
    val nv = v1keep.size
    val v1 = v1keep.map { case (p, c) =>
      p -> r(math.log((c + 1).toDouble / (tot1 + nv)), 9)
    }.toMap

    val cnt2 = emCounts(v1)
    val tot2 = cnt2.values.sum
    val want = v1keep.map { case (p, _) =>
      val n = cnt2.getOrElse(p, 0L)
      (p, n, r(math.log((n + 1).toDouble / (tot2 + nv)), 6))
    }.sortBy { case (p, n, _) => (-n, p) }

    assert(got.size == want.size, s"${got.size} rows, twin has ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"row mismatch: engine $g, twin $w")
    }
    // The prune did real work: the trained vocabulary segments words into
    // multi-char pieces, not just characters.
    assert(want.count { case (p, n, _) => p.length > 1 && n > 0 } >= 5,
      "no multi-char pieces survived training")
  }
}
