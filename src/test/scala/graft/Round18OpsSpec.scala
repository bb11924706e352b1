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

  test("suffix-array ranks match a sequential sort of all suffixes") {
    val got = Registry.byId("dedup_suffix_array_rank").run(spark, sf)
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getString(4))).toSeq

    val docs: Seq[(Long, Array[String])] = Tables(spark, sf, "documents")
      .filter(col("lang") === "en" && col("doc_id") % 10 === 3)
      .select(col("doc_id"), lower(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .toSeq

    // Every suffix, sorted lexicographically by its FULL token sequence
    // (shorter prefix-suffix first — Seq ordering does exactly that).
    import scala.math.Ordering.Implicits.seqOrdering
    val sufs = for ((id, toks) <- docs; p <- toks.indices)
      yield (id, p.toLong, toks.drop(p).toSeq)
    val sorted = sufs.sortBy { case (id, p, content) => (content, id, p) }
    // Dense rank: increments when the suffix CONTENT changes.
    val ranks = mutable.ListBuffer.empty[(Long, Long, Long, Seq[String])]
    var rk = 0L
    var prev: Option[Seq[String]] = None
    for ((id, p, content) <- sorted) {
      if (!prev.contains(content)) { rk += 1; prev = Some(content) }
      ranks += ((rk, id, p, content))
    }
    val dupCnt = ranks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = ranks
      .map { case (r0, id, p, content) =>
        (r0, dupCnt(r0), id, p, content.take(5).mkString(" ")) }
      .sortBy { case (r0, _, id, p, _) => (r0, id, p) }
      .take(64).toSeq

    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"row mismatch: engine $g, twin $w")
    }
    // The corpus has genuinely repeated full suffixes (the dedup signal) —
    // somewhere in the rank space, not necessarily inside the head-64.
    assert(dupCnt.values.exists(_ > 1), "no duplicate suffixes in the slice")
  }

  test("DPO pair loss matches a sequential pairing + knot-table fold") {
    val got = Registry.byId("ml_dpo_pair_loss").run(spark, sf).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4))).toSeq

    val ev = Tables(spark, sf, "events")
      .select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

    def bd(x: Double, dp: Int): BigDecimal =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
    def lpPol(id: Long) = bd(math.log(2 + (id % 97).toDouble), 9)
    def lpRef(id: Long) = bd(math.log(2 + ((id * 31) % 89).toDouble), 9)

    val margins = ev.groupBy { case (id, _, _) => id / 2 }
      .valuesIterator.filter(_.length == 2).map { members =>
        val Seq(w, l) = members.sortBy { case (id, _, v) => (-v, id) }.toSeq
        (w._2,
          BigDecimal("0.1") *
            ((lpPol(w._1) - lpRef(w._1)) - (lpPol(l._1) - lpRef(l._1))))
      }.toSeq
    val lossKnot = margins.map(_._2).distinct
      .map(m => m -> bd(math.log(1 + math.exp(-m.toDouble)), 9)).toMap
    val want = margins.groupBy(_._1).toSeq.map { case (tpe, ms) =>
      val n = ms.size
      val mSum = ms.map(_._2).sum
      val lSum = ms.map(p => lossKnot(p._2)).sum
      val acc = ms.count(_._2 > 0)
      (tpe, n.toLong, r(mSum.toDouble / n, 6), r(lSum.toDouble / n, 6),
        r(acc.toDouble / n, 6))
    }.sortBy(_._1)

    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"row mismatch: engine $g, twin $w")
    }
    // The pairing produced real preference signal: accuracy is not
    // degenerate (all-0 or all-1) across every group.
    assert(want.exists(t => t._5 > 0.0 && t._5 < 1.0))
  }
}
