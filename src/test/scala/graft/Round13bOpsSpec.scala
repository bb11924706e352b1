package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Brute-force twins (SURVEY.md §5.2.2 discipline) for the round-13 second
  * operator wave: sequential driver-side recomputes from the raw sf0.001
  * rows — different code path and iteration order — must agree row for row
  * with the declared queries. Catches the same-wrong-formula-twice failure
  * mode the DuckDB differential can't.
  */
class Round13bOpsSpec extends SparkSpec {

  private def round(x: Double, s: Int): Double =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()

  /** Timestamp → epoch micros (the asof-twin convention). */
  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  // ---- window_anomaly_zscore ----------------------------------------

  test("window_anomaly_zscore matches a sequential per-user sliding window") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)),
        r.getDouble(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.flatMap { i =>
        if (i < 9) None
        else {
          val frame = sorted.slice(i - 9, i + 1)
          val n = frame.size.toDouble
          val s1 = frame.map(r => JBigDecimal.valueOf(r._4)
            .setScale(6, RoundingMode.HALF_UP))
            .reduce(_ add _).doubleValue()
          val s2 = frame.map(r => JBigDecimal.valueOf(r._4 * r._4)
            .setScale(10, RoundingMode.HALF_UP))
            .reduce(_ add _).doubleValue()
          val sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
          val v = sorted(i)._4
          val z = (v - s1 / n) / sd
          if (sd > 1e-9 && math.abs(z) > 2.5)
            Some((u, sorted(i)._2, round(v, 6), round(z, 6)))
          else None
        }
      }
    }.sortBy(t => (t._1, t._2))
    val got = Registry.byId("window_anomaly_zscore").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  // ---- sim_bm25_topk -------------------------------------------------

  test("sim_bm25_topk matches a sequential BM25 recompute") {
    val qTerms = Seq("join", "filter", "vector")
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val n = docs.size.toDouble
    val dl = docs.map { case (id, t) => id -> t.size.toDouble }.toMap
    val avgdl = docs.map { case (id, _) =>
      JBigDecimal.valueOf(dl(id)).setScale(6, RoundingMode.HALF_UP)
    }.reduce(_ add _).doubleValue() / docs.size
    val expected = qTerms.flatMap { term =>
      val withTerm = docs.filter(_._2.contains(term))
      val df = withTerm.size.toDouble
      val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
      withTerm.map { case (id, toks) =>
        val tf = toks.count(_ == term).toDouble
        val s = idf * tf * 2.2 / (tf + (0.25 + 0.75 * dl(id) / avgdl) * 1.2)
        id -> JBigDecimal.valueOf(round(s, 6)).setScale(6, RoundingMode.HALF_UP)
      }
    }.groupBy(_._1)
      .map { case (id, terms) =>
        id -> terms.map(_._2).reduce(_ add _).doubleValue()
      }.toSeq
      .sortBy { case (id, s) => (-s, id) }
      .take(20).zipWithIndex
      .map { case ((id, s), i) => (id, s, i + 1) }
    val got = Registry.byId("sim_bm25_topk").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(got == expected)
  }

  // ---- shared exact-cosine helper (sequential left-fold like list_sum
  // and the fused native expression) ----------------------------------

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def loadEmb(): Array[(Long, Array[Float], Int)] =
    Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))

  // ---- ml_ndcg_at_k --------------------------------------------------

  test("ml_ndcg_at_k matches a sequential ranked-relevance recompute") {
    val emb = loadEmb()
    val expected = emb.filter(_._1 < 20).sortBy(_._1).map { case (qa, qe, ql) =>
      val ranked = emb.filter(_._1 != qa)
        .map { case (qb, be, bl) => (qb, bl, round(cos(qe, be), 6)) }
        .sortBy { case (qb, _, c) => (-c, qb) }
      val dcg = ranked.take(10).zipWithIndex.map { case ((_, bl, _), i) =>
        val term = if (bl == ql) 1.0 / (math.log(i + 2.0) / math.log(2.0)) else 0.0
        JBigDecimal.valueOf(round(term, 6)).setScale(6, RoundingMode.HALF_UP)
      }.reduce(_ add _).doubleValue()
      val nRel = ranked.count(_._2 == ql)
      val idcg = (1 to math.min(nRel, 10)).map { i =>
        val term = 1.0 / (math.log(i + 1.0) / math.log(2.0))
        JBigDecimal.valueOf(round(term, 6)).setScale(6, RoundingMode.HALF_UP)
      }.reduce(_ add _).doubleValue()
      (qa, nRel.toLong, round(dcg / idcg, 6))
    }.toSeq
    val got = Registry.byId("ml_ndcg_at_k").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  // ---- graph_jaccard_linkpred ----------------------------------------

  test("graph_jaccard_linkpred matches a sequential wedge recompute") {
    val emb = loadEmb().filter(_._1 < 200)
    val und = emb.flatMap { case (qa, qe, _) =>
      emb.filter(_._1 != qa)
        .map { case (qb, be, _) => (qb, round(cos(qe, be), 6)) }
        .sortBy { case (qb, c) => (-c, qb) }
        .take(3)
        .map { case (qb, _) => (math.min(qa, qb), math.max(qa, qb)) }
    }.distinct.toSet
    val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    val expected = nbrs.keySet.toSeq.sorted
      .combinations(2).map { case Seq(a, b) => (a, b) }
      .filter { case (a, b) => !und((a, b)) }
      .map { case (a, b) =>
        val common = (nbrs(a) & nbrs(b)).size
        val jac = common.toDouble / (nbrs(a).size + nbrs(b).size - common)
        (a, b, common.toLong, round(jac, 6))
      }
      .filter(_._3 > 0).toSeq
      .sortBy { case (a, b, _, j) => (-j, a, b) }
      .take(15).zipWithIndex
      .map { case ((a, b, c, j), i) => (a, b, c, j, i + 1) }
    val got = Registry.byId("graph_jaccard_linkpred").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
      .toSeq
    assert(got == expected)
  }

  // ---- seq_sliding_context -------------------------------------------

  test("seq_sliding_context covers every token with stride-24 windows") {
    val docs = Tables(spark, sf, "documents")
      .filter("doc_id < 100")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val expected = docs.flatMap { case (id, toks) =>
      val n = toks.size.toLong
      (0L until n by 24L).zipWithIndex.map { case (start, i) =>
        (id, i + 1, start, math.min(32L, n - start), toks(start.toInt), n)
      }
    }.sortBy(t => (t._1, t._3)).toSeq
    val got = Registry.byId("seq_sliding_context").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
      .toSeq
    assert(got == expected)
    // Coverage invariant: within each doc the windows tile [0, n) with
    // overlap — union of [start, start+len) is exactly [0, n).
    for ((id, rows) <- got.groupBy(_._1)) {
      val covered = rows.flatMap(r => r._3 until (r._3 + r._4)).toSet
      val n = rows.head._6
      assert(covered == (0L until n).toSet, s"doc $id coverage hole")
    }
  }

  // ---- agg_mad_robust ------------------------------------------------

  test("agg_mad_robust matches a sequential median/MAD recompute") {
    val ev = Tables(spark, sf, "events")
      .select("event_type", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def midpoint(rows: Seq[(Double, Long)]): Double = {
      val sorted = rows.sortBy(r => (r._1, r._2)).map(_._1)
      val n = sorted.size
      val lo = ((n + 1) / 2.0).floor.toInt - 1
      val hi = ((n + 1) / 2.0).ceil.toInt - 1
      Seq(lo, hi).distinct.map(i =>
        JBigDecimal.valueOf(sorted(i)).setScale(6, RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue() / Seq(lo, hi).distinct.size
    }
    val expected = ev.groupBy(_._1).toSeq.map { case (t, rows) =>
      val med = midpoint(rows.map(r => (r._3, r._2)).toSeq)
      val devs = rows.map(r => (math.abs(r._3 - med), r._2)).toSeq
      val mad = midpoint(devs)
      val nOut = devs.count(_._1 > 3.0 * 1.4826 * mad)
      (t, round(med, 6), round(mad, 6), nOut.toLong, rows.size.toLong)
    }.sortBy(_._1)
    val got = Registry.byId("agg_mad_robust").run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  // ---- ml_average_precision ------------------------------------------

  test("ml_average_precision matches a sequential precision-at-k recompute") {
    val emb = loadEmb()
    val ranked = emb
      .map { case (id, e, l) => (id, l % 2, e(0).toDouble) }
      .sortBy { case (id, _, s) => (-s, id) }
    var cp = 0
    val terms = ranked.zipWithIndex.flatMap { case ((_, y, _), i) =>
      if (y == 1) { cp += 1
        Some(JBigDecimal.valueOf(round(cp.toDouble / (i + 1), 8))
          .setScale(8, RoundingMode.HALF_UP))
      } else None
    }
    val nPos = terms.size
    val expected = (nPos.toLong,
      round(terms.reduce(_ add _).doubleValue() / nPos, 6))
    val got = Registry.byId("ml_average_precision").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    assert(got == expected)
  }

  // ---- ml_gbt_boost_round --------------------------------------------

  test("ml_gbt_boost_round matches a sequential two-round recompute") {
    val li = Tables(spark, sf, "lineitem")
      .select("l_quantity", "l_partkey", "l_extendedprice")
      .collect().map(r => (r.getDouble(0).toInt, r.getLong(1),
        round(r.getDouble(2), 2)))
    def bestSplits(binned: Seq[(Int, JBigDecimal)], k: Int)
        : Seq[(Int, Long, Long, Double, Double, Double)] = {
      val h = binned.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, rows) =>
        (b, rows.size.toLong, rows.map(_._2).reduce(_ add _))
      }
      val nt = h.map(_._2).sum
      val syt = h.map(_._3).reduce(_ add _).doubleValue()
      var nl = 0L
      var syl = JBigDecimal.ZERO
      h.flatMap { case (b, n, sy) =>
        nl += n; syl = syl.add(sy)
        if (nl < nt) {
          val l = syl.doubleValue()
          val gain = l * l / nl + (syt - l) * (syt - l) / (nt - nl) -
            syt * syt / nt
          Some((b, nl, nt - nl, gain, l / nl, (syt - l) / (nt - nl)))
        } else None
      }.sortBy(t => (-t._4, t._1)).take(k)
    }
    val b1 = bestSplits(li.map { case (q, _, y) =>
      (q, JBigDecimal.valueOf(y).setScale(2, RoundingMode.HALF_UP))
    }.toSeq, 1).head
    val expected = bestSplits(li.map { case (q, pk, y) =>
      val pred = if (q <= b1._1) b1._5 else b1._6
      ((pk % 32).toInt, JBigDecimal.valueOf(round(y - pred, 4))
        .setScale(4, RoundingMode.HALF_UP))
    }.toSeq, 3).map(t => (t._1, t._2, t._3, round(t._4, 4), b1._1,
      round(b1._4, 4)))
    val got = Registry.byId("ml_gbt_boost_round").run(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getDouble(5)))
      .toSeq
    assert(got == expected)
  }

  // ---- scalar_haversine_legs -----------------------------------------

  test("scalar_haversine_legs matches a sequential haversine recompute") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)),
        r.getDouble(3)))
    def rad(x: Double): Double = math.toRadians(x)
    val expected = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val pts = rows.sortBy(r => (r._3, r._2))
        .map(r => (r._4 * 0.5 - 45, (r._2 % 360).toDouble - 180))
        .toSeq
      val legs = pts.sliding(2).collect { case Seq((la1, lo1), (la2, lo2)) =>
        val a = math.sin(rad(la2 - la1) / 2) * math.sin(rad(la2 - la1) / 2) +
          math.cos(rad(la1)) * math.cos(rad(la2)) *
            math.sin(rad(lo2 - lo1) / 2) * math.sin(rad(lo2 - lo1) / 2)
        2 * 6371.0088 * math.asin(math.min(1.0, math.sqrt(a)))
      }.toSeq
      val total = legs.map(l => JBigDecimal.valueOf(round(l, 4))
        .setScale(4, RoundingMode.HALF_UP)).reduce(_ add _).doubleValue()
      (u, legs.size.toLong, round(total, 4))
    }.sortBy(_._1)
    val got = Registry.byId("scalar_haversine_legs").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  // ---- window_drawdown_max -------------------------------------------

  test("window_drawdown_max matches a sequential running-peak recompute") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)),
        r.getDouble(3)))
    val expected = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val vs = rows.sortBy(r => (r._3, r._2)).map(_._4)
      var peak = Double.NegativeInfinity
      var maxDd = Double.NegativeInfinity
      vs.foreach { v =>
        peak = math.max(peak, v)
        maxDd = math.max(maxDd, peak - v)
      }
      (u, round(maxDd, 6), round(peak, 6), vs.size.toLong)
    }.sortBy(_._1)
    val got = Registry.byId("window_drawdown_max").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // ---- dedup_edit_distance -------------------------------------------

  /** Classic unit-cost Levenshtein DP, written directly. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("dedup_edit_distance matches a direct DP recompute") {
    val docs = Tables(spark, sf, "documents")
      .filter("doc_id < 80")
      .select("doc_id", "lang", "text", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expected = (for {
      a <- docs; b <- docs
      if a._2 == b._2 && a._1 < b._1 && math.abs(a._4 - b._4) <= 30
      dist = lev(a._3, b._3).toLong
      maxLen = math.max(a._4, b._4)
      if dist.toDouble <= 0.8 * maxLen
    } yield (a._1, b._1, dist,
      round(1.0 - dist.toDouble / maxLen, 6))).sortBy(t => (t._1, t._2)).toSeq
    val got = Registry.byId("dedup_edit_distance").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  // ---- ml_kfold_cv ----------------------------------------------------

  test("ml_kfold_cv matches a sequential leave-one-fold-out recompute") {
    val li = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => ((r.getLong(0) % 5).toInt, r.getDouble(1),
        round(r.getDouble(2), 2)))
    def dsum(xs: Seq[Double], scale: Int): Double =
      xs.map(JBigDecimal.valueOf(_).setScale(scale, RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue()
    val folds = li.groupBy(_._1).map { case (fd, rows) =>
      fd -> ((rows.size.toLong, dsum(rows.map(_._2).toSeq, 6),
        dsum(rows.map(_._3).toSeq, 2),
        dsum(rows.map(r => r._2 * r._2).toSeq, 10),
        dsum(rows.map(r => r._2 * r._3).toSeq, 10)))
    }
    val tn = folds.values.map(_._1).sum
    val tsx = dsum(folds.values.map(_._2).toSeq, 6)
    val tsy = dsum(folds.values.map(_._3).toSeq, 2)
    val tsxx = dsum(folds.values.map(_._4).toSeq, 10)
    val tsxy = dsum(folds.values.map(_._5).toSeq, 10)
    val expected = folds.toSeq.sortBy(_._1).map {
      case (fd, (n, sx, sy, sxx, sxy)) =>
        val slope = ((tn - n) * (tsxy - sxy) - (tsx - sx) * (tsy - sy)) /
          ((tn - n) * (tsxx - sxx) - (tsx - sx) * (tsx - sx))
        val icept = ((tsy - sy) - slope * (tsx - sx)) / (tn - n)
        val sse = li.filter(_._1 == fd)
          .map { case (_, x, yv) =>
            val e = yv - (icept + slope * x)
            JBigDecimal.valueOf(e * e).setScale(8, RoundingMode.HALF_UP)
          }.reduce(_ add _).doubleValue()
        (fd, tn - n, n, round(slope, 6), round(icept, 4), round(sse / n, 2))
    }
    val got = Registry.byId("ml_kfold_cv").run(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got == expected)
  }

  // ---- agg_bootstrap_ci ----------------------------------------------

  test("agg_bootstrap_ci matches a sequential Poisson-bootstrap recompute") {
    val thresholds = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L)
    def weight(eventId: Long, rep: Int): Int = {
      // Two-round Lehmer mod 2^31-1 seeded by (event_id, rep) — must stay
      // in exact lockstep with the query and its DuckDB oracle.
      val M = 2147483647L
      val x1 = (eventId % M * 48271L + rep * 16807L + 11213L) % M
      val h = x1 * 48271L % M * 48271L % M % 1000000L
      thresholds.indexWhere(h < _) match {
        case -1 => 6
        case i  => i
      }
    }
    val ev = Tables(spark, sf, "events")
      .select("event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val means = (0 until 32).map { rep =>
      var sw = 0L
      var sv = JBigDecimal.ZERO
      ev.foreach { case (id, v) =>
        val w = weight(id, rep)
        sw += w
        sv = sv.add(JBigDecimal.valueOf(w * v)
          .setScale(6, RoundingMode.HALF_UP))
      }
      (sv.doubleValue() / sw, rep)
    }.sorted
    val n = ev.length.toLong
    val mean = ev.map(r => JBigDecimal.valueOf(r._2)
      .setScale(6, RoundingMode.HALF_UP)).reduce(_ add _).doubleValue() / n
    val expected = (n, round(mean, 6), round(means(1)._1, 6),
      round(means(30)._1, 6), 32)
    val got = Registry.byId("agg_bootstrap_ci").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected)
    // Sanity: the interval brackets the point estimate.
    assert(got._3 <= got._2 && got._2 <= got._4)
  }

  // ---- agg_chisq_independence ----------------------------------------

  test("agg_chisq_independence matches a sequential contingency recompute") {
    val ev = Tables(spark, sf, "events")
      .select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val obs = ev.groupBy { case (t, v) => (t, math.floor(v / 100).toLong) }
      .map { case (k, rows) => k -> rows.size.toLong }
    val rts = obs.groupBy(_._1._1).map { case (r, m) => r -> m.values.sum }
    val cts = obs.groupBy(_._1._2).map { case (c, m) => c -> m.values.sum }
    val n = ev.size.toLong
    val terms = for (r <- rts.keys.toSeq.sorted; c <- cts.keys.toSeq.sorted) yield {
      val e = rts(r).toDouble * cts(c).toDouble / n.toDouble
      val o = obs.getOrElse((r, c), 0L).toDouble
      JBigDecimal.valueOf(round((o - e) * (o - e) / e, 8))
        .setScale(8, RoundingMode.HALF_UP)
    }
    val chi2 = round(terms.reduce(_ add _).doubleValue(), 6)
    val dof = (rts.size - 1).toLong * (cts.size - 1).toLong
    val got = Registry.byId("agg_chisq_independence").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).head
    assert(got == ((n, dof, chi2)))
  }

  // ---- agg_ks_test ----------------------------------------------------

  test("agg_ks_test matches a sequential merged-ECDF recompute") {
    val ev = Tables(spark, sf, "events")
      .select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = ev.filter(_._1 == "click").map(_._2).sorted
    val b = ev.filter(_._1 == "view").map(_._2).sorted
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val xs = (a ++ b).distinct.sorted
    def ecdf(s: Array[Double], x: Double): Double =
      s.count(_ <= x).toDouble / s.length
    val d = xs.map(x => math.abs(ecdf(a, x) - ecdf(b, x))).max
    val crit = 1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb))
    val expected = (na, nb, round(d, 6), round(crit, 6),
      if (d > crit) 1 else 0)
    val got = Registry.byId("agg_ks_test").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected)
  }

  // ---- sink_scd2_history ---------------------------------------------

  test("sink_scd2_history versions exactly the changed keys") {
    val base = Tables(spark, sf, "customer")
      .filter("c_custkey < 300")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val got = Registry.byId("sink_scd2_history").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getString(3), r.getDouble(4)))
      .groupBy(_._1)
    assert(got.keySet == base.map(_._1).toSet)
    for ((key, seg, bal) <- base) {
      val versions = got(key).sortBy(_._2)
      if (key % 7 == 0) {
        assert(versions.map(v => (v._2, v._3)).toSeq ==
          Seq((1, Some(2)), (2, None)), s"key $key version chain")
        assert(versions(0)._4 == seg && versions(0)._5 == round(bal, 2))
        assert(versions(1)._4 == "UPGRADED" &&
          versions(1)._5 == round(bal + 100, 2))
      } else {
        assert(versions.map(v => (v._2, v._3)).toSeq == Seq((1, None)))
        assert(versions(0)._4 == seg && versions(0)._5 == round(bal, 2))
      }
    }
  }
}
