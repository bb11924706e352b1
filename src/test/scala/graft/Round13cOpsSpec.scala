package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Brute-force twins (SURVEY.md §5.2.2 discipline) for the round-13 fifth
  * operator wave: sequential driver-side recomputes from the raw sf0.001
  * rows — different code path and iteration order — must agree row for row
  * with the declared queries. Catches the same-wrong-formula-twice failure
  * mode the DuckDB differential can't.
  */
class Round13cOpsSpec extends SparkSpec {

  private def round(x: Double, s: Int): Double =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()

  /** Timestamp → epoch micros (the asof-twin convention). */
  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def loadEvents(): Array[(Long, Long, Long, String, Double)] =
    Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)),
        r.getString(3), r.getDouble(4)))

  // ---- window_rolling_median -----------------------------------------

  test("window_rolling_median matches a sequential per-user 9-row median") {
    val ev = loadEvents()
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.flatMap { i =>
        if (i < 8) None
        else {
          val frame = sorted.slice(i - 8, i + 1).map(_._5).sorted
          Some((u, sorted(i)._2, round(frame(4), 6)))
        }
      }
    }.sortBy(t => (t._1, t._2))
    val got = Registry.byId("window_rolling_median").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  // ---- agg_mannwhitney_u ---------------------------------------------

  test("agg_mannwhitney_u matches a sequential midrank recompute") {
    val s = loadEvents().filter(r => r._4 == "click" || r._4 == "view")
    val na = s.count(_._4 == "click").toLong
    val n = s.length.toLong
    // Sequential midranks over the fully sorted combined sample — the
    // textbook O(n log n) path, not the compressed-domain fold the query
    // uses.
    val sorted = s.sortBy(_._5)
    val ra = sorted.zipWithIndex
      .groupBy(_._1._5)
      .toSeq
      .flatMap { case (_, grp) =>
        val midrank = grp.map(_._2 + 1).sum.toDouble / grp.size
        grp.collect { case ((_, _, _, "click", _), _) => midrank }
      }
      .sum // exact: half-integers below 2^52
    val uA = ra - na * (na + 1) / 2.0
    val z = (uA - na.toDouble * (n - na) / 2.0) /
      math.sqrt(na.toDouble * (n - na) * (n + 1) / 12.0)
    val got = Registry.byId("agg_mannwhitney_u").run(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq((na, n - na, round(uA, 6), round(z, 6))))
  }

  // ---- agg_ohlc_resample ---------------------------------------------

  test("agg_ohlc_resample matches a sequential per-bar recompute") {
    val ev = loadEvents()
    val expected = ev.groupBy(r => (r._4, r._3 / 3600000000L * 3600L))
      .toSeq
      .map { case ((et, hr), rows) =>
        val ordered = rows.sortBy(r => (r._3, r._2))
        val vol = ordered.map(r => JBigDecimal.valueOf(r._5)
          .setScale(6, RoundingMode.HALF_UP)).reduce(_ add _)
          .doubleValue()
        (et, hr, round(ordered.head._5, 6), round(ordered.map(_._5).max, 6),
          round(ordered.map(_._5).min, 6), round(ordered.last._5, 6),
          ordered.size.toLong, round(vol, 4))
      }
      .sortBy(t => (t._1, t._2))
    val got = Registry.byId("agg_ohlc_resample").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7))).toSeq
    assert(got == expected)
  }

  // ---- text_cooccur_pmi ----------------------------------------------

  test("text_cooccur_pmi matches a sequential PMI recompute") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSet))
    val nDocs = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, g) => t -> g.length.toLong }
      .filter(_._2 >= 5)
    val pairCounts = docs.flatMap { case (_, toks) =>
      val ft = toks.filter(df.contains).toSeq.sorted
      for (i <- ft.indices; j <- (i + 1) until ft.size) yield (ft(i), ft(j))
    }.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val expected = pairCounts.toSeq
      .map { case ((ta, tb), nab) =>
        val pmi = math.log(nab.toDouble * nDocs / (df(ta).toDouble * df(tb)))
        (ta, tb, nab, round(pmi, 6))
      }
      .sortBy { case (ta, tb, _, pmi) => (-pmi, ta, tb) }
      .take(30)
    val got = Registry.byId("text_cooccur_pmi").run(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  // ---- ml_knn_classify -----------------------------------------------

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

  test("ml_knn_classify matches a sequential vote recompute") {
    val emb = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val expected = emb.filter(_._1 < 20).sortBy(_._1).map { case (qa, qe, _) =>
      val top = emb.filter(_._1 != qa)
        .map { case (qb, be, bl) => (qb, bl, round(cos(qe, be), 6)) }
        .sortBy { case (qb, _, c) => (-c, qb) }
        .take(10)
      val (pred, votes) = top.groupBy(_._2)
        .map { case (lb, g) => (lb, g.length.toLong) }
        .toSeq
        .minBy { case (lb, v) => (-v, lb) }
      (qa, pred, votes)
    }.toSeq
    val got = Registry.byId("ml_knn_classify").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected)
  }
}
