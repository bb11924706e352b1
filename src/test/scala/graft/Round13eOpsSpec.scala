package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Brute-force twins (SURVEY.md §5.2.2 discipline) for the round-13 seventh
  * operator wave: sequential driver-side recomputes from the raw sf0.001
  * rows must agree row for row with the declared queries.
  */
class Round13eOpsSpec extends SparkSpec {

  private def round(x: Double, s: Int): Double =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()

  private def dec(x: Double, s: Int): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP)

  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def docTokens(): Array[(Long, String, Array[String])] =
    Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ").filter(_.nonEmpty)))

  // ---- ml_naive_bayes_lang -------------------------------------------

  test("ml_naive_bayes_lang matches a sequential NB recompute") {
    val docs = docTokens()
    val v = docs.flatMap(_._3).distinct.length.toLong
    val cls = docs.groupBy(_._2).map { case (l, g) =>
      l -> g.map(_._3.length.toLong).sum }
    val prior = docs.groupBy(_._2).map { case (l, g) => l -> g.length.toLong }
    val nt = docs.length.toLong
    val cnts = docs.flatMap { case (_, l, ts) => ts.map(t => (l, t)) }
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val langs = cls.keys.toSeq.sorted
    val expected = docs.filter(_._1 < 100).sortBy(_._1).map { case (d, trueL, ts) =>
      val tf = ts.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
      val scores = langs.map { l =>
        val tokTerms = tf.map { case (t, f) =>
          val lik = (cnts.getOrElse((l, t), 0L) + 1.0) / (cls(l) + v)
          dec(f * round(math.log(lik), 8), 8)
        }
        val pr = dec(round(math.log(prior(l).toDouble / nt), 8), 8)
        l -> (tokTerms ++ Seq(pr)).reduce(_ add _)
      }
      val (pred, sc) = scores.minBy { case (l, s) => (s.negate, l) }
      (d, pred, round(sc.doubleValue, 6), trueL,
        if (pred == trueL) 1 else 0)
    }.toSeq
    val got = Registry.byId("ml_naive_bayes_lang").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3), r.getInt(4))).toSeq
    assert(got == expected)
  }

  // ---- funnel_path_trigrams ------------------------------------------

  test("funnel_path_trigrams matches a sequential sessionize recompute") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)),
        r.getString(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      // split into sessions on >30 min gaps
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._3 <= cur.head._3 + 1800000000L =>
            (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse)
      sessions.map(s => s.take(3).map(_._4).mkString(">"))
    }
    val expected = paths.groupBy(identity).toSeq
      .map { case (p, g) => (p, g.length.toLong) }
      .sortBy { case (p, n) => (-n, p) }
      .take(20)
    val got = Registry.byId("funnel_path_trigrams").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  // ---- window_time_to_conversion -------------------------------------

  test("window_time_to_conversion matches a sequential forward scan") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)),
        r.getString(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.flatMap { i =>
        if (sorted(i)._4 != "view") None
        else sorted.drop(i + 1).find(_._4 == "purchase")
          .map(p => (u, sorted(i)._2, p._3 - sorted(i)._3))
      }
    }.sortBy(t => (t._1, t._2))
    val got = Registry.byId("window_time_to_conversion").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  // ---- text_bigram_cond_entropy --------------------------------------

  test("text_bigram_cond_entropy matches a sequential decimal recompute") {
    // Pair on the RAW split (empties kept) then drop pairs touching an
    // empty token — the query's order of operations; pre-filtering the
    // tokens would invent pairs that span a double space.
    val raw = Tables(spark, sf, "documents")
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ", -1))
    val bigrams = raw.flatMap(full => full.sliding(2)
      .filter(p => p.length == 2 && p(0).nonEmpty && p(1).nonEmpty)
      .map(p => (p(0), p(1))))
    val ab = bigrams.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val na = ab.groupBy(_._1._1).map { case (a, g) => a -> g.values.sum }
    val n = ab.values.sum
    val h = ab.map { case ((a, _), nab) =>
      dec(-(nab.toDouble / n) * math.log(nab.toDouble / na(a)), 10)
    }.reduce(_ add _).doubleValue()
    val got = Registry.byId("text_bigram_cond_entropy").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((n, ab.size.toLong, round(h, 6))))
  }
}
