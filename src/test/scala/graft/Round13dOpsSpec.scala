package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Brute-force twins (SURVEY.md §5.2.2 discipline) for the round-13 sixth
  * operator wave: sequential driver-side recomputes from the raw sf0.001
  * rows — different code path and iteration order — must agree row for row
  * with the declared queries.
  */
class Round13dOpsSpec extends SparkSpec {

  private def round(x: Double, s: Int): Double =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()

  private def dec(x: Double, s: Int): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP)

  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  // ---- window_rolling_corr -------------------------------------------

  test("window_rolling_corr matches a sequential decimal-sum recompute") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)),
        r.getDouble(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      // pair stream: (x_i, x_{i-1}) for i >= 1
      val pairs = sorted.zip(sorted.drop(1)).map { case (prev, cur) =>
        (cur._2, cur._4, prev._4) // (event_id, x, y)
      }
      pairs.indices.flatMap { i =>
        if (i < 19) None
        else {
          val fr = pairs.slice(i - 19, i + 1)
          val n = fr.size.toDouble
          def dsum(f: ((Long, Double, Double)) => Double, s: Int) =
            fr.map(t => dec(f(t), s)).reduce(_ add _).doubleValue()
          val sx = dsum(_._2, 6); val sy = dsum(_._3, 6)
          val sxx = dsum(t => t._2 * t._2, 10)
          val syy = dsum(t => t._3 * t._3, 10)
          val sxy = dsum(t => t._2 * t._3, 10)
          val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
          if (den > 1e-9)
            Some((u, fr.last._1, round((n * sxy - sx * sy) / math.sqrt(den), 6)))
          else None
        }
      }
    }.sortBy(t => (t._1, t._2))
    val got = Registry.byId("window_rolling_corr").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  // ---- agg_gini_coefficient ------------------------------------------

  test("agg_gini_coefficient matches a sequential rank-sum recompute") {
    val orders = Tables(spark, sf, "orders")
      .select("o_custkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val totals = orders.groupBy(_._1).toSeq.map { case (c, rows) =>
      c -> rows.map(r => dec(r._2, 6)).reduce(_ add _)
    }
    val ranked = totals.sortBy { case (c, t) => (t, c) }.zipWithIndex
    val n = ranked.size.toLong
    val s = totals.map(_._2).reduce(_ add _).doubleValue()
    val si = ranked.map { case ((_, t), i) =>
      t.multiply(JBigDecimal.valueOf(i + 1L))
    }.reduce(_ add _).doubleValue()
    val gini = 2.0 * si / (n * s) - (n + 1.0) / n
    val got = Registry.byId("agg_gini_coefficient").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((n, round(s, 2), round(gini, 6))))
  }

  // ---- ml_feature_hashing --------------------------------------------

  private def polyHash(tok: String): Long =
    tok.toCharArray.foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % 2147483647L)

  test("ml_feature_hashing matches a sequential hash-and-vote recompute") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 < 50)
    val expected = docs.flatMap { case (d, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val nTok = toks.length.toLong
      toks.map(polyHash)
        .map(h => (h % 64, if (h % 2 == 0) 1L else -1L))
        .groupBy(_._1).toSeq
        .map { case (slot, g) =>
          val w = g.map(_._2).sum
          (d, slot.toInt, w, round(w.toDouble / nTok, 6))
        }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = Registry.byId("ml_feature_hashing").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  test("ml_feature_hashing twin hash agrees with the rolling-hash dialect") {
    // The featurizer's slot hash must stay THE library polynomial fold:
    // anchor a few literals so a drift in either side is a failure here,
    // not a silent cross-engine coincidence.
    assert(polyHash("the") == ((((7L * 31 + 't') % 2147483647L) * 31 + 'h')
      % 2147483647L * 31 + 'e') % 2147483647L)
    assert(polyHash("") == 7L)
  }

  // ---- text_zipf_fit -------------------------------------------------

  test("text_zipf_fit matches a sequential ln-ln least-squares recompute") {
    val toks = Tables(spark, sf, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    val vocab = toks.groupBy(identity).toSeq
      .map { case (t, g) => (t, g.length.toLong) }
      .sortBy { case (t, f) => (-f, t) }
    val n = vocab.size.toLong
    val xs = vocab.indices.map(i => dec(math.log((i + 1).toDouble), 10))
    val ys = vocab.map { case (_, f) => dec(math.log(f.toDouble), 10) }
    def dsum(vs: Seq[JBigDecimal]) = vs.reduce(_ add _).doubleValue()
    val sx = dsum(xs); val sy = dsum(ys)
    val sxx = dsum(xs.map(x => dec(x.doubleValue * x.doubleValue, 10)))
    val sxy = dsum(xs.zip(ys).map { case (x, y) =>
      dec(x.doubleValue * y.doubleValue, 10) })
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    val got = Registry.byId("text_zipf_fit").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((n, round(slope, 6), round(intercept, 6))))
  }
}
