package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Oracle-independent brute-force twins (SURVEY.md §5.2.2) for the derived
  * statistics where the DuckDB oracle shares the formula with the query: a
  * driver-side sequential recompute from the raw sf0.001 rows — different
  * code path, different engine, different iteration order — must agree row
  * for row. Catches the failure mode the differential gate can't: the same
  * wrong formula written twice.
  */
class BruteForceTwinSpec extends SparkSpec {

  private def round(x: Double, s: Int): Double =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()

  test("agg_weighted_median matches a sequential cumsum over sorted rows") {
    val raw = Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity")
      .collect()
      .map(r => (r.getString(0),
        JBigDecimal.valueOf(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP),
        JBigDecimal.valueOf(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP)))
    val expected = raw.groupBy(_._1).map { case (flag, rows) =>
      val sorted = rows.sortBy(_._2)
      val tot = sorted.map(_._3).reduce(_ add _)
      var cum = JBigDecimal.ZERO
      val med = sorted.find { case (_, _, q) =>
        cum = cum.add(q)
        cum.add(cum).compareTo(tot) >= 0
      }.get._2
      flag -> ((med.doubleValue(), tot.doubleValue()))
    }
    val got = Registry.byId("agg_weighted_median").run(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got == expected)
  }

  /** The md5 ppm draw, recomputed with MessageDigest instead of the SQL
    * md5/conv chain.
    */
  private def ppmU(docId: Long): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$docId:77".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16) % 1000000L
    (h + 1) / 1000001.0
  }

  test("sample_weighted_reservoir picks the A-ES top-3 per source") {
    val docs = Tables(spark, sf, "documents")
      .select("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map { case (_, id, w) => (id, round(math.log(ppmU(id)) / w, 12)) }
        .sortBy { case (id, r) => (-r, id) }
        .take(3).zipWithIndex
        .map { case ((id, r), i) => (src, i + 1, id, r) }
    }.sortBy(t => (t._1, t._2))
    val got = Registry.byId("sample_weighted_reservoir").run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  test("join_asof_tolerance: sequential per-user scan agrees, bound inclusive") {
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    val ev = Tables(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type")
      .collect().map { r =>
        val ts = r.getTimestamp(1)
        val micros = math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
        (r.getLong(0), micros, r.getLong(2), r.getString(3))
      }
    val expected = ev.groupBy(_._3).toSeq.flatMap { case (_, rows) =>
      var lastClick: Option[Long] = None
      rows.sortBy(e => (e._2, e._1)).map { case (id, us, _, typ) =>
        val fresh = lastClick.filter(us - _ <= 86400000000L)
        if (typ == "click") lastClick = Some(us)
        id -> fresh.map(c => LocalDateTime
          .ofInstant(Instant.ofEpochSecond(
            math.floorDiv(c, 1000000L), (math.floorMod(c, 1000000L)) * 1000L),
            ZoneOffset.UTC)
          .format(fmt)).orNull
      }
    }.toMap
    val got = Registry.byId("join_asof_tolerance").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
  }

  test("decontaminate_semantic_embed: driver argmax over the eval set agrees") {
    val all = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val evals = all.filter(_._1 < 20).sortBy(_._1)
    // The native expression's fused fold: one pass, three accumulators.
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        ab += x * y; aa += x * x; bb += y * y; i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val expected = all.filter(_._1 >= 20).map { case (id, e) =>
      var bestEid = -1L
      var bestCos = Double.NegativeInfinity
      for ((eid, ee) <- evals) {
        val c = round(cos(e, ee), 6)
        if (c > bestCos) { bestCos = c; bestEid = eid } // ties keep min eid
      }
      id -> ((bestEid, bestCos, bestCos >= 0.30))
    }.toMap
    val got = Registry.byId("decontaminate_semantic_embed").run(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got == expected)
  }
}
