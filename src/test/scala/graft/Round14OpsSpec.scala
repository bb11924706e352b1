package graft

import org.apache.spark.sql.functions._

/** Sequential brute-force twins for the round-14 operators. */
class Round14OpsSpec extends SparkSpec {

  private def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }


  test("BPE training trace matches reference greedy merge loop") {
    // Reference BPE (Sennrich et al. 2016) on the driver: words as symbol
    // vectors, count every adjacent pair weighted by word frequency, take
    // the (n DESC, a, b) argmax, merge greedily left-to-right
    // non-overlapping, repeat.
    val words = Tables(spark, sf, "documents")
      .filter(col("lang") === "en")
      .select(explode(split(lower(col("text")), " ")).as("wd"))
      .filter(length(col("wd")) >= 2 && col("wd").rlike("^[a-z]+$"))
      .groupBy("wd").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var wf: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }

    val want = (1 to 5).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- wf; i <- 0 until syms.length - 1)
        counts(syms(i) -> syms(i + 1)) =
          counts.getOrElse(syms(i) -> syms(i + 1), 0L) + f
      val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      wf = wf.map { case (syms, f) => (mergeWord(syms, a, b), f) }
      (k, a, b, n)
    }

    val got = Registry.byId("text_bpe_train_merges").run(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("bigram-backoff perplexity matches a driver-side LM rebuild") {
    // Rebuild the interpolated LM sequentially: train unigram+bigram on the
    // doc_id%10==0 slice, score every other doc token-by-token with
    // p = 0.7*c(a,b)/n(a) + 0.3*p_uni(b) (first token unigram-only),
    // rounding each ln to 9dp like the registry op's decimal discipline.
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val ref = docs.filter(_._1 % 10 == 0).flatMap(_._2)
    val n = ref.length.toLong
    val vocab = ref.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(64).toMap
    val v = vocab.size.toLong
    val pu = (t: String) =>
      (vocab.getOrElse(t, 0L) + 1).toDouble / (n + v + 1).toDouble
    val refPairs = docs.filter(_._1 % 10 == 0)
      .flatMap { case (_, ts) => ts.sliding(2).filter(_.length == 2) }
      .map(p => (p(0), p(1)))
    val cab = refPairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val na = refPairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val want = docs.filter(_._1 % 10 != 0).map { case (id, ts) =>
      val terms = ts.zipWithIndex.map { case (t, i) =>
        val p =
          if (i == 0) pu(t)
          else 0.7 * (cab.getOrElse((ts(i - 1), t), 0L).toDouble /
            na.getOrElse(ts(i - 1), 1L).toDouble) + 0.3 * pu(t)
        BigDecimal(math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      val ce = -(terms.sum.toDouble) / ts.length
      (id, ts.length.toLong,
        BigDecimal(ce).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = Registry.byId("corpus_perplexity_bigram_filter").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("BPE apply: per-doc subword counts match a driver re-encode") {
    val merges = Registry.byId("text_bpe_train_merges").run(spark, sf)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    def encode(w: String): Long = {
      var syms = w.map(_.toString).toVector
      for ((a, b) <- merges) syms = mergeWord(syms, a, b)
      syms.length.toLong
    }
    val want = Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text")))
      .collect().map { r =>
        val ws = r.getString(1).split(" ", -1)
        r.getLong(0) -> ws.map(w =>
          if (w.length >= 2 && w.forall(c => c >= 'a' && c <= 'z')) encode(w)
          else 1L).sum
      }.toMap
    val got = Registry.byId("text_bpe_encode_tokens").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == want)
  }

  test("hybrid RRF fuses the two driver-recomputed rank lists exactly") {
    // Rebuild both modality rankings sequentially and fuse on the driver.
    val e = Tables(spark, sf, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosR(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val toks = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).filter(_.nonEmpty).toSet).toMap
    def topList(qa: Long, score: Long => Double): Seq[(Long, Int)] =
      e.keys.filter(_ != qa).toSeq
        .map(qb => (qb, score(qb)))
        .sortBy { case (qb, sc) => (-sc, qb) }
        .take(20).zipWithIndex.map { case ((qb, _), i) => (qb, i + 1) }
    val want = (0L until 20L).flatMap { qa =>
      val sem = topList(qa, qb => cosR(e(qa), e(qb))).toMap
      val lex = topList(qa, { qb =>
        val i = (toks(qa) & toks(qb)).size
        if (i == 0) Double.MinValue
        else BigDecimal(i.toDouble / (toks(qa).size + toks(qb).size - i))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }).filter { case (qb, _) => (toks(qa) & toks(qb)).nonEmpty }.toMap
      (sem.keySet ++ lex.keySet).toSeq
        .map { qb =>
          val rrf = sem.get(qb).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            lex.get(qb).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          (qb, BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        }
        .sortBy { case (qb, sc) => (-sc, qb) }.take(3).zipWithIndex
        .map { case ((qb, sc), i) => (qa, qb, sc, i + 1) }
    }
    val got = Registry.byId("sim_hybrid_rrf_topk").run(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == want)
  }

  test("label propagation matches a driver-side synchronous LPA") {
    val edges = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 2)
      lab = adj.map { case (v, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    val com = lab.values.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val want = com.sortBy { case (l, n) => (-n, l) }.take(20)
      .map { case (l, n) => (l, n, com.size.toLong) }
    val got = Registry.byId("graph_label_propagation").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("logistic GD: loss decreases and step-1 gradient matches closed form") {
    val rows = Registry.byId("ml_train_logreg_gd").run(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    // Training must make progress: nll strictly decreases across the trace
    // (the incoming-params convention means row k holds nll BEFORE step k,
    // so row1 = ln 2 exactly — the w=b=0 sigmoid is 0.5 for every row).
    val nlls = rows.map(_._4).toSeq
    assert(nlls == nlls.sorted.reverse && nlls.distinct.size == 3, nlls)
    assert(math.abs(nlls.head - math.log(2)) < 1e-6, nlls.head)
    // At w=b=0 the sigmoid is exactly 0.5, so the first update is the
    // closed form w1 = -lr/n * sum x*(n_x/2 - sy_x) — recompute raw-row-wise
    // (uncompressed) and compare.
    val raw = Tables(spark, sf, "lineitem")
      .select(col("l_quantity"), (col("l_returnflag") === "R").cast("int"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val gw = raw.map { case (x, y) => x * (0.5 - y) }.sum
    val gb = raw.map { case (x, y) => 0.5 - y }.sum
    val n = raw.length.toDouble
    assert(math.abs(rows(0)._2 - (-(1e-2 * gw) / n)) < 1e-9, rows(0)._2)
    assert(math.abs(rows(0)._3 - (-(1e-2 * gb) / n)) < 1e-9, rows(0)._3)
  }

  test("seasonal decompose matches a driver-side trend-remove + profile") {
    val hourly = Tables(spark, sf, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hb"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(t => (t._2, t._3)).toIndexedSeq)
      .toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cells = for {
      (et, series) <- hourly.toSeq
      i <- series.indices
    } yield {
      val lo = math.max(0, i - 11)
      val hi = math.min(series.length - 1, i + 12)
      val win = series.slice(lo, hi + 1)
      val trend = r6(win.map(_._2).sum.toDouble / win.length)
      val hod = {
        val cal = java.util.Calendar.getInstance(
          java.util.TimeZone.getTimeZone("UTC"))
        cal.setTime(series(i)._1); cal.get(java.util.Calendar.HOUR_OF_DAY)
      }
      (et, hod, r6(series(i)._2 - trend))
    }
    val want = cells.groupBy(c => (c._1, c._2)).map { case ((et, hod), ds) =>
      val s = ds.map(d => BigDecimal(d._3)).sum
      (et, hod, ds.size.toLong, r6(s.toDouble / ds.size))
    }.toSeq.sortBy(c => (c._1, c._2))
    val got = Registry.byId("window_seasonal_decompose").run(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("equi-depth deciles: populations balanced, ranges disjoint, total exact") {
    val rows = Registry.byId("agg_equidepth_deciles").run(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(rows.map(_._1) == (1 to 10))
    // Equal frequency by construction: bucket sizes differ by at most 1.
    val ns = rows.map(_._2)
    assert(ns.max - ns.min <= 1, ns)
    val nCust = Tables(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(ns.sum == nCust)
    // Value ranges are non-overlapping and ascending.
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 <= b._3, s"overlap between buckets ${a._1} and ${b._1}")
    }
  }

  test("half-life decay matches a driver recompute with exact 2^-k weights") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("value"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val mu = ev.map(_._3).max
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val s = rows.map { case (_, v, us) =>
        val k = (mu - us) / 3600000000L
        new java.math.BigDecimal(v * math.pow(2.0, -k.toDouble))
          .setScale(10, java.math.RoundingMode.HALF_UP)
      }.reduce(_.add(_))
      (u, rows.length.toLong, r6(s.doubleValue))
    }.toSeq.sortBy(_._1)
    val got = Registry.byId("agg_halflife_decay").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("k-anonymity totals are consistent with the flagged classes") {
    val rows = Registry.byId("curation_k_anonymity").run(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    val suppressedSum = rows.filter(_._4).map(_._3).sum
    assert(rows.forall(_._5 == suppressedSum))
    assert(rows.forall(r => r._4 == (r._3 < 5)))
    assert(rows.map(_._3).sum ==
      Tables(spark, sf, "customer").count())
  }

  test("incremental agg maintenance equals the monolithic recompute") {
    val got = Registry.byId("sink_incremental_agg_maintain").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val want = Tables(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 6))).cast("double"), 4).as("s"))
      .orderBy("pri")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == want)
  }
}
