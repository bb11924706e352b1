package graft

import org.apache.spark.sql.functions._

/** Round-15 operator micro-pins. */
class Round15OpsSpec extends SparkSpec {

  test("content-addressed blob store: round-trip verifies, addresses dedup to distinct payloads") {
    val rows = Registry.byId("sink_blob_content_addressed").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // Every manifest row found its blob, the recomputed sha matched both
    // the manifest address and the file name (the `ok` conjunction).
    assert(rows.forall(_.getBoolean(3)), "round-trip integrity failed")
    // Content addressing collapses identical payloads: distinct addresses
    // == distinct source texts, and byte lengths match the source.
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 500)
    val distinctTexts = docs.select("text").distinct().count()
    assert(rows.map(_.getString(1)).distinct.length.toLong == distinctTexts)
    val wantLens = docs
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == wantLens(r.getLong(0)),
      s"doc ${r.getLong(0)}: blob length ${r.getLong(2)} != source ${wantLens(r.getLong(0))}"))
  }

  // ---- transformer-component twins: naive per-element recomputations that
  // pin the algebraic rearrangements (sufficient-stats LayerNorm, merged
  // RoPE cache, merged LoRA checksum) to the textbook formulas.

  private def embRows(): Array[(Long, Int, Array[Double])] =
    Tables(spark, sf, "embeddings")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray))

  private def avgBy[K: Ordering](xs: Seq[(K, Double)]): Map[K, Double] =
    xs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum / vs.size }

  test("layernorm/rmsnorm sufficient-stats form matches the naive two-pass formula") {
    val got = Registry.byId("ml_layernorm_rmsnorm").run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val w = (1 to 64).map(i => ((i * 37) % 11 - 5).toDouble)
    val v = (1 to 64).map(i => ((i * 23) % 13 - 6).toDouble)
    val naive = embRows().map { case (_, label, x) =>
      val mu = x.sum / 64.0
      val sd = math.sqrt(x.map(e => (e - mu) * (e - mu)).sum / 64.0 + 1e-5)
      val rms = math.sqrt(x.map(e => e * e).sum / 64.0 + 1e-5)
      val ln = x.zip(w).map { case (e, wi) => (e - mu) / sd * wi }.sum
      val rm = x.zip(v).map { case (e, vi) => e / rms * vi }.sum
      (label, ln, rm)
    }
    val lnAvg = avgBy(naive.map(t => t._1 -> t._2).toSeq)
    val rmAvg = avgBy(naive.map(t => t._1 -> t._3).toSeq)
    got.foreach { case (label, (lnGot, rmGot)) =>
      assert(math.abs(lnGot - lnAvg(label)) < 1e-4, s"ln label $label")
      assert(math.abs(rmGot - rmAvg(label)) < 1e-4, s"rms label $label")
    }
  }

  test("rope merged coefficient cache matches direct per-pair rotation") {
    val got = Registry.byId("ml_rope_rotate").run(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val naive = embRows().map { case (id, _, x) =>
      val p = (id % 32).toInt
      val chk = (1 to 32).map { j =>
        val theta = p * math.pow(10000.0, -(2.0 * (j - 1)) / 64.0)
        val c = math.cos(theta); val sn = math.sin(theta)
        val x1 = x(2 * j - 2); val x2 = x(2 * j - 1)
        val y1 = x1 * c - x2 * sn; val y2 = x1 * sn + x2 * c
        y1 * ((j * 29) % 13 - 6) + y2 * ((j * 19) % 11 - 5)
      }.sum
      (p, chk)
    }
    avgBy(naive.toSeq).foreach { case (p, want) =>
      assert(math.abs(got(p) - want) < 1e-3, s"pos $p: ${got(p)} vs $want")
    }
  }

  test("attention entropy matches brute-force softmax per sequence") {
    val got = Registry.byId("ml_attention_entropy").run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getDouble(2), r.getLong(4))).toMap
    val groups = embRows().groupBy(_._1 / 8)
    val perGid = groups.toSeq.map { case (gid, rows) =>
      val sorted = rows.sortBy(_._1)
      val qe = sorted.head._3
      val scores = sorted.map { case (_, _, ke) =>
        qe.zip(ke).map { case (a, b) => a * b }.sum * 4.0
      }
      val mx = scores.max
      val ex = scores.map(sc => math.exp(sc - mx))
      val se = ex.sum
      val ws = ex.map(_ / se)
      val h = ws.map(wi => if (wi > 0) -wi * math.log(wi) else 0.0).sum
      val topK = ws.indexOf(ws.max) + 1
      (gid, h, topK)
    }
    val hAvg = avgBy(perGid.map(t => (t._1 % 16).toInt -> t._2))
    val kSum = perGid.groupBy(t => (t._1 % 16).toInt)
      .map { case (b, vs) => b -> vs.map(_._3.toLong).sum }
    got.foreach { case (bucket, (hGot, kGot)) =>
      assert(math.abs(hGot - hAvg(bucket)) < 1e-3, s"h bucket $bucket")
      assert(kGot == kSum(bucket), s"topk bucket $bucket: $kGot vs ${kSum(bucket)}")
    }
  }

  test("scc of the knn digraph matches a driver-side Floyd-Warshall closure") {
    val got = Registry.byId("graph_scc_knn").run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Recompute edges naively (top-3 cosine, 6dp, id tie-break) and close
    // reachability with Floyd-Warshall, then scc_id = min mutual partner.
    val vecs = embRows().filter(_._1 < 60).sortBy(_._1)
    val n = vecs.length
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val raw = dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      // Spark round() semantics (HALF_UP on the shortest repr), so rank
      // tie-breaks match the query exactly.
      java.math.BigDecimal.valueOf(raw)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    }
    val reach = Array.fill(n, n)(false)
    for (i <- 0 until n) {
      reach(i)(i) = true
      val sims = (0 until n).filter(_ != i)
        .map(j => (cos(vecs(i)._3, vecs(j)._3), j))
        .sortBy { case (c, j) => (-c, j) }
        .take(3)
      sims.foreach { case (_, j) => reach(i)(j) = true }
    }
    for (k <- 0 until n; i <- 0 until n if reach(i)(k);
         j <- 0 until n if reach(k)(j)) reach(i)(j) = true
    val sccId = (0 until n).map(i =>
      (0 until n).filter(j => reach(i)(j) && reach(j)(i)).min)
    val want = sccId.groupBy(identity).map { case (id, vs) =>
      id.toLong -> vs.size.toLong }
    assert(got == want, s"$got vs $want")
  }

  test("lora merged checksum matches the naive y = Dx + 0.5*B(Ax) probe fold") {
    val got = Registry.byId("ml_lora_matvec").run(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val naive = embRows().map { case (_, label, x) =>
      val h = (1 to 4).map { j =>
        (1 to 64).map(i => x(i - 1) * (((j * 31 + i * 17) % 19 - 9) / 16.0)).sum
      }
      val chk = (1 to 64).map { i =>
        val d = 1.0 + (i % 7) / 128.0
        val bh = (1 to 4).map(j => (((i * 13 + j * 7) % 17 - 8) / 16.0) * h(j - 1)).sum
        val v = ((i * 23 + 5) % 13 - 6).toDouble
        (d * x(i - 1) + 0.5 * bh) * v
      }.sum
      (label, chk)
    }
    avgBy(naive.toSeq).foreach { case (label, want) =>
      assert(math.abs(got(label) - want) < 1e-4, s"label $label")
    }
  }

  test("moe top-2 routing matches a naive per-token gate/softmax/mix") {
    val got = Registry.byId("ml_moe_route_top2").run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    def gate(e: Int, i: Int) = ((e * 37 + i * 13) % 17 - 8) / 16.0
    def out(e: Int, i: Int) = ((e * 29 + i * 19) % 15 - 7) / 16.0
    val naive = embRows().map { case (_, _, x) =>
      val s = (0 until 8).map(e => (1 to 64).map(i => x(i - 1) * gate(e, i)).sum)
      val o = (0 until 8).map(e => (1 to 64).map(i => x(i - 1) * out(e, i)).sum)
      val e1 = s.indexOf(s.max)
      val masked = s.zipWithIndex.map { case (v, i) => if (i == e1) -1e18 else v }
      val e2 = masked.indexOf(masked.max)
      val ed = math.exp(s(e2) - s(e1))
      val w1 = 1.0 / (1.0 + ed); val w2 = ed / (1.0 + ed)
      ((e1 + 1, e2 + 1), w1 * o(e1) + w2 * o(e2))
    }
    naive.groupBy(_._1).foreach { case (pair, vs) =>
      val (n, ySum) = got(pair)
      assert(n == vs.length.toLong, s"pair $pair count")
      assert(math.abs(ySum - vs.map(_._2).sum) < 1e-3, s"pair $pair y_sum")
    }
  }

  test("gelu ffn checksum matches a naive tanh-GELU forward pass") {
    val got = Registry.byId("ml_mlp_gelu_forward").run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val C = math.sqrt(2.0 / math.Pi)
    val naive = embRows().map { case (_, label, x) =>
      val chk = (1 to 8).map { j =>
        val z = (1 to 64).map(i =>
          x(i - 1) * (((j * 41 + i * 23) % 19 - 9) / 16.0)).sum +
          ((j * 5) % 9 - 4) / 128.0
        val h = 0.5 * z * (1.0 + math.tanh(C * (z + 0.044715 * z * z * z)))
        h * ((j * 13) % 11 - 5)
      }.sum
      (label, chk)
    }
    naive.groupBy(_._1).foreach { case (label, vs) =>
      val (n, chkSum) = got(label)
      assert(n == vs.length.toLong, s"label $label count")
      assert(math.abs(chkSum - vs.map(_._2).sum) < 1e-3, s"label $label chk_sum")
    }
  }

  test("nucleus keep counts match a naive softmax + cumulative-mass filter") {
    val got = Registry.byId("ml_topp_nucleus_sample").run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    def probe(i: Int) = ((i * 7) % 15 - 7) / 16.0
    val perGid = embRows().groupBy(_._1 / 8).toSeq.map { case (gid, rows) =>
      val scores = rows.sortBy(_._1).map { case (_, _, x) =>
        4.0 * (1 to 64).map(i => x(i - 1) * probe(i)).sum
      }
      val mx = scores.max
      val ex = scores.map(sc => math.exp(sc - mx))
      val ws = ex.map(_ / ex.sum)
      // sort desc with kpos tie-break; keep while preceding cum mass < 0.8
      val ordered = ws.zipWithIndex.sortBy { case (w, i) => (-w, i) }
      val kept = ordered.scanLeft(0.0)(_ + _._1).dropRight(1)
        .zip(ordered).takeWhile { case (prev, _) => prev < 0.8 }
      (gid, kept.length.toLong)
    }
    perGid.groupBy(t => (t._1 % 16).toInt).foreach { case (bucket, vs) =>
      val (nSeq, keptSum) = got(bucket)
      assert(nSeq == vs.length.toLong, s"bucket $bucket n_seq")
      assert(keptSum == vs.map(_._2).sum, s"bucket $bucket kept_sum")
    }
  }

  test("hits rounds match a driver-side recomputation on the trade digraph") {
    val got = Registry.byId("graph_hits_hubs_auth").run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val eds = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("s"), (col("l_suppkey") * 2 + 1).as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val a1 = eds.groupBy(_._2).map { case (d, es) => d -> es.length.toLong }
    val h1 = eds.groupBy(_._1).map { case (s, es) =>
      s -> es.map(e => a1(e._2)).sum }
    val a2 = eds.groupBy(_._2).map { case (d, es) =>
      d -> es.map(e => h1(e._1)).sum }
    val h2 = eds.groupBy(_._1).map { case (s, es) =>
      s -> es.map(e => a2(e._2)).sum }
    got.foreach {
      case (("auth", node), (r1, r2)) =>
        assert(r1 == a1(node) && r2 == a2(node), s"auth $node")
      case (("hub", node), (r1, r2)) =>
        assert(r1 == h1(node) && r2 == h2(node), s"hub $node")
      case other => fail(s"unexpected row $other")
    }
    // the reported authorities are the true top-10 by (a2 DESC, node)
    val wantAuth = a2.toSeq.map { case (n, v) => (-v, n) }.sorted.take(10)
      .map(_._2).toSet
    assert(got.keys.collect { case ("auth", n) => n }.toSet == wantAuth)
  }

  test("bollinger bands match a naive 20-day mean/stddev recomputation") {
    val got = Registry.byId("window_bollinger_bands").run(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(6)))
      .toMap
    val daily = Tables(spark, sf, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .agg(sum(Fns.cents(col("o_totalprice"))).cast("long").as("c"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).sortBy(_._1)
    daily.indices.drop(19).foreach { i =>
      val frame = daily.slice(i - 19, i + 1).map(_._2.toDouble / 100.0)
      val mean = frame.sum / 20.0
      val sd = math.sqrt(frame.map(v => (v - mean) * (v - mean)).sum / 19.0)
      val (close, mid, sdGot, above) = got(daily(i)._1)
      assert(math.abs(close - daily(i)._2 / 100.0) < 1e-9)
      assert(math.abs(mid - mean) < 1e-6, s"day ${daily(i)._1} mid")
      assert(math.abs(sdGot - sd) < 1e-4, s"day ${daily(i)._1} sd")
      assert(above == (close > mid + 2.0 * sdGot))
    }
    assert(got.size == daily.length - 19)
  }

  test("als half-step factors satisfy the regularized normal equations") {
    val rows = Registry.byId("ml_als_step").run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val ratings = Tables(spark, sf, "orders")
      .filter(col("o_custkey") <= 300)
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    ratings.groupBy(_._1).foreach { case (u, items) =>
      val fs = items.map { case (_, p, rt) =>
        (((p * 17) % 13 - 6) / 16.0, ((p * 11) % 7 - 3) / 16.0, rt)
      }
      val s11 = fs.map(t => t._1 * t._1).sum + 0.25
      val s12 = fs.map(t => t._1 * t._2).sum
      val s22 = fs.map(t => t._2 * t._2).sum + 0.25
      val b1 = fs.map(t => t._1 * t._3).sum
      val b2 = fs.map(t => t._2 * t._3).sum
      val (u1, u2) = rows(u)
      // A·u == b within fp noise: the definition of the half-step solve.
      assert(math.abs(s11 * u1 + s12 * u2 - b1) < 1e-9, s"user $u eq1")
      assert(math.abs(s12 * u1 + s22 * u2 - b2) < 1e-9, s"user $u eq2")
    }
  }

  test("int4 pack round-trips: codes within [-7,7], bytes reconstruct codes") {
    val got = Registry.byId("ml_int4_quantize_pack").run(spark, sf).collect()
    val emb = Tables(spark, sf, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    got.foreach { r =>
      val (id, amax, packed, err) =
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
      val x = emb(id)
      assert(math.abs(amax - x.map(math.abs).max) < 1e-12)
      val q = x.map(v => math.floor(v * 7.0 / amax + 0.5).toLong)
      assert(q.forall(c => c >= -7 && c <= 7), s"vec $id code range")
      val bytes = (1 to 32).map(k => (q(2 * k - 2) + 8) * 16 + (q(2 * k - 1) + 8))
      assert(bytes.forall(b => b >= 0 && b <= 255))
      assert(packed == bytes.sum, s"vec $id packed_sum")
      // unpack: hi nibble / lo nibble recover the codes
      bytes.zipWithIndex.foreach { case (b, k) =>
        assert(b / 16 - 8 == q(2 * k) && b % 16 - 8 == q(2 * k + 1))
      }
      val wantErr = x.zip(q).map { case (v, c) =>
        math.abs(v - c.toDouble * amax / 7.0) }.max
      assert(math.abs(err - wantErr) < 1e-12, s"vec $id err")
    }
  }

  test("dp laplace counts: noise is the declared transform of the cell-key hash") {
    val got = Registry.byId("curation_dp_count_laplace").run(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    val cells = Tables(spark, sf, "documents").groupBy("source", "lang")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    cells.foreach { case (src, lang, n) =>
      val h = s"$src|$lang".foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % 2147483647L)
      val uu = ((h % 1048575L) + 0.5) / 1048576.0 - 0.5
      val lnr = BigDecimal(math.log(1.0 - 2.0 * math.abs(uu)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val noise = -2.0 * (if (uu >= 0) 1.0 else -1.0) * lnr
      val (noisy, sup) = got((src, lang))
      assert(noisy == n.toDouble + noise, s"cell ($src,$lang)")
      assert(sup == (noisy < 5.0))
    }
    assert(got.size == cells.length)
  }

  test("beam graph-walk ANN matches a driver-side beam descent") {
    // Round 17: the lower layer carries a width-4 bounded beam (each hop
    // expands every beam member's out-edges, self included, dedups and
    // keeps the top-4 per query by (cos DESC, node)); the row emits
    // (q, found, cos6, worst6, n_beam).
    val got = Registry.byId("sim_ann_graph_greedy").run(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toMap
    val all = embRows().map { case (id, _, x) => id -> x }.toMap
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      val ab = a.zip(b).map { case (u, v) => u * v }.sum
      val na = math.sqrt(a.map(u => u * u).sum)
      val nb = math.sqrt(b.map(u => u * u).sum)
      BigDecimal(ab / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val nodes = all.keys.filter(_ < 200).toSeq.sorted
    // Layer 0 (round 18): the build is candidate-BOUNDED — multiprobe
    // sign-LSH (8 tables x 5 planes; probe side also scans the 5 buckets
    // one bit-flip away) proposes pairs, exact cosine re-ranks, top-4 per
    // src survives. The twin mirrors the same three stages sequentially.
    val planes = graft.queries.SimOps.Planes
    def planeDot(x: Array[Double], i: Int): Double =
      x.zip(planes(i)).map { case (a, w) => a * w.toDouble }.sum
    def bucket(x: Array[Double], t: Int): Int =
      (0 until 5).map(i => if (planeDot(x, 5 * t + i) > 0) 1 << i else 0).sum
    val cells = nodes
      .flatMap(v => (0 until 8).map(t => ((t, bucket(all(v), t)), v)))
      .groupMap(_._1)(_._2)
    val cand = nodes.map { v =>
      v -> (0 until 8).flatMap { t =>
        val b = bucket(all(v), t)
        (b +: (0 until 5).map(i => b ^ (1 << i)))
          .flatMap(p => cells.getOrElse((t, p), Nil))
      }.distinct.filter(_ != v)
    }.toMap
    val edges = nodes.map { v =>
      v -> cand(v)
        .map(u => (-cos6(all(v), all(u)), u)).sorted.take(4).map(_._2)
    }.toMap
    // Upper layer (two-layer walk, round 16): 1-in-8 node sample, top-2.
    val upperNodes = nodes.filter(_ % 8 == 0)
    val upperEdges = upperNodes.map { v =>
      v -> upperNodes.filter(_ != v)
        .map(u => (-cos6(all(v), all(u)), u)).sorted.take(2).map(_._2)
    }.toMap
    (200L until 205L).foreach { q =>
      var cur = 0L
      for (_ <- 1 to 4) {
        val cands = cur +: upperEdges(cur)
        cur = cands.map(u => (-cos6(all(q), all(u)), u)).min._2
      }
      var beam = Seq(cur)
      for (_ <- 1 to 8) {
        val expanded = beam.flatMap(b => b +: edges(b)).distinct
        beam = expanded.map(u => (-cos6(all(q), all(u)), u))
          .sorted.take(4).map(_._2)
      }
      val scored = beam.map(u => (-cos6(all(q), all(u)), u)).sorted
      val (found, c6, worst6, nBeam) = got(q)
      assert(found == scored.head._2, s"query $q found $found want ${scored.head._2}")
      assert(c6 == -scored.head._1, s"query $q cos6")
      assert(worst6 == -scored.map(_._1).max, s"query $q worst6")
      assert(nBeam == beam.size, s"query $q n_beam")
    }
  }

  test("phash bits match a naive DCT + median threshold per doc") {
    val got = Registry.byId("multimodal_image_phash").run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables(spark, sf, "documents")
      .filter(col("doc_id") < 300 && length(col("text")) > 0)
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val cps = text.codePoints().toArray
      val p = (0 until 64).map(i => cps(i % cps.length).toDouble)
      val xs = graft.queries.SimOps.PhashBasis.map { case (_, _, k) =>
        p.zip(k).map { case (a, b) => a * b }.sum
      }
      val med = xs.sorted.apply(7)
      val want = xs.zipWithIndex
        .map { case (x, j) => if (x > med) 1L << j else 0L }.sum
      assert(got(id) == want, s"doc $id phash")
    }
    assert(got.size == docs.length)
  }

  test("transformer block checksum matches a naive per-sequence forward pass") {
    val got = Registry.byId("ml_transformer_block_forward").run(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val C = math.sqrt(2.0 / math.Pi)
    def ln(x: Array[Double]): Array[Double] = {
      val mu = x.sum / 64.0
      val sd = math.sqrt(x.map(v => (v - mu) * (v - mu)).sum / 64.0 + 1e-5)
      x.map(v => (v - mu) / sd)
    }
    import graft.queries.TransformerOps.{BlkW, BlkW2, BlkProbe}
    val perTok = embRows().groupBy(_._1 / 8).toSeq.flatMap { case (_, rows) =>
      val toks = rows.sortBy(_._1).map(_._3)
      val xn = toks.map(ln)
      toks.indices.map { qi =>
        val sc = (0 to qi).map(ki =>
          xn(qi).zip(xn(ki)).map { case (a, b) => a * b }.sum * 0.125)
        val mx = sc.max
        val ex = sc.map(v => math.exp(v - mx))
        val w = ex.map(_ / ex.sum)
        val r1 = Array.tabulate(64)(e =>
          toks(qi)(e) + (0 to qi).map(ki => w(ki) * xn(ki)(e)).sum)
        val r1n = ln(r1)
        val hs = (1 to 4).map { j =>
          val z = r1n.zip(BlkW(j - 1)).map { case (a, b) => a * b }.sum
          0.5 * z * (1.0 + math.tanh(C * (z + 0.044715 * z * z * z)))
        }
        val out = Array.tabulate(64)(e =>
          r1(e) + (1 to 4).map(j => hs(j - 1) * BlkW2(j - 1)(e)).sum)
        (qi + 1, out.zip(BlkProbe).map { case (a, b) => a * b }.sum)
      }
    }
    perTok.groupBy(_._1).foreach { case (qpos, vs) =>
      val (n, chkSum) = got(qpos)
      assert(n == vs.length.toLong, s"qpos $qpos n")
      assert(math.abs(chkSum - vs.map(_._2).sum) < 1e-2 * vs.length,
        s"qpos $qpos chk_sum ${chkSum} vs ${vs.map(_._2).sum}")
    }
  }

  test("speculative acceptance matches a naive dual-softmax verification") {
    val got = Registry.byId("ml_speculative_decode_accept").run(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    import graft.queries.TransformerOps.{SpecDraft, SpecTarget}
    def softmax(s: Seq[Double]): Seq[Double] = {
      val ex = s.map(v => math.exp(v - s.max)); ex.map(_ / ex.sum)
    }
    val naive = embRows().map { case (_, _, x) =>
      val dsc = SpecDraft.map(w => x.zip(w).map { case (a, b) => a * b }.sum)
      val tsc = SpecTarget.map(w => x.zip(w).map { case (a, b) => a * b }.sum)
      val td = dsc.indexOf(dsc.max)
      (td + 1, softmax(tsc)(td) >= softmax(dsc)(td))
    }
    naive.groupBy(_._1).foreach { case (td, vs) =>
      val (n, nAcc) = got(td)
      assert(n == vs.length.toLong, s"td $td n")
      // rounded-6dp engine probabilities can flip knife-edge comparisons;
      // allow a 2-count band against the unrounded reference.
      assert(math.abs(nAcc - vs.count(_._2).toLong) <= 2, s"td $td n_accept")
    }
  }

  test("whitened dimensions have mean ~0 and stddev ~1 under the corpus stats") {
    // Recompute the stats the query derives and confirm they standardize:
    // the whitening transform applied back to the corpus yields per-dim
    // mean ~0, stddev ~1 (up to the decimal-cast granularity).
    val rows = embRows().map(_._3)
    val n = rows.length
    (0 until 64).foreach { d =>
      val xs = rows.map(_(d))
      val mu = xs.sum / n
      val sd = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / (n - 1))
      val w = xs.map(v => (v - mu) / sd)
      assert(math.abs(w.sum / n) < 1e-9, s"dim $d mean")
      assert(math.abs(w.map(v => v * v).sum / (n - 1) - 1.0) < 1e-9, s"dim $d var")
    }
    // and the registry query's per-label counts cover the corpus
    val got = Registry.byId("ml_embedding_whitening").run(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == n.toLong)
  }

  test("kneser-ney scores match a driver-side model recompute") {
    val got = Registry.byId("corpus_perplexity_kneser_ney").run(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val refPairs = docs.filter(_._1 % 10 == 0).flatMap { case (_, ts) =>
      ts.zipWithIndex.map { case (t, i) => (t, if (i > 0) Some(ts(i - 1)) else None) }
    }
    val n = refPairs.length
    val vocab = refPairs.groupBy(_._1).map { case (t, xs) => t -> xs.length }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(64).map(_._1).toSet
    val v = vocab.size
    val big = refPairs.collect {
      case (b, Some(a)) if vocab(a) && vocab(b) => (a, b)
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val na = big.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val n1a = big.groupBy(_._1._1).map { case (a, m) => a -> m.size.toLong }
    val cc = big.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
    val ntot = big.size.toLong
    def pCont(b: String) = (cc.getOrElse(b, 0L) + 1) / (ntot + v).toDouble
    docs.filter(_._1 % 10 != 0).foreach { case (id, ts) =>
      val lnSum = ts.zipWithIndex.map { case (b, i) =>
        val prev = if (i > 0) Some(ts(i - 1)) else None
        val p =
          if (!vocab(b)) 1.0 / (n + v + 1)
          else prev.filter(a => na.contains(a)) match {
            case None => pCont(b)
            case Some(a) =>
              (math.max(big.getOrElse((a, b), 0L).toDouble - 0.75, 0.0) +
                0.75 * n1a(a) * pCont(b)) / na(a)
          }
        math.log(p)
      }.sum
      val ce = -lnSum / ts.length
      val (nTok, ceGot) = got(id)
      assert(nTok == ts.length.toLong, s"doc $id n_tok")
      assert(math.abs(ceGot - ce) < 1e-4, s"doc $id ce $ceGot vs $ce")
    }
  }

  test("infonce loss and top-1 hits match a naive per-batch recompute") {
    val got = Registry.byId("ml_infonce_contrastive").run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val ab = a.zip(b).map { case (u, v) => u * v }.sum
      ab / (math.sqrt(a.map(u => u * u).sum) * math.sqrt(b.map(u => u * u).sum))
    }
    val anchors = embRows().groupBy(_._1 / 8).toSeq.flatMap { case (_, rows) =>
      rows.flatMap { case (av, al, ea) =>
        val others = rows.filter(_._1 != av)
        val scored = others.map { case (bv, bl, eb) =>
          (bv, bl == al, cos(ea, eb) * 4.0) }
        if (!scored.exists(_._2)) None
        else {
          val mx = scored.map(_._3).max
          val ex = scored.map(t => (t._2, math.exp(t._3 - mx)))
          val loss = -math.log(ex.filter(_._1).map(_._2).sum / ex.map(_._2).sum)
          val hit = scored.minBy { case (bv, _, sc) => (-sc, bv) }._2
          Some((al, loss, if (hit) 1L else 0L))
        }
      }
    }
    anchors.groupBy(_._1).foreach { case (label, vs) =>
      val (n, hits, lossSum) = got(label)
      assert(n == vs.length.toLong, s"label $label n_anchor")
      assert(hits == vs.map(_._3).sum, s"label $label hits")
      assert(math.abs(lossSum - vs.map(_._2).sum) < 1e-2 * vs.length,
        s"label $label loss_sum")
    }
  }

  test("beam search matches a naive driver-side width-2 beam") {
    val got = Registry.byId("ml_beam_search_decode").run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    import graft.queries.TransformerOps.{BeamT, SpecTarget}
    val endpoints = embRows().map { case (_, _, x) =>
      val ts = SpecTarget.map(w => x.zip(w).map { case (a, b) => a * b }.sum)
      // beam of (t0, cur, score); step 0 = top-2 start tokens
      var beam = (1 to 8).map(b => (b, b, ts(b - 1)))
        .sortBy { case (_, b, sc) => (-sc, b) }.take(2)
      for (_ <- 1 to 3) {
        beam = beam.flatMap { case (t0, cur, sc) =>
          (1 to 8).map(b =>
            (t0, cur, b, sc + BeamT(cur - 1)(b - 1) + 0.25 * ts(b - 1)))
        }.sortBy { case (t0, cur, b, sc) => (-sc, b, cur, t0) }.take(2)
          .map { case (t0, _, b, sc) => (t0, b, sc) }
      }
      val best = beam.minBy { case (t0, cur, sc) => (-sc, t0, cur) }
      (best._1, best._2)
    }
    endpoints.groupBy(identity).foreach { case (pair, vs) =>
      assert(got(pair) == vs.length.toLong, s"pair $pair")
    }
    assert(got.values.sum == endpoints.length.toLong)
  }

  test("markov transition probabilities sum to 1 per source type") {
    val rows = Registry.byId("funnel_markov_transitions").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (src, vs) =>
      val p = vs.map(_._3).sum
      assert(math.abs(p - 1.0) < 1e-9, s"$src sums to $p")
      val tot = vs.map(_._2).sum
      vs.foreach { case (_, n, pi) =>
        assert(pi == n.toDouble / tot, s"$src p not the exact ratio") }
    }
  }
}
