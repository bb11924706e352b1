package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tiny-literal-DataFrame edge cases (SURVEY.md §5.2.3): empty inputs,
  * all-NULL measures, ties, empty join sides.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("dsum of empty input is null, cnt is zero") {
    val empty = Seq.empty[(Int, Double)].toDF("k", "v")
    val r = empty.agg(Fns.dsum(col("v")).as("s"), Fns.cnt.as("n")).collect().head
    assert(r.isNullAt(0) && r.getLong(1) == 0)
  }

  test("dsum of all-NULL measure is null; nulls are skipped in mixed input") {
    val df = Seq[(Int, Option[Double])]((1, None), (2, None)).toDF("k", "v")
    assert(df.agg(Fns.dsum(col("v"))).collect().head.isNullAt(0))
    val mixed = Seq[(Int, Option[Double])]((1, Some(2.5)), (2, None))
      .toDF("k", "v")
    assert(mixed.agg(Fns.dsum(col("v"))).collect().head.getDouble(0) == 2.5)
  }

  test("dstddev: single row raises under ANSI (n-1 = 0); constants give 0") {
    // Spark 4 runs ANSI mode by default: the n-1 division surfaces as
    // DIVIDE_BY_ZERO instead of silently yielding NaN. Every oracle query
    // using dstddev aggregates n > 1 rows.
    val one = Seq((1, 5.0)).toDF("k", "v")
    val e = intercept[Exception] {
      one.agg(Fns.dstddev(col("v"))).collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"), e.getMessage)
    val const = Seq((1, 5.0), (2, 5.0), (3, 5.0)).toDF("k", "v")
    assert(const.agg(Fns.dstddev(col("v"))).collect().head.getDouble(0) == 0.0)
  }

  test("palette interp covers every class id 0..8 with in-range uint8 RGB") {
    // np.interp twin: class 8 maps to ramp position x = 226*9/255 < 8, so
    // the hi-knot join (k+1 <= 8) never falls off the palette.
    val px = (0 to 8).map(v => (v.toLong, v)).toDF("event_id", "v")
    val pal = graft.queries.MLOps.Palette
    assert(pal.length == 9 && pal.forall(_.matches("[0-9A-F]{6}")))
    val ci = floor(col("v").cast("double") / 9.0 * 255.0)
    val k = floor(ci * 9.0 / 255.0).cast("int")
    val ks = px.select(col("v"), k.as("k")).as[(Int, Int)].collect()
    assert(ks.forall { case (_, kk) => kk >= 0 && kk <= 7 })
  }

  test("simhash banding guarantees recall at Hamming <= 3") {
    // Pigeonhole: 3 differing bits corrupt at most 3 of the 4 disjoint
    // 8-bit bands. Exhaustively flip any 3 of 32 bits and assert at least
    // one band survives intact.
    val sig = 0x5A3C96E1L
    val flips = for {
      a <- 0 until 32; b <- a until 32; c <- b until 32
    } yield sig ^ (1L << a) ^ (1L << b) ^ (1L << c)
    flips.foreach { other =>
      val shared = (0 until 4).exists(band =>
        ((sig >> (8 * band)) & 0xFF) == ((other >> (8 * band)) & 0xFF))
      assert(shared, f"no shared band for flip pattern ${sig ^ other}%08x")
    }
  }

  test("seeded split bucket is stable for a known key") {
    val df = Seq(1L).toDF("k")
      .select(graft.ml.SeededSplit.bucket(col("k"), 42L).as("b"))
    val b1 = df.collect().head.getLong(0)
    assert(b1 >= 0 && b1 < 100)
    assert(df.collect().head.getLong(0) == b1) // re-evaluation stable
  }

  test("row_number tie-break is total: equal sort keys resolved by id") {
    val df = Seq((1, 10.0, "a"), (2, 10.0, "b"), (3, 10.0, "c"))
      .toDF("id", "v", "tag")
    val w = Window.orderBy(col("v").desc, col("id"))
    val r = df.select(col("tag"), row_number().over(w).as("rn"))
      .orderBy("rn").as[(String, Int)].collect().toSeq
    assert(r == Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("left join against an empty right side keeps all left rows with nulls") {
    val l = Seq((1, "x"), (2, "y")).toDF("k", "lv")
    val r = Seq.empty[(Int, String)].toDF("k", "rv")
    val j = l.join(r, Seq("k"), "left").orderBy("k").collect()
    assert(j.length == 2 && j.forall(_.isNullAt(2)))
  }

  test("left_semi/left_anti against empty right = none/all") {
    val l = Seq((1, "x"), (2, "y")).toDF("k", "lv")
    val r = Seq.empty[(Int, String)].toDF("k", "rv")
    assert(l.join(r, Seq("k"), "left_semi").count() == 0)
    assert(l.join(r, Seq("k"), "left_anti").count() == 2)
  }

  test("groupBy over empty input yields no rows, not a zero row") {
    val empty = Seq.empty[(Int, Double)].toDF("k", "v")
    assert(empty.groupBy("k").agg(sum("v")).count() == 0)
  }

  test("minhash of an empty token set stays at the zero (identity) buffer") {
    val agg = new graft.functions.MinHashAgg
    assert(agg.finish(agg.zero).forall(_ == Long.MaxValue))
    // merging identity with anything is a no-op
    val buf = agg.reduce(agg.zero, 12345L)
    assert(agg.merge(buf.clone(), agg.zero).toSeq == buf.toSeq)
  }

  test("sessionizer: open session held in state, gap closes and emits") {
    import graft.streaming.Sessionize
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val state = TestGroupState.create[Sessionize.OpenSession](
      org.apache.spark.api.java.Optional.empty[Sessionize.OpenSession](),
      GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(0L), hasTimedOut = false)
    // Two events 10 min apart, then one 2 h later: first session closes.
    val out = Sessionize.apply(7L, Iterator(
      Sessionize.Ev(7L, ts("2024-01-01 00:00:00"), 1L),
      Sessionize.Ev(7L, ts("2024-01-01 00:10:00"), 2L),
      Sessionize.Ev(7L, ts("2024-01-01 02:00:00"), 3L)), state).toSeq
    assert(out.map(s => (s.n, s.s_start.take(19), s.s_end.take(19))) ==
      Seq((2L, "2024-01-01 00:00:00", "2024-01-01 00:10:00")))
    assert(state.exists && state.get.n == 1) // the 02:00 session stays open
  }

  test("Adam at the optimum is a fixed point: zero gradient leaves w,b unchanged") {
    import graft.ml.{GradientDescent => GD}
    // Moments of y = 2x exactly: optimum (w,b) = (2,0), gradient = 0 there.
    // n=3 over x in {1,2,3}: sx=6, sy=12, sxx=14, sxy=28, syy=56.
    val m = GD.Moments(3, 6, 12, 14, 28, 56)
    val (st1, mse1) = GD.stepAdam(m, GD.State(0, 2.0, 0.0), 0.001)
    assert(st1.w == 2.0 && st1.b == 0.0 && mse1 == 0.0)
    assert(st1.mw == 0.0 && st1.vw == 0.0) // moments stay zero on zero grad
  }

  test("one-hot class id stays in [0,8] across value boundaries, incl. negatives") {
    // pmod, not %: the query's class id must land in 0..8 even for
    // negative values (plain % would give -2 for -10.5 -> floor -11).
    val px = Seq(0.0, 8.999, 9.0, 17.5, 199.99, -10.5).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("event_id", "value")
    val cls = px.select(pmod(floor(col("value")).cast("int"), lit(9)).as("cls"))
      .as[Int].collect()
    assert(cls.toSeq == Seq(0, 8, 0, 8, 1, 7))
  }

  test("conv-transpose on a single input cell emits the full 5x5 kernel footprint") {
    // One cell with count 256 scatters to 25 output cells whose values are
    // exactly the binomial weights (s/256 with s = w*256 = w).
    val grid = Seq((10L, 5, 256L)).toDF("u", "d", "c")
    val bin = Map(-2 -> 1, -1 -> 4, 0 -> 6, 1 -> 4, 2 -> 1)
    val offs = (for { dy <- -2 to 2; dx <- -2 to 2 }
      yield (dy, dx, bin(dy) * bin(dx))).toDF("dy", "dx", "w")
    val out = grid.crossJoin(broadcast(offs))
      .groupBy((col("u") + col("dy")).as("u"), (col("d") + col("dx")).as("d"))
      .agg((sum(col("w") * col("c")) / 256.0).as("convt"))
      .collect()
    assert(out.length == 25)
    val total = out.map(_.getAs[Double]("convt")).sum
    assert(math.abs(total - 256.0) < 1e-9) // mass conserved, no clipping
    val center = out.find(r => r.getAs[Long]("u") == 10L && r.getAs[Int]("d") == 5).get
    assert(center.getAs[Double]("convt") == 36.0) // 6*6 weight at the center
  }

  test("momentsBySplit on a single-split input returns a one-key map") {
    import graft.ml.{GradientDescent => GD}
    val df = Seq((1.0, 2.0, "train"), (2.0, 4.0, "train"))
      .toDF("x", "y", "split")
    val m = GD.momentsBySplit(df, "split")
    assert(m.keySet == Set("train") && m("train").n == 2.0)
  }

  test("per-source cap keeps ALL docs of a source smaller than the cap") {
    // Exercises the n < cap branch the benchmark corpus never hits (every
    // sf source holds >= 25 docs vs cap 15): a 3-doc source must keep all
    // 3, with ranks a permutation of 1..3.
    val dir = java.nio.file.Files.createTempDirectory("graft_edge_cap").toString
    Seq((1L, "tiny"), (2L, "tiny"), (3L, "tiny"))
      .toDF("doc_id", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = Registry.byId("corpus_cap_per_source").run(spark, dir).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Boolean]("kept")))
    assert(out.map(_.getAs[Int]("smp_rank")).sorted.toSeq == Seq(1, 2, 3))
  }

  test("composed FCN forward pass on an empty events table is empty, not an error") {
    // Every layer (grid agg, gather join, scatter agg, heads) must pass
    // zero rows through cleanly. ts is written as a raw int64 like the
    // driver's nanos column so Tables' ts conversion path is exercised.
    val dir = java.nio.file.Files.createTempDirectory("graft_edge_fcn").toString
    Seq.empty[(Long, Long, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    assert(Registry.byId("ml_cnn_forward_compose").run(spark, dir).count() == 0)
  }

  test("nearest as-of: equidistant tie takes the earlier click; edges fall back") {
    // One user, clicks at t-10s and t+10s around a view: the tie must
    // resolve to the EARLIER click (pandas direction='nearest' semantics),
    // and events before the first / after the last click must fall back to
    // the only available side.
    val dir = java.nio.file.Files.createTempDirectory("graft_edge_asof").toString
    val us = 1000000L
    def ev(id: Long, t: Long, ty: String) = (id, t * 1000, 7L, ty, 0.0, "{}")
    Seq(
      ev(1, 0L * us, "view"), // before any click -> nearest is click@10
      ev(2, 10L * us, "click"),
      ev(3, 20L * us, "view"), // tie: click@10 vs click@30 -> earlier (10)
      ev(4, 30L * us, "click"),
      ev(5, 41L * us, "view")) // after last click -> click@30
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Registry.byId("join_asof_nearest").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).endsWith("00:00:10.000000"), out(1L))
    assert(out(3L).endsWith("00:00:10.000000"), out(3L)) // tie -> earlier
    assert(out(5L).endsWith("00:00:30.000000"), out(5L))
    // A click's own nearest ignores itself only via the 1 PRECEDING /
    // 1 FOLLOWING frames: click@10's nearest is click@30, not itself.
    assert(out(2L).endsWith("00:00:30.000000"), out(2L))
  }

  test("gram containment: a short doc inside a long one scores 1.0 one-way") {
    val dir = java.nio.file.Files.createTempDirectory("graft_edge_cont").toString
    val short = "abcdefgh" // 4 distinct 5-grams
    val long = "XX" + short + "YY" // contains all of short's grams
    Seq((1L, short, "en", "s", 8L), (2L, long, "en", "s", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Registry.byId("dedup_gram_containment").run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0, out) // all of short's grams are in long
    assert(out((2L, 1L)) < 1.0, out) // long has grams short lacks
  }

  /** Micro events fixture: (event_id, epoch_seconds, type, value) rows for
    * one user, ts written as the driver's nanos-LONG encoding.
    */
  private def eventsFixture(tag: String,
      rows: Seq[(Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_edge_$tag").toString
    rows.map { case (id, sec, ty, v) => (id, sec * 1000000000L, 7L, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("rolling median: duplicates select the middle element, heads drop") {
    // 10 events; frame at row 9 = values 1..9 sorted -> median 5; frame at
    // row 10 = {2..9, 100, 100} sorted -> 5th element 6 (the outlier 100
    // CANNOT drag the median, unlike the moving average).
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0, 100.0)
    val dir = eventsFixture("rmed",
      vals.zipWithIndex.map { case (v, i) => (i + 1L, i * 60L, "view", v) })
    val out = Registry.byId("window_rolling_median").run(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out == Map(9L -> 5.0, 10L -> 6.0), out)
  }

  test("OHLC: same-timestamp tie breaks open/close by event_id") {
    // Three events in one hour bucket; the first two share a timestamp, so
    // open must come from the LOWER event_id and close from the last row.
    val dir = eventsFixture("ohlc", Seq(
      (2L, 100L, "view", 20.0), // same second as event 1
      (1L, 100L, "view", 10.0),
      (3L, 200L, "view", 5.0)))
    val r = Registry.byId("agg_ohlc_resample").run(spark, dir).collect().head
    assert(r.getDouble(2) == 10.0, r) // open = event_id 1
    assert(r.getDouble(3) == 20.0 && r.getDouble(4) == 5.0, r) // high/low
    assert(r.getDouble(5) == 5.0, r) // close = last event
    assert(r.getLong(6) == 3L, r)
  }

  test("time-to-conversion: non-converting views drop; same-ts purchase counts") {
    val dir = eventsFixture("ttc", Seq(
      (1L, 100L, "view", 0.0), // next purchase at 160 -> 60s
      (2L, 160L, "purchase", 0.0),
      (3L, 200L, "view", 0.0), // purchase at SAME ts, higher id -> 0s
      (4L, 200L, "purchase", 0.0),
      (5L, 300L, "view", 0.0))) // no later purchase -> dropped
    val out = Registry.byId("window_time_to_conversion").run(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 60000000L, 3L -> 0L), out)
  }

  test("Mann-Whitney: fully tied samples give U = na*nb/2 and z = 0") {
    val dir = eventsFixture("mwu", Seq(
      (1L, 1L, "click", 5.0), (2L, 2L, "click", 5.0),
      (3L, 3L, "view", 5.0), (4L, 4L, "view", 5.0), (5L, 5L, "view", 5.0)))
    val r = Registry.byId("agg_mannwhitney_u").run(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L, r)
    assert(r.getDouble(2) == 3.0, r) // U_A = na*nb/2 = 3
    assert(r.getDouble(3) == 0.0, r)
  }
}
