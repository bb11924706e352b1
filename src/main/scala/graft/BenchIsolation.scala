package graft

import org.apache.spark.sql.SparkSession

/** Bench-isolation harness: adjudicates whether the historically spiky
  * bench rows (`stream_restart_exactly_once`, `dedup_minhash_mllib`,
  * `ml_train_gd_iterations`, `dedup_cc_clusters`, `agg_corr_covar`) carry a
  * real session-state leak (state-store spool, accumulated temp artifacts,
  * GC pressure from the 120+ queries that ran before them in `graft.Bench`)
  * or are plain fixed-overhead noise.
  *
  * Protocol: each suspect runs min-of-2 in ONE long-lived "shared" session
  * (after the same whole-table cache warm `Bench` does), then again min-of-2
  * in its own FRESH SparkSession — built after the shared session is fully
  * stopped, with its own cold table cache. The shared leg runs FIRST so the
  * fresh legs execute on a fully JIT-warm JVM: any remaining fresh-vs-shared
  * delta is session state, not code-compilation warmup. A near-zero delta
  * (fresh ≈ shared) means the round-to-round spikes are machine/overhead
  * noise, not a leak; a large positive shared-minus-fresh delta would mean
  * the long-lived session genuinely degrades and needs fixing.
  *
  * Emits ONE JSON line:
  * `{"metric":"bench_isolation","sf":...,"queries":{name:{"shared":s,
  * "fresh":s,"shared_minus_fresh":s}}}`.
  */
object BenchIsolation {

  val Suspects: Seq[String] = Seq(
    "stream_restart_exactly_once",
    "dedup_minhash_mllib",
    "ml_train_gd_iterations",
    "dedup_cc_clusters",
    "agg_corr_covar",
    // round 11: the new heaviest bench row — profile it up front rather
    // than leaving "is 3.8s real work or session noise" to a later round.
    "dedup_repeated_spans",
    // round 13: the current >2s tail after the events-ts restore.
    "sim_ann_pq_topk",
    "ml_linreg_normal_eq",
    "agg_weighted_median",
    // round 14: the new >2s rows — the stream machinery floors (full
    // outer emits ~38k rows at sf0.1; the CDC sink rewrites the target
    // three times) and the rotated-ADC index.
    "stream_stream_full_outer",
    "stream_cdc_upsert_sink",
    "sim_ann_opq_topk",
    "ml_kfold_cv",
    // round 15: the round-14 worst row, previously missing from the set
    // (VERDICT r14 item 3) — re-measured after the fused-kernel fix.
    "sim_ann_ivfpq_topk",
    // round 15 tail after the exact-integer perf pass: the remaining
    // >1.4s rows are stream machinery floors plus the iterative graph
    // pair — adjudicate them up front.
    "stream_stream_left_outer",
    "stream_stream_join",
    "graph_pagerank_unrolled",
    "graph_label_propagation",
    // round 15 wave 2: the one new addition that lands >1.4s (the basket
    // pair rollup is ~1M groups at sf0.1 — genuinely heavy, adjudicate).
    "graph_bipartite_copurchase",
    // round 16: the rows that stage session-keyed state (catalog tables +
    // ANALYZE, bucketed table, bloom layout, the two-layer walk's
    // checkpointed transition tables) — adjudicate that the memoized
    // staging doesn't degrade a long-lived session.
    "join_cbo_reorder",
    "sink_bucket_pruning",
    "sink_bloom_colindex_skipping",
    "sim_ann_graph_greedy",
    "stream_stream_right_outer",
    // round 18 (VERDICT r17 item 1): every remaining round-17 `Staged`
    // bearer — the staged-≈-fresh claim must be MEASURED for exactly the
    // rows that stage session-keyed artifacts (trade_deg, knn_und_200,
    // the hnsw edge tables + PMI matrix + MinHash banding are covered by
    // the rows above; these add the graph pair, the kNN-graph pair, the
    // co-occurrence matrix, and the three perplexity model-table gates).
    "graph_hits_hubs_auth",
    "graph_knn_triangles",
    "graph_kcore_prune",
    "text_cooccur_pmi",
    "corpus_perplexity_filter",
    "corpus_perplexity_bigram_filter",
    "corpus_perplexity_kneser_ney",
    // round 18: the new heaviest addition (~2s: 2 global dense ranks +
    // per-round lineage cuts = ~8 small jobs of fixed machinery) —
    // adjudicate shared-vs-fresh the round it lands.
    "dedup_suffix_array_rank")

  private def newSession(cpus: String): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // Optional state-store-parallelism override for the streaming rows
    // (the PartitionInvarianceSpec knob) — lets an isolation run A/B the
    // micro-batch floor at different store counts.
    sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS")
      .foreach(n => b.config("graft.stream.partitions", n))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** min-of-2 through the same noop sink Bench uses (full row evaluation,
    * no Catalyst pruning of computed columns). A failed run must NOT be
    * reported as its (misleadingly small) partial elapsed time — that would
    * distort the shared-vs-fresh verdict — so failures surface as NaN,
    * which the JSON emitter renders as an explicit "failed" marker.
    */
  private def time(spark: SparkSession, sfDir: String, name: String): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench-isolation] $name failed: ${e.getMessage}")
          Double.NaN
      }
    }
    val (a, b) = (once(), once())
    if (a.isNaN || b.isNaN) Double.NaN else math.min(a, b)
  }

  /** NaN (= a failed leg) is not valid JSON as a bare literal; emit null. */
  private def jnum(v: Double): String =
    if (v.isNaN) "null" else f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Ad-hoc adjudication subset (any registry ids, not just the standing
    // Suspects): SPARK_GRAFT_ISOLATION_ONLY=a,b,c — used e.g. to isolate
    // the r19 capture-anomaly rows without paying the full sweep.
    val suspects: Seq[String] = sys.env.get("SPARK_GRAFT_ISOLATION_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Suspects)

    // Leg 1 — shared session, Bench's exact protocol (warm all table caches,
    // then run each suspect back-to-back in the one session).
    val shared = newSession(cpus)
    Tables.names.foreach(t => Tables(shared, sfDir, t).count())
    val sharedTimes = suspects.map(q => q -> time(shared, sfDir, q)).toMap
    shared.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // Leg 2 — one FRESH session per suspect: cold session state, cold table
    // cache (Tables keys on session identity), warm JVM/JIT.
    val freshTimes = suspects.map { q =>
      val s = newSession(cpus)
      Tables.names.foreach(t => Tables(s, sfDir, t).count())
      val t = time(s, sfDir, q)
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      q -> t
    }.toMap

    val qs = suspects.map { q =>
      val sh = sharedTimes(q); val fr = freshTimes(q)
      val failed = sh.isNaN || fr.isNaN
      s""""$q":{"shared":${jnum(sh)},"fresh":${jnum(fr)},""" +
        s""""shared_minus_fresh":${jnum(sh - fr)},"failed":$failed}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"bench_isolation","sf":"$sfDir","queries":$qs}""")
  }
}
