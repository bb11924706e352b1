package graft

/** Registry-WIDE plan-regression net (VERDICT r13 item 7): PlanShapeSpec
  * pins ~70 shapes precisely; this sweep walks EVERY registry query's
  * physical plan and enforces the cheap global invariants a new wave could
  * silently regress on an unpinned query:
  *
  *   1. no CartesianProduct anywhere (every all-pairs op must candidate
  *      via equi-join/broadcast; PLANS.md has held zero since round 3);
  *   2. no Python-eval or Scala-UDF eval nodes (the functions-not-UDFs
  *      contract — custom compute is native Catalyst expressions);
  *   3. a per-query shuffle-exchange ceiling: no single query's plan may
  *      carry more than [[MaxExchanges]] hash exchanges. The ceiling is
  *      calibrated against the registry's worst legitimate case (the
  *      unrolled iterative graph/ML traces: 26 on graph_kcore_prune) with headroom — it catches the
  *      pathological join-back/re-shuffle chains, not normal growth.
  *
  * Building each query's DataFrame executes the eager families (streams,
  * sinks, learned indexes) once; the shared session memos keep that to the
  * same one-time cost Verify pays.
  */
class PlanInvariantSpec extends SparkSpec {

  private val MaxExchanges = 32

  test("every registry query plan: no cartesian, no UDF eval, bounded exchanges") {
    val violations = Seq.newBuilder[String]
    var worst = 0
    var worstId = ""
    for (q <- Registry.all) {
      val p = q.run(spark, sf).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct"))
        violations += s"${q.id}: CartesianProduct"
      if (p.contains("BatchEvalPython") || p.contains("ArrowEvalPython") ||
          p.contains("BatchEvalUDF"))
        violations += s"${q.id}: UDF eval node"
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      if (n > worst) { worst = n; worstId = q.id }
      if (n > MaxExchanges)
        violations += s"${q.id}: $n hash exchanges (> $MaxExchanges)"
    }
    info(s"worst hash-exchange count: $worst ($worstId)")
    assert(violations.result().isEmpty,
      violations.result().mkString("\n"))
  }
}
