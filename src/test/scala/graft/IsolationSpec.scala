package graft

/** Guards against cross-query session-state order dependence (VERDICT r1,
  * "What's wrong" #1): each batch query must analyze in a brand-new session
  * whose function registry holds only Spark built-ins — a query that needs
  * `graft_dot` (or any other temp function / view) must register it itself
  * inside its own closure, never rely on an earlier query having done so.
  *
  * `spark.newSession()` shares the SparkContext but gets a fresh
  * SessionState (empty temp-function registry, empty temp views), which is
  * exactly the state a user hits running one query in a fresh REPL.
  * Constructing the DataFrame forces analysis, so an unregistered function
  * fails here with UNRESOLVED_ROUTINE. Streaming queries are excluded
  * (their `run` executes micro-batches — covered by RegistrySmokeSpec).
  */
class IsolationSpec extends SparkSpec {

  for (q <- Registry.all if !q.id.startsWith("stream_")) {
    test(s"${q.id} analyzes in a fresh session") {
      val fresh = spark.newSession()
      val df = q.run(fresh, sf)
      assert(df.queryExecution.analyzed != null)
      assert(df.columns.nonEmpty)
    }
  }

  test("multimodal_join_textvec executes first-in-session") {
    val fresh = spark.newSession()
    val df = Registry.all
      .find(_.id == "multimodal_join_textvec").get.run(fresh, sf)
    assert(df.count() > 0)
  }
}
