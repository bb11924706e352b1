package graft

/** Contract smoke (SURVEY.md §5.2.2): every declared query runs on sf0.001
  * and produces a well-formed result; the flagship returns rows.
  */
class RegistrySmokeSpec extends SparkSpec {

  test("query ids are unique and every oracle belongs to a query") {
    val ids = Registry.all.map(_.id)
    assert(ids.distinct.size == ids.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Legitimately empty on sf0.001: no exact-duplicate texts, and every
    * customer has at least one order in the generated data.
    */
  private val mayBeEmpty = Set("dedup_exact_hash", "except_holdout", "join_anti")

  for (q <- Registry.all) {
    test(s"${q.id} runs and returns rows") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // A canonical query that unexpectedly returns 0 rows would make the
      // driver's hash compare vacuous.
      if (!mayBeEmpty(q.id)) assert(n > 0, s"${q.id} returned 0 rows")
    }
  }
}
