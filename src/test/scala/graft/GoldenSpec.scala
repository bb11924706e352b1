package graft

/** Hand-pinned golden values on the deterministic sf0.001 testdata
  * (SURVEY.md §5.2.2) — absolute guards the differential/property tests
  * can't give: a semantic drift that changed BOTH the Spark query and its
  * oracle in the same wrong way would still pass the DuckDB compare, but
  * not these literals.
  */
class GoldenSpec extends SparkSpec {

  test("flagship star-join revenue: first rows match pinned values") {
    val rows = Registry.byId("join_star_multiway").run(spark, sf)
      .limit(3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(rows == Seq(
      ("AFRICA", 1995, 9457989.8062, 191L),
      ("AFRICA", 1996, 9618458.0009, 190L),
      ("AFRICA", 1997, 8807027.1644, 170L)))
  }

  test("global mean/std of l_quantity match pinned values") {
    val r = Registry.byId("agg_global_mean_std").run(spark, sf).collect().head
    assert(r.getDouble(0) == 25.376167)
    assert(r.getDouble(1) == 14.521173)
    assert(r.getLong(2) == 6000L)
  }

  test("per-lang token counts match pinned values") {
    val rows = Registry.byId("text_token_count_regex").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(
      ("de", 71L, 4070L), ("en", 193L, 10343L), ("es", 80L, 4516L),
      ("fr", 82L, 4926L), ("zh", 74L, 4084L)))
  }
}
