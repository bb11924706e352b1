package graft

import org.apache.spark.sql.functions._

/** Round-17 operator micro-pins. */
class Round17OpsSpec extends SparkSpec {

  /** Longest common substring length by classic DP — the quadratic
    * driver-side oracle the relational shingle-run form must reproduce
    * (for answers >= the 20-char gram width; shorter overlaps are below
    * the query's resolution by design).
    */
  private def lcsLen(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var best = 0
    for (i <- 1 to a.length) {
      java.util.Arrays.fill(cur, 0)
      for (j <- 1 to b.length) {
        if (a.charAt(i - 1) == b.charAt(j - 1)) {
          cur(j) = prev(j - 1) + 1
          if (cur(j) > best) best = cur(j)
        }
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
    }
    best
  }

  test("exact-substring runs equal the DP longest-common-substring length") {
    val got = Registry.byId("dedup_exact_substring_runs").run(spark, sf)
      .collect()
    assert(got.nonEmpty, "no shared-substring pairs found")
    val texts = Tables(spark, sf, "documents")
      .filter(col("doc_id") < 150)
      .select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Top rows are the strongest claims — replay the 5 largest against the
    // quadratic DP (each is O(|a|·|b|), fine driver-side at the test sf).
    got.take(5).foreach { r =>
      val (da, db, chars) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(chars >= 20L, s"pair ($da,$db) below gram resolution")
      val want = lcsLen(texts(da), texts(db))
      assert(chars == want.toLong,
        s"pair ($da,$db): shingle-run length $chars != DP LCS $want")
    }
    // Ordering + dedup of the report itself.
    val keys = got.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "duplicate pair rows")
    val lens = got.map(_.getLong(2))
    assert(lens.sameElements(lens.sortBy(-_)), "not ordered by run length")
  }
}
