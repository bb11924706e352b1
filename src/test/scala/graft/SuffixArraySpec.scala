package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the generalized distributed suffix-array build
  * (`dedup_suffix_array_rank`, VERDICT r18 item 3): the k=16 round count
  * derives from the slice's max doc length, so corpora past the old
  * 128-token ceiling take more rounds instead of silently mis-ranking —
  * pinned here against a driver-side sequential suffix sort on >128-token
  * docs (the DuckDB oracle cannot catch a shared truncation, so the twin
  * must be an independent full-length comparator). Also pins the loud
  * token-contract guard (ADVICE r18).
  */
class SuffixArraySpec extends SparkSpec {

  import queries.DedupOps.{saRoundsOf, suffixArrayRank, SaSeedGram, SaK}

  private def frame(docs: Seq[(Long, Seq[String])]): DataFrame = {
    val rows = docs.map { case (id, toks) => (id, toks) }
    spark.createDataFrame(rows).toDF("doc_id", "toks")
  }

  /** Sequential reference: rank every suffix by full-length lexicographic
    * token order (shorter-prefix-first), dense-ranked; dup_cnt =
    * multiplicity of the identical full suffix.
    */
  private def reference(docs: Seq[(Long, Seq[String])])
      : Seq[(Long, Long, Long, Long)] = {
    val sufs = docs.flatMap { case (id, toks) =>
      toks.indices.map(p => (id, p.toLong, toks.drop(p)))
    }
    implicit val ord: Ordering[Seq[String]] =
      Ordering.Implicits.seqOrdering[Seq, String]
    val sorted = sufs.sortBy(_._3)
    val ranks = sorted.map(_._3).distinct.zipWithIndex
      .map { case (s, i) => s -> (i + 1).toLong }.toMap
    val dup = sorted.groupBy(_._3).map { case (s, g) => s -> g.size.toLong }
    sufs.map { case (id, p, s) => (id, p, ranks(s), dup(s)) }
      .sortBy(t => (t._3, t._1, t._2))
  }

  private def built(d: DataFrame, rounds: Int): Seq[(Long, Long, Long, Long)] =
    suffixArrayRank(d, rounds)
      .select("doc_id", "pos", "rk", "dup_cnt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._3, t._1, t._2))

  /** Deterministic token stream over a 20-word vocab. */
  private def tok(i: Int): String = f"w${(i * 7 + 3) % 20}%02d"

  test("round count derives from the slice's max doc length") {
    val short = frame(Seq((0L, (0 until 7).map(tok))))
    assert(saRoundsOf(short) == 0) // seed gram alone covers 7 < 8
    val mid = frame(Seq((0L, (0 until 99).map(tok))))
    assert(saRoundsOf(mid) == 1) // 8*16 = 128 >= 99
    val long = frame(Seq((0L, (0 until 300).map(tok))))
    assert(saRoundsOf(long) == 2) // 8*16^2 = 2048 >= 300 > 128
    assert(SaSeedGram == 8 && SaK == 16)
  }

  test(">128-token docs: 2-round build matches the sequential suffix sort") {
    // Three 250-350-token docs engineered so two suffixes agree through
    // MORE than 128 tokens before diverging: a 1-round build (the old
    // hardcoded geometry) would tie them; the derived 2-round build must
    // rank them apart.
    val common = (0 until 250).map(tok)
    val docs = Seq(
      0L -> ((0 until 50).map(i => tok(i + 100)) ++ common),
      1L -> ((0 until 50).map(i => tok(i + 200)) ++ common),
      2L -> (common.take(200) ++ (0 until 50).map(i => tok(i + 300))))
    val d = frame(docs)
    assert(saRoundsOf(d) == 2)
    assert(built(d, 2) == reference(docs))
    // The old ceiling really was the bug: one round mis-ties the
    // >128-token divergence (this is what the derived count fixes).
    assert(built(d, 1) != reference(docs))
  }

  test("shipped-corpus geometry (1 round) matches the sequential sort") {
    val docs = Seq(
      0L -> (0 until 99).map(tok),
      1L -> ((0 until 40).map(i => tok(i + 60)) ++ (40 until 99).map(tok)),
      2L -> (0 until 30).map(i => tok(i + 11)))
    val d = frame(docs)
    assert(saRoundsOf(d) == 1)
    assert(built(d, 1) == reference(docs))
  }

  test("token-contract violations fail loudly instead of mis-ranking") {
    val empty = frame(Seq((0L, Seq("a", "", "b"))))
    assertThrows[IllegalArgumentException](saRoundsOf(empty))
    val ctrl = frame(Seq((0L, Seq("a", "b\nc"))))
    assertThrows[IllegalArgumentException](saRoundsOf(ctrl))
  }
}
