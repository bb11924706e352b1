package graft

import graft.plans.GreedyPack
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the custom GreedyPack whole-operator (SURVEY §4.3(c)):
  * physical plan shape, exact agreement with a driver-side reference fold,
  * partition invariance, and the capacity invariant.
  */
class GreedyPackSpec extends SparkSpec {

  private val budget = 128L

  private def input: DataFrame =
    Tables(spark, sf, "documents")
      .select(
        col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))

  private def packedRows(df: DataFrame): Seq[(String, Long, Long, Long)] =
    GreedyPack.packed(df, budget, Seq("lang"), Seq("doc_id"), "n_tok")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
      .sortBy(t => (t._1, t._2))

  /** Reference semantics: per lang in doc_id order, first-fit fold. */
  private def referenceFold(
      rows: Seq[(String, Long, Long)]): Seq[(String, Long, Long, Long)] =
    rows.sortBy(t => (t._1, t._2)).foldLeft(
      (List.empty[(String, Long, Long, Long)], "", 0L, 0L)) {
      case ((acc, lang, pack, fill), (l, id, tok)) =>
        if (l != lang) (acc :+ ((l, id, tok, 0L)), l, 0L, tok)
        else if (fill + tok > budget) (acc :+ ((l, id, tok, pack + 1)), l, pack + 1, tok)
        else (acc :+ ((l, id, tok, pack)), l, pack, fill + tok)
    }._1

  test("plan contains the custom exec with one exchange+sort below it") {
    val df = GreedyPack.packed(input, budget, Seq("lang"), Seq("doc_id"), "n_tok")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreedyPack 128"), p) // exec prints without the Exec suffix
    assert(p.contains("Exchange hashpartitioning(lang"), p)
    assert(p.contains("Sort [lang"), p)
  }

  test("pack assignment equals the reference first-fit fold") {
    val base = input.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = referenceFold(base)
      .sortBy(t => (t._1, t._2))
    assert(packedRows(input) == expected)
  }

  test("result is invariant to input partitioning") {
    assert(packedRows(input.repartition(7)) == packedRows(input.coalesce(1)))
  }

  test("no pack exceeds the budget (docs here are all under it)") {
    val over = GreedyPack.packed(input, budget, Seq("lang"), Seq("doc_id"), "n_tok")
      .groupBy("lang", "pack_id")
      .agg(sum("n_tok").as("tot"))
      .filter(col("tot") > budget)
      .count()
    assert(over == 0L)
  }
}
