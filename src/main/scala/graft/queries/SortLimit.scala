package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.F — sort / limit / top-k.
  *
  * Reference analogs: deterministic palette/render ordering
  * (`trainer/flax_inference.ipynb` cells 1/8), head-slices `input[:10]`
  * (cells 10/12/21). Both queries compile to TakeOrderedAndProject — a
  * per-partition heap + driver-side merge, i.e. no global sort materializes
  * at any scale.
  */
object SortLimit extends QueryPack {

  def queries: Seq[Q] = Seq(
    Q(
      "sort_multi_key",
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |LIMIT 100""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)),

    Q(
      "limit_head",
      Some("""SELECT doc_id, lang, source, n_chars FROM documents
             |ORDER BY doc_id LIMIT 10""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id")
          .limit(10)))
}
