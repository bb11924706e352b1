package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.A — sources / sinks.
  *
  * Reference analogs: npz directory scan (`trainer/flax_model.py:99-115`),
  * key-projected archive loads (`:62-64`), raw-bytes decode (`read_example`,
  * `:53-66`), per-epoch prediction dumps (`:279-285`) and TensorBoard scalar
  * appends (`:371-375`).
  */
object Scans extends QueryPack {

  def queries: Seq[Q] = Seq(
    // Full-table DataSourceV2 parquet scan, schema from the footer.
    Q(
      "scan_parquet_full",
      Some("SELECT * FROM region ORDER BY r_regionkey"),
      (s, dir) => Tables(s, dir, "region").orderBy("r_regionkey")),

    // Column pruning + predicate pushdown reach the scan (verified by the
    // plan-shape test: PushedFilters + 2-column ReadSchema).
    Q(
      "scan_projected_pruned",
      Some("""SELECT l_orderkey, l_quantity FROM lineitem
             |WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_linenumber") === 1)
          .select("l_orderkey", "l_quantity")
          .orderBy("l_orderkey")),

    // Opaque-payload decode path (reference: bytes -> arrays in
    // read_example). Here: reconstruct n_chars from the text payload.
    Q(
      "scan_binary_blobs",
      Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text")).cast("long").as("n"))
          .orderBy("doc_id")),

    // Overwrite-mode parquet sink exercised for real: write to a scratch dir,
    // read back (reference: np.save prediction dumps, overwritten per epoch).
    Q(
      "sink_parquet_overwrite",
      Some("SELECT * FROM part ORDER BY p_partkey"),
      (s, dir) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_sink_parquet"
        Tables(s, dir, "part").write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp).orderBy("p_partkey")
      }),

    // Append-style metrics sink shape: (name, bucket, value) rows, the batch
    // twin of the TensorBoard scalar stream.
    Q(
      "sink_append_metrics",
      Some("""SELECT event_type AS name,
             |       CAST(date_trunc('month', ts) AS DATE) AS bucket,
             |       CAST(COUNT(*) AS DOUBLE) AS value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(
            col("event_type").as("name"),
            date_trunc("month", col("ts")).cast("date").as("bucket"))
          .agg(cnt.cast("double").as("value"))
          .orderBy("name", "bucket")))
}
