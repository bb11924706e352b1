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

    // Opaque-payload decode path over the REAL binary source (reference:
    // file bytes -> arrays in read_example, trainer/flax_model.py:53-66).
    // Spill documents' raw bytes as one file-per-blob — the layout an
    // image/audio corpus actually lands in — then scan the directory with
    // the `binaryFile` DataSource (path, length, content), recover the key
    // from the file name and decode the payload in-plan. The spill is a
    // distributed foreachPartition through the Hadoop FS API (no driver
    // loop; works unchanged against an object store), and the read side
    // bin-packs small blobs into splits via the normal file-scan sizing.
    // The spill is bounded to a 500-doc slice (the full documents table
    // at the driver's sf0.01 correctness scale): the demo exercises the
    // binary SOURCE, and a real binary corpus already lands as files —
    // manufacturing 50k tiny files per bench run would time the local
    // filesystem, not the operator. Checksum sidecars are off for the
    // spill (the read side never consults them).
    Q(
      "scan_binary_blobs",
      Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n
             |FROM documents WHERE doc_id < 500 ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import org.apache.hadoop.fs.Path
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_binary_docs"
        val root = new Path(tmp)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(root, true)
        fs.mkdirs(root)
        Tables(s, dir, "documents")
          .filter(col("doc_id") < 500)
          .select(col("doc_id"), col("text"))
          .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
            val pfs = new Path(tmp)
              .getFileSystem(new org.apache.hadoop.conf.Configuration())
            pfs.setWriteChecksum(false)
            rows.foreach { r =>
              val out = pfs.create(new Path(tmp, s"doc_${r.get(0)}.bin"), true)
              try out.write(r.getString(1).getBytes("UTF-8"))
              finally out.close()
            }
          }
        s.read.format("binaryFile").load(tmp)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
              .cast("long").as("doc_id"),
            length(decode(col("content"), "UTF-8")).cast("long").as("n"))
          .orderBy("doc_id")
      }),

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

    // CSV round-trip: write a projection to CSV with header, read it back
    // with an explicit schema (CSV carries no types), aggregate. Exercises
    // the text-format source/sink path end-to-end; result equals the same
    // aggregate straight off parquet.
    Q(
      "scan_csv_roundtrip",
      Some("""SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n
             |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_nation"
        Tables(s, dir, "nation")
          .select("n_nationkey", "n_regionkey", "n_name")
          .write.mode("overwrite").option("header", "true").csv(tmp)
        s.read
          .schema("n_nationkey BIGINT, n_regionkey BIGINT, n_name STRING")
          .option("header", "true").csv(tmp)
          .groupBy("n_regionkey")
          .agg(cnt.as("n"))
          .orderBy("n_regionkey")
      }),

    // JSON-lines round-trip: schema re-inferred from the JSON on read (text
    // payloads with quoting/escaping survive intact).
    Q(
      "scan_json_roundtrip",
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(n_chars) AS BIGINT) AS chars
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_json_docs"
        Tables(s, dir, "documents")
          .write.mode("overwrite").json(tmp)
        s.read.json(tmp)
          .groupBy("lang")
          .agg(cnt.as("n"), sum("n_chars").cast("long").as("chars"))
          .orderBy("lang")
      }),

    // Compressed corpus interchange: jsonl.gz round-trip (the format text
    // corpora are actually shipped in — gzip'd JSON-lines). Write the
    // documents table gzip-compressed, read it back through the same JSON
    // source (codec auto-detected from the .gz extension), aggregate.
    // gzip splits per FILE, not per block — parallelism comes from the
    // many-files layout the distributed writer already produces, which is
    // exactly how a 100 TB jsonl.gz corpus stays parallel too.
    Q(
      "scan_jsonl_gzip",
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(n_chars) AS BIGINT) AS chars,
             |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_gz"
        Tables(s, dir, "documents")
          .write.mode("overwrite").option("compression", "gzip").json(tmp)
        s.read.json(tmp)
          .groupBy("lang")
          .agg(
            cnt.as("n"),
            sum("n_chars").cast("long").as("chars"),
            max("n_chars").cast("long").as("max_chars"))
          .orderBy("lang")
      }),

    // Raw text-lines round-trip (the corpus interchange format LLM
    // pipelines actually exchange — one document per line): write the
    // document bodies as a text sink, stream them back through the line
    // source, aggregate. Line-level stats must equal the same aggregate
    // straight off parquet (the driver data is newline-free, verified).
    Q(
      "scan_text_lines",
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
             |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             |  CAST(MIN(length(text)) AS INT) AS min_len,
             |  CAST(MAX(length(text)) AS INT) AS max_len
             |FROM documents""".stripMargin),
      (s, dir) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_text_docs"
        Tables(s, dir, "documents")
          .select("text")
          .write.mode("overwrite").text(tmp)
        s.read.text(tmp)
          .agg(
            cnt.as("n_lines"),
            sum(length(col("value"))).cast("long").as("n_chars"),
            min(length(col("value"))).cast("int").as("min_len"),
            max(length(col("value"))).cast("int").as("max_len"))
      }),

    // Partitioned layout + partition pruning: write orders laid out by
    // year (the 100 TB practice — time-partitioned facts), read back with a
    // partition filter. The plan shows PartitionFilters pruning the scan to
    // one directory; at scale this is the difference between scanning one
    // year and scanning the decade.
    Q(
      "sink_partitioned_pruning",
      Some("""SELECT CAST(month(o_orderdate) AS INT) AS m,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s
             |FROM orders WHERE year(o_orderdate) = 1995
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_part_orders"
        Tables(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")))
          .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("o_year") === 1995)
          .groupBy(month(col("o_orderdate")).cast("int").as("m"))
          .agg(cnt.as("n"), dsum(col("o_totalprice")).as("s"))
          .orderBy("m")
      }),

    // Metrics SERVING read path (reference: TensorBoard reading the scalar
    // append log, trainer/tensorboard.ipynb:36-55): three "epoch"
    // generations append-write (name, bucket, value, epoch) rows — epoch e
    // sees only events up to day 10*e, re-emitting keys with refreshed
    // values — then the reader compacts the log last-write-wins (max epoch
    // per key) and serves the latest value plus the version count. The
    // compaction window partitions on the metric key, so state per key is
    // the handful of generations, never the fact rows; at scale the same
    // read runs over an append-only metrics bucket without rewriting it.
    Q(
      "sink_metrics_compact_serve",
      Some("""SELECT event_type AS name,
             |  CAST(date_trunc('month', ts) AS DATE) AS bucket,
             |  CAST(COUNT(*) AS DOUBLE) AS value,
             |  CAST(1 + (CASE WHEN MIN(day(ts)) <= 10 THEN 1 ELSE 0 END)
             |         + (CASE WHEN MIN(day(ts)) <= 20 THEN 1 ELSE 0 END) AS INT)
             |    AS n_versions
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_metrics_log"
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
        for ((maxDay, e) <- Seq(10, 20, 31).zipWithIndex) {
          Tables(s, dir, "events")
            .filter(dayofmonth(col("ts")) <= maxDay)
            .groupBy(
              col("event_type").as("name"),
              date_trunc("month", col("ts")).cast("date").as("bucket"))
            .agg(cnt.cast("double").as("value"))
            .withColumn("epoch", lit(e + 1))
            .write.mode("append").parquet(tmp)
        }
        val w = Window.partitionBy("name", "bucket")
        s.read.parquet(tmp)
          .withColumn("latest", max("epoch").over(w))
          .withColumn("n_versions", count(lit(1)).over(w).cast("int"))
          .filter(col("epoch") === col("latest"))
          .select("name", "bucket", "value", "n_versions")
          .orderBy("name", "bucket")
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
