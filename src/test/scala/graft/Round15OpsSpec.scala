package graft

import org.apache.spark.sql.functions._

/** Round-15 operator micro-pins. */
class Round15OpsSpec extends SparkSpec {

  test("content-addressed blob store: round-trip verifies, addresses dedup to distinct payloads") {
    val rows = Registry.byId("sink_blob_content_addressed").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // Every manifest row found its blob, the recomputed sha matched both
    // the manifest address and the file name (the `ok` conjunction).
    assert(rows.forall(_.getBoolean(3)), "round-trip integrity failed")
    // Content addressing collapses identical payloads: distinct addresses
    // == distinct source texts, and byte lengths match the source.
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 500)
    val distinctTexts = docs.select("text").distinct().count()
    assert(rows.map(_.getString(1)).distinct.length.toLong == distinctTexts)
    val wantLens = docs
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == wantLens(r.getLong(0)),
      s"doc ${r.getLong(0)}: blob length ${r.getLong(2)} != source ${wantLens(r.getLong(0))}"))
  }
}
