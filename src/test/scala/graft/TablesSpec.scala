package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Regression guard for the events `ts` load normalization
  * (`Tables.load`). The driver has shipped events.parquet with three
  * physical encodings across generations — nanos-as-LONG, TIMESTAMP_NTZ
  * (micros, isAdjustedToUTC=false) and TIMESTAMP (micros, UTC) — and round
  * 12 lost 47 registry queries to an unconditional nanos-LONG assumption.
  * Each encoding is written in-test and must load to the identical
  * TimestampType instants.
  */
class TablesSpec extends SparkSpec {

  private val micros: Seq[Long] =
    Seq(0L, 1700000000000000L, 1700000123456789L)

  private def loadTs(dir: String): Seq[Long] = {
    Tables.noCache = true
    try Tables(spark, dir, "events")
      .select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq.sorted
    finally Tables.noCache = false
  }

  private def freshDir(): String =
    Files.createTempDirectory("graft_tables_spec").toString

  test("events ts: nanos-as-LONG encoding loads to µs timestamps") {
    import spark.implicits._
    val dir = freshDir()
    micros.map(us => (1L, us * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadTs(dir) === micros)
    assert(Tables(spark, dir, "events").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("events ts: TIMESTAMP_NTZ encoding loads to µs timestamps") {
    import spark.implicits._
    val dir = freshDir()
    micros.map(us => (1L, us)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadTs(dir) === micros)
    assert(Tables(spark, dir, "events").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("events ts: native TIMESTAMP encoding passes through") {
    import spark.implicits._
    val dir = freshDir()
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try micros.map(us => (1L, us)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally prev.foreach(spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    assert(loadTs(dir) === micros)
  }

  test("events ts: the driver's actual sf0.001 events table loads") {
    val df = Tables(spark, sf, "events")
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(df.filter(col("ts").isNotNull).limit(1).count() === 1L)
  }

  test("events ts predicates push down to the parquet scan") {
    // NTZ inference is disabled at load, so the scan yields TimestampType
    // directly and a ts range predicate must reach PushedFilters — a cast
    // on top of an NTZ scan would silently drop row-group pruning.
    // clearCache: an events cache from a previous test would substitute an
    // InMemoryRelation for the scan and hide the PushedFilters line.
    spark.catalog.clearCache()
    Tables.noCache = true
    try {
      val plan = Tables(spark, sf, "events")
        .filter(col("ts") >= lit("2024-01-02").cast("timestamp"))
        .queryExecution.executedPlan.toString
      val pushed = plan.linesIterator
        .filter(_.contains("PushedFilters")).mkString
      assert(pushed.contains("ts"), s"no ts in PushedFilters: $pushed")
      assert(!pushed.contains("PushedFilters: []"), pushed)
    } finally Tables.noCache = false
  }

  /** Testdata-drift sentinel for EVERY table, not just events: the driver
    * regenerates the parquet between rounds, and a silent dtype change is
    * exactly how round 12 lost 28% of the registry. Loaded dtypes the
    * engine's queries/oracles depend on are pinned here so drift fails in
    * the FIRST test run of a round with a message naming the column.
    */
  test("driver testdata schemas match the dtypes the registry depends on") {
    val expected = Map(
      "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"),
      "nation" -> Map("n_nationkey" -> "int", "n_regionkey" -> "int"),
      "customer" -> Map("c_custkey" -> "bigint", "c_nationkey" -> "int",
        "c_acctbal" -> "double", "c_mktsegment" -> "string"),
      "supplier" -> Map("s_suppkey" -> "bigint", "s_nationkey" -> "int",
        "s_acctbal" -> "double"),
      "part" -> Map("p_partkey" -> "bigint", "p_size" -> "int",
        "p_retailprice" -> "double"),
      "orders" -> Map("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_totalprice" -> "double"),
      "lineitem" -> Map("l_orderkey" -> "bigint", "l_quantity" -> "double",
        "l_extendedprice" -> "double", "l_discount" -> "double",
        "l_returnflag" -> "string"),
      "events" -> Map("event_id" -> "bigint", "ts" -> "timestamp",
        "user_id" -> "bigint", "event_type" -> "string",
        "value" -> "double", "props" -> "string"),
      "documents" -> Map("doc_id" -> "bigint", "text" -> "string",
        "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
      "embeddings" -> Map("vec_id" -> "bigint",
        "embedding" -> "array<float>", "label" -> "int"))
    Tables.noCache = true
    try for ((table, cols) <- expected) {
      val schema = Tables(spark, sf, table).schema
      for ((name, dtype) <- cols) {
        val f = schema.fields.find(_.name == name)
        assert(f.isDefined, s"$table.$name missing — driver testdata drifted")
        assert(f.get.dataType.simpleString == dtype,
          s"$table.$name is ${f.get.dataType.simpleString}, expected $dtype " +
            "— driver testdata drifted; audit Tables.load normalization")
      }
    } finally Tables.noCache = false
  }
}
