package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger scale factor from an existing testdata dir
  * by replicating every table K times with consistent key offsets, so the
  * scale-slope probe (`BENCH_SCALE.json`) can compare `graft.Bench` at two
  * scales without driver-side generators.
  *
  * Replication preserves referential integrity: each scaling key domain
  * (custkey, orderkey, partkey, suppkey, event_id, doc_id, vec_id)
  * is offset by `replica * (max(key)+pad)` on BOTH its primary table and
  * every foreign reference, while the fixed dimensions (region, nation) and
  * all non-key attributes are copied verbatim — the same join fan-outs,
  * group cardinalities per key, and value distributions, at K times the
  * rows. doc_id offsets are rounded up to a multiple of 10 so the
  * eval/train membership pattern (doc_id % 10) replicates exactly.
  *
  * Usage: `sbt "runMain graft.ScaleGen /root/testdata/sf0.1 <outDir> 5"`.
  * Output dirs are named `<table>.parquet` like the driver's testdata, so
  * `SPARK_GRAFT_SF_DIR=<outDir>` works for Bench/Verify unchanged.
  */
object ScaleGen {

  /** max(key)+1 rounded up to the next multiple of `mod` (pattern-preserving
    * offset for modulus-based membership like doc_id % 10).
    */
  private def domain(df: DataFrame, key: String, mod: Long = 1L): Long = {
    val m = df.agg(max(col(key).cast("long"))).head().getLong(0) + 1
    ((m + mod - 1) / mod) * mod
  }

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, kStr) = args
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // NOTE: reads raw (nanosAsLong), NOT through Tables' ts conversion —
    // the copy must round-trip the driver's physical schema unchanged so
    // Tables applies its usual conversion when reading the scaled dir.
    def raw(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")

    val custK = domain(raw("customer"), "c_custkey")
    val ordK = domain(raw("orders"), "o_orderkey")
    val partK = domain(raw("part"), "p_partkey")
    val suppK = domain(raw("supplier"), "s_suppkey")
    val evK = domain(raw("events"), "event_id")
    val docK = domain(raw("documents"), "doc_id", mod = 10L)
    val vecK = domain(raw("embeddings"), "vec_id")

    /** K replicas of `df`, each with the listed key columns offset by
      * `r * step(col)`, original types preserved.
      */
    def replicate(df: DataFrame, offsets: Map[String, Long]): DataFrame = {
      val reps = spark.range(k).select(col("id").as("__r"))
      val out = df.crossJoin(broadcast(reps))
      val shifted = offsets.foldLeft(out) { case (acc, (c, step)) =>
        val orig = df.schema(c).dataType
        acc.withColumn(c, (col(c).cast("long") + col("__r") * step).cast(orig))
      }
      shifted.drop("__r").select(df.columns.map(col).toIndexedSeq: _*)
    }

    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> raw("region"),
      "nation" -> raw("nation"),
      "customer" -> replicate(raw("customer"), Map("c_custkey" -> custK)),
      "supplier" -> replicate(raw("supplier"), Map("s_suppkey" -> suppK)),
      "part" -> replicate(raw("part"), Map("p_partkey" -> partK)),
      "orders" -> replicate(raw("orders"),
        Map("o_orderkey" -> ordK, "o_custkey" -> custK)),
      "lineitem" -> replicate(raw("lineitem"),
        Map("l_orderkey" -> ordK, "l_partkey" -> partK, "l_suppkey" -> suppK)),
      // user_id is a CUSTOMER foreign key (stream_dim_join joins
      // user_id = c_custkey), so it must shift by the customer domain —
      // an events-derived step would only keep referential integrity by
      // the accident of c_custkey being dense from 0.
      "events" -> replicate(raw("events"),
        Map("event_id" -> evK, "user_id" -> custK)),
      "documents" -> replicate(raw("documents"), Map("doc_id" -> docK)),
      "embeddings" -> replicate(raw("embeddings"), Map("vec_id" -> vecK)))

    plans.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scalegen] $t x$k written")
    }
    spark.stop()
  }
}
