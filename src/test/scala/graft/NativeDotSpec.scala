package graft

import graft.functions.Native
import org.apache.spark.sql.functions._

/** graft.functions.DotProduct: bit-equality with the declarative
  * higher-order-function form, null handling, and codegen participation.
  */
class NativeDotSpec extends SparkSpec {

  test("native dot is bit-equal to aggregate(zip_with(...)) on all embeddings") {
    Native.register(spark)
    import graft.queries.SimOps.{dot, ndot}
    val e = Tables(spark, sf, "embeddings")
    val bad = e.select(
      dot(col("embedding"), col("embedding")).as("d"),
      ndot(col("embedding"), col("embedding")).as("n"))
      .filter(col("d") =!= col("n")) // bit-inequality (exact, not approx)
    assert(bad.count() == 0)
  }

  test("null array yields null") {
    Native.register(spark)
    val df = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS d")
    assert(df.collect().head.isNullAt(0))
  }

  test("known value: dot([1,2,3],[4,5,6]) = 32") {
    Native.register(spark)
    val d = spark.sql(
      """SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT), CAST(3 AS FLOAT)),
        |                 array(CAST(4 AS FLOAT), CAST(5 AS FLOAT), CAST(6 AS FLOAT))) AS d
        |""".stripMargin)
    assert(d.collect().head.getDouble(0) == 32.0)
  }

  test("non-float-array input is rejected at analysis") {
    Native.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>"), e.getMessage)
  }

  test("dot stays inside whole-stage codegen (no CodegenFallback)") {
    Native.register(spark)
    import graft.queries.SimOps.ndot
    val df = Tables(spark, sf, "embeddings")
      .select(ndot(col("embedding"), col("embedding")).as("d"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p)
  }
}
