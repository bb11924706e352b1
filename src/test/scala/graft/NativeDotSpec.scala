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

  test("fused cosine is bit-equal to ndot/(nnorm*nnorm) on shifted pairs") {
    Native.register(spark)
    import graft.queries.SimOps.{ncos, ndot, nnorm}
    val e = Tables(spark, sf, "embeddings")
    // Pair each vector with its successor's embedding (non-trivial pairs).
    val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    val pairs = e.select(col("vec_id"), col("embedding").as("ea"))
      .withColumn("eb", lead(col("ea"), 1).over(w))
      .filter(col("eb").isNotNull)
    val bad = pairs.select(
      ncos(col("ea"), col("eb")).as("fused"),
      (ndot(col("ea"), col("eb")) / (nnorm(col("ea")) * nnorm(col("eb"))))
        .as("composed"))
      .filter(col("fused") =!= col("composed")) // exact, not approx
    assert(bad.count() == 0)
  }

  test("cosine of a vector with itself is exactly 1 for nonzero vectors") {
    Native.register(spark)
    import graft.queries.SimOps.ncos
    // ab == aa == bb in the fused loop, so ab/(sqrt(aa)*sqrt(bb)) == 1.0
    // whenever sqrt is exact-inverse — holds for aa*1.0; assert within ulp.
    val bad = Tables(spark, sf, "embeddings")
      .select(ncos(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12)
    assert(bad.count() == 0)
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
