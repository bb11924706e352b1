package graft

import graft.plans.RewritePowAsMultiply
import org.apache.spark.sql.functions._

/** The pow(x,2) -> x*x optimizer rule rewrites the plan and preserves
  * results.
  */
class RewriteRuleSpec extends SparkSpec {

  test("pow(x,2) becomes a multiply in the optimized plan") {
    val prior = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prior :+ RewritePowAsMultiply
      val df = Tables(spark, sf, "orders")
        .select(pow(col("o_totalprice"), 2).as("sq"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("POWER") && !optimized.contains("pow("),
        optimized)
      assert(optimized.contains("* "), optimized)
      // Result parity with the unrewritten form on real data.
      val direct = Tables(spark, sf, "orders")
        .select((col("o_totalprice") * col("o_totalprice")).as("sq"))
      assert(df.agg(sum("sq")).collect().head.getDouble(0) ==
        direct.agg(sum("sq")).collect().head.getDouble(0))
    } finally {
      spark.experimental.extraOptimizations = prior
    }
  }
}
