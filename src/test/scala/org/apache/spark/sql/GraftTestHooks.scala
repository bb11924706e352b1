package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge to the private[sql] extensions API. */
object GraftTestHooks {
  def registerFunctions(
      ext: SparkSessionExtensions, reg: FunctionRegistry): Unit =
    ext.registerFunctions(reg)
}
