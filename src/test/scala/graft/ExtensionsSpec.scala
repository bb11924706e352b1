package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.SparkSessionExtensions

/** The spark.sql.extensions deployment path registers the native functions. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects graft_dot into a SparkSessionExtensions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // buildFunctionRegistry applies injected functions onto a registry.
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    val before = reg.listFunction().size
    org.apache.spark.sql.GraftTestHooks.registerFunctions(ext, reg)
    assert(reg.listFunction().size == before + 6)
    assert(reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
    assert(reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine")))
    assert(reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_gram_hashes")))
    assert(reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_grams")))
    assert(reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_might_contain")))
    assert(reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_agg")))
  }
}
