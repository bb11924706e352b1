package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize the shared table cache up front so per-query timings
    // measure the query, not the first-toucher's scan+cache cost.
    Tables.names.foreach(t => Tables(spark, sfDir, t).count())
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune every computed
      // column, so map-only queries would be timed as bare scans. The noop
      // sink fully evaluates each output row and discards it.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
