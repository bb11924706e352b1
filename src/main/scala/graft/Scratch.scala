package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only staged profiler (not part of the library surface; deleted or
  * inert in shipped rounds).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t => Tables(spark, dir, t).count())
    val ev = Tables(spark, dir, "events")
    val M = 2147483647L
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    val x1 = (col("event_id") % M * 48271L + (col("rep") * 16807L + 11213L)) % M
    val h = x1 * 48271L % M * 48271L % M % 1000000L
    val w = when(h < 367879, 0).when(h < 735759, 1).when(h < 919699, 2)
      .when(h < 981012, 3).when(h < 996340, 4).when(h < 999406, 5)
      .otherwise(6)
    for (r <- 1 to 3) {
      time(s"explode only ($r)") {
        ev.select(col("event_id"), col("value"),
            explode(sequence(lit(0), lit(31))).as("rep"))
          .select(col("rep"), col("value"), col("event_id"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"explode+w ($r)") {
        ev.select(col("event_id"), col("value"),
            explode(sequence(lit(0), lit(31))).as("rep"))
          .select(col("rep"), col("value"), w.as("w"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"explode+w+agg ($r)") {
        ev.select(col("event_id"), col("value"),
            explode(sequence(lit(0), lit(31))).as("rep"))
          .select(col("rep"), col("value"), w.as("w"))
          .groupBy("rep")
          .agg(sum((col("w") * col("value")).cast(DecimalType(18, 6)))
            .cast("double").as("sv"), sum("w").as("sw"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"explode+w+agg-longs ($r)") {
        ev.select(col("event_id"), col("value"),
            explode(sequence(lit(0), lit(31))).as("rep"))
          .select(col("rep"), col("value"), w.as("w"))
          .groupBy("rep")
          .agg(sum(col("w") * col("value")).as("sv"), sum("w").as("sw"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"agg-nogroup-dec ($r)") {
        ev.select(col("event_id"), col("value"),
            explode(sequence(lit(0), lit(31))).as("rep"))
          .select(col("rep"), col("value"), w.as("w"))
          .agg(sum((col("w") * col("value")).cast(DecimalType(18, 6)))
            .cast("double").as("sv"), sum("w").as("sw"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"explode+w+agg-dsump ($r)") {
        graft.functions.Native.register(spark)
        ev.select(col("event_id"), col("value"),
            explode(sequence(lit(0), lit(31))).as("rep"))
          .select(col("rep"), col("value"), w.as("w"))
          .groupBy("rep")
          .agg(Fns.dsumP(col("w") * col("value"), 18, 6).as("sv"), sum("w").as("sw"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"full query ($r)") {
        Registry.byId("corpus_perplexity_bigram_filter").run(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    println(Registry.byId("corpus_perplexity_bigram_filter").run(spark, dir)
      .queryExecution.optimizedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
