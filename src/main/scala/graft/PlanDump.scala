package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for a named set of registry queries into
  * per-query files — the optimization-round evidence artifact
  * (`plans/rNN/<query>_{before,after}.txt`). Unlike [[Plans]] (the
  * PLANS.md book, local[4]), this runs the bench's own geometry
  * (local[32], shuffle.partitions=32, AQE on) so the captured shapes are
  * the ones the bench times.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val ids = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (id <- ids) {
      val plan =
        try {
          val df = Registry.byId(id).run(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch {
          case e: Throwable => s"FAILED: ${e.getMessage}"
        }
      Files.writeString(Paths.get(outDir, s"${id}_$suffix.txt"), plan)
      System.err.println(s"[plandump] $id -> $outDir/${id}_$suffix.txt")
    }
    spark.stop()
  }
}
