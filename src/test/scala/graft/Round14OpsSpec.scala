package graft

import org.apache.spark.sql.functions._

/** Sequential brute-force twins for the round-14 operators. */
class Round14OpsSpec extends SparkSpec {

  test("BPE training trace matches reference greedy merge loop") {
    // Reference BPE (Sennrich et al. 2016) on the driver: words as symbol
    // vectors, count every adjacent pair weighted by word frequency, take
    // the (n DESC, a, b) argmax, merge greedily left-to-right
    // non-overlapping, repeat.
    val words = Tables(spark, sf, "documents")
      .filter(col("lang") === "en")
      .select(explode(split(lower(col("text")), " ")).as("wd"))
      .filter(length(col("wd")) >= 2 && col("wd").rlike("^[a-z]+$"))
      .groupBy("wd").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var wf: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }

    def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }

    val want = (1 to 5).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- wf; i <- 0 until syms.length - 1)
        counts(syms(i) -> syms(i + 1)) =
          counts.getOrElse(syms(i) -> syms(i + 1), 0L) + f
      val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      wf = wf.map { case (syms, f) => (mergeWord(syms, a, b), f) }
      (k, a, b, n)
    }

    val got = Registry.byId("text_bpe_train_merges").run(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want)
  }
}
