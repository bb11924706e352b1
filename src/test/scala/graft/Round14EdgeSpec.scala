package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-fixture edge cases for the round-14 operator dialects. */
class Round14EdgeSpec extends SparkSpec {
  import spark.implicits._

  test("BPE <sym>-wrapper replace = greedy non-overlapping reference merge") {
    // The whole trainer/encoder rests on one claim: a literal replace of
    // "<a><b>" with "<ab>" over the wrapped encoding reproduces reference
    // BPE's greedy left-to-right merge and can never cross a symbol
    // boundary. Exercise the three hazard fixtures.
    def enc(w: String) = w.map(c => s"<$c>").mkString
    def merge(s: String, a: String, b: String) =
      s.replace(s"<$a><$b>", s"<$a$b>")
    def syms(s: String) = s.stripPrefix("<").stripSuffix(">").split("><").toSeq
    // Back-to-back occurrences both merge ([a,b,a,b] -> [ab,ab]).
    assert(syms(merge(enc("abab"), "a", "b")) == Seq("ab", "ab"))
    // Overlapping self-pair merges greedily ([a,a,a] -> [aa,a]).
    assert(syms(merge(enc("aaa"), "a", "a")) == Seq("aa", "a"))
    // A pattern must not match INSIDE a multi-char symbol: after merging
    // (b,c), the pair (a,b) has no occurrence in [a, bc].
    val m1 = merge(enc("abc"), "b", "c") // "<a><bc>"
    assert(syms(m1) == Seq("a", "bc"))
    assert(merge(m1, "a", "b") == m1, "merge crossed a symbol boundary")
    // And the Spark-side expression chain agrees on the same fixtures.
    val df = Seq("abab", "aaa", "abc").toDF("wd")
      .select(regexp_replace(col("wd"), "(.)", "<$1>").as("e"))
      .select(replace(col("e"), lit("<a><b>"), lit("<ab>")).as("e"))
      .select((length(col("e")) -
        length(replace(col("e"), lit("<"), lit("")))).as("n"))
      .collect().map(_.getInt(0) match { case n => n })
    assert(df.toSeq == Seq(2, 3, 2)) // [ab,ab], [a,a,a] (no (a,a) merge), [ab,c]
  }

  test("LPA argmax struct picks most-frequent label, smallest on ties") {
    // node 1 sees labels {7,7,3}: majority 7. node 2 sees {5,9}: tie ->
    // smallest label 5 must win via max_by(lab, struct(c, -lab)).
    val nbrs = Seq((1L, 7L), (1L, 7L), (1L, 3L), (2L, 9L), (2L, 5L))
      .toDF("v", "lab")
    val got = nbrs.groupBy("v", "lab").agg(count(lit(1)).as("c"))
      .groupBy("v")
      .agg(max_by(col("lab"), struct(col("c"), -col("lab"))).as("lab"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 7L, 2L -> 5L))
  }

  test("half-life 2^-k weights are exact powers of two through pow()") {
    // The agg_halflife_decay exactness argument: pow(2.0, -k) must return
    // the exactly-representable power for every age the data can produce.
    val got = spark.range(0, 61)
      .select(pow(lit(2.0), -col("id")).as("w"))
      .collect().map(_.getDouble(0))
    (0 until 61).foreach { k =>
      assert(got(k) == math.pow(2.0, -k) &&
        got(k) == BigDecimal(2).pow(-k).toDouble, s"k=$k")
    }
  }

  test("equi-depth bucket arithmetic balances any N, buckets ascend") {
    for (n <- Seq(1, 9, 10, 11, 23, 100, 101)) {
      val buckets = (1 to n).map(i => ((i - 1) * 10) / n + 1)
      assert(buckets.head == 1 && buckets.last == math.min(10, buckets.max))
      assert(buckets == buckets.sorted)
      val sizes = buckets.groupBy(identity).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"n=$n sizes=$sizes")
    }
  }

  test("seasonal trend window clamps at series edges to available rows") {
    // A 3-row series: the centered 24-row frame shrinks to the series, so
    // every trend equals the full-series mean — no null, no division slip.
    val s3 = Seq(("a", 1L, 3L), ("a", 2L, 6L), ("a", 3L, 9L))
      .toDF("et", "hb", "n")
    val w = Window.partitionBy("et").orderBy("hb").rowsBetween(-11, 12)
    val trends = s3
      .select(round(sum("n").over(w).cast("double") /
        count(lit(1)).over(w), 6).as("t"))
      .collect().map(_.getDouble(0))
    assert(trends.forall(_ == 6.0))
  }

  test("k-anonymity boundary: a class of exactly k is NOT suppressed") {
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(4)(("b", "y")))
      .toDF("q1", "q2")
    val got = df.groupBy("q1", "q2").agg(count(lit(1)).as("n"))
      .select(col("q1"), (col("n") < 5).as("suppressed"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("a" -> false, "b" -> true))
  }
}
