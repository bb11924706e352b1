package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed training of a small convolution kernel — the last piece of
  * the reference's core compute reproduced end-to-end: the reference
  * LEARNS its conv weights (`nn.Conv(features=32, kernel_size=(5,5))`,
  * `trainer/flax_model.py:156`, trained by the `:229-260` loop), while the
  * engine's forward conv queries run fixed binomial kernels.
  *
  * The shape is the moments pattern of [[GradientDescent]] lifted from a
  * scalar feature to a 9-tap patch: because conv output is LINEAR in the
  * kernel, quadratic loss over any corpus folds to exact integer
  * sufficient statistics
  *
  *   A = Σ_p x_p x_pᵀ  (9×9 patch Gram),  b = Σ_p y_p x_p,  C = Σ_p y_p²
  *
  * gathered in ONE distributed pass — the gradient of conv-as-join is
  * itself a conv-as-join, and after the pass every GD iteration is pure
  * driver arithmetic on an 9-double state (at 100 TB: one scan total, same
  * contract as `ml_train_gd_iterations`). The patch pivot rides the same
  * broadcast-offsets equi-join as `ml_conv2d_join_agg`; absent neighbors
  * are exact zeros, so the target below IS that query's conv output.
  *
  * Determinism: A, b·16, C·256 are integer-valued (counts and binomial
  * weights) and summed as DECIMAL(38,0) — merge-order-independent on any
  * cluster — and every value fits a double exactly (well under 2^53), so
  * the training trajectory is bit-reproducible and checkpoint-resumable
  * ([[ModelCheckpoint]] round-trips the state; ConvTrainSpec asserts
  * bit-for-bit resume equality).
  */
object ConvTrain {

  /** 3×3 offsets, row-major tap index k = (dy+1)*3 + (dx+1). */
  val Taps = 9
  private def bw(o: Int): Int = if (o == 0) 2 else 1

  /** The generating kernel of the training target: binomial
    * [1,2,1]⊗[1,2,1] / 16 (`ml_conv2d_join_agg`'s kernel,
    * gaussian_filter sigma=1 — flax_model.py:73). Training must recover
    * exactly this vector: the target is exactly linear in the patch, so
    * the least-squares minimizer is the true kernel.
    */
  val TrueKernel: Array[Double] =
    (for { dy <- -1 to 1; dx <- -1 to 1 } yield bw(dy) * bw(dx) / 16.0).toArray

  /** Exact sufficient statistics of `y ~ w·x` over all patches. */
  final case class Stats(
      n: Long, a: Array[Array[Double]], b: Array[Double], c: Double)

  /** The (u, d, c) activity grid of `ml_conv2d_join_agg`. */
  def grid(events: DataFrame): DataFrame = events
    .groupBy(
      col("user_id").as("u"),
      datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast("int").as("d"))
    .agg(count(lit(1)).as("c"))

  /** ONE distributed pass: patch pivot (9 conditional sums off the
    * broadcast-offset equi-join — absent neighbors are exact 0), target
    * numerator ynum = Σ_k bin_k·x_k (so y = ynum/16 exactly), then the
    * 45 upper-triangle Gram sums + 9 cross sums + ynum² + n in one
    * aggregation. Everything integer, summed as DECIMAL(38,0).
    */
  def stats(ev: DataFrame): Stats = {
    val s = ev.sparkSession
    val g = grid(ev)
    val offs = s.createDataFrame(
      for { dy <- Seq(-1, 0, 1); dx <- Seq(-1, 0, 1) }
        yield (dy, dx, (dy + 1) * 3 + (dx + 1)))
      .toDF("dy", "dx", "k")
    val n = g.select(col("u").as("nu"), col("d").as("nd"), col("c").as("nc"))
    val patches = g.crossJoin(broadcast(offs))
      .join(n, col("nu") === col("u") + col("dy") &&
        col("nd") === col("d") + col("dx"))
      .groupBy("u", "d")
      .agg(
        sum(when(col("k") === 0, col("nc")).otherwise(0L)).as("x0"),
        (1 until Taps).map(k =>
          sum(when(col("k") === k, col("nc")).otherwise(0L)).as(s"x$k")): _*)
    val binW: Array[Long] = TrueKernel.map(w => math.round(w * 16))
    val ynum = (0 until Taps).map(k => lit(binW(k)) * col(s"x$k"))
      .reduce(_ + _)
    def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 0)))
    val gramCols = for { k <- 0 until Taps; j <- k until Taps }
      yield dsum(col(s"x$k") * col(s"x$j")).as(s"a_${k}_$j")
    val crossCols = (0 until Taps)
      .map(k => dsum(col("yn") * col(s"x$k")).as(s"by_$k"))
    val row = patches
      .withColumn("yn", ynum)
      .agg(count(lit(1)).as("n"),
        (gramCols ++ crossCols :+ dsum(col("yn") * col("yn")).as("cy")): _*)
      .head()
    def d(name: String): Double =
      row.getDecimal(row.fieldIndex(name)).doubleValue()
    val a = Array.ofDim[Double](Taps, Taps)
    for { k <- 0 until Taps; j <- k until Taps } {
      a(k)(j) = d(s"a_${k}_$j"); a(j)(k) = a(k)(j)
    }
    Stats(row.getLong(row.fieldIndex("n")), a,
      (0 until Taps).map(k => d(s"by_$k") / 16.0).toArray,
      d("cy") / 256.0)
  }

  /** Driver-held optimizer state: step + the 9 kernel weights. */
  final case class State(step: Int, w: Array[Double])

  /** MSE of `w` against the folded statistics:
    * (wᵀAw − 2wᵀb + C) / n — the loss the step observed.
    */
  def mse(st: Stats, w: Array[Double]): Double = {
    var quad = 0.0; var lin = 0.0
    for (k <- 0 until Taps) {
      lin += w(k) * st.b(k)
      for (j <- 0 until Taps) quad += w(k) * st.a(k)(j) * w(j)
    }
    (quad - 2 * lin + st.c) / st.n
  }

  /** Deterministic, data-adaptive step size: lr = 1 / (trace(A)/n) ≥
    * 1/λmax(A/n) is a guaranteed-stable GD step for a quadratic (trace
    * bounds the largest eigenvalue of a PSD matrix), with no hand-tuned
    * constant that breaks when the grid's count scale changes.
    */
  def stableLr(st: Stats): Double = {
    var tr = 0.0
    for (k <- 0 until Taps) tr += st.a(k)(k)
    st.n / tr
  }

  /** One GD step on the folded statistics; returns the next state and the
    * incoming state's MSE.
    */
  def step(st: Stats, s: State, lr: Double): (State, Double) = {
    val g = new Array[Double](Taps)
    for (k <- 0 until Taps) {
      var ak = 0.0
      for (j <- 0 until Taps) ak += st.a(k)(j) * s.w(j)
      g(k) = 2.0 * (ak - st.b(k)) / st.n
    }
    val w2 = Array.tabulate(Taps)(k => s.w(k) - lr * g(k))
    (State(s.step + 1, w2), mse(st, s.w))
  }

  /** Euclidean distance of `w` to the generating binomial kernel. */
  def distToTrue(w: Array[Double]): Double =
    math.sqrt((0 until Taps)
      .map(k => (w(k) - TrueKernel(k)) * (w(k) - TrueKernel(k))).sum)

  /** Fold [[step]] with optional per-iteration checkpointing; history rows
    * are (iter, mse-of-incoming-state, dist-to-true-kernel-of-next-state).
    */
  def run(st: Stats, init: State, nSteps: Int, lr: Double,
      ckpt: Option[ModelCheckpoint] = None)
      : (State, Seq[(Int, Double, Double)]) = {
    var s = init
    val hist = (init.step + 1 to init.step + nSteps).map { it =>
      val (next, m) = step(st, s, lr)
      s = next
      ckpt.foreach(c => c.save(it, toDf(c.spark, next)))
      (it, m, distToTrue(next.w))
    }
    (s, hist)
  }

  /** Closed-form normal-equation solve of the same statistics (Gaussian
    * elimination with partial pivoting) — the `ml_linreg_normal_eq`
    * contrast at d=9: when the parameter count is tiny, one pass + a
    * driver solve beats any iteration count. Because the target is exactly
    * linear in the patch, this returns [[TrueKernel]] up to float ulps
    * (ConvTrainSpec asserts 1e-9 agreement).
    */
  def solveNormal(st: Stats): Array[Double] = {
    val m = Array.tabulate(Taps)(k =>
      Array.tabulate(Taps + 1)(j => if (j < Taps) st.a(k)(j) else st.b(k)))
    for (col0 <- 0 until Taps) {
      val p = (col0 until Taps).maxBy(r => math.abs(m(r)(col0)))
      val t = m(col0); m(col0) = m(p); m(p) = t
      require(math.abs(m(col0)(col0)) > 0, "singular patch Gram")
      for (r <- col0 + 1 until Taps) {
        val f = m(r)(col0) / m(col0)(col0)
        for (j <- col0 to Taps) m(r)(j) -= f * m(col0)(j)
      }
    }
    val w = new Array[Double](Taps)
    for (r <- Taps - 1 to 0 by -1) {
      var acc = m(r)(Taps)
      for (j <- r + 1 until Taps) acc -= m(r)(j) * w(j)
      w(r) = acc / m(r)(r)
    }
    w
  }

  def toDf(spark: org.apache.spark.sql.SparkSession, s: State): DataFrame =
    spark.createDataFrame(
      s.w.zipWithIndex.toSeq.map { case (v, k) => (k, s.step, v) })
      .toDF("tap", "step", "w")

  def fromDf(df: DataFrame): State = {
    val rows = df.orderBy("tap").collect()
    State(rows.head.getInt(1), rows.map(_.getDouble(2)))
  }
}
