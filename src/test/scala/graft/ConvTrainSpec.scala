package graft

import graft.ml.{ConvTrain, ModelCheckpoint}

/** Contract of the learned-conv-kernel trainer (`ml_conv_train_gd`):
  * the target is exactly linear in the 9-tap patch, so (1) the
  * normal-equation solve of the folded statistics must recover the
  * generating binomial kernel to float ulps with ~zero loss, (2) GD with
  * the trace-bounded step size must descend monotonically toward it, and
  * (3) the trajectory must resume bit-for-bit from a checkpoint
  * (the CheckpointSpec contract, applied to the 9-weight state).
  */
class ConvTrainSpec extends SparkSpec {

  private lazy val stats =
    ConvTrain.stats(Tables(spark, sf, "events"))

  test("normal-equation solve recovers the generating kernel exactly") {
    val w = ConvTrain.solveNormal(stats)
    assert(ConvTrain.distToTrue(w) < 1e-9,
      s"solve missed the generating kernel by ${ConvTrain.distToTrue(w)}")
    assert(math.abs(ConvTrain.mse(stats, w)) < 1e-12)
  }

  test("GD loss decreases monotonically and approaches the true kernel") {
    val lr = ConvTrain.stableLr(stats)
    val init = ConvTrain.State(0, new Array[Double](ConvTrain.Taps))
    val (fin, hist) = ConvTrain.run(stats, init, 8, lr)
    val mses = hist.map(_._2)
    assert(mses.zip(mses.tail).forall { case (a, b) => b < a },
      s"mse not strictly decreasing: $mses")
    val dists = hist.map(_._3)
    assert(dists.last < dists.head,
      s"kernel distance did not shrink: $dists")
    assert(ConvTrain.distToTrue(fin.w) < ConvTrain.distToTrue(init.w))
  }

  test("checkpointed run resumes bit-for-bit") {
    val lr = ConvTrain.stableLr(stats)
    val init = ConvTrain.State(0, new Array[Double](ConvTrain.Taps))
    val (_, full) = ConvTrain.run(stats, init, 5, lr)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_conv_ckpt").toString
    val ckpt = ModelCheckpoint(spark, dir)
    val (_, leg1) = ConvTrain.run(stats, init, 3, lr, Some(ckpt))
    val restored = ConvTrain.fromDf(ckpt.restoreLatest().get._2)
    val (fin2, leg2) = ConvTrain.run(stats, restored, 2, lr)
    val resumed = leg1 ++ leg2
    assert(full.size == resumed.size)
    full.zip(resumed).foreach { case ((i1, m1, d1), (i2, m2, d2)) =>
      assert(i1 == i2)
      assert(java.lang.Double.doubleToRawLongBits(m1) ==
        java.lang.Double.doubleToRawLongBits(m2), s"mse drift at step $i1")
      assert(java.lang.Double.doubleToRawLongBits(d1) ==
        java.lang.Double.doubleToRawLongBits(d2), s"dist drift at step $i1")
    }
    // The restored state itself is bit-equal to an uninterrupted 5-step run
    val (fin1, _) = ConvTrain.run(stats, init, 5, lr)
    fin1.w.zip(fin2.w).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b), "final weights drift")
    }
  }
}
