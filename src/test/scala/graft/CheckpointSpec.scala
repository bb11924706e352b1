package graft

import java.nio.file.Files

import graft.ml.{GradientDescent => GD, KMeansLloyd, ModelCheckpoint}
import org.apache.spark.sql.functions.col

/** Checkpoint/restore of driver-held iterative model state (reference:
  * per-epoch `keep=3` checkpoints, `trainer/flax_model.py:377-382`; restore
  * in `flax_inference.ipynb` cell 3): resume(checkpoint(n)) must equal
  * run(n+m) bit-for-bit, and the store must prune to the newest `keep`.
  */
class CheckpointSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_ckpt_spec").toString

  private def bitsEq(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(a) ==
      java.lang.Double.doubleToRawLongBits(b)

  private lazy val moments = GD.moments(
    Tables(spark, sf, "lineitem")
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y")))

  test("GD: resume(checkpoint(2)) + 3 more == run(5), bit-for-bit") {
    val (endFull, histFull) = GD.run(moments, GD.State(0, 0.0, 0.0), 5, 0.001)
    val ckpt = ModelCheckpoint(spark, tmp())
    GD.run(moments, GD.State(0, 0.0, 0.0), 2, 0.001, Some(ckpt))
    val (step, stateDf) = ckpt.restoreLatest().get
    assert(step == 2)
    val restored = GD.fromDf(stateDf)
    val (endRes, histRes) = GD.run(moments, restored, 3, 0.001)
    assert(endRes.step == endFull.step)
    assert(bitsEq(endRes.w, endFull.w) && bitsEq(endRes.b, endFull.b))
    histFull.drop(2).zip(histRes).foreach { case ((i1, w1, b1, e1), (i2, w2, b2, e2)) =>
      assert(i1 == i2 && bitsEq(w1, w2) && bitsEq(b1, b2) && bitsEq(e1, e2))
    }
  }

  test("Adam: resume(checkpoint(2)) + 3 more == run(5), bit-for-bit incl m/v") {
    val adam = GD.stepAdam(_: GD.Moments, _: GD.State, _: Double)
    val (endFull, histFull) =
      GD.run(moments, GD.State(0, 0.0, 0.0), 5, 0.001, opt = adam)
    val ckpt = ModelCheckpoint(spark, tmp())
    GD.run(moments, GD.State(0, 0.0, 0.0), 2, 0.001, Some(ckpt), opt = adam)
    val (step, stateDf) = ckpt.restoreLatest().get
    assert(step == 2)
    val restored = GD.fromDf(stateDf)
    // The checkpoint must round-trip the optimizer moments, not just (w, b):
    // a resume that zeroed m/v would diverge from the uninterrupted run on
    // the very next step.
    val (endRes, histRes) = GD.run(moments, restored, 3, 0.001, opt = adam)
    assert(endRes.step == endFull.step)
    assert(bitsEq(endRes.w, endFull.w) && bitsEq(endRes.b, endFull.b))
    assert(bitsEq(endRes.mw, endFull.mw) && bitsEq(endRes.mb, endFull.mb))
    assert(bitsEq(endRes.vw, endFull.vw) && bitsEq(endRes.vb, endFull.vb))
    histFull.drop(2).zip(histRes).foreach { case ((i1, w1, b1, e1), (i2, w2, b2, e2)) =>
      assert(i1 == i2 && bitsEq(w1, w2) && bitsEq(b1, b2) && bitsEq(e1, e2))
    }
  }

  test("Adam converges: MSE strictly decreases over the first 5 steps") {
    val adam = GD.stepAdam(_: GD.Moments, _: GD.State, _: Double)
    val (_, hist) = GD.run(moments, GD.State(0, 0.0, 0.0), 5, 0.001, opt = adam)
    val mses = hist.map(_._4)
    mses.zip(mses.tail).foreach { case (a, b) => assert(b < a) }
  }

  test("k-means: resume(checkpoint(1)) + 2 more == run(3), centroid bits equal") {
    val e = Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val init = KMeansLloyd.init(e)
    val (csFull, histFull) = KMeansLloyd.run(e, init, 0, 3)
    val ckpt = ModelCheckpoint(spark, tmp())
    KMeansLloyd.run(e, init, 0, 1, Some(ckpt))
    val (step, stateDf) = ckpt.restoreLatest().get
    assert(step == 1)
    val restored = KMeansLloyd.fromDf(stateDf)
    val (csRes, histRes) = KMeansLloyd.run(e, restored, 1, 2)
    csFull.zip(csRes).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq) // exact float equality, element-wise
    }
    histFull.drop(1).zip(histRes).foreach { case ((i1, w1, n1), (i2, w2, n2)) =>
      assert(i1 == i2 && bitsEq(w1, w2) && n1 == n2)
    }
  }

  test("store prunes to the newest keep=3 steps and restores the max step") {
    val ckpt = ModelCheckpoint(spark, tmp())
    (1 to 5).foreach(n => ckpt.save(n, GD.toDf(spark, GD.State(n, n * 1.0, 0.0))))
    assert(ckpt.steps.sorted == Seq(3, 4, 5))
    val (step, df) = ckpt.restoreLatest().get
    assert(step == 5 && GD.fromDf(df).w == 5.0)
  }

  test("restoreLatest on an empty/missing dir is None") {
    assert(ModelCheckpoint(spark, tmp() + "/nope").restoreLatest().isEmpty)
  }

  test("train/eval epochs: resume(checkpoint(3)) + 2 == run(5), eval-MSE series bit-equal") {
    import graft.ml.TrainEval
    val li = Tables(spark, sf, "lineitem").select(
      (col("l_orderkey") * 8 + col("l_linenumber")).as("k"),
      col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      .withColumn("split", graft.ml.SeededSplit.assign(col("k"), 42L))
    // The single-scan grouped pass must agree bit-for-bit with separate
    // filtered passes — exact decimal sums make the two plans equivalent.
    val bySplit = GD.momentsBySplit(li, "split")
    val mTrain = GD.moments(li.filter(col("split") === "train"))
    val mEval = GD.moments(li.filter(col("split") === "test"))
    assert(bySplit("train") == mTrain && bySplit("test") == mEval)
    val (endFull, histFull) =
      TrainEval.run(mTrain, mEval, GD.State(0, 0.0, 0.0), 5, 0.001)
    // Sanity on the series itself: 5 epochs x 2 metrics, eval loss finite
    // and strictly decreasing over the early epochs (Adam is converging on
    // the held-out split too, not just the train split).
    assert(histFull.length == 10)
    val evalSeries = histFull.filter(_._1 == "eval_loss").map(_._3)
    assert(evalSeries.zip(evalSeries.tail).forall { case (a, b) => b < a })
    // Resume leg: 3 checkpointed epochs, restore from the store, 2 more.
    val ckpt = ModelCheckpoint(spark, tmp())
    TrainEval.run(mTrain, mEval, GD.State(0, 0.0, 0.0), 3, 0.001, Some(ckpt))
    val (step, stateDf) = ckpt.restoreLatest().get
    assert(step == 3)
    val (endRes, histRes) =
      TrainEval.run(mTrain, mEval, GD.fromDf(stateDf), 2, 0.001)
    assert(endRes.step == endFull.step)
    assert(bitsEq(endRes.w, endFull.w) && bitsEq(endRes.b, endFull.b))
    assert(bitsEq(endRes.mw, endFull.mw) && bitsEq(endRes.vw, endFull.vw))
    // Both metric series — train AND eval — replay bit-for-bit after the
    // restart, epoch labels included.
    histFull.drop(6).zip(histRes).foreach { case ((n1, e1, v1), (n2, e2, v2)) =>
      assert(n1 == n2 && e1 == e2 && bitsEq(v1, v2))
    }
  }

  test("ml_train_checkpoint_resume registry rows all bit_equal") {
    val rows = Registry.byId("ml_train_checkpoint_resume").run(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Boolean]("bit_equal")))
  }
}
