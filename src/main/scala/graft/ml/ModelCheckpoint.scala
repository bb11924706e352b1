package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed checkpointing for driver-held iterative model state
  * (GD weights, k-means centroids).
  *
  * Reference analog: the reference checkpoints every epoch with `keep=3`
  * pruning (`trainer/flax_model.py:377-382`) and restores for inference
  * (`trainer/flax_inference.ipynb` cell 3, `restore_checkpoint`). Here each
  * step's state is one tiny parquet directory `<dir>/step=<n>` — model
  * state is O(k·dim), never data-sized, so the write costs nothing while
  * the thing it protects (N scans of a 100 TB table to recompute the state
  * after a driver failure) is the single most expensive artifact in an
  * iterative job. Paths go through the Hadoop FileSystem API, so the same
  * code addresses local disk, HDFS, or an object store.
  *
  * Determinism contract: state round-trips bit-for-bit (parquet stores
  * IEEE doubles/floats exactly), so resume(checkpoint(n)) ≡ run(n+m) —
  * asserted in CheckpointSpec.
  */
final case class ModelCheckpoint(spark: SparkSession, dir: String, keep: Int = 3) {

  private def fs =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Persist one step's state and prune to the newest [[keep]] steps. */
  def save(step: Int, state: DataFrame): Unit = {
    state.coalesce(1).write.mode("overwrite").parquet(s"$dir/step=$step")
    steps.sorted.dropRight(keep)
      .foreach(old => fs.delete(new Path(s"$dir/step=$old"), true))
  }

  /** COMMITTED steps currently on disk (unordered). A step counts only if
    * its directory carries the committer's `_SUCCESS` marker: a driver
    * crash mid-save — the exact failure checkpointing exists to survive —
    * leaves a partial `step=n` dir with no marker, and restoreLatest must
    * fall back to the last complete step instead of restoring torn state.
    */
  def steps: Seq[Int] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("step="))
      .filter(n => fs.exists(new Path(s"$dir/$n/_SUCCESS")))
      .map(_.stripPrefix("step=").toInt)
  }

  /** Newest checkpoint, or None if the directory is empty/missing. */
  def restoreLatest(): Option[(Int, DataFrame)] =
    steps.sorted.lastOption.map(n => (n, spark.read.parquet(s"$dir/step=$n")))
}
