package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded, reproducible train/test split.
  *
  * Reference analog: seeded permutation + prefix split
  * (`trainer/flax_model.py:125-131`, ratio 0.9 at `:399`). A permutation
  * needs a global total order — a shuffle-the-world non-starter at 100 TB —
  * so the scalable equivalent assigns each row a deterministic pseudo-random
  * bucket from (key, seed) alone: split membership is a pure per-row map,
  * independent of partitioning, row order, cluster size, or engine, and any
  * two runs (or two engines — the md5 bucket is DuckDB-oracle-checkable)
  * agree row for row. Expected train fraction = trainPct/100, exact
  * disjointness and coverage by construction; SeededSplitSpec asserts the
  * distributional properties.
  */
object SeededSplit {

  /** Deterministic bucket in [0, 100) from (key, seed): first 60 bits of
    * md5("key:seed") mod 100. DuckDB twin:
    * `CAST(('0x'||substr(md5(key||':'||seed),1,15)) AS BIGINT) % 100`.
    */
  def bucket(key: Column, seed: Long): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s":$seed"))), 1, 15),
      16, 10).cast("long") % 100

  /** 'train' for trainPct% of keys, 'test' for the rest. */
  def assign(key: Column, seed: Long, trainPct: Int = 90): Column =
    when(bucket(key, seed) < trainPct, "train").otherwise("test")
}
