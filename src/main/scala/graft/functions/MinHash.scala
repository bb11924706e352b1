package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Shared MinHash constants — the SAME numbers parameterize the declarative
  * `dedup_minhash_lsh` query, its DuckDB oracle SQL (string-generated from
  * these), and the typed [[MinHashAgg]] UDAF, so the three can never drift.
  *
  * Reference analog: the content-identity requirement of
  * `read_example` (`trainer/flax_model.py:53-66` — every npz key must be
  * present and aligned); here generalized to near-duplicate *content* identity
  * for LLM-corpus dedup (north-star extension).
  *
  * Scheme: token → 60-bit hash (first 15 hex chars of md5, a form both Spark
  * `conv` and DuckDB hex-cast compute identically) → k=16 universal hashes
  * `(a_i*h + b_i) mod P` over the Mersenne prime P=2^31−1, min per doc.
  * `a_i*h < 2^5 * 2^31 = 2^36` keeps every intermediate exactly representable
  * in a signed 64-bit integer in both engines.
  */
object MinHashParams {
  val NumHashes = 16
  val P = 2147483647L // 2^31 - 1
  def a(i: Int): Long = 2L * i + 3
  def b(i: Int): Long = 1L * i * i + 7
  /** LSH banding: 4 bands x 4 rows. */
  val NumBands = 4
  val RowsPerBand = 4
}

/** Typed MinHash-signature aggregate (SURVEY.md §4.3): buffer = running
  * elementwise min of the k permutation hashes. Commutative + associative, so
  * partial aggregation (map-side combine) applies — at 100 TB each executor
  * folds its token partition locally and only k longs per doc cross the
  * shuffle.
  *
  * Input is the token's 60-bit hash (column-side `conv(substr(md5(tok),1,15),
  * 16,10)`), NOT the raw token — keeps the UDAF numeric and the hot loop
  * allocation-free.
  */
class MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import MinHashParams._

  def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val hm = h % P
    var i = 0
    while (i < NumHashes) {
      val v = (a(i) * hm + b(i)) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHash {
  /** `minhash(hashCol)` — aggregate column producing the k-long signature. */
  def signature(h: Column): Column = udaf(new MinHashAgg, Encoders.scalaLong)(h)
}
