package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable streaming-quantile sketches (Apache DataSketches KLL) — the
  * bounded-state alternative to exact percentiles (SURVEY §2.D's
  * `agg_median_quantile` sorts the full column; a KLL sketch holds ~O(k)
  * doubles regardless of input size, partial-aggregates map-side, and any
  * rollup — day→month, type→global — is a cheap sketch merge, never a
  * re-scan). Rank error at k=200 is ~1.65% with 99% confidence (public
  * bound, Karnin-Lang-Liberty 2016).
  *
  * Reference analog: the reference computes exact means/medians over small
  * arrays in one process (`trainer/flax_model.py:214-232`); at 100 TB the
  * mergeable sketch is the only shape that survives.
  *
  * The aggregation buffer is the live heap sketch (updates are in-place,
  * allocation-free per row); it serializes via the sketch's own compact
  * byte form only at partial-aggregation shuffle boundaries
  * (writeObject/readObject below), same two-level pattern as
  * `agg_hll_sketch_union`.
  */
object KllParams {
  /** Sketch accuracy parameter (~1.65% rank error, ~3 KB serialized). */
  val K = 200
}

/** Serialization shim: a mutable sketch holder whose wire form is the
  * sketch's own compact byte array.
  */
final class KllBuf(@transient var sk: KllDoublesSketch) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val b = sk.toByteArray
    out.writeInt(b.length)
    out.write(b)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    sk = KllDoublesSketch.heapify(Memory.wrap(b))
  }
}

/** `kll_sketch_agg(value)`: build a KLL doubles sketch per group. */
class KllAgg extends Aggregator[Double, KllBuf, Array[Byte]] {
  def zero: KllBuf = new KllBuf(KllDoublesSketch.newHeapInstance(KllParams.K))
  def reduce(b: KllBuf, x: Double): KllBuf = { b.sk.update(x); b }
  def merge(a: KllBuf, b: KllBuf): KllBuf = { a.sk.merge(b.sk); a }
  def finish(b: KllBuf): Array[Byte] = b.sk.toByteArray
  def bufferEncoder: Encoder[KllBuf] = Encoders.javaSerialization[KllBuf]
  def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}

/** `kll_union_agg(sketchBytes)`: merge serialized sketches (the rollup). */
class KllUnionAgg extends Aggregator[Array[Byte], KllBuf, Array[Byte]] {
  def zero: KllBuf = new KllBuf(KllDoublesSketch.newHeapInstance(KllParams.K))
  def reduce(b: KllBuf, bytes: Array[Byte]): KllBuf = {
    b.sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    b
  }
  def merge(a: KllBuf, b: KllBuf): KllBuf = { a.sk.merge(b.sk); a }
  def finish(b: KllBuf): Array[Byte] = b.sk.toByteArray
  def bufferEncoder: Encoder[KllBuf] = Encoders.javaSerialization[KllBuf]
  def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}

object KllQuantile {
  def sketch(v: Column): Column = udaf(new KllAgg, Encoders.scalaDouble)(v)

  def union(sk: Column): Column =
    udaf(new KllUnionAgg, ExpressionEncoder[Array[Byte]]())(sk)

  /** Quantile estimates from a serialized sketch. A scalar UDF is the
    * pragmatic tail here: no built-in reads DataSketches KLL bytes, and it
    * runs on the handful of post-aggregation rows, never the data path.
    */
  def quantile(sk: Column, rank: Double): Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      KllDoublesSketch.heapify(Memory.wrap(b)).getQuantile(rank)
    }
    f(sk)
  }
}
