package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Intersection, SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable distinct-SET-OPERATION sketches (Apache DataSketches Theta).
  * HLL (`agg_hll_sketch_union`) only unions; Theta sketches additionally
  * support INTERSECTION and difference — the "how many users did BOTH X and Y"
  * audience-overlap question that at 100 TB cannot be answered by
  * re-scanning raw data for every segment combination. Per-segment sketches
  * persist as tiny binaries; any overlap query is a set operation over
  * sketches, never a re-scan.
  *
  * Determinism note: a theta sketch stays in EXACT mode (theta = 1, zero
  * error) until it exceeds its k = 2^lgK retained-entry budget. lgK = 14
  * (16384) exceeds the distinct-user domain at every test scale, so the
  * estimates here are exact integers and the query carries a full DuckDB
  * oracle; beyond k the same query degrades gracefully to ±1.6%-bounded
  * estimates (the production regime — documented, not reachable at test
  * scales).
  */
object ThetaParams {
  val LgK = 14
}

/** Serialization shim around a live theta Union: wire form is the compact
  * result sketch; rebuilding a Union from it is lossless.
  */
final class ThetaBuf(@transient var u: Union) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val b = u.getResult.toByteArray
    out.writeInt(b.length)
    out.write(b)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    u = SetOperation.builder().setLogNominalEntries(ThetaParams.LgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
  }
}

private object ThetaBuf {
  def empty(): ThetaBuf = new ThetaBuf(
    SetOperation.builder().setLogNominalEntries(ThetaParams.LgK).buildUnion())
}

/** `theta_sketch_agg(key)`: build a theta sketch of a long key per group. */
class ThetaAgg extends Aggregator[Long, ThetaBuf, Array[Byte]] {
  def zero: ThetaBuf = ThetaBuf.empty()
  def reduce(b: ThetaBuf, x: Long): ThetaBuf = { b.u.update(x); b }
  def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = { a.u.union(b.u.getResult); a }
  def finish(b: ThetaBuf): Array[Byte] = b.u.getResult.toByteArray
  def bufferEncoder: Encoder[ThetaBuf] = Encoders.javaSerialization[ThetaBuf]
  def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}

/** `theta_union_agg(sketchBytes)`: union serialized sketches. */
class ThetaUnionAgg extends Aggregator[Array[Byte], ThetaBuf, Array[Byte]] {
  def zero: ThetaBuf = ThetaBuf.empty()
  def reduce(b: ThetaBuf, bytes: Array[Byte]): ThetaBuf = {
    b.u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    b
  }
  def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = { a.u.union(b.u.getResult); a }
  def finish(b: ThetaBuf): Array[Byte] = b.u.getResult.toByteArray
  def bufferEncoder: Encoder[ThetaBuf] = Encoders.javaSerialization[ThetaBuf]
  def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}

/** Intersection buffer: `sk = null` marks the virgin state (the identity of
  * intersection — "everything"), so merging partials is associative.
  */
final class ThetaIBuf(var sk: Array[Byte]) extends Serializable

/** `theta_intersect_agg(sketchBytes)`: intersect serialized sketches. */
class ThetaIntersectAgg extends Aggregator[Array[Byte], ThetaIBuf, Array[Byte]] {
  private def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i: Intersection =
      SetOperation.builder().setLogNominalEntries(ThetaParams.LgK).buildIntersection()
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(a)))
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(b)))
    i.getResult.toByteArray
  }
  def zero: ThetaIBuf = new ThetaIBuf(null)
  def reduce(b: ThetaIBuf, bytes: Array[Byte]): ThetaIBuf = {
    b.sk = if (b.sk == null) bytes else intersect(b.sk, bytes)
    b
  }
  def merge(a: ThetaIBuf, b: ThetaIBuf): ThetaIBuf = {
    if (a.sk == null) a.sk = b.sk
    else if (b.sk != null) a.sk = intersect(a.sk, b.sk)
    a
  }
  def finish(b: ThetaIBuf): Array[Byte] =
    if (b.sk == null) ThetaBuf.empty().u.getResult.toByteArray else b.sk
  def bufferEncoder: Encoder[ThetaIBuf] = Encoders.javaSerialization[ThetaIBuf]
  def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}

object ThetaSketch {
  def sketch(key: Column): Column = udaf(new ThetaAgg, Encoders.scalaLong)(key)

  def union(sk: Column): Column =
    udaf(new ThetaUnionAgg, ExpressionEncoder[Array[Byte]]())(sk)

  def intersect(sk: Column): Column =
    udaf(new ThetaIntersectAgg, ExpressionEncoder[Array[Byte]]())(sk)

  /** Estimate from a serialized sketch (exact below 2^lgK — see above).
    * NULL bytes (an aggregate over zero rows) estimate as 0 — an empty set.
    */
  def estimate(sk: Column): Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) 0.0
      else Sketches.wrapCompactSketch(Memory.wrap(b)).getEstimate
    }
    f(sk)
  }
}
