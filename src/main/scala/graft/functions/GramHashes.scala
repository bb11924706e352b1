package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-n-gram machinery for `dedup_repeated_spans`
  * (reference scale analog: the ExactSubstr dedup family — Lee et al. 2021).
  *
  * The declarative pass-1 form
  * `array_distinct(transform(sequence(1, len-n+1), i -> xxhash64(substring(tx, i, n))))`
  * is semantically right but quadratic in practice: `substring(tx, i, n)` on
  * a UTF8String seeks from byte 0 to codepoint i on EVERY call (multibyte
  * awareness), so a doc of L characters pays O(L^2) byte scans, and the
  * HigherOrderFunction chain is a CodegenFallback that boxes every element.
  * Both expressions here walk the codepoint boundaries ONCE (O(L)), then
  * slice grams off the precomputed offsets.
  *
  * Hash compatibility is load-bearing: [[GramHashes]] feeds a join against
  * `xxhash64(gram)` computed by stock Spark in pass 2, so it hashes each
  * gram's UTF8 bytes with the same XXH64 core and the same seed 42 as
  * Spark's `xxhash64` — bit-identical values by construction
  * (GramHashesSpec asserts equality against the declarative form).
  */
abstract class GramExprBase extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, INT), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Byte offset of each codepoint boundary: offs(0..numChars), with
    * offs(numChars) = numBytes — one O(L) walk.
    */
  protected final def charOffsets(s: UTF8String): (Array[Int], Int) = {
    val numBytes = s.numBytes()
    val offs = new Array[Int](numBytes + 1)
    var nc = 0
    var i = 0
    while (i < numBytes) {
      offs(nc) = i
      nc += 1
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
    }
    offs(nc) = numBytes
    (offs, nc)
  }
}

/** `graft_gram_hashes(str, n)` → ARRAY<BIGINT>: the DISTINCT xxhash64
  * (seed 42) values of every n-character gram of `str`, first-occurrence
  * order. Exactly the distinct set pass 1 of `dedup_repeated_spans` needs —
  * within-doc dedup happens here, map-side, with only 8-byte hashes ever
  * leaving the row.
  */
case class GramHashes(left: Expression, right: Expression)
    extends GramExprBase {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_gram_hashes"

  def compute(sAny: Any, nAny: Any): ArrayData = {
    val s = sAny.asInstanceOf[UTF8String]
    val n = nAny.asInstanceOf[Int]
    val (offs, nc) = charOffsets(s)
    if (n <= 0 || nc < n) return new GenericArrayData(Array.emptyLongArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nGrams = nc - n + 1
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    val out = new Array[Long](nGrams)
    var m = 0
    var g = 0
    while (g < nGrams) {
      val b0 = offs(g)
      val h = XXH64.hashUnsafeBytes(base, off + b0, offs(g + n) - b0, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      g += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def nullSafeEval(sAny: Any, nAny: Any): Any =
    compute(sAny, nAny)

  // Keeps the surrounding stage in whole-stage codegen: the generated code
  // calls back into this expression instance (a broadcast-safe reference
  // object); the O(L) loop itself is plain JVM code either way.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) => {
      val ref = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($s, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashes =
    copy(left = newLeft, right = newRight)
}

/** `graft_grams(str, n)` → ARRAY<STRING>: every n-character gram of `str`
  * in position order (duplicates kept — pass 2 re-derives (gram, hash)
  * pairs per representative doc). Each gram is an O(gram-bytes) copy off
  * the single offset walk, never a seek-from-zero substring.
  */
case class Grams(left: Expression, right: Expression) extends GramExprBase {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_grams"

  def compute(sAny: Any, nAny: Any): ArrayData = {
    val s = sAny.asInstanceOf[UTF8String]
    val n = nAny.asInstanceOf[Int]
    val (offs, nc) = charOffsets(s)
    if (n <= 0 || nc < n)
      return new GenericArrayData(Array.empty[AnyRef])
    val bytes = s.getBytes // one materialization; grams copy slices of it
    val nGrams = nc - n + 1
    val out = new Array[AnyRef](nGrams)
    var g = 0
    while (g < nGrams) {
      out(g) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(g), offs(g + n)))
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(sAny: Any, nAny: Any): Any =
    compute(sAny, nAny)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) => {
      val ref = ctx.addReferenceObj("grams", this, classOf[Grams].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($s, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Grams =
    copy(left = newLeft, right = newRight)
}
