package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused product-quantization / rotation kernels as native Catalyst
  * expressions.
  *
  * The declarative forms these replace build one Catalyst node PER OUTPUT:
  * OPQ rotation was `array(64 x graft_dot(vec, lit(row)))`, PQ encode was
  * `array(16 x (cc - 2*graft_dot(slice, lit)))` per subspace, the query LUT
  * was 64 separate projection columns. Those trees have two costs that
  * compound at scale: (a) hundreds of literal-array nodes make every
  * analyze/optimize pass seconds-slow on the driver, and (b) inside
  * whole-stage codegen the per-output snippets cannot be split
  * (`splitExpressionsWithCurrentInputs` refuses when inputs are deferred
  * variables), so the generated `processNext` exceeds HotSpot's
  * huge-method bytecode limit and executes in the bytecode INTERPRETER —
  * the profiled cost of the round-14 PQ bench tail. Each kernel here is one
  * small generated loop nest (JIT-friendly), with the weight/codebook
  * literal evaluated ONCE at plan time and attached as a reference object.
  *
  * Exactness contract (the whole SimOps oracle strategy depends on it):
  * every accumulation is the same left-to-right double fold as the
  * composed `graft_dot` forms, distances are `cc - 2.0*dot` evaluated in
  * that order, argmin is first-minimal strict `<`, and the LUT entry is
  * `(selfdot - 2.0*dot) + cc` — bit-equal to the expression chains they
  * replace (asserted in NativeDotSpec).
  *
  * Null semantics: null result if the vector is null or (when the input
  * array type admits element nulls) any scanned element slot is null —
  * the [[FloatArrayFusedNullability]] convention. The weight/codebook
  * argument must be a foldable literal; a null or ragged literal is a
  * plan-time error.
  */
private[functions] abstract class PqFusedBase
    extends BinaryExpression with FloatArrayFusedNullability {

  /** The vector input (left child). */
  def vec: Expression = left
  /** The foldable weights/codebook literal (right child). */
  def weights: Expression = right

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> input, got ${vec.dataType.catalogString}")
    else if (!weights.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable weights literal")
    else weightsCheck
  }

  protected def weightsCheck: TypeCheckResult

  /** Element nullability of the VECTOR only (the weights literal is
    * materialized to primitives at plan time).
    */
  protected final def vecElemsNullable: Boolean = vec.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
  override def nullable: Boolean = vec.nullable || vecElemsNullable

  protected final def float2d(raw: Any): Array[Array[Float]] = {
    val a = raw.asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { i =>
      val r = a.getArray(i)
      Array.tabulate(r.numElements())(j => r.getFloat(j))
    }
  }
}

/** `graft_matvec(vec, W)`: `out[o] = (float) Σ_i v[i]·W[o][i]` — the OPQ
  * rotation (and any dense layer apply) as ONE fused loop nest. `W` is a
  * foldable `ARRAY<ARRAY<FLOAT>>` literal; each output accumulates
  * left-to-right in double then narrows to float, bit-equal to
  * `array(graft_dot(vec, lit(row)).cast("float"), ...)`.
  */
case class MatVec(left: Expression, right: Expression) extends PqFusedBase {

  override def prettyName: String = "graft_matvec"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override protected def weightsCheck: TypeCheckResult = weights.dataType match {
    case ArrayType(ArrayType(FloatType, _), _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName weights must be ARRAY<ARRAY<FLOAT>>, got ${t.catalogString}")
  }

  // Plan-time materialization of the literal: flat row-major float[] plus
  // dims, so codegen indexes a primitive array (no per-row ArrayData walk).
  @transient private lazy val wRows: Array[Array[Float]] =
    float2d(weights.eval(null))
  @transient private lazy val outRows: Int = wRows.length
  @transient private lazy val inDim: Int =
    if (wRows.isEmpty) 0 else wRows(0).length
  @transient private lazy val wFlat: Array[Float] = {
    require(wRows.forall(_.length == inDim), s"$prettyName: ragged weight rows")
    wRows.flatten
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(inDim, x.numElements())
    if (vecElemsNullable) {
      var i = 0
      while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Float](outRows)
    var o = 0
    while (o < outRows) {
      val base = o * inDim
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * wFlat(base + i).toDouble
        i += 1
      }
      out(o) = acc.toFloat
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val x = vecGen.value
    val w = ctx.addReferenceObj("matvecW", wFlat, "float[]")
    val resIsNull = ctx.freshName("mvIsNull")
    val resValue = ctx.freshName("mvValue")
    val n = ctx.freshName("n")
    val out = ctx.freshName("out")
    val o = ctx.freshName("o")
    val i = ctx.freshName("i")
    val base = ctx.freshName("base")
    val acc = ctx.freshName("acc")
    val nullScan =
      if (vecElemsNullable)
        s"for (int $i = 0; $i < $n && !$resIsNull; $i++) { if ($x.isNullAt($i)) $resIsNull = true; }"
      else ""
    val body =
      s"""
         |boolean $resIsNull = ${vecGen.isNull};
         |ArrayData $resValue = null;
         |if (!$resIsNull) {
         |  int $n = java.lang.Math.min($inDim, $x.numElements());
         |  $nullScan
         |  if (!$resIsNull) {
         |    float[] $out = new float[$outRows];
         |    for (int $o = 0; $o < $outRows; $o++) {
         |      int $base = $o * $inDim;
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $acc += ((double) $x.getFloat($i)) * ((double) $w[$base + $i]);
         |      }
         |      $out[$o] = (float) $acc;
         |    }
         |    $resValue = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = vecGen.code + code"$body",
      isNull = if (nullable) JavaCode.isNullVariable(resIsNull) else FalseLiteral,
      value = JavaCode.variable(resValue, dataType))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVec =
    copy(left = newLeft, right = newRight)
}

/** Shared plan-time codebook materialization for the PQ kernels: `cb` is a
  * foldable `ARRAY<ARRAY<ARRAY<FLOAT>>>` literal of shape
  * `[subs][codes][subdim]`; `cc(s,c) = Σ w·w` is the codeword self-dot
  * (the same left-to-right fold as `SimOps.pqCc`).
  */
private[functions] abstract class PqCodebookBase extends PqFusedBase {

  override protected def weightsCheck: TypeCheckResult = weights.dataType match {
    case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName codebook must be ARRAY<ARRAY<ARRAY<FLOAT>>>, got ${t.catalogString}")
  }

  @transient protected lazy val cb: Array[Array[Array[Float]]] = {
    val a = weights.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(s => float2d(a.getArray(s)))
  }
  @transient protected lazy val subs: Int = cb.length
  @transient protected lazy val codes: Int = cb(0).length
  @transient protected lazy val subdim: Int = cb(0)(0).length
  /** Row-major flat codebook: `cbFlat[(s*codes + c)*subdim + i]`. */
  @transient protected lazy val cbFlat: Array[Float] = {
    require(cb.forall(s => s.length == codes && s.forall(_.length == subdim)),
      s"$prettyName: ragged codebook")
    cb.flatten.flatten
  }
  /** `cc(s,c)` flattened as `ccFlat[s*codes + c]`. */
  @transient protected lazy val ccFlat: Array[Double] =
    cb.flatten.map(_.foldLeft(0.0)((acc, w) => acc + w.toDouble * w.toDouble))

  /** Null scan of the vector prefix the kernels read (subs*subdim slots). */
  protected final def scanNulls(x: ArrayData): Boolean = {
    if (!vecElemsNullable) return false
    val n = math.min(subs * subdim, x.numElements())
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return true; i += 1 }
    false
  }

  /** `dot(vec[base..base+subdim), cb(s)(c))` over the in-bounds prefix —
    * identical to `graft_dot(slice(vec, base+1, subdim), lit(codeword))`.
    */
  protected final def subDot(x: ArrayData, base: Int, cbBase: Int): Double = {
    val n = math.min(subdim, math.max(0, x.numElements() - base))
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(base + i).toDouble * cbFlat(cbBase + i).toDouble
      i += 1
    }
    acc
  }
}

/** `graft_pq_encode(vec, cb)`: the PQ code assignment — for each subspace
  * `s`, `code[s] = argmin_c (cc(s,c) - 2.0·dot(vec[s·subdim..), cb[s][c]))`
  * with first-minimal tie-breaking, exactly the
  * `array_position(ds, array_min(ds)) - 1` chain it replaces. Output
  * `ARRAY<INT>` of length `subs`.
  */
case class PqEncode(left: Expression, right: Expression) extends PqCodebookBase {

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    if (scanNulls(x)) return null
    val out = new Array[Int](subs)
    var s = 0
    while (s < subs) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < codes) {
        val d = ccFlat(s * codes + c) - 2.0 * subDot(x, s * subdim, (s * codes + c) * subdim)
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val x = vecGen.value
    val w = ctx.addReferenceObj("pqCb", cbFlat, "float[]")
    val cc = ctx.addReferenceObj("pqCc", ccFlat, "double[]")
    val resIsNull = ctx.freshName("peIsNull")
    val resValue = ctx.freshName("peValue")
    val out = ctx.freshName("out")
    val s = ctx.freshName("s")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val base = ctx.freshName("base")
    val cbBase = ctx.freshName("cbBase")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    val best = ctx.freshName("best")
    val bestC = ctx.freshName("bestC")
    val nullScan =
      if (vecElemsNullable) {
        val j = ctx.freshName("j")
        val m = ctx.freshName("m")
        s"""int $m = java.lang.Math.min(${subs * subdim}, $x.numElements());
           |for (int $j = 0; $j < $m && !$resIsNull; $j++) { if ($x.isNullAt($j)) $resIsNull = true; }""".stripMargin
      } else ""
    val body =
      s"""
         |boolean $resIsNull = ${vecGen.isNull};
         |ArrayData $resValue = null;
         |if (!$resIsNull) {
         |  $nullScan
         |  if (!$resIsNull) {
         |    int[] $out = new int[$subs];
         |    for (int $s = 0; $s < $subs; $s++) {
         |      double $best = Double.POSITIVE_INFINITY;
         |      int $bestC = 0;
         |      int $base = $s * $subdim;
         |      for (int $c = 0; $c < $codes; $c++) {
         |        int $cbBase = ($s * $codes + $c) * $subdim;
         |        int $n = java.lang.Math.min($subdim, java.lang.Math.max(0, $x.numElements() - $base));
         |        double $acc = 0.0;
         |        for (int $i = 0; $i < $n; $i++) {
         |          $acc += ((double) $x.getFloat($base + $i)) * ((double) $w[$cbBase + $i]);
         |        }
         |        double $d = $cc[$s * $codes + $c] - 2.0 * $acc;
         |        if ($d < $best) { $best = $d; $bestC = $c; }
         |      }
         |      $out[$s] = $bestC;
         |    }
         |    $resValue = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = vecGen.code + code"$body",
      isNull = if (nullable) JavaCode.isNullVariable(resIsNull) else FalseLiteral,
      value = JavaCode.variable(resValue, dataType))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_lut(vec, cb)`: the per-query exact ADC lookup table —
  * `lut[s·codes + c] = (dot(sub,sub) - 2.0·dot(sub, cb[s][c])) + cc(s,c)`,
  * the same `(selfdot - 2*dot) + cc` association as the 64 projection
  * columns it replaces. Output `ARRAY<DOUBLE>` of length `subs·codes`;
  * the ADC distance is then `Σ_s lut[s·codes + code_s]` by `element_at`.
  */
case class PqLut(left: Expression, right: Expression) extends PqCodebookBase {

  override def prettyName: String = "graft_pq_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** `dot(sub, sub)` — identical fold to `graft_dot(slice, slice)`. */
  private def selfDot(x: ArrayData, base: Int): Double = {
    val n = math.min(subdim, math.max(0, x.numElements() - base))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(base + i).toDouble
      acc += xi * xi
      i += 1
    }
    acc
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    if (scanNulls(x)) return null
    val out = new Array[Double](subs * codes)
    var s = 0
    while (s < subs) {
      val sd = selfDot(x, s * subdim)
      var c = 0
      while (c < codes) {
        val k = s * codes + c
        out(k) = (sd - 2.0 * subDot(x, s * subdim, k * subdim)) + ccFlat(k)
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val x = vecGen.value
    val w = ctx.addReferenceObj("pqCb", cbFlat, "float[]")
    val cc = ctx.addReferenceObj("pqCc", ccFlat, "double[]")
    val resIsNull = ctx.freshName("plIsNull")
    val resValue = ctx.freshName("plValue")
    val out = ctx.freshName("out")
    val s = ctx.freshName("s")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val k = ctx.freshName("k")
    val base = ctx.freshName("base")
    val acc = ctx.freshName("acc")
    val sd = ctx.freshName("sd")
    val xi = ctx.freshName("xi")
    val nullScan =
      if (vecElemsNullable) {
        val j = ctx.freshName("j")
        val m = ctx.freshName("m")
        s"""int $m = java.lang.Math.min(${subs * subdim}, $x.numElements());
           |for (int $j = 0; $j < $m && !$resIsNull; $j++) { if ($x.isNullAt($j)) $resIsNull = true; }""".stripMargin
      } else ""
    val body =
      s"""
         |boolean $resIsNull = ${vecGen.isNull};
         |ArrayData $resValue = null;
         |if (!$resIsNull) {
         |  $nullScan
         |  if (!$resIsNull) {
         |    double[] $out = new double[${subs * codes}];
         |    for (int $s = 0; $s < $subs; $s++) {
         |      int $base = $s * $subdim;
         |      int $n = java.lang.Math.min($subdim, java.lang.Math.max(0, $x.numElements() - $base));
         |      double $sd = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        double $xi = (double) $x.getFloat($base + $i);
         |        $sd += $xi * $xi;
         |      }
         |      for (int $c = 0; $c < $codes; $c++) {
         |        int $k = $s * $codes + $c;
         |        double $acc = 0.0;
         |        for (int $i = 0; $i < $n; $i++) {
         |          $acc += ((double) $x.getFloat($base + $i)) * ((double) $w[$k * $subdim + $i]);
         |        }
         |        $out[$k] = ($sd - 2.0 * $acc) + $cc[$k];
         |      }
         |    }
         |    $resValue = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = vecGen.code + code"$body",
      isNull = if (nullable) JavaCode.isNullVariable(resIsNull) else FalseLiteral,
      value = JavaCode.variable(resValue, dataType))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLut =
    copy(left = newLeft, right = newRight)
}
