package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two FLOAT-array columns
  * in ONE fused loop (three accumulators: a·b, a·a, b·b), with whole-stage
  * codegen.
  *
  * The composed form `graft_dot(a,b) / (sqrt(graft_dot(a,a)) *
  * sqrt(graft_dot(b,b)))` traverses the arrays three times; the ANN re-rank
  * stage (`sim_ann_lsh_topk`, `sim_ann_ivf_topk`, `sim_cosine_*`) computes
  * this per candidate pair, so at corpus scale the fusion removes two thirds
  * of the hot-loop memory traffic. Accumulation is left-to-right per
  * accumulator and the final arithmetic is the identical expression tree, so
  * the result is BIT-EQUAL to the composed form (asserted in NativeDotSpec)
  * and DuckDB-oracle-safe.
  *
  * Semantics: null if either array is null OR any scanned element slot is
  * null (parquet lists declare nullable elements; a null slot read as
  * getFloat would be garbage, so element nulls propagate to a null result —
  * identical to the composed zip_with form); common prefix on ragged arrays
  * (our embeddings are fixed 64-dim); zero vectors yield NaN (0/0) exactly
  * like the composed form.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayFusedNullability {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    var anyNull = false
    while (i < n && !anyNull) {
      if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
      else {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        ab += xi * yi
        aa += xi * xi
        bb += yi * yi
        i += 1
      }
    }
    if (anyNull) null else ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Standard-contract codegen — see [[FloatArrayFusedNullability]]: fresh
    * locals only, result surfaced via `ev.copy`, caller's `ev.isNull` never
    * written; null-element scan dropped when neither input declares
    * `containsNull`.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = leftGen.value
    val b = rightGen.value
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val ab = ctx.freshName("ab")
    val aa = ctx.freshName("aa")
    val bb = ctx.freshName("bb")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val resIsNull = ctx.freshName("cosIsNull")
    val resValue = ctx.freshName("cosValue")
    val elemCheck =
      if (elemsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $resIsNull = true; break; }"
      else ""
    val body =
      s"""
         |boolean $resIsNull = ${leftGen.isNull} || ${rightGen.isNull};
         |double $resValue = 0.0;
         |if (!$resIsNull) {
         |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemCheck
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
         |  }
         |  if (!$resIsNull) {
         |    $resValue = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = leftGen.code + rightGen.code + code"$body",
      isNull = if (nullable) JavaCode.isNullVariable(resIsNull) else FalseLiteral,
      value = JavaCode.variable(resValue, DoubleType))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
