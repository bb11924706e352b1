package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization of a string column to
  * a canonical/compatibility form (`NFC`/`NFD`/`NFKC`/`NFKD`).
  *
  * Spark ships no normalization function, yet it is the FIRST transform of
  * every text-corpus build: without it, byte-level dedup/hashing treats the
  * composed (`U+00E9`) and decomposed (`e` + `U+0301`) spellings of the
  * same text as different documents, silently halving dedup recall on
  * mixed-provenance crawls. The form argument must be a foldable literal —
  * it is resolved ONCE at plan time to a `java.text.Normalizer.Form`, and
  * the per-row work is a single static `Normalizer.normalize` call inlined
  * into the surrounding whole-stage-codegen stage (no UDF boxing, null
  * handling via the standard nullSafe wrappers). Zero shuffle; the scrub
  * runs map-side at any scale, same class as the PII redaction pass.
  *
  * DuckDB twin for the NFC form: `nfc_normalize(s)` — both engines
  * implement the Unicode standard's canonical composition, so outputs are
  * byte-identical and oracle-hashable.
  */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, STRING literal form), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form argument must be a literal")
    else {
      val f = right.eval(null)
      val name = if (f == null) null else f.toString.toUpperCase
      if (name == null || !Seq("NFC", "NFD", "NFKC", "NFKD").contains(name))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName form must be one of NFC/NFD/NFKC/NFKD, got $f")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(right.eval(null).toString.toUpperCase)

  override protected def nullSafeEval(s: Any, f: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(s.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The form is plan-time constant: bake the enum lookup into a codegen
    // reference instead of re-parsing the literal per row.
    val formRef = ctx.addReferenceObj("form", form, classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(), $formRef));
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(left = newLeft, right = newRight)
}
