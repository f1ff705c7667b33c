package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static normalization kernel shared by the interpreted and generated
  * paths — one definition, no eval-mode drift (the [[JaroWinklerFn]]
  * pattern). The fast path skips the (allocating) normalizer when the
  * string is already in the requested form, which `Normalizer.isNormalized`
  * answers without building the result — on ASCII corpora every row takes
  * this branch, so the expression costs one linear scan.
  */
object UnicodeNormalizeFn {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** Unicode canonical/compatibility normalization (NFC/NFD/NFKC/NFKD) as a
  * native codegen'd Catalyst expression — the text-canonicalization step
  * multilingual corpora need ahead of exact/near dedup: visually identical
  * strings in different codepoint forms (é vs e+COMBINING ACUTE) otherwise
  * land in different fingerprint classes. Composes with built-ins for the
  * rest of the cleanup (accent folding = NFD → strip \p{Mn} → NFC;
  * zero-width strip = one regexp_replace), so this one expression is the
  * only new kernel. DuckDB's nfc_normalize pins the NFC path in the
  * oracle; the other forms are unit-tested against java.text.Normalizer
  * directly.
  *
  * Null-safe: null input → null. `form` is a case-sensitive literal
  * (NFC|NFD|NFKC|NFKD), validated at analysis time.
  */
case class UnicodeNormalize(child: Expression, formName: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(formName))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be NFC|NFD|NFKC|NFKD, got '$formName'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_unicode_normalize"

  @transient private lazy val form = Normalizer.Form.valueOf(formName)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalizeFn.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.expressions.UnicodeNormalizeFn.normalize(" +
        s"$in, java.text.Normalizer.Form.$formName)")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
