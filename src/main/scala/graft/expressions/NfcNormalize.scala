package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen'd expression — the text-canonicalization step a multilingual
  * corpus needs before hashing/dedup: the same visible text arrives in
  * both composed ("é") and decomposed ("e" + U+0301) forms, and every
  * fingerprint/shingle/token operator downstream would otherwise treat
  * them as distinct documents. The reference normalizes its diacritic
  * table to NFC single-codepoint forms (text_utils.py:14-23, mirrored
  * in functions/Text.scala); this expression is the general-purpose
  * kernel for corpora where a static table cannot cover the input.
  *
  * Scan-side, zero-shuffle, whole-stage-codegen friendly: compiles to
  * one `java.text.Normalizer.normalize` call per row inside the
  * generated loop (a UDF would break codegen and add ser/de per row).
  * The common all-ASCII case is short-circuited with
  * `Normalizer.isNormalized`, which for NFC is a single latin-1 fast
  * scan — no allocation for already-normal text.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_nfc"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** JVM kernel shared by interpreted eval and codegen. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
