package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical decomposition +
  * canonical composition) as a native Catalyst expression with
  * whole-stage codegen — the text-canonicalization primitive a
  * corpus pipeline runs BEFORE hashing/dedup, so the composed
  * ("é" U+00E9) and decomposed ("e"+U+0301) spellings of the same
  * document collapse to one byte sequence (SURVEY.md §2 t31).
  * Spark has no built-in normalizer; the Fnv64Expr discipline
  * applies: a custom `Expression` (not a Scala UDF) keeps the call
  * inside generated code — no serialization, no boxing, fuses with
  * the surrounding projection. Canonical composition is fully
  * specified by Unicode (and stable across versions by policy), so
  * the JDK's `java.text.Normalizer` and DuckDB's utf8proc-based
  * `nfc_normalize` land identical bytes — the cross-engine oracle.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize a UTF8String. The already-normalized fast path
    * (every ASCII string, and in practice most web text) returns the
    * INPUT object — `Normalizer.isNormalized` is a single quick-check
    * scan with no allocation, so the common case costs one pass and
    * zero copies; only strings carrying decomposed sequences pay the
    * String round-trip.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API: `nfc($"text")`. */
  def nfc(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NfcNormalizeExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}
