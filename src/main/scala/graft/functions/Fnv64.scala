package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit rolling hash over a string's UTF-8 bytes, as a native
  * Catalyst expression with whole-stage codegen — the document
  * fingerprint primitive (SURVEY.md §2 t4). A custom `Expression`
  * (not a Scala UDF) keeps the hot path inside generated code: no
  * serialization, no boxing, fuses with the surrounding projection.
  */
case class Fnv64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Fnv64.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64Expr =
    copy(child = newChild)
}

object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** Column API: `fnv64(lower(trim($"text")))`. */
  def fnv64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      Fnv64Expr(org.apache.spark.sql.GraftBridge.expression(c)))
}
