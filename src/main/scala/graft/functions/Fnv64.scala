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

  // ---------- DuckDB mirror (oracle side) ----------
  // The same FNV-1a fold as an inline DuckDB scalar expression —
  // HUGEINT keeps the unsigned 64-bit state ((h ^ b) * prime mod 2^64
  // cannot overflow int128: h < 2^64, prime < 2^41). Valid for ASCII
  // input only (ord(char) == UTF-8 byte); the testdata corpus is
  // ASCII and the queries normalize with lower(trim(..)) first.
  // Inline (not a macro) because the driver's oracle runner executes
  // a single statement.

  private val P2_64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val P2_63 = "CAST('9223372036854775808' AS HUGEINT)"

  /** Unsigned FNV-1a state in [0, 2^64) as a HUGEINT expression. */
  def duckUnsigned(e: String): String =
    s"list_reduce([CAST('14695981039346656037' AS HUGEINT)] || " +
      s"list_transform(range(1, length($e) + 1), i -> CAST(ord(substr($e, i, 1)) AS HUGEINT)), " +
      s"(acc, b) -> (xor(acc, b) * CAST('1099511628211' AS HUGEINT)) % $P2_64)"

  /** Two's-complement BIGINT view, matching [[hashBytes]] bitwise. */
  def duckSigned(e: String): String = {
    val hu = duckUnsigned(e)
    s"CAST(CASE WHEN $hu >= $P2_63 THEN $hu - $P2_64 ELSE $hu END AS BIGINT)"
  }

  /** Signed view of an already-computed unsigned HUGEINT column. */
  def duckToSigned(hu: String): String =
    s"CAST(CASE WHEN $hu >= $P2_63 THEN $hu - $P2_64 ELSE $hu END AS BIGINT)"
}
