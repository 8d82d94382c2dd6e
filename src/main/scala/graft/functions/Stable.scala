package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic float aggregation.
  *
  * Problem: `sum(double)` accumulates in partition order, so Spark and
  * an oracle engine produce doubles differing in the last ulps; any
  * post-hoc `round()` then flips at half-point boundaries (observed on
  * `round(avg(value), 4)`).
  *
  * Fix: integerize per row — `round(x * 10^p)` on *identical* input
  * doubles is identical in every engine (both round half away from
  * zero) — sum exactly as BIGINT (associative, order-free), and divide
  * back by the same power of ten. Every step is bitwise deterministic,
  * so results hash-match without tolerances. Choose `p` at (or above)
  * the decimal grain of the data; for arbitrary doubles any fixed `p`
  * is still deterministic, merely quantized.
  *
  * The same construction in SQL: [[sumSql]] / [[avgSql]].
  */
object Stable {
  private def pow10(p: Int): Double = math.pow(10, p)

  /** Order-independent sum of a float column at 10^-p quantization.
    * floor(x+0.5) instead of round(): identical for the non-negative
    * money/measure columns it is used on, and ~5x cheaper (Spark's
    * Round on doubles goes through BigDecimal).
    */
  def dsum(c: Column, p: Int): Column =
    sum(floor(c * pow10(p) + lit(0.5)).cast("long")) / lit(pow10(p))

  /** Order-independent average (quantized sum / exact count). */
  def davg(c: Column, p: Int): Column =
    dsum(c, p) / count(lit(1))

  /** SQL text of [[dsum]] for the DuckDB oracle. (The inner sum is
    * re-cast: DuckDB widens sum(BIGINT) to HUGEINT, which must not
    * leak into the result schema.)
    */
  def sumSql(x: String, p: Int): String =
    s"CAST(sum(CAST(floor(($x) * 1e$p + 0.5) AS BIGINT)) AS BIGINT) / 1e$p"

  /** SQL text of [[davg]]. */
  def avgSql(x: String, p: Int): String =
    s"${sumSql(x, p)} / count(*)"
}
