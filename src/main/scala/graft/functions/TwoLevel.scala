package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level (salted) top-k hierarchy used wherever partitions
  * are FEW and a single per-partition window would rank a
  * partition's every row in one task (the q26/t9 scan decomposition
  * applied to ranking): level 0 ranks within (part, salt) — `salts`
  * bounded windows per partition — and level 1 re-ranks the
  * ≤ salts×k salt survivors.
  *
  * Correctness invariant, kept in THIS one audited place (the
  * per-operator copies drifted by construction): level 0 must keep
  * AT LEAST the final k rows under EXACTLY the final order columns.
  * Then every global top-k row is its salt group's local top-≤k row
  * and survives level 0, so level 1 sees all of them — output is
  * row-identical to the single-window plan.
  */
object TwoLevel {

  /** Top-k rows per `part` group under `order`, rank exposed as
    * `rankName` (1-based, dense in arrival order of `order`).
    * `saltSrc` must be a deterministic per-row expression (an id) so
    * the salt split is stable across runs.
    */
  def topK(df: DataFrame, part: Seq[Column], order: Seq[Column],
           saltSrc: Column, k: Int, rankName: String = "rnk",
           salts: Int = 32): DataFrame = {
    val w0 = Window.partitionBy(part :+ col("__salt"): _*).orderBy(order: _*)
    val w1 = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn("__salt", pmod(saltSrc, lit(salts)))
      .withColumn("__rn0", row_number().over(w0)).filter(col("__rn0") <= k)
      .withColumn(rankName, row_number().over(w1)).filter(col(rankName) <= k)
      .drop("__salt", "__rn0")
  }
}
