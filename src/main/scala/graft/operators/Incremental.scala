package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental aggregate maintenance — the daily-ingest pattern that
  * makes 100 TB stores affordable: per-key stats are kept as ALGEBRAIC
  * partials (count + exact integerized sum), so a new day's partial
  * merges into the historical partial with one outer join — history is
  * never rescanned. The reference recomputes its whole grid per run;
  * this is the shape that wouldn't.
  */
object Incremental {

  /** p3: maintain per-user (count, sum) across an ingest boundary —
    * history (day < 15) and the new arrival (day ≥ 15) aggregate
    * independently, then merge by pure partial addition (coalesce +
    * add on the integer state; the float division happens ONCE at
    * presentation). The oracle is the DIRECT full recompute, so the
    * correctness check IS the merge-equals-recompute theorem; the
    * integerized sum (§8.1) is what makes the partial exactly
    * mergeable in any order.
    */
  def p3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "CAST(extract(DOY FROM ts) AS BIGINT) AS day", "value")
    def part(pred: String) = ev.filter(pred).groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 1e2 + 0.5) AS BIGINT)")).as("c2"))
    part("day < 15")
      .select($"user_id", $"n".as("n_a"), $"c2".as("c_a"))
      .join(part("day >= 15")
        .select($"user_id", $"n".as("n_b"), $"c2".as("c_b")),
        Seq("user_id"), "full_outer")
      .selectExpr("user_id",
        "coalesce(n_a, CAST(0 AS BIGINT)) + coalesce(n_b, CAST(0 AS BIGINT)) AS n_events",
        "(coalesce(c_a, CAST(0 AS BIGINT)) + coalesce(c_b, CAST(0 AS BIGINT))) / 1e2 AS sum_value")
      .transform(Tables.ordered(_, $"user_id"))
  }

  /** The direct recompute — proving the merged partials equal it. */
  val p3Sql: String =
    s"""SELECT user_id, count(*) AS n_events,
      |  ${graft.functions.Stable.sumSql("value", 2)} AS sum_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin
}
