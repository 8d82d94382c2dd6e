package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Snapshot differencing (change-data-capture between two versions of
  * a table) — the nightly "what changed" pass that feeds incremental
  * downstreams (p3's partial-merge consumes exactly this shape).
  *
  * Scale posture: ONE full-outer equality join on the primary key —
  * at 100 TB both snapshots are written bucketed by pk (SURVEY §8.16 /
  * LayoutSpec's clustered layout), so the diff runs with zero
  * exchanges; unchanged rows (the overwhelming majority of a daily
  * snapshot pair) are dropped by a post-join filter, and nothing else
  * shuffles. The change classification is pure row-local arithmetic.
  */
object Cdc {

  /** p4: diff two synthetic snapshots of `orders` keyed by
    * o_orderkey. Snapshot A (old) lacks pk % 10 == 3 (→ inserts);
    * snapshot B (new) lacks pk % 10 == 4 (→ deletes); B bumps the
    * price for pk % 7 == 0 and flips status for pk % 11 == 0
    * (→ updates). Output: one row per changed key with old/new
    * values; unchanged keys emit nothing. Doubles compare safely:
    * both sides derive from the same parquet bits and the only
    * arithmetic is one IEEE add of an exactly-representable literal.
    */
  def p4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val a = o.filter($"o_orderkey" % 10 =!= 3)
      .select($"o_orderkey".as("pk"), $"o_totalprice".as("old_price"),
        $"o_orderstatus".as("old_status"))
    val b = o.filter($"o_orderkey" % 10 =!= 4)
      .select($"o_orderkey".as("pk"),
        when($"o_orderkey" % 7 === 0, $"o_totalprice" + lit(10.0))
          .otherwise($"o_totalprice").as("new_price"),
        when($"o_orderkey" % 11 === 0, lit("R"))
          .otherwise($"o_orderstatus").as("new_status"))
    a.join(b, Seq("pk"), "full_outer")
      .withColumn("change_type",
        when($"new_price".isNull, lit("delete"))
          .when($"old_price".isNull, lit("insert"))
          .when($"old_price" =!= $"new_price" || $"old_status" =!= $"new_status",
            lit("update"))
          .otherwise(lit("none")))
      .filter($"change_type" =!= "none")
      .select($"pk", $"change_type", $"old_price", $"new_price",
        $"old_status", $"new_status")
      .transform(Tables.ordered(_, $"pk"))
  }

  val p4Sql: String =
    """WITH a AS (SELECT o_orderkey AS pk, o_totalprice AS old_price,
      |             o_orderstatus AS old_status
      |           FROM orders WHERE o_orderkey % 10 <> 3),
      |b AS (SELECT o_orderkey AS pk,
      |        CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
      |             ELSE o_totalprice END AS new_price,
      |        CASE WHEN o_orderkey % 11 = 0 THEN 'R'
      |             ELSE o_orderstatus END AS new_status
      |      FROM orders WHERE o_orderkey % 10 <> 4),
      |j AS (SELECT COALESCE(a.pk, b.pk) AS pk, old_price, new_price,
      |        old_status, new_status
      |      FROM a FULL OUTER JOIN b ON a.pk = b.pk),
      |c AS (SELECT *,
      |        CASE WHEN new_price IS NULL THEN 'delete'
      |             WHEN old_price IS NULL THEN 'insert'
      |             WHEN old_price <> new_price OR old_status <> new_status THEN 'update'
      |             ELSE 'none' END AS change_type
      |      FROM j)
      |SELECT pk, change_type, old_price, new_price, old_status, new_status
      |FROM c WHERE change_type <> 'none'
      |ORDER BY pk""".stripMargin
}
