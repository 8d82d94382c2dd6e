package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Slowly-changing-dimension type-2 merge — the versioned-upsert
  * sibling of the reference's combine_first forecast merge
  * (main.py:245-250 keeps only the latest value; warehouse dimension
  * maintenance must keep the history). Given the current dimension
  * and a batch of updates: no-op updates (same attribute value)
  * produce NO new version, changed keys close the old row
  * (valid_to = batch time) and open a new one. One left join on the
  * key + a per-row explode — a single shuffle at any scale, with the
  * update side broadcastable when small.
  */
object Scd {

  /** p1: customers as the dimension (integer-cent attribute), keys
    * %4 == 0 receive an update, of which keys %8 == 0 are no-ops.
    */
  def p1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cur = Tables.customer(spark, dir)
      .selectExpr("c_custkey", "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS attr")
    val upd = cur.filter($"c_custkey" % 4 === 0)
      .selectExpr("c_custkey",
        "CASE WHEN c_custkey % 8 = 0 THEN attr ELSE attr + 10000 END AS new_attr")
    cur.join(upd, Seq("c_custkey"), "left")
      .selectExpr("c_custkey",
        """explode(CASE
          | WHEN new_attr IS NULL OR new_attr = attr
          |   THEN array(named_struct('attr', attr, 'valid_from', 0L, 'valid_to', CAST(NULL AS BIGINT)))
          | ELSE array(named_struct('attr', attr, 'valid_from', 0L, 'valid_to', 1L),
          |            named_struct('attr', new_attr, 'valid_from', 1L, 'valid_to', CAST(NULL AS BIGINT)))
          | END)""".stripMargin.replace("\n", "") + " AS v")
      .selectExpr("c_custkey", "v.attr AS attr",
        "v.valid_from AS valid_from", "v.valid_to AS valid_to")
      .orderBy($"c_custkey", $"valid_from")
  }

  val p1Sql: String =
    """WITH cur AS (SELECT c_custkey,
      |        CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS attr FROM customer),
      |upd AS (SELECT c_custkey,
      |          CASE WHEN c_custkey % 8 = 0 THEN attr ELSE attr + 10000 END AS new_attr
      |        FROM cur WHERE c_custkey % 4 = 0),
      |j AS (SELECT cur.c_custkey, attr, new_attr FROM cur LEFT JOIN upd USING (c_custkey))
      |SELECT c_custkey, attr, CAST(0 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
      |FROM j WHERE new_attr IS NULL OR new_attr = attr
      |UNION ALL
      |SELECT c_custkey, attr, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      |FROM j WHERE new_attr IS NOT NULL AND new_attr <> attr
      |UNION ALL
      |SELECT c_custkey, new_attr, CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
      |FROM j WHERE new_attr IS NOT NULL AND new_attr <> attr
      |ORDER BY c_custkey, valid_from""".stripMargin
}
