package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, lit}
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

  /** p6: MERGE INTO — the type-1 lakehouse write primitive next to
    * p1's type-2 (history-keeping) merge and p4's diff REPORT: given
    * the current table and a change feed carrying updates, deletes
    * and inserts, produce the post-merge table state in clause order
    * (WHEN MATCHED AND del THEN DELETE / WHEN MATCHED THEN UPDATE /
    * WHEN NOT MATCHED THEN INSERT), with an `action` column for the
    * write audit. Deterministic feed: target keys %3 update (+5000
    * cents), %7 delete (delete wins on %21 overlap, mirroring clause
    * order), and an %11-derived disjoint key range inserts.
    *
    * Scale shape: ONE full-outer equality join on the pk + row-local
    * clause arithmetic — identical posture to p4: broadcastable feed
    * when small, zero-exchange under §8.16's pk-bucketed layout, and
    * the output partitioning is the join's, so writing back
    * pk-bucketed is free. No windows, no history rescan.
    */
  def p6(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tgt = Tables.customer(spark, dir)
      .selectExpr("c_custkey AS k", "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS attr")
    val feed = tgt.filter($"k" % 3 === 0 || $"k" % 7 === 0)
      .selectExpr("k",
        "CASE WHEN k % 7 = 0 THEN CAST(NULL AS BIGINT) ELSE attr + 5000 END AS new_attr",
        "k % 7 = 0 AS del")
      .unionByName(tgt.filter($"k" % 11 === 0)
        .selectExpr("k + 1000000 AS k", "CAST(777 AS BIGINT) AS new_attr", "false AS del"))
    tgt.join(feed, Seq("k"), "full_outer")
      .filter(!coalesce($"del", lit(false)))
      .selectExpr("k",
        "CASE WHEN attr IS NULL OR new_attr IS NOT NULL THEN new_attr ELSE attr END AS attr_out",
        """CASE WHEN attr IS NULL THEN 'inserted'
          |     WHEN del IS NULL THEN 'kept'
          |     ELSE 'updated' END""".stripMargin.replace("\n", " ") + " AS action")
      .selectExpr("k", "attr_out AS attr", "action")
      .orderBy($"k")
  }

  /** p6 oracle: the same clause arithmetic over a full outer join. */
  val p6Sql: String =
    """WITH tgt AS (SELECT c_custkey AS k,
      |        CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS attr FROM customer),
      |feed AS (SELECT k,
      |           CASE WHEN k % 7 = 0 THEN CAST(NULL AS BIGINT) ELSE attr + 5000 END AS new_attr,
      |           k % 7 = 0 AS del
      |         FROM tgt WHERE k % 3 = 0 OR k % 7 = 0
      |         UNION ALL
      |         SELECT k + 1000000, CAST(777 AS BIGINT), false FROM tgt WHERE k % 11 = 0),
      |j AS (SELECT coalesce(tgt.k, feed.k) AS k, tgt.attr, feed.new_attr, feed.del
      |      FROM tgt FULL OUTER JOIN feed ON tgt.k = feed.k)
      |SELECT k,
      |  CASE WHEN attr IS NULL OR new_attr IS NOT NULL THEN new_attr ELSE attr END AS attr,
      |  CASE WHEN attr IS NULL THEN 'inserted'
      |       WHEN del IS NULL THEN 'kept'
      |       ELSE 'updated' END AS action
      |FROM j
      |WHERE NOT coalesce(del, false)
      |ORDER BY k""".stripMargin
}
