package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.relational.Relational
import graft.operators.{AsOf, EventWindows}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every implemented operator has a `queries` entry; SQL-expressible
  * ones also have a DuckDB `oracleSql` entry with column names/order
  * matching the Spark result exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1 _),
    "q3_join_agg" -> (Relational.q3 _),
    "q5_multijoin" -> (Relational.q5 _),
    "q6_filter_agg" -> (Relational.q6 _),
    "q7_semi_anti" -> (Relational.q7 _),
    "q8_rollup" -> (Relational.q8 _),
    "q9_window" -> (Relational.q9 _),
    "q10_topk_pergroup" -> (Relational.q10 _),
    "q11_asof_join" -> (AsOf.asOfJoin _),
    "q12_range_join" -> (AsOf.rangeJoin _),
    "e1_tumbling" -> (EventWindows.tumbling _),
    "e2_sliding" -> (EventWindows.sliding _),
    "e3_sessionize" -> (EventWindows.sessionize _),
  )

  /** DuckDB-runnable oracle SQL per query key (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1Sql,
    "q3_join_agg" -> Relational.q3Sql,
    "q5_multijoin" -> Relational.q5Sql,
    "q6_filter_agg" -> Relational.q6Sql,
    "q7_semi_anti" -> Relational.q7Sql,
    "q8_rollup" -> Relational.q8Sql,
    "q9_window" -> Relational.q9Sql,
    "q10_topk_pergroup" -> Relational.q10Sql,
    "q11_asof_join" -> AsOf.asOfSql,
    "q12_range_join" -> AsOf.rangeSql,
    "e1_tumbling" -> EventWindows.tumblingSql,
    "e2_sliding" -> EventWindows.slidingSql,
    "e3_sessionize" -> EventWindows.sessionizeSql,
  )
}
