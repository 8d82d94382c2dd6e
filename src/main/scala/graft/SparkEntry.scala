package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.relational.Relational
import graft.operators.{AsOf, Dedup, EventWindows, Knn, TextStats, Weather}

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
    "q15_cube" -> (Relational.q15 _),
    "q16_setops" -> (Relational.q16 _),
    "q11_asof_join" -> (AsOf.asOfJoin _),
    "q12_range_join" -> (AsOf.rangeJoin _),
    "q13_asof_custom" -> (AsOf.asOfJoinCustom _),
    "q14_range_custom" -> (AsOf.rangeJoinCustom _),
    "e1_tumbling" -> (EventWindows.tumbling _),
    "e2_sliding" -> (EventWindows.sliding _),
    "e3_sessionize" -> (EventWindows.sessionize _),
    "w1_wind_speed" -> (Weather.w1 _),
    "w2_solar_cza" -> (Weather.w2 _),
    "w3_erbs" -> (Weather.w3 _),
    "w4_mrt" -> (Weather.w4 _),
    "w5_vapor_pressure" -> (Weather.w5 _),
    "w6_utci" -> (Weather.w6 _),
    "w7_wbgt" -> (Weather.w7 _),
    "w8_encode" -> (Weather.w8 _),
    "w9_forecast_merge" -> (Weather.w9 _),
    "w10_near_land" -> (Weather.w10 _),
    "w11_hour_angle_shift" -> (Weather.w11 _),
    "w12_daily_extremes" -> (Weather.w12 _),
    "w13_forecast_docs" -> (Weather.w13 _),
    "w14_contour_bins" -> (Weather.w14 _),
    "t1_token_count" -> (TextStats.t1 _),
    "t2_quality" -> (TextStats.t2 _),
    "t3_lang_id" -> (TextStats.t3 _),
    "t4_fingerprint" -> (TextStats.t4 _),
    "t5_chunking" -> (TextStats.t5 _),
    "t6_vocab" -> (TextStats.t6 _),
    "t7_redact" -> (TextStats.t7 _),
    "t8_split" -> (TextStats.t8 _),
    "t9_pack" -> (TextStats.t9 _),
    "d1_dedup_exact" -> (Dedup.d1 _),
    "d2_minhash_lsh" -> (Dedup.d2 _),
    "d3_simhash" -> (Dedup.d3 _),
    "d4_ngram_jaccard" -> (Dedup.d4 _),
    "d5_embed_neardup" -> (Dedup.d5 _),
    "d6_components" -> (Dedup.d6 _),
    "v1_knn_brute" -> (Knn.v1 _),
    "v2_knn_lsh" -> (Knn.v2 _),
    "v3_knn_ivf" -> (Knn.v3 _),
    "v4_kmeans" -> (Knn.v4 _),
    "m1_media_meta" -> (graft.operators.Media.m1 _),
    "s1_stream_tumbling" -> (graft.streaming.EventStreams.s1 _),
    "s2_stream_sessions" -> (graft.streaming.EventStreams.s2 _),
    "s3_stream_dedup" -> (graft.streaming.EventStreams.s3 _),
    "s4_stream_interval_join" -> (graft.streaming.EventStreams.s4 _),
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
    "q15_cube" -> Relational.q15Sql,
    "q16_setops" -> Relational.q16Sql,
    "q11_asof_join" -> AsOf.asOfSql,
    "q12_range_join" -> AsOf.rangeSql,
    "q13_asof_custom" -> AsOf.asOfSql,
    "q14_range_custom" -> AsOf.rangeSql,
    "e1_tumbling" -> EventWindows.tumblingSql,
    "e2_sliding" -> EventWindows.slidingSql,
    "e3_sessionize" -> EventWindows.sessionizeSql,
    "w1_wind_speed" -> Weather.w1Sql,
    "w2_solar_cza" -> Weather.w2Sql,
    "w3_erbs" -> Weather.w3Sql,
    "w4_mrt" -> Weather.w4Sql,
    "w5_vapor_pressure" -> Weather.w5Sql,
    "w6_utci" -> Weather.w6Sql,
    "w7_wbgt" -> Weather.w7Sql,
    "w8_encode" -> Weather.w8Sql,
    "w9_forecast_merge" -> Weather.w9Sql,
    "w10_near_land" -> Weather.w10Sql,
    "w11_hour_angle_shift" -> Weather.w11Sql,
    "w12_daily_extremes" -> Weather.w12Sql,
    "w13_forecast_docs" -> Weather.w13Sql,
    "w14_contour_bins" -> Weather.w14Sql,
    "t1_token_count" -> TextStats.t1Sql,
    "t2_quality" -> TextStats.t2Sql,
    "t3_lang_id" -> TextStats.t3Sql,
    "t5_chunking" -> TextStats.t5Sql,
    "t6_vocab" -> TextStats.t6Sql,
    "t7_redact" -> TextStats.t7Sql,
    "t8_split" -> TextStats.t8Sql,
    "t9_pack" -> TextStats.t9Sql,
    "d1_dedup_exact" -> Dedup.d1Sql,
    "d5_embed_neardup" -> Dedup.d5Sql,
    "d6_components" -> Dedup.d6Sql,
    "v1_knn_brute" -> Knn.v1Sql,
    "s1_stream_tumbling" -> graft.streaming.EventStreams.s1Sql,
    "s2_stream_sessions" -> graft.streaming.EventStreams.s2Sql,
    "s3_stream_dedup" -> graft.streaming.EventStreams.s3Sql,
    "s4_stream_interval_join" -> graft.streaming.EventStreams.s4Sql,
  )
}
