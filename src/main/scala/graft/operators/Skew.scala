package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5): when a group-by key is
  * pathologically hot (one user, one grid cell, one dedup bucket),
  * hash-partitioning alone puts the whole key on one task. Salting
  * splits each key into `buckets` sub-keys for a partial aggregate,
  * then reduces the partials — two small shuffles instead of one
  * skewed one. AQE's skew-join handling covers joins; this covers
  * aggregations, which AQE does not rebalance.
  */
object Skew {

  /** Two-phase salted sum/count aggregate: exact results for
    * decomposable aggregates. `aggs` maps output column -> the column
    * to sum. Counts ride along as sum(1).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], buckets: Int,
      aggs: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.keys.map(n => sum(col(n)).as(n)).toSeq: _*)
  }

  /** Salted equi-join for a skewed build side: the skewed (large)
    * side gets a random salt in [0, buckets); the small side is
    * replicated once per salt value via an explode — turning one hot
    * key's single reduce partition into `buckets` of them. Exact for
    * any join type expressible as inner on (keys, salt): every
    * (large-row, small-row) pair meets in exactly one bucket.
    * This is the manual fallback; AQE's skewedJoin handles the
    * common cases (spec asserts both).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<long>")))
    saltedLarge.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Split-and-broadcast inner join for a skewed PROBE side against a
    * build side whose keys are UNIQUE (≤ 1 build row per key) — the
    * iterative-graph case: pointer jumping's late rounds concentrate
    * most probe rows on a few root keys, so hash-partitioning the
    * join puts ~all of a root's rows on one task. Because build keys
    * are unique, the build rows for hot keys number at most |hot| —
    * so the scale-correct fix is NOT buckets× replication
    * ([[saltedJoin]]'s trade) but a split: detect hot keys with a
    * partial-agg-safe count (the hot key's partials spread across
    * tasks, so the detector itself cannot straggle), BROADCAST the
    * few hot build rows to the probe (narrow, no shuffle of the hot
    * rows at all), and shuffle-join only the cold remainder — where
    * every key now contributes ≤ hotThreshold rows, which bounds any
    * task's per-key input. Exact: hot and cold probe rows partition
    * the probe, each meets its unique build row exactly once.
    * |hot| ≤ probe.count / hotThreshold keys, so the broadcast is
    * bounded by construction.
    */
  def hotKeyJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, hotThreshold: Long): DataFrame = {
    val hot = probe.groupBy(col(probeKey)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotThreshold)
      .select(col(probeKey).as("_hotkey"))
    val hotBuild = build.join(broadcast(hot),
      col(buildKey) === col("_hotkey"), "left_semi")
    val hotPart = probe.join(broadcast(hotBuild),
      col(probeKey) === col(buildKey))
    val coldPart = probe.join(broadcast(hot),
        col(probeKey) === col("_hotkey"), "left_anti")
      .join(build, col(probeKey) === col(buildKey))
    hotPart.unionByName(coldPart)
  }
}
