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
}
