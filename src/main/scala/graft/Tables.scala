package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet per table under the sf dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The driver's testdata has shipped two parquet timestamp layouts:
    * TIMESTAMP(NANOS) (unreadable as a Spark timestamp — the legacy
    * nanosAsLong conf exposes raw BIGINT nanos) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers
    * as TIMESTAMP_NTZ by default. Every operator (and every oracle)
    * assumes session-zone TimestampType, so disable NTZ inference —
    * the micros columns then read natively as TimestampType (the
    * session runs UTC, so the instant is identical) and parquet
    * filter pushdown keeps working (a post-scan NTZ→LTZ cast would
    * block it).
    */
  private[graft] def tsConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    tsConfs(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts`: under the legacy TIMESTAMP(NANOS) layout it reads
    * as raw BIGINT nanos and needs integer conversion (`div`, not `/`
    * — epoch-nanos exceed a double's exact range) to a microsecond
    * timestamp; under the current micros layout [[load]]'s confs make
    * it a plain TimestampType already.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Deterministic total order for presentation/verify output:
    * repartition(1) + partition sort instead of a global orderBy —
    * RangePartitioning's sampling pass re-executes the whole upstream
    * pipeline (measured ~2x on the thermal chain); a single-partition
    * sort of an already-computed result does not. Output sizes here
    * are bounded (aggregates or <=1M rows), so one reduce task is fine.
    */
  def ordered(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(if (s.length == 10) s + " 00:00:00" else s)
}
