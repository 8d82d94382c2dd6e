package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet per table under the sf dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp. Read it as raw nanos (legacy conf) and
    * convert with integer arithmetic (`div`, not `/` — epoch-nanos
    * exceed a double's exact range) to a microsecond timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
