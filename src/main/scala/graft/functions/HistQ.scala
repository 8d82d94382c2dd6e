package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mergeable equi-width histogram quantile sketch — ONE
  * implementation for the batch query (q34) and the streaming twin
  * (s22), the Hll/Cms sharing contract applied to rank estimation:
  * the [[histogram]] aggregate IS the streaming state (≤ [[buckets]]
  * counts, bounded forever, merge = cell-wise sum — no watermark,
  * counts only grow), and [[locate]] turns any such histogram into
  * per-permille bucket estimates with the cumulative bounds that
  * prove the one-bucket rank guarantee.
  *
  * Determinism: bucketing is `floor(value / width)` clamped to the
  * top bucket — exact in both engines for the parquet doubles; all
  * downstream arithmetic is BIGINT (cross-multiplied rank location,
  * no division).
  */
object HistQ {

  val buckets = 256

  /** The corpus→histogram aggregate: ≤ [[buckets]] rows move per
    * executor (map-side partial sum) regardless of input size.
    * BOTH sides clamp — without the floor clamp, negative values
    * would mint one cell per distinct bucket and break the bounded
    * streaming-state contract the sketch exists for. NULLs are
    * EXCLUDED — without the filter, floor(NULL/w) is NULL and both
    * engines' least/greatest skip NULLs, so NULL values would land
    * in the TOP bucket (and inflate n_rows): consistent cross-engine
    * but a wrong semantic for a reusable rank sketch.
    */
  def histogram(df: DataFrame, valueExpr: String, width: Long): DataFrame =
    df.filter(s"($valueExpr) IS NOT NULL")
      .selectExpr(
        s"greatest(CAST(0 AS BIGINT), least(${buckets - 1}, CAST(floor(($valueExpr) / $width) AS BIGINT))) AS bucket")
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Locate each requested permille in a (bucket, cnt) histogram:
    * first bucket whose cumulative count reaches q·n/1000, upper
    * value edge as the estimate, bracketing cumulative counts as the
    * rank-guarantee proof. The struct-argmin keeps the located
    * bucket's bounds in the SAME aggregate — no join back to the
    * histogram (which would recompute its subtree).
    */
  def locate(hist: DataFrame, width: Long, qs: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val w = Window.orderBy($"bucket") // ≤ buckets rows: metadata grain
    val c = hist
      .withColumn("cum", sum($"cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum($"cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qdf = spark.createDataFrame(qs.map(Tuple1(_))).toDF("q_permille")
    c.crossJoin(broadcast(qdf))
      .filter($"cum" * 1000 >= $"q_permille" * $"tot")
      .groupBy($"q_permille")
      .agg(min(struct($"bucket", ($"cum" - $"cnt").as("cum_before"), $"cum".as("cum_incl"))).as("s"),
        max($"tot").as("n_rows"))
      .selectExpr("q_permille", "s.bucket AS bucket",
        s"(s.bucket + 1) * $width AS est_hi",
        "s.cum_before AS cum_before", "s.cum_incl AS cum_incl", "n_rows")
      .transform(graft.Tables.ordered(_, $"q_permille"))
  }

  /** The identical sketch in DuckDB (oracle side). */
  def oracleSql(table: String, valueExpr: String, width: Long, qs: Seq[Int]): String = {
    val qvals = qs.map(q => s"($q)").mkString(", ")
    s"""WITH h AS (
      |  SELECT greatest(CAST(0 AS BIGINT), least(${buckets - 1}, CAST(floor(($valueExpr) / $width) AS BIGINT))) AS bucket,
      |         count(*) AS cnt
      |  FROM $table WHERE ($valueExpr) IS NOT NULL GROUP BY 1),
      |c AS (SELECT bucket, cnt,
      |        CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum,
      |        CAST(sum(cnt) OVER () AS BIGINT) AS tot
      |      FROM h),
      |qs AS (SELECT * FROM (VALUES $qvals) AS t(q_permille)),
      |loc AS (SELECT q_permille, min(bucket) AS bucket, max(tot) AS n_rows
      |        FROM c CROSS JOIN qs
      |        WHERE cum * 1000 >= q_permille * tot
      |        GROUP BY q_permille)
      |SELECT l.q_permille, l.bucket, (l.bucket + 1) * $width AS est_hi,
      |  c.cum - c.cnt AS cum_before, c.cum AS cum_incl, l.n_rows
      |FROM loc l JOIN c ON c.bucket = l.bucket
      |ORDER BY l.q_permille""".stripMargin
  }
}
