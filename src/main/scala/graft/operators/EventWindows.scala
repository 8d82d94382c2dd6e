package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-time window analytics over the `events` table — the batch
  * counterparts of the streaming queries in [[graft.streaming]].
  * All windowing uses Spark's native `window()` (epoch-aligned, same
  * alignment the oracle derives arithmetically), and session
  * detection is pure window-function arithmetic on exact microsecond
  * integers — no float comparisons, no UDFs.
  */
object EventWindows {

  /** e1: tumbling 1-hour windows per event type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Stable.dsum($"value", 2).as("sum_value"),
        min($"value").as("min_value"),
        max($"value").as("max_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"sum_value", $"min_value", $"max_value")
      .orderBy($"window_start", $"event_type")
  }

  val tumblingSql: String =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type,
      |  count(*) AS n,
      |  ${graft.functions.Stable.sumSql("value", 2)} AS sum_value,
      |  min(value) AS min_value,
      |  max(value) AS max_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** e2: sliding windows, 1 h length / 15 min hop (each event lands in
    * exactly 4 windows; Spark's native sliding window is epoch-aligned,
    * which the oracle reproduces with an explicit 4-offset expansion).
    */
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), graft.functions.Stable.davg($"value", 2).as("avg_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"n", $"avg_value")
      .orderBy($"window_start")
  }

  val slidingSql: String =
    s"""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
      |  count(*) AS n,
      |  ${graft.functions.Stable.avgSql("value", 2)} AS avg_value
      |FROM (
      |  SELECT date_trunc('minute', ts)
      |           - (extract(minute FROM ts)::BIGINT % 15) * INTERVAL 1 MINUTE
      |           - k * INTERVAL 15 MINUTE AS ws,
      |         value
      |  FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k)
      |)
      |GROUP BY ws
      |ORDER BY 1""".stripMargin

  /** e3: gap-based sessionization (30-minute idle gap) per user, on
    * exact microsecond arithmetic. One shuffle on user_id.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("tus"))
      .withColumn("new_session",
        when(lag($"tus", 1).over(w).isNull || $"tus" - lag($"tus", 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .groupBy($"user_id")
      .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  val sessionizeSql: String =
    """SELECT user_id,
      |  sum(new_session) AS n_sessions,
      |  count(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN prev_t IS NULL OR t - prev_t > 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT user_id, epoch_us(ts) AS t,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_t
      |    FROM events))
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin
}
