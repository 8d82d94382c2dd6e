package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of and range joins — operators Spark SQL lacks natively.
  *
  * As-of is implemented as the scalable union+window composition: tag
  * both sides, union, one shuffle on the join key, and carry the most
  * recent right-side value forward with `last(..., ignoreNulls)` over
  * an ordered frame. This is linear in input size — unlike the naive
  * inequality join + rank, which materializes every (event, earlier
  * order) pair before pruning and explodes at 100 TB.
  *
  * The range (band) self-join buckets event time so the physical plan
  * is an equality join on (key, bucket) — candidates are only
  * adjacent-bucket pairs, then the exact predicate filters. No
  * cartesian, no inequality-join fallback (a BroadcastNestedLoopJoin
  * here would be quadratic per key at scale).
  */
object AsOf {

  /** q11: for each event (with its timestamp mapped into the orders
    * era so matches are non-degenerate), the latest order of that
    * user at-or-before the event time.
    */
  def asOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("ts2", expr("timestampadd(DAY, CAST(event_id % 2400 AS INT), TIMESTAMP '1995-01-01 00:00:00')"))
      .select($"user_id".as("key"), $"ts2".as("t"),
        lit(1).as("is_event"), $"event_id",
        lit(null).cast("timestamp").as("odate"))
    val ord = Tables.orders(spark, dir)
      .select($"o_custkey".as("key"), $"o_orderdate".as("t"),
        lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
        $"o_orderdate".as("odate"))
    // orders sort before events at equal t, so `>=` as-of semantics hold
    val w = Window.partitionBy($"key").orderBy($"t", $"is_event")
      .rowsBetween(Window.unboundedPreceding, 0)
    ord.unionByName(ev)
      .withColumn("matched", last($"odate", ignoreNulls = true).over(w))
      .filter($"is_event" === 1 && $"matched".isNotNull)
      .select($"event_id", $"key".as("user_id"),
        date_format($"t", "yyyy-MM-dd").as("event_day"),
        date_format($"matched", "yyyy-MM-dd").as("order_day"))
      .orderBy($"event_id")
  }

  /** q13: identical semantics to [[asOfJoin]], but through the custom
    * Catalyst operator ([[graft.plans.AsOfJoinPlan]] + strategy +
    * partition-local merge exec) — the whole-operator extension path.
    */
  def asOfJoinCustom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("ts2", expr("timestampadd(DAY, CAST(event_id % 2400 AS INT), TIMESTAMP '1995-01-01 00:00:00')"))
      .select($"event_id", $"user_id", $"ts2")
    val ord = Tables.orders(spark, dir).select($"o_custkey", $"o_orderdate")
    graft.plans.AsOfJoin.asofJoin(
        ev, col("user_id"), unix_micros(col("ts2")),
        ord, col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")), "matched_us")
      .select($"event_id", $"user_id",
        date_format($"ts2", "yyyy-MM-dd").as("event_day"),
        date_format(timestamp_micros($"matched_us"), "yyyy-MM-dd").as("order_day"))
      .orderBy($"event_id")
  }

  val asOfSql: String =
    """SELECT e.event_id, e.user_id,
      |  strftime(e.ts2, '%Y-%m-%d') AS event_day,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_day
      |FROM (SELECT event_id, user_id,
      |        TIMESTAMP '1995-01-01 00:00:00' + (event_id % 2400) * INTERVAL 1 DAY AS ts2
      |      FROM events) e
      |ASOF JOIN orders o
      |  ON e.user_id = o.o_custkey AND e.ts2 >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** q36: NEAREST as-of join (pandas merge_asof direction='nearest'
    * — the variant Spark lacks even via composition recipes): for
    * each event, the user's order CLOSEST in time, before OR after,
    * ties to the earlier order. Built as TWO window passes over ONE
    * union and ONE key shuffle: the backward pass is q11's
    * last-ignoreNulls carry-forward; the forward pass mirrors it
    * with first-ignoreNulls over the following frame — both windows
    * partition on the same key, so Catalyst plans one Exchange with
    * two Sorts (orders sort before events at equal t on the
    * backward pass and after them on the forward pass, giving the
    * inclusive ≥/≤ semantics on both sides). Linear in input like
    * q11 — never an inequality-join pair blow-up. Distances are
    * exact day integers; the tie rule (prev when equal) is the
    * deterministic total order. The oracle runs DuckDB's native
    * ASOF twice (≥ backward, ≤ forward) and combines with the same
    * CASE — two engines, two mechanisms, one semantics.
    */
  def asOfNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("ts2", expr("timestampadd(DAY, CAST(event_id % 2400 AS INT), TIMESTAMP '1995-01-01 00:00:00')"))
      .select($"user_id".as("key"), $"ts2".as("t"),
        lit(1).as("is_event"), $"event_id",
        lit(null).cast("timestamp").as("odate"))
    val ord = Tables.orders(spark, dir)
      .select($"o_custkey".as("key"), $"o_orderdate".as("t"),
        lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
        $"o_orderdate".as("odate"))
    val wB = Window.partitionBy($"key").orderBy($"t", $"is_event")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy($"key").orderBy($"t", $"is_event".desc)
      .rowsBetween(0, Window.unboundedFollowing)
    ord.unionByName(ev)
      .withColumn("prev_d", last($"odate", ignoreNulls = true).over(wB))
      .withColumn("next_d", first($"odate", ignoreNulls = true).over(wF))
      .filter($"is_event" === 1 && ($"prev_d".isNotNull || $"next_d".isNotNull))
      .withColumn("dp", datediff($"t".cast("date"), $"prev_d".cast("date")))
      .withColumn("dn", datediff($"next_d".cast("date"), $"t".cast("date")))
      .withColumn("matched", when($"prev_d".isNull, $"next_d")
        .when($"next_d".isNull, $"prev_d")
        .when($"dp" <= $"dn", $"prev_d").otherwise($"next_d"))
      .selectExpr("event_id", "key AS user_id",
        "date_format(t, 'yyyy-MM-dd') AS event_day",
        "date_format(matched, 'yyyy-MM-dd') AS order_day",
        "CAST(least(coalesce(dp, 999999), coalesce(dn, 999999)) AS BIGINT) AS dist_days")
      .orderBy($"event_id")
  }

  /** q36 oracle: DuckDB's native ASOF in both directions + the same
    * nearest/tie CASE.
    */
  val asOfNearestSql: String =
    """WITH e AS (SELECT event_id, user_id,
      |        TIMESTAMP '1995-01-01 00:00:00' + (event_id % 2400) * INTERVAL 1 DAY AS ts2
      |      FROM events),
      |b AS (SELECT e.event_id, e.user_id, e.ts2, o.o_orderdate AS prev_d
      |      FROM e ASOF LEFT JOIN orders o
      |        ON e.user_id = o.o_custkey AND e.ts2 >= o.o_orderdate),
      |f AS (SELECT e.event_id, o.o_orderdate AS next_d
      |      FROM e ASOF LEFT JOIN orders o
      |        ON e.user_id = o.o_custkey AND e.ts2 <= o.o_orderdate)
      |SELECT b.event_id, b.user_id,
      |  strftime(b.ts2, '%Y-%m-%d') AS event_day,
      |  strftime(CASE WHEN prev_d IS NULL THEN next_d
      |                WHEN next_d IS NULL THEN prev_d
      |                WHEN datediff('day', CAST(prev_d AS DATE), CAST(b.ts2 AS DATE))
      |                     <= datediff('day', CAST(b.ts2 AS DATE), CAST(next_d AS DATE)) THEN prev_d
      |                ELSE next_d END, '%Y-%m-%d') AS order_day,
      |  CAST(least(coalesce(datediff('day', CAST(prev_d AS DATE), CAST(b.ts2 AS DATE)), 999999),
      |             coalesce(datediff('day', CAST(b.ts2 AS DATE), CAST(next_d AS DATE)), 999999)) AS BIGINT) AS dist_days
      |FROM b JOIN f USING (event_id)
      |WHERE prev_d IS NOT NULL OR next_d IS NOT NULL
      |ORDER BY b.event_id""".stripMargin

  /** q38: the BAND-JOIN OPTIMIZER RULE exercised end-to-end — the
    * query writes the NATURAL inner join (`a.key = b.key AND b.t >
    * a.t AND b.t <= a.t + 5min`; no custom API anywhere) and
    * [[graft.plans.BandJoinRewrite]] rewrites it to the custom
    * [[graft.plans.RangeJoinPlan]] during optimization — so the
    * O(n + matches) sliding merge replaces Catalyst's hash-join +
    * post-filter (which materializes every same-key pair before
    * the band cuts: the per-hot-key quadratic trap). Same
    * semantics and oracle as q12/q14; PlanSpec pins that
    * RangeJoinExec actually appears in THIS plan (the rule fired)
    * and the rewrite is attested by the result matching the
    * bitwise oracle. The third Catalyst extension surface:
    * expression, plan+strategy, and now an optimizer Rule.
    */
  def bandRewrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.BandJoinRewrite.install(spark)
    val ev = Tables.events(spark, dir)
    val a = ev.select($"user_id".as("ua"), unix_micros($"ts").as("ta_us"))
    val b = ev.select($"user_id".as("ub"), unix_micros($"ts").as("tb_us"))
    a.join(b, a("ua") === b("ub") && b("tb_us") > a("ta_us") &&
        b("tb_us") <= a("ta_us") + 300000000L)
      .groupBy($"ua")
      .agg(count(lit(1)).as("n_pairs"))
      .select($"ua".as("user_id"), $"n_pairs")
      .transform(graft.Tables.ordered(_, col("user_id")))
  }

  /** q12: band self-join — pairs of events of the same user within
    * (0, 5 min], counted per user, via time-bucketed equality join.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucketUs = 300L * 1000000L // 5 min in microseconds
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("tus"))
    // left emits its own bucket and the next; right keyed by its bucket.
    val left = ev.withColumn("bkt",
        explode(array(floor($"tus" / bucketUs).cast("long"),
          (floor($"tus" / bucketUs) + 1).cast("long"))))
      .select($"user_id", $"tus".as("t_a"), $"bkt")
    val right = ev.select($"user_id", $"tus".as("t_b"),
      floor($"tus" / bucketUs).cast("long").as("bkt"))
    left.join(right, Seq("user_id", "bkt"))
      .filter($"t_b" > $"t_a" && $"t_b" <= $"t_a" + bucketUs)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"user_id")
  }

  /** q14: identical band-join semantics to [[rangeJoin]], through the
    * custom interval-join operator ([[graft.plans.RangeJoinPlan]]) —
    * partition-local sliding-window merge, O(n + matches).
    */
  def rangeJoinCustom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val a = ev.select($"user_id".as("ua"), unix_micros($"ts").as("ta_us"),
      $"event_id".as("ea"))
    val b = ev.select($"user_id".as("ub"), unix_micros($"ts").as("tb_us"),
      $"event_id".as("eb"))
    graft.plans.RangeJoin.rangeJoin(
        a, col("ua"), col("ta_us"), b, col("ub"), col("tb_us"),
        lowDelta = 0L, highDelta = 300L * 1000000L)
      .groupBy($"ua")
      .agg(count(lit(1)).as("n_pairs"))
      .select($"ua".as("user_id"), $"n_pairs")
      .transform(graft.Tables.ordered(_, col("user_id")))
  }

  // Both engines must compare at the SAME grain: the Spark side
  // joins on unix_micros (us), so the oracle joins on epoch_us too —
  // an INTERVAL compare on raw nanosecond timestamps would diverge
  // for a pair within <1us of the 5-minute boundary (§8.2).
  val rangeSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events)
      |SELECT a.user_id, count(*) AS n_pairs
      |FROM e a JOIN e b
      |  ON b.user_id = a.user_id
      | AND b.tus > a.tus
      | AND b.tus <= a.tus + 300000000
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin
}
