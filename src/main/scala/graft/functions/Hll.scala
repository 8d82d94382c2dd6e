package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic cross-engine HyperLogLog (Flajolet et al. 2007) —
  * the shared sketch behind q31 (batch ndv) and s18 (streaming ndv).
  *
  * Both engines' native `approx_count_distinct` sketches differ, so
  * this IS the portable sketch: md5-prefix 60-bit hash, low
  * [[bits]] bits pick the register, rank = leading-zero count of
  * the remaining [[wBits]]-bit window + 1 (computed as a
  * binary-string length — integer-only, no float anywhere), and the
  * register table is max(rank) per index. Everything after hashing
  * is integer arithmetic: the harmonic sum Σ2^(−M_j) is scaled to
  * S = Σ2^(51−M_j) (BIGINT-exact; an empty register contributes
  * 2^51) and the estimate α_m·m²/Σ2^(−M_j) becomes ONE integral
  * division (α₆·2^71)/(S·10⁶) in DECIMAL(38,0) (Spark) / HUGEINT
  * (DuckDB) — `div` and `//` agree on positives. The small-range
  * linear-counting branch (m·ln(m/V)) quantizes its single log at
  * 10⁻⁹ (SURVEY §8.4).
  *
  * Scale properties: hash+rank is a narrow map; the register
  * aggregate moves ≤ m = 1024 rows per executor regardless of input
  * size (map-side partial max); registers MERGE by max-per-index,
  * so per-partition / per-day / per-micro-batch sketches union
  * without rescanning — which is also why the same register
  * aggregate runs unchanged as a streaming stateful aggregate
  * (state = the m registers; see s18).
  */
object Hll {
  val bits = 10
  val m: Long = 1L << bits // 1024 registers; standard error 1.04/√m ≈ 3.2%
  val wBits = 50 // 60-bit hash minus the register index
  private val maxRank = wBits + 1

  /** α_m · 10⁶ for m = 1024 (Flajolet et al. 2007 §4), embedded as
    * the same integer literal in both engines.
    */
  val alpha6: Long = (0.7213 / (1 + 1.079 / m) * 1e6).toLong

  /** m²·2^(wBits+1) = 2^71: the estimate's integer numerator scale
    * (S is Σ2^(51−M_j), the harmonic sum scaled by 2^(wBits+1)).
    */
  val num: String = java.math.BigInteger.TWO.pow(wBits + 1 + 2 * bits).toString

  /** (reg, rnk) per input row — the narrow map stage. `valueExpr` is
    * any SQL expression over `df`'s columns; streams welcome.
    */
  def ranks(df: DataFrame, valueExpr: String): DataFrame =
    df.selectExpr(
        s"CAST(conv(substring(md5(CAST(($valueExpr) AS STRING)), 1, 15), 16, 10) AS BIGINT) AS hv")
      .selectExpr(s"hv % $m AS reg", s"hv div $m AS w")
      .selectExpr("reg",
        s"CASE WHEN w = 0 THEN $maxRank " +
          s"ELSE $maxRank - length(trim(LEADING '0' FROM bin(w))) END AS rnk")

  /** The register table (reg, r): ≤ m rows, mergeable by max. As a
    * streaming aggregate this is the sketch's state store.
    */
  def registers(df: DataFrame, valueExpr: String): DataFrame =
    ranks(df, valueExpr).groupBy(col("reg")).agg(max(col("rnk")).as("r"))

  /** 1-row estimate from a register table: (v_zero, s_sum, est_raw,
    * est) — raw HLL plus the small-range linear-counting correction.
    */
  def estimate(regs: DataFrame): DataFrame =
    regs.agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxRank - r AS INT))"))
          .as("s_present"))
      .selectExpr(s"$m - n_present AS v_zero",
        s"s_present + CAST($m - n_present AS BIGINT) * shiftleft(CAST(1 AS BIGINT), $maxRank) AS s_sum")
      .selectExpr("v_zero", "s_sum",
        s"CAST((CAST($alpha6 AS DECIMAL(38,0)) * CAST('$num' AS DECIMAL(38,0)))" +
          s" div (CAST(s_sum AS DECIMAL(38,0)) * 1000000) AS BIGINT) AS est_raw")
      .selectExpr("v_zero", "s_sum", "est_raw",
        s"CASE WHEN est_raw * 2 <= 5 * $m AND v_zero > 0 " +
          s"THEN ($m * CAST(floor(ln(CAST($m AS DOUBLE) / v_zero) * 1e9 + 0.5) AS BIGINT)) div 1000000000 " +
          "ELSE est_raw END AS est")

  /** Tag-preserving rank map: (key, reg, rnk) — ONE corpus pass
    * feeds several sketches (q35's segment fan-out).
    */
  def ranksKeyed(df: DataFrame, key: String, valueExpr: String): DataFrame =
    df.selectExpr(key,
        s"CAST(conv(substring(md5(CAST(($valueExpr) AS STRING)), 1, 15), 16, 10) AS BIGINT) AS hv")
      .selectExpr(key, s"hv % $m AS reg", s"hv div $m AS w")
      .selectExpr(key, "reg",
        s"CASE WHEN w = 0 THEN $maxRank " +
          s"ELSE $maxRank - length(trim(LEADING '0' FROM bin(w))) END AS rnk")

  /** Per-key register tables (key, reg, r): ≤ m rows per key,
    * mergeable by max WITHIN and ACROSS keys (a cross-key max-merge
    * is the union sketch — the set-operation property q35 audits).
    */
  def registersKeyed(df: DataFrame, key: String, valueExpr: String): DataFrame =
    ranksKeyed(df, key, valueExpr)
      .groupBy(col(key), col("reg")).agg(max(col("rnk")).as("r"))

  /** DuckDB mirror of [[registersKeyed]] + [[estimateGrouped]]: CTE
    * text from `tagged`(sketch, v) through `hest`(sketch, v_zero,
    * s_sum, est_raw, est); `regs` holds the per-sketch registers for
    * callers that add merged sketches before estimating (append to
    * `allregs` via the returned text's seam — see q35Sql).
    */
  def groupedOracleCtes(extraRegsSql: String): String =
    s"""hh AS (
      |  SELECT sketch,
      |    CAST(('0x' || substring(md5(CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      |  FROM tagged),
      |rr AS (
      |  SELECT sketch, hv % $m AS reg,
      |    CASE WHEN hv // $m = 0 THEN $maxRank
      |         ELSE $maxRank - length(ltrim(bin(CAST(hv // $m AS BIGINT)), '0')) END AS rnk
      |  FROM hh),
      |regs AS (SELECT sketch, reg, max(rnk) AS r FROM rr GROUP BY 1, 2),
      |allregs AS (SELECT sketch, reg, r FROM regs$extraRegsSql),
      |hagg AS (SELECT sketch, count(*) AS n_present,
      |          CAST(sum(CAST(1 AS BIGINT) << CAST($maxRank - r AS INTEGER)) AS BIGINT) AS s_present
      |        FROM allregs GROUP BY sketch),
      |he0 AS (SELECT sketch, $m - n_present AS v_zero,
      |    s_present + CAST($m - n_present AS BIGINT) * (CAST(1 AS BIGINT) << $maxRank) AS s_sum
      |  FROM hagg),
      |he1 AS (SELECT *,
      |    CAST((CAST($alpha6 AS HUGEINT) * CAST('$num' AS HUGEINT))
      |      // (CAST(s_sum AS HUGEINT) * 1000000) AS BIGINT) AS est_raw
      |  FROM he0),
      |hest AS (SELECT *,
      |    CASE WHEN est_raw * 2 <= 5 * $m AND v_zero > 0
      |         THEN ($m * CAST(floor(ln(CAST($m AS DOUBLE) / v_zero) * 1e9 + 0.5) AS BIGINT)) // 1000000000
      |         ELSE est_raw END AS est
      |  FROM he1)""".stripMargin

  /** Per-group estimate over a TAGGED register table (`key`, reg, r)
    * — the multi-sketch variant q35 uses to estimate several
    * segments (and their max-merge union) in ONE aggregate pass;
    * the estimate chain is [[estimate]]'s, carried per key.
    */
  def estimateGrouped(regs: DataFrame, key: String): DataFrame =
    regs.groupBy(col(key)).agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxRank - r AS INT))"))
          .as("s_present"))
      .selectExpr(key, s"$m - n_present AS v_zero",
        s"s_present + CAST($m - n_present AS BIGINT) * shiftleft(CAST(1 AS BIGINT), $maxRank) AS s_sum")
      .selectExpr(key, "v_zero", "s_sum",
        s"CAST((CAST($alpha6 AS DECIMAL(38,0)) * CAST('$num' AS DECIMAL(38,0)))" +
          s" div (CAST(s_sum AS DECIMAL(38,0)) * 1000000) AS BIGINT) AS est_raw")
      .selectExpr(key, "v_zero", "s_sum", "est_raw",
        s"CASE WHEN est_raw * 2 <= 5 * $m AND v_zero > 0 " +
          s"THEN ($m * CAST(floor(ln(CAST($m AS DOUBLE) / v_zero) * 1e9 + 0.5) AS BIGINT)) div 1000000000 " +
          "ELSE est_raw END AS est")

  /** Estimate + accuracy audit against a 1-row exact count
    * (`n_exact`): the audit is the only corpus-sized aggregate and
    * exists to grade the sketch.
    */
  def estimateWithAudit(regs: DataFrame, exact: DataFrame): DataFrame =
    estimate(regs).crossJoin(broadcast(exact))
      .selectExpr("n_exact", "v_zero", "s_sum", "est_raw", "est",
        "abs(est - n_exact) * 1000 div n_exact AS err_permille")

  /** The full audited sketch as DuckDB SQL over `table`'s
    * `valueExpr` — the one oracle both q31 and s18 instantiate.
    */
  def oracleSql(table: String, valueExpr: String): String =
    s"""WITH h AS (
      |  SELECT CAST(('0x' || substring(md5(CAST(($valueExpr) AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      |  FROM $table),
      |rr AS (
      |  SELECT hv % $m AS reg,
      |    CASE WHEN hv // $m = 0 THEN $maxRank
      |         ELSE $maxRank - length(ltrim(bin(CAST(hv // $m AS BIGINT)), '0')) END AS rnk
      |  FROM h),
      |regs AS (SELECT reg, max(rnk) AS r FROM rr GROUP BY reg),
      |agg AS (SELECT count(*) AS n_present,
      |          CAST(sum(CAST(1 AS BIGINT) << CAST($maxRank - r AS INTEGER)) AS BIGINT) AS s_present
      |        FROM regs),
      |ex AS (SELECT CAST(count(DISTINCT ($valueExpr)) AS BIGINT) AS n_exact FROM $table),
      |est0 AS (
      |  SELECT n_exact, $m - n_present AS v_zero,
      |    s_present + CAST($m - n_present AS BIGINT) * (CAST(1 AS BIGINT) << $maxRank) AS s_sum
      |  FROM agg, ex),
      |est1 AS (
      |  SELECT *,
      |    CAST((CAST($alpha6 AS HUGEINT) * CAST('$num' AS HUGEINT))
      |      // (CAST(s_sum AS HUGEINT) * 1000000) AS BIGINT) AS est_raw
      |  FROM est0),
      |est2 AS (
      |  SELECT *,
      |    CASE WHEN est_raw * 2 <= 5 * $m AND v_zero > 0
      |         THEN ($m * CAST(floor(ln(CAST($m AS DOUBLE) / v_zero) * 1e9 + 0.5) AS BIGINT)) // 1000000000
      |         ELSE est_raw END AS est
      |  FROM est1)
      |SELECT n_exact, v_zero, s_sum, est_raw, est,
      |  abs(est - n_exact) * 1000 // n_exact AS err_permille
      |FROM est2""".stripMargin
}
