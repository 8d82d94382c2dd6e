package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ThermalChain
import graft.functions.ThermalChain.q

/** The reference's weather/thermal operators (SURVEY.md §2, w1-w14),
  * built on [[ThermalChain]]. Scalar queries (w1-w8) are pure narrow
  * maps — one codegen'd stage, no shuffle, linear at any scale. Grid
  * operators (w9-w14) shuffle exactly once on their natural key.
  */
object Weather {

  private def chain(spark: SparkSession, dir: String, n: Int) =
    ThermalChain.df(spark, dir, n)

  // ---------- w1: wind speed (hypot of u/v; main.py:174-182) ----------

  def w1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 2)
      .select($"event_id", $"lat", $"lon", $"wind_speed")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w1Sql: String =
    s"""SELECT event_id, lat, lon, wind_speed
      |FROM (${ThermalChain.sql(2)})
      |ORDER BY event_id""".stripMargin

  // ---------- w2: integrated cosine solar zenith angle ----------

  def w2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 10)
      .select($"event_id", $"lat", $"lon", $"doy", $"hh",
        $"avg_cza")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w2Sql: String =
    s"""SELECT event_id, lat, lon, doy, hh, avg_cza
      |FROM (${ThermalChain.sql(10)})
      |ORDER BY event_id""".stripMargin

  // ---------- w3: Erbs GHI -> DNI/DHI ----------

  def w3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 14)
      .select($"event_id", $"kt", $"dni", $"dhi")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w3Sql: String =
    s"""SELECT event_id, kt, dni, dhi
      |FROM (${ThermalChain.sql(14)})
      |ORDER BY event_id""".stripMargin

  // ---------- w4: mean radiant temperature ----------

  def w4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 16)
      .select($"event_id", $"mrt_c")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w4Sql: String =
    s"""SELECT event_id, mrt_c
      |FROM (${ThermalChain.sql(16)})
      |ORDER BY event_id""".stripMargin

  // ---------- w5: saturation vapor pressure + relative humidity ----------

  def w5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 5)
      .select($"event_id", $"es_td", $"rh")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w5Sql: String =
    s"""SELECT event_id, es_td, rh
      |FROM (${ThermalChain.sql(5)})
      |ORDER BY event_id""".stripMargin

  // ---------- w6: UTCI ----------

  def w6(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 22)
      .select($"event_id", $"lat", $"lon", $"utci_c")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w6Sql: String =
    s"""SELECT event_id, lat, lon, utci_c
      |FROM (${ThermalChain.sql(22)})
      |ORDER BY event_id""".stripMargin

  // ---------- w7: WBGT ----------

  def w7(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 27)
      .select($"event_id", $"wbgt_c")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w7Sql: String =
    s"""SELECT event_id, wbgt_c
      |FROM (${ThermalChain.sql(27)})
      |ORDER BY event_id""".stripMargin

  // ---------- w8: int32 encode + decode roundtrip ----------

  def w8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, ThermalChain.full)
      .select($"event_id", $"encoded", $"utci_d", $"wbgt_d", $"off_d")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w8Sql: String =
    s"""SELECT event_id, encoded, utci_d, wbgt_d, off_d
      |FROM (${ThermalChain.sql(ThermalChain.full)})
      |ORDER BY event_id""".stripMargin

  // ---------- w9: forecast merge (combine_first; main.py:245-250) ----------
  // New run covers hours [240,360), previous run [120,300) with a -1K
  // bias; merged series prefers new, keeps the old tail, and clips
  // before the earliest-necessary cutoff (180).

  def w9(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = chain(spark, dir, 2)
    val newF = g.filter($"aoff" >= 240 && $"aoff" < 360)
      .groupBy($"lat", $"lon", $"aoff").agg(max($"tmp2m").as("t_new"))
    val oldF = g.filter($"aoff" >= 120 && $"aoff" < 300)
      .groupBy($"lat", $"lon", $"aoff").agg((max($"tmp2m") - lit(1.0)).as("t_old"))
    newF.join(oldF, Seq("lat", "lon", "aoff"), "full_outer")
      .filter($"aoff" >= 180)
      .select($"lat", $"lon", $"aoff",
        coalesce($"t_new", $"t_old").as("t"),
        when($"t_new".isNotNull, "new").otherwise("old").as("src"))
      .transform(Tables.ordered(_, $"lat", $"lon", $"aoff"))
  }

  val w9Sql: String =
    s"""WITH g AS (${ThermalChain.sql(2)}),
      |n AS (SELECT lat, lon, aoff, max(tmp2m) AS t_new FROM g
      |      WHERE aoff >= 240 AND aoff < 360 GROUP BY 1, 2, 3),
      |o AS (SELECT lat, lon, aoff, max(tmp2m) - 1.0 AS t_old FROM g
      |      WHERE aoff >= 120 AND aoff < 300 GROUP BY 1, 2, 3)
      |SELECT COALESCE(n.lat, o.lat) AS lat, COALESCE(n.lon, o.lon) AS lon,
      |  COALESCE(n.aoff, o.aoff) AS aoff,
      |  COALESCE(n.t_new, o.t_old) AS t,
      |  CASE WHEN n.t_new IS NOT NULL THEN 'new' ELSE 'old' END AS src
      |FROM n FULL OUTER JOIN o
      |  ON n.lat = o.lat AND n.lon = o.lon AND n.aoff = o.aoff
      |WHERE COALESCE(n.aoff, o.aoff) >= 180
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------- w10: near-land mask broadcast semi-join (main.py:281-304) ----------
  // Mask keyed on the same (lat, lon) grid, derived from `part`.

  def w10(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mask = Tables.part(spark, dir)
      .filter($"p_size" > 25)
      .selectExpr("CAST(p_partkey % 29 AS DOUBLE) * 5.0 - 70.0 AS lat",
        "CAST((p_partkey * 3) % 72 AS DOUBLE) * 5.0 - 177.5 AS lon")
      .distinct()
    chain(spark, dir, 2)
      .groupBy($"lat", $"lon")
      .agg(countDistinct($"aoff").as("n_hours"), max($"tmp2m").as("t_max"))
      .join(broadcast(mask), Seq("lat", "lon"), "left_semi")
      .select($"lat", $"lon", $"n_hours", $"t_max")
      .transform(Tables.ordered(_, $"lat", $"lon"))
  }

  val w10Sql: String =
    s"""WITH g AS (${ThermalChain.sql(2)}),
      |m AS (SELECT DISTINCT CAST(p_partkey % 29 AS DOUBLE) * 5.0 - 70.0 AS lat,
      |        CAST((p_partkey * 3) % 72 AS DOUBLE) * 5.0 - 177.5 AS lon
      |      FROM part WHERE p_size > 25),
      |c AS (SELECT lat, lon, count(DISTINCT aoff) AS n_hours, max(tmp2m) AS t_max
      |      FROM g GROUP BY 1, 2)
      |SELECT c.lat, c.lon, c.n_hours, c.t_max AS t_max
      |FROM c
      |WHERE EXISTS (SELECT 1 FROM m WHERE m.lat = c.lat AND m.lon = c.lon)
      |ORDER BY 1, 2""".stripMargin

  // ---------- w11: hour-angle time shift (main.py:361-367) ----------
  // The reference runs 24 masked whole-grid shift passes; here the
  // shift is key arithmetic on the hour offset — a narrow map.

  def w11(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 2)
      .groupBy($"lat", $"lon", $"aoff").agg(max($"tmp2m").as("t"))
      .withColumn("ha", expr("CAST(floor(lon / 15.0 + 0.5) AS BIGINT)"))
      .withColumn("uha", when($"ha" > 12, $"ha" - 24).otherwise($"ha"))
      .select($"lat", $"lon", $"aoff", $"uha",
        ($"aoff" + $"uha").as("local_aoff"), $"t")
      .transform(Tables.ordered(_, $"lat", $"lon", $"aoff"))
  }

  val w11Sql: String =
    s"""WITH g AS (${ThermalChain.sql(2)}),
      |c AS (SELECT lat, lon, aoff, max(tmp2m) AS t FROM g GROUP BY 1, 2, 3),
      |h AS (SELECT *, CAST(floor(lon / 15.0 + 0.5) AS BIGINT) AS ha FROM c)
      |SELECT lat, lon, aoff,
      |  CASE WHEN ha > 12 THEN ha - 24 ELSE ha END AS uha,
      |  aoff + (CASE WHEN ha > 12 THEN ha - 24 ELSE ha END) AS local_aoff,
      |  t
      |FROM h
      |ORDER BY lat, lon, aoff""".stripMargin

  // ---------- w12: daily extremes with complete-day filter (main.py:401-408) ----------
  // Dense hourly series per observed grid cell (hours via the 24-key
  // `nation` table, days via `customer`, both shared with the oracle),
  // hour-angle shifted; only local days with all 24 hours survive.

  private val w12T =
    s"263.15 + 40.0 * ${q("sin(radians(lat) + CAST(day AS DOUBLE) / 3.0 + CAST(h AS DOUBLE) / 7.0 + radians(lon))")}"
  // gate whole source days: after the hour-angle shift, a local day
  // mixes two source days, so kept/dropped boundaries yield incomplete
  // local days and the count(*)=24 filter is exercised both ways.
  private val w12Keep =
    s"${q("sin(radians(lat) * 3.0 + radians(lon) + CAST(day AS DOUBLE))")} > -0.5"

  /** Shared w12/w18 core: hour-angle-shifted per-cell daily extremes
    * over the dense synthetic series, complete (24h) local days only.
    */
  private def w12Daily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = chain(spark, dir, 1).select($"lat", $"lon").distinct()
    val days = Tables.customer(spark, dir)
      .selectExpr("c_custkey % 30 AS day").distinct()
    val hours = Tables.nation(spark, dir)
      .filter($"n_nationkey" < 24).selectExpr("n_nationkey AS h")
    cells.join(broadcast(days)).join(broadcast(hours))
      .withColumn("t", expr(w12T))
      .filter(expr(w12Keep))
      .withColumn("uha", expr("CASE WHEN CAST(floor(lon / 15.0 + 0.5) AS BIGINT) > 12 THEN CAST(floor(lon / 15.0 + 0.5) AS BIGINT) - 24 ELSE CAST(floor(lon / 15.0 + 0.5) AS BIGINT) END"))
      .withColumn("lday", expr("CAST(floor((CAST(day * 24 + h AS DOUBLE) + CAST(uha AS DOUBLE)) / 24.0) AS BIGINT)"))
      .groupBy($"lat", $"lon", $"lday")
      .agg(count(lit(1)).as("n"), max($"t").as("hi"), min($"t").as("lo"))
      .filter($"n" === 24)
      .select($"lat", $"lon", $"lday", $"hi", $"lo")
  }

  def w12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    w12Daily(spark, dir).transform(Tables.ordered(_, $"lat", $"lon", $"lday"))
  }

  /** Shared CTE prefix for the w12/w18 oracles (through `daily`). */
  private val w12SqlDaily: String =
    s"""WITH g AS (${ThermalChain.sql(1)}),
      |cells AS (SELECT DISTINCT lat, lon FROM g),
      |days AS (SELECT DISTINCT c_custkey % 30 AS day FROM customer),
      |hours AS (SELECT n_nationkey AS h FROM nation WHERE n_nationkey < 24),
      |dense AS (
      |  SELECT lat, lon, day, h, ($w12T) AS t,
      |    CASE WHEN CAST(floor(lon / 15.0 + 0.5) AS BIGINT) > 12
      |         THEN CAST(floor(lon / 15.0 + 0.5) AS BIGINT) - 24
      |         ELSE CAST(floor(lon / 15.0 + 0.5) AS BIGINT) END AS uha
      |  FROM cells CROSS JOIN days CROSS JOIN hours
      |  WHERE $w12Keep),
      |shifted AS (
      |  SELECT lat, lon, t,
      |    CAST(floor((CAST(day * 24 + h AS DOUBLE) + CAST(uha AS DOUBLE)) / 24.0) AS BIGINT) AS lday
      |  FROM dense),
      |daily AS (
      |  SELECT lat, lon, lday, max(t) AS hi, min(t) AS lo
      |  FROM shifted
      |  GROUP BY 1, 2, 3
      |  HAVING count(*) = 24)""".stripMargin

  val w12Sql: String =
    s"""$w12SqlDaily
      |SELECT lat, lon, lday, hi, lo FROM daily
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------- w23: heating/cooling degree days ----------

  /** w23: HEATING/COOLING DEGREE DAYS per cell — the classic
    * climatological energy-demand metric (ASHRAE/NOAA degree days,
    * base 18 °C): HDD = Σ_days max(0, 18 − mean), CDD = Σ_days
    * max(0, mean − 18), with the standard (hi + lo)/2 daily-mean
    * approximation over w12's hour-angle-shifted local days — the
    * seasonal aggregation layer above w12's extremes and w16's
    * climatology. One extra cell-grain aggregate over w12's daily
    * table (which already costs its one (cell, lday) shuffle);
    * the day-sum uses [[graft.functions.Stable]] quantized sums so
    * the float accumulation is order-free and bitwise cross-engine.
    */
  def w23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    w12Daily(spark, dir)
      .withColumn("mean_t", ($"hi" + $"lo") / lit(2.0))
      .groupBy($"lat", $"lon")
      .agg(count(lit(1)).as("n_days"),
        graft.functions.Stable.dsum(
          greatest(lit(0.0), lit(18.0) - $"mean_t"), 2).as("hdd"),
        graft.functions.Stable.dsum(
          greatest(lit(0.0), $"mean_t" - lit(18.0)), 2).as("cdd"))
      .transform(Tables.ordered(_, $"lat", $"lon"))
  }

  /** w23 oracle: w12's daily CTEs + the same quantized degree-day
    * sums (greatest/CAST mirrors — no decimal literals, §8.2).
    */
  val w23Sql: String =
    s"""$w12SqlDaily,
      |m AS (SELECT lat, lon, (hi + lo) / CAST(2 AS DOUBLE) AS mean_t FROM daily)
      |SELECT lat, lon, count(*) AS n_days,
      |  ${graft.functions.Stable.sumSql("greatest(CAST(0 AS DOUBLE), CAST(18 AS DOUBLE) - mean_t)", 2)} AS hdd,
      |  ${graft.functions.Stable.sumSql("greatest(CAST(0 AS DOUBLE), mean_t - CAST(18 AS DOUBLE))", 2)} AS cdd
      |FROM m
      |GROUP BY lat, lon
      |ORDER BY lat, lon""".stripMargin

  // ---------- w24: wind rose (directional climatology) ----------

  /** w24: WIND ROSE — the 16-sector directional frequency/speed
    * histogram every wind climatology publishes, in the
    * METEOROLOGICAL convention: direction the wind blows FROM,
    * measured clockwise from north — dir = (270 − atan2°(v,u)) mod
    * 360, the standard u/v → compass conversion (atan2 alone gives
    * the math-convention angle the wind blows TOWARD, CCW from
    * east). Sector k spans [k·22.5°, (k+1)·22.5°) edge-aligned from
    * north, so sector 0 is N→NNE (not the center-on-north binning
    * some atlases use — a labeling choice, stated here). Per
    * sector: observation count and the quantized speed sum (mean =
    * sum/n downstream).
    *
    * Determinism (§8.4): atan2 is the ONE transcendental and is
    * quantized at 1e-6 immediately (absorbing cross-engine libm ULP
    * differences); everything after is single-op IEEE double
    * arithmetic on exact constants (270, 360 and 22.5 are exactly
    * representable; the mod is a single conditional subtract on the
    * (90, 450) range of 270 − dq, not an engine-varying fmod —
    * quantized dq ∈ (−180, 180] makes that range exhaustive).
    *
    * Scale shape: a pure narrow map over the chain + ONE 16-row
    * aggregate (map-side combine) — the w1-w8 class with a bounded
    * output; speed sums ride [[graft.functions.Stable]] so the
    * float accumulation is order-free.
    */
  def w24(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 2)
      .selectExpr("wind_speed",
        "floor(degrees(atan2(vgrd10m, ugrd10m)) * 1e6 + 0.5) / 1e6 AS dq")
      .selectExpr("CAST(270 AS DOUBLE) - dq AS met", "wind_speed")
      .selectExpr(
        "CAST(floor((CASE WHEN met >= CAST(360 AS DOUBLE) THEN met - CAST(360 AS DOUBLE) ELSE met END) / CAST(22.5 AS DOUBLE)) AS BIGINT) AS sector",
        "wind_speed")
      .groupBy($"sector")
      .agg(count(lit(1)).as("n_obs"),
        graft.functions.Stable.dsum($"wind_speed", 2).as("speed_sum"))
      .transform(Tables.ordered(_, $"sector"))
  }

  /** w24 oracle: identical quantized atan2 + exact-constant
    * meteorological-conversion arithmetic over the chain CTE.
    */
  val w24Sql: String =
    s"""WITH g AS (${graft.functions.ThermalChain.sql(2)}),
      |d AS (SELECT wind_speed,
      |        floor(degrees(atan2(vgrd10m, ugrd10m)) * 1e6 + 0.5) / 1e6 AS dq
      |      FROM g),
      |m AS (SELECT CAST(270 AS DOUBLE) - dq AS met, wind_speed FROM d),
      |s AS (SELECT CAST(floor((CASE WHEN met >= CAST(360 AS DOUBLE) THEN met - CAST(360 AS DOUBLE) ELSE met END) / CAST(22.5 AS DOUBLE)) AS BIGINT) AS sector,
      |        wind_speed
      |      FROM m)
      |SELECT sector, count(*) AS n_obs,
      |  ${graft.functions.Stable.sumSql("wind_speed", 2)} AS speed_sum
      |FROM s
      |GROUP BY sector
      |ORDER BY sector""".stripMargin

  // ---------- w13: per-cell forecast document assembly (main.py:286-304) ----------

  def w13(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 29)
      .groupBy($"lat", $"lon", $"aoff").agg(max($"encoded").as("enc"))
      .groupBy($"lat", $"lon")
      .agg(count(lit(1)).as("n_hours"), min($"aoff").as("forecast_start"),
        expr("array_join(transform(array_sort(collect_list(named_struct('aoff', aoff, 'enc', enc)))," +
          " s -> concat(cast(s.aoff AS string), ':', cast(s.enc AS string))), ',')").as("series"))
      .transform(Tables.ordered(_, $"lat", $"lon"))
  }

  val w13Sql: String =
    s"""WITH g AS (${ThermalChain.sql(29)}),
      |c AS (SELECT lat, lon, aoff, max(encoded) AS enc FROM g GROUP BY 1, 2, 3)
      |SELECT lat, lon, count(*) AS n_hours, min(aoff) AS forecast_start,
      |  string_agg(CAST(aoff AS VARCHAR) || ':' || CAST(enc AS VARCHAR), ',' ORDER BY aoff) AS series
      |FROM c
      |GROUP BY lat, lon
      |ORDER BY lat, lon""".stripMargin

  // ---------- w14: UTCI contour-band classification (main.py:369-416) ----------

  /** The 10 chart bands (main.py:378-390 `divisions`) over value v. */
  private def bandOf(v: String) =
    s"""CASE WHEN $v < -40.0 THEN 0 WHEN $v < -27.0 THEN 1 WHEN $v < -13.0 THEN 2
      | WHEN $v < 0.0 THEN 3 WHEN $v < 9.0 THEN 4 WHEN $v < 26.0 THEN 5
      | WHEN $v < 32.0 THEN 6 WHEN $v < 38.0 THEN 7 WHEN $v < 46.0 THEN 8
      | ELSE 9 END""".stripMargin.replace("\n", "")

  private val bandExpr = bandOf("hi")

  def w14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chain(spark, dir, 22)
      .withColumn("day", expr("CAST(floor(CAST(aoff AS DOUBLE) / 24.0) AS BIGINT)"))
      .groupBy($"lat", $"lon", $"day").agg(max($"utci_c").as("hi"))
      .withColumn("band", expr(bandExpr))
      .groupBy($"day", $"band").agg(count(lit(1)).as("n_cells"))
      .transform(Tables.ordered(_, $"day", $"band"))
  }

  val w14Sql: String =
    s"""WITH g AS (${ThermalChain.sql(22)}),
      |d AS (SELECT lat, lon, CAST(floor(CAST(aoff AS DOUBLE) / 24.0) AS BIGINT) AS day,
      |        max(utci_c) AS hi
      |      FROM g GROUP BY 1, 2, 3)
      |SELECT day, ($bandExpr) AS band, count(*) AS n_cells
      |FROM d
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------- w18: per-cell banded chart raster (main.py:341-443) ----------
  // The exact contourf input the reference renders: hour-angle-shifted
  // complete local days, each cell's highs and lows classified into
  // the 10 UTCI bands, in the chart's 0..360-longitude convention
  // (glon = lon - min(lon), so the grid starts at 0 like the GFS
  // grid) with the cyclic wrap: the glon=0 column is duplicated at
  // glon=360 so a global contour closes (main.py:345-349). PNG
  // emission itself is raster-library territory (not in this
  // sandbox); this DataFrame IS the pixel-independent chart content,
  // one row per (cell, day, vertex). Scale shape: w12's one shuffle
  // on (cell, lday) + narrow maps; the wrap is a filter+union of one
  // longitude column, not a second pass.

  /** Shared w18 / W4hJob chart-raster shape: stack highs/lows, band
    * via [[bandOf]], the chart's 0..360 glon convention, and the
    * cyclic-wrap column. `tempC` converts the stacked value `t` to
    * °C for banding (w12Daily carries Kelvin-offset synthetic
    * values; W4hJob's extremes are already °C).
    */
  private[graft] def chartRaster(daily: DataFrame, tempC: String): DataFrame = {
    val sess = daily.sparkSession
    import sess.implicits._
    val banded = daily
      .selectExpr("lat", "lon", "lday",
        "stack(2, 'highs', hi, 'lows', lo) AS (vertex, t)")
      .selectExpr("lat", "lon + 177.5 AS glon", "lday", "vertex",
        s"(${bandOf(tempC)}) AS band")
    banded
      .unionByName(banded.filter($"glon" === 0.0)
        .withColumn("glon", lit(360.0)))
  }

  def w18(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chartRaster(w12Daily(spark, dir), "(t - 273.15)")
      .transform(Tables.ordered(_, $"lat", $"glon", $"lday", $"vertex"))
  }

  val w18Sql: String =
    s"""$w12SqlDaily,
      |v AS (
      |  SELECT lat, lon, lday, 'highs' AS vertex, hi AS t FROM daily
      |  UNION ALL
      |  SELECT lat, lon, lday, 'lows' AS vertex, lo AS t FROM daily),
      |b AS (
      |  SELECT lat, lon + 177.5 AS glon, lday, vertex,
      |    (${bandOf("(t - 273.15)")}) AS band
      |  FROM v)
      |SELECT lat, glon, lday, vertex, band FROM b
      |UNION ALL
      |SELECT lat, 360.0 AS glon, lday, vertex, band FROM b WHERE glon = 0.0
      |ORDER BY 1, 2, 3, 4""".stripMargin

  // ---------- w19: 3x3 grid stencil smoothing ----------

  /** w19: neighborhood (3×3 box) smoothing of a per-cell scalar field
    * — the standard pre-contour pass that keeps band edges from
    * stair-stepping cell to cell. The stencil runs as KEY ARITHMETIC:
    * each cell emits 9 (target-cell, value) contributions (a bounded
    * explode), targets aggregate with one shuffle on the cell key —
    * no self-joins, no windows, no per-offset grid passes. Longitude
    * wraps cyclically (the w18 convention); latitude edges simply
    * average over the neighbors that exist. Contributions land only
    * on real cells (broadcast semi-join, the w10 mask shape). Means
    * are integerized per §8.1, so the result is bitwise.
    */
  def w19(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached: the mask semi-join reuses the same per-cell aggregate
    // instead of re-scanning (InMemoryRelation on both sides)
    val cellT = chain(spark, dir, 2)
      .groupBy($"lat", $"lon").agg(max($"tmp2m").as("t"))
      .cache()
    cellT
      .selectExpr("lat", "lon", "t", "explode(array(-5.0, 0.0, 5.0)) AS dlat")
      .selectExpr("lat", "lon", "t", "dlat",
        "explode(array(-5.0, 0.0, 5.0)) AS dlon")
      .selectExpr("lat + dlat AS glat",
        "((lon + 177.5 + dlon + 360.0) % 360.0) - 177.5 AS glon",
        "CAST(floor(t * 1e6 + 0.5) AS BIGINT) AS c6")
      .groupBy($"glat", $"glon")
      .agg(count(lit(1)).as("n_nbrs"),
        ((sum($"c6") / count(lit(1))) / 1e6).as("t_smooth"))
      .join(broadcast(cellT.select($"lat".as("glat"), $"lon".as("glon"))),
        Seq("glat", "glon"), "left_semi")
      .select($"glat".as("lat"), $"glon".as("lon"), $"n_nbrs", $"t_smooth")
      .transform(Tables.ordered(_, $"lat", $"lon"))
  }

  val w19Sql: String =
    s"""WITH g AS (${ThermalChain.sql(2)}),
      |c AS (SELECT lat, lon, max(tmp2m) AS t FROM g GROUP BY 1, 2),
      |con AS (SELECT lat + dlat.d AS glat,
      |          ((lon + 177.5 + dlon.d + 360.0) % 360.0) - 177.5 AS glon,
      |          CAST(floor(t * 1e6 + 0.5) AS BIGINT) AS c6
      |        FROM c
      |        CROSS JOIN (SELECT unnest([-5.0, 0.0, 5.0]) AS d) dlat
      |        CROSS JOIN (SELECT unnest([-5.0, 0.0, 5.0]) AS d) dlon),
      |s AS (SELECT glat, glon, count(*) AS n_nbrs,
      |        (CAST(sum(c6) AS BIGINT) / count(*)) / 1e6 AS t_smooth
      |      FROM con GROUP BY 1, 2)
      |SELECT s.glat AS lat, s.glon AS lon, n_nbrs, t_smooth
      |FROM s
      |WHERE EXISTS (SELECT 1 FROM c WHERE c.lat = s.glat AND c.lon = s.glon)
      |ORDER BY 1, 2""".stripMargin

  // ---------- w20: time-series gap fill (forward fill) ----------

  /** w20: per-cell forward-fill onto the dense hour scaffold — the
    * series-repair pass a merge/upload needs when a cycle arrives
    * with holes (the reference's combine_first quietly assumes dense
    * series; this makes sparse ones dense). The scaffold is cells ×
    * observed-hours (hours broadcast — it's bounded by the horizon),
    * the fill is ONE window shuffle on the cell key with last(...,
    * ignoreNulls) over an unbounded-preceding ROWS frame; leading
    * holes (no prior observation) stay absent. `src` marks
    * observed vs filled rows for downstream QA.
    */
  def w20(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = chain(spark, dir, 2).filter($"aoff" < 240)
      .groupBy($"lat", $"lon", $"aoff").agg(max($"tmp2m").as("t"))
    val cells = obs.select($"lat", $"lon").distinct()
    val hours = obs.select($"aoff").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lat", $"lon").orderBy($"aoff")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cells.crossJoin(broadcast(hours))
      .join(obs, Seq("lat", "lon", "aoff"), "left_outer")
      .withColumn("t_filled", last($"t", ignoreNulls = true).over(w))
      .filter($"t_filled".isNotNull)
      .selectExpr("lat", "lon", "aoff", "t_filled",
        "CASE WHEN t IS NOT NULL THEN 'obs' ELSE 'fill' END AS src")
      .transform(Tables.ordered(_, $"lat", $"lon", $"aoff"))
  }

  val w20Sql: String =
    s"""WITH g AS (${ThermalChain.sql(2)}),
      |obs AS (SELECT lat, lon, aoff, max(tmp2m) AS t FROM g
      |        WHERE aoff < 240 GROUP BY 1, 2, 3),
      |cells AS (SELECT DISTINCT lat, lon FROM obs),
      |hours AS (SELECT DISTINCT aoff FROM obs),
      |s AS (SELECT c.lat, c.lon, h.aoff, o.t
      |      FROM cells c CROSS JOIN hours h
      |      LEFT JOIN obs o ON o.lat = c.lat AND o.lon = c.lon AND o.aoff = h.aoff),
      |f AS (SELECT lat, lon, aoff, t,
      |        last_value(t IGNORE NULLS) OVER (PARTITION BY lat, lon ORDER BY aoff
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_filled
      |      FROM s)
      |SELECT lat, lon, aoff, t_filled,
      |  CASE WHEN t IS NOT NULL THEN 'obs' ELSE 'fill' END AS src
      |FROM f
      |WHERE t_filled IS NOT NULL
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------- w17: NWS heat index + wind chill ----------
  // Public formulas beyond the reference's UTCI/WBGT pair: the
  // Rothfusz heat-index regression (T>=80°F branch, simple formula
  // below) and the NWS wind-chill model. Shared two-dialect strings;
  // the only transcendental (V^0.16) goes through quantized exp(ln)
  // per SURVEY §8.3 — everything else is single IEEE ops on already
  // quantized chain columns.

  private val w17Exprs: Seq[(String, String)] = {
    val tF = "((tmp2m - 273.15) * 1.8 + 32.0)"
    val vMph = "(wind_speed * 2.2369362920544)"
    val roth = s"(-42.379 + 2.04901523 * t_f + 10.14333127 * rh" +
      s" - 0.22475541 * t_f * rh - 6.83783e-3 * t_f * t_f" +
      s" - 5.481717e-2 * rh * rh + 1.22874e-3 * t_f * t_f * rh" +
      s" + 8.5282e-4 * t_f * rh * rh - 1.99e-6 * t_f * t_f * rh * rh)"
    val simple = "(0.5 * (t_f + 61.0 + (t_f - 68.0) * 1.2 + rh * 0.094))"
    val v016 = q("exp(0.16 * ln(greatest(v_mph, 1.0e-9)))")
    Seq(
      "t_f" -> tF,
      "v_mph" -> vMph,
      "heat_index_f" -> s"CASE WHEN t_f >= 80.0 THEN $roth ELSE $simple END",
      "wind_chill_f" -> (s"CASE WHEN t_f <= 50.0 AND v_mph > 3.0" +
        s" THEN 35.74 + 0.6215 * t_f - 35.75 * $v016 + 0.4275 * t_f * $v016" +
        s" ELSE t_f END"),
    )
  }

  def w17(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    w17Exprs.foldLeft(chain(spark, dir, 5)) { case (d, (n, e)) =>
      d.selectExpr("*", s"($e) AS $n")
    }
      .select($"event_id", $"t_f", $"v_mph", $"heat_index_f", $"wind_chill_f")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w17Sql: String = {
    val inner = w17Exprs.foldLeft(s"(${ThermalChain.sql(5)})") {
      case (from, (n, e)) => s"(SELECT *, ($e) AS $n FROM $from)"
    }
    s"""SELECT event_id, t_f, v_mph, heat_index_f, wind_chill_f
      |FROM $inner
      |ORDER BY event_id""".stripMargin
  }

  // ---------- w28: the remaining operational thermal indices ----------
  // Completes the public thermal-index suite around the reference's
  // UTCI/WBGT core (thermofeel's catalogue: w17 covered NWS heat
  // index + wind chill; these are the other three in operational
  // use): Environment Canada's humidex (Masterton & Richardson
  // 1979), the Australian BoM apparent temperature (Steadman 1994,
  // non-radiative form) and the Hong Kong Observatory net effective
  // temperature (Li & Chan 2000). All ride the chain's already
  // quantized es_td (actual vapor pressure, hPa), rh and
  // wind_speed; the ONLY new transcendental (v^0.75 in NET's
  // convective term) goes through quantized exp(ln) per §8.3 —
  // every other term is single IEEE ops textually identical in
  // both dialects, the w17 bitwise discipline.

  private val w28Exprs: Seq[(String, String)] = {
    val v075 = q("exp(0.75 * ln(greatest(wind_speed, 1.0e-9)))")
    Seq(
      "humidex" -> "(ta_c + 0.5555 * (es_td - 10.0))",
      "apparent_t" -> "(ta_c + 0.33 * es_td - 0.70 * wind_speed - 4.00)",
      "net_effective" -> (s"(37.0 - (37.0 - ta_c) / (0.68 - 0.0014 * rh" +
        s" + 1.0 / (1.76 + 1.4 * $v075)) - 0.29 * ta_c * (1.0 - 0.01 * rh))"),
    )
  }

  def w28(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    w28Exprs.foldLeft(chain(spark, dir, 5)) { case (d, (n, e)) =>
      d.selectExpr("*", s"($e) AS $n")
    }
      .select($"event_id", $"ta_c", $"es_td", $"humidex", $"apparent_t",
        $"net_effective")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w28Sql: String = {
    val inner = w28Exprs.foldLeft(s"(${ThermalChain.sql(5)})") {
      case (from, (n, e)) => s"(SELECT *, ($e) AS $n FROM $from)"
    }
    s"""SELECT event_id, ta_c, es_td, humidex, apparent_t, net_effective
      |FROM $inner
      |ORDER BY event_id""".stripMargin
  }

  // ---------- w29: sunrise / sunset / day length ----------
  // The classic sunset-hour-angle identity cos H0 = −tan φ · tan δ
  // (NOAA's solar calculator; Spencer declination already in the
  // chain), clamped for polar day/night. The ONLY new
  // transcendental (acos) is quantized per §8.3; everything else is
  // single IEEE ops on already-quantized chain columns (sinlat,
  // coslat from level 5; sindecl, cosdecl from level 7) — the w17
  // bitwise discipline. Day length and solar sunrise/sunset hours
  // derive from H0 by constant factors.

  private val w29Exprs: Seq[(String, String)] = Seq(
    "x0" -> "least(1.0, greatest(-1.0, -(sinlat / coslat) * (sindecl / cosdecl)))",
    "h0" -> q("acos(x0)"),
    "daylight_h" -> "(h0 * (24.0 / pi()))",
    "sunrise_h" -> "(12.0 - h0 * (12.0 / pi()))",
    "sunset_h" -> "(12.0 + h0 * (12.0 / pi()))",
  )

  def w29(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    w29Exprs.foldLeft(chain(spark, dir, 7)) { case (d, (n, e)) =>
      d.selectExpr("*", s"($e) AS $n")
    }
      .selectExpr("event_id", "lat", "doy", "daylight_h", "sunrise_h", "sunset_h",
        "CAST(CASE WHEN x0 = -1.0 THEN 1 WHEN x0 = 1.0 THEN -1 ELSE 0 END AS BIGINT) AS polar")
      .transform(Tables.ordered(_, $"event_id"))
  }

  val w29Sql: String = {
    val inner = w29Exprs.foldLeft(s"(${ThermalChain.sql(7)})") {
      case (from, (n, e)) => s"(SELECT *, ($e) AS $n FROM $from)"
    }
    s"""SELECT event_id, lat, doy, daylight_h, sunrise_h, sunset_h,
      |  CAST(CASE WHEN x0 = -1.0 THEN 1 WHEN x0 = 1.0 THEN -1 ELSE 0 END AS BIGINT) AS polar
      |FROM $inner
      |ORDER BY event_id""".stripMargin
  }

  // ---------- w16: hour-of-day climatology + anomaly count ----------
  // The normals/anomalies shape of grid analytics: each reading is
  // compared with its cell's climatological mean FOR THAT HOUR OF
  // DAY across the period. One window shuffle on (cell, hour);
  // the mean is integerized (order-free) per SURVEY §8.

  def w16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = chain(spark, dir, 1).select($"lat", $"lon").distinct()
    val days = Tables.customer(spark, dir)
      .selectExpr("c_custkey % 30 AS day").distinct()
    val hours = Tables.nation(spark, dir)
      .filter($"n_nationkey" < 24).selectExpr("n_nationkey AS h")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lat", $"lon", $"h")
    cells.join(broadcast(days)).join(broadcast(hours))
      .withColumn("t", expr(w12T))
      .withColumn("c6", floor($"t" * 1e6 + lit(0.5)).cast("long"))
      .withColumn("nrm", (sum($"c6").over(w) / count(lit(1)).over(w)) / 1e6)
      .withColumn("anom", $"t" - $"nrm")
      .groupBy($"lat", $"lon")
      .agg(sum(when(abs($"anom") > 47.0, 1L).otherwise(0L)).as("n_anom"),
        (floor(max($"anom") * 1e6 + lit(0.5)) / 1e6).as("max_anom"))
      .transform(Tables.ordered(_, $"lat", $"lon"))
  }

  /** w21: heat episodes — per-cell runs of consecutive hours at or
    * above a temperature threshold (the heat-wave / alerting analytic
    * a thermal-index product sits under; the reference's chart bands
    * show severity per day, this finds sustained severity over time).
    * Gaps-and-islands on the dense grid hour: island id = global hour
    * − row_number per cell (q24's calendar move at hour grain), so a
    * run collapses to one group with NO self-joins and ONE shuffle on
    * the cell key — the window and the aggregate share it. Episodes
    * shorter than 3 h are dropped (alerting noise floor). The peak
    * temperature is a max over engine-identical doubles (order-free),
    * quantized only at presentation.
    */
  def w21(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = chain(spark, dir, 1).select($"lat", $"lon").distinct()
    val days = Tables.customer(spark, dir)
      .selectExpr("c_custkey % 30 AS day").distinct()
    val hours = Tables.nation(spark, dir)
      .filter($"n_nationkey" < 24).selectExpr("n_nationkey AS h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lat", $"lon").orderBy($"gh")
    cells.join(broadcast(days)).join(broadcast(hours))
      .withColumn("t", expr(w12T))
      .withColumn("gh", expr("day * 24 + h"))
      .filter($"t" >= 295.0)
      .withColumn("grp", $"gh" - row_number().over(w))
      .groupBy($"lat", $"lon", $"grp")
      .agg(min($"gh").as("ep_start"), max($"gh").as("ep_end"),
        count(lit(1)).as("n_hours"),
        (floor(max($"t") * 1e6 + lit(0.5)).cast("long") / 1e6).as("peak_t"))
      .filter($"n_hours" >= 3)
      .select($"lat", $"lon", $"ep_start", $"ep_end", $"n_hours", $"peak_t")
      .transform(Tables.ordered(_, $"lat", $"lon", $"ep_start"))
  }

  val w21Sql: String =
    s"""WITH g AS (${ThermalChain.sql(1)}),
      |cells AS (SELECT DISTINCT lat, lon FROM g),
      |days AS (SELECT DISTINCT c_custkey % 30 AS day FROM customer),
      |hours AS (SELECT n_nationkey AS h FROM nation WHERE n_nationkey < 24),
      |dense AS (SELECT lat, lon, day * 24 + h AS gh, ($w12T) AS t
      |          FROM cells CROSS JOIN days CROSS JOIN hours),
      |hot AS (SELECT lat, lon, gh, t FROM dense WHERE t >= 295.0),
      |i AS (SELECT lat, lon, gh, t,
      |        gh - row_number() OVER (PARTITION BY lat, lon ORDER BY gh) AS grp
      |      FROM hot)
      |SELECT lat, lon, min(gh) AS ep_start, max(gh) AS ep_end,
      |  count(*) AS n_hours,
      |  CAST(floor(max(t) * 1e6 + 0.5) AS BIGINT) / 1e6 AS peak_t
      |FROM i
      |GROUP BY lat, lon, grp
      |HAVING count(*) >= 3
      |ORDER BY lat, lon, ep_start""".stripMargin

  val w16Sql: String =
    s"""WITH g AS (${ThermalChain.sql(1)}),
      |cells AS (SELECT DISTINCT lat, lon FROM g),
      |days AS (SELECT DISTINCT c_custkey % 30 AS day FROM customer),
      |hours AS (SELECT n_nationkey AS h FROM nation WHERE n_nationkey < 24),
      |dense AS (SELECT lat, lon, day, h, ($w12T) AS t
      |          FROM cells CROSS JOIN days CROSS JOIN hours),
      |b AS (SELECT lat, lon, h, t,
      |        CAST(floor(t * 1e6 + 0.5) AS BIGINT) AS c6
      |      FROM dense),
      |n AS (SELECT lat, lon, t,
      |        (CAST(sum(c6) OVER w AS BIGINT) / count(*) OVER w) / 1e6 AS nrm
      |      FROM b WINDOW w AS (PARTITION BY lat, lon, h)),
      |a AS (SELECT lat, lon, t - nrm AS anom FROM n)
      |SELECT lat, lon,
      |  CAST(sum(CASE WHEN abs(anom) > 47.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anom,
      |  CAST(floor(max(anom) * 1e6 + 0.5) AS BIGINT) / 1e6 AS max_anom
      |FROM a
      |GROUP BY lat, lon
      |ORDER BY lat, lon""".stripMargin

  // ---------- w22: bilinear spatial regrid ----------

  /** w22: bilinear regridding — the spatial-resampling pass every
    * gridded product needs when a consumer wants values off the
    * native grid (downscaling, sensor-site extraction, model-to-model
    * remap; the reference serves fixed grid points, this is the step
    * beyond). Target points sit at a quarter-cell offset
    * (+1.25°, +1.25°) from each source cell, so the bilinear weights
    * are genuinely fractional: (0.75, 0.25) per axis → corner weights
    * 5625/1875/1875/625 over 10⁴ — kept as EXACT integers so each
    * target's weighted sum is one BIGINT dot product (value already
    * 1e6-integerized ⇒ 1e10 fixed point, far from overflow) and the
    * single final /1e10 division is bitwise cross-engine.
    *
    * Shape: targets explode their 4 corner keys (lon wraps with
    * w19's arithmetic) and equality-join the cell table — ONE
    * shuffle, never a spatial cross product; only targets with all
    * 4 corners emit (the lat boundary row drops, lon wraps around).
    * At 100 TB the corner join is the standard co-partitioned grid
    * join: both sides key on (lat, lon) cells.
    */
  def w22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = chain(spark, dir, 2)
      .groupBy($"lat", $"lon").agg(max($"tmp2m").as("t"))
      .cache()
    val corners = cells.selectExpr("lat AS clat", "lon AS clon",
      "CAST(floor(t * 1e6 + 0.5) AS BIGINT) AS c6")
    val targets = cells
      .selectExpr("lat AS lat0", "lon AS lon0", "explode(array(0.0, 5.0)) AS dlat")
      .selectExpr("lat0", "lon0", "dlat", "explode(array(0.0, 5.0)) AS dlon")
      .selectExpr("lat0", "lon0",
        "lat0 + dlat AS clat",
        "((lon0 + 177.5 + dlon + 360.0) % 360.0) - 177.5 AS clon",
        "CAST((CASE WHEN dlat = 0.0 THEN 75 ELSE 25 END) " +
          "* (CASE WHEN dlon = 0.0 THEN 75 ELSE 25 END) AS BIGINT) AS w4")
    targets.join(corners, Seq("clat", "clon"))
      .groupBy($"lat0", $"lon0")
      .agg(count(lit(1)).as("n_corners"),
        (sum($"w4" * $"c6") / 1e10).as("t_bilinear"))
      .filter($"n_corners" === 4)
      .selectExpr("lat0 + 1.25 AS lat",
        "((lon0 + 177.5 + 1.25 + 360.0) % 360.0) - 177.5 AS lon",
        "t_bilinear")
      .transform(Tables.ordered(_, $"lat", $"lon"))
  }

  val w22Sql: String =
    s"""WITH g AS (${ThermalChain.sql(2)}),
      |c AS (SELECT lat, lon, max(tmp2m) AS t FROM g GROUP BY 1, 2),
      |cor AS (SELECT lat AS clat, lon AS clon,
      |          CAST(floor(t * 1e6 + 0.5) AS BIGINT) AS c6 FROM c),
      |tg AS (SELECT lat AS lat0, lon AS lon0,
      |         lat + dlat.d AS clat,
      |         ((lon + 177.5 + dlon.d + 360.0) % 360.0) - 177.5 AS clon,
      |         CAST((CASE WHEN dlat.d = 0.0 THEN 75 ELSE 25 END)
      |           * (CASE WHEN dlon.d = 0.0 THEN 75 ELSE 25 END) AS BIGINT) AS w4
      |       FROM c
      |       CROSS JOIN (SELECT unnest([0.0, 5.0]) AS d) dlat
      |       CROSS JOIN (SELECT unnest([0.0, 5.0]) AS d) dlon),
      |s AS (SELECT lat0, lon0, count(*) AS n_corners,
      |        CAST(sum(w4 * c6) AS BIGINT) / 1e10 AS t_bilinear
      |      FROM tg JOIN cor USING (clat, clon)
      |      GROUP BY 1, 2)
      |SELECT lat0 + 1.25 AS lat,
      |  ((lon0 + 177.5 + 1.25 + 360.0) % 360.0) - 177.5 AS lon,
      |  t_bilinear
      |FROM s WHERE n_corners = 4
      |ORDER BY 1, 2""".stripMargin

  // ---------- w26: temperature anomaly vs cell normals ----------

  /** w26: TEMPERATURE ANOMALY — each cell-day's daily max as a
    * DEPARTURE FROM THE CELL'S NORMAL (its mean daily max over the
    * record), the standard climate product (NOAA/Copernicus anomaly
    * maps are exactly this): absolute temperatures hide geography,
    * anomalies expose events, and w21/w25 both implicitly threshold
    * what w26 makes explicit per cell-day. Composition: w12's daily
    * extremes; the normal is the per-cell mean via the w16 integer
    * trick (hi quantized to c6 = floor(hi·10⁶ + ½), summed exactly,
    * ONE IEEE division by the day count, /1e6) so the mean is
    * order-free; the anomaly is one subtract of deterministic
    * doubles. The normal's window PARTITIONS on the cell key w12's
    * aggregate already hashed by — no additional exchange (the
    * w21 shared-shuffle contract).
    */
  def w26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lat", $"lon")
    w12Daily(spark, dir)
      .withColumn("c6", floor($"hi" * 1e6 + lit(0.5)).cast("long"))
      .withColumn("normal_hi", (sum($"c6").over(w) / count(lit(1)).over(w)) / 1e6)
      .withColumn("anom", $"hi" - $"normal_hi")
      .select($"lat", $"lon", $"lday", $"hi", $"normal_hi", $"anom")
      .transform(Tables.ordered(_, $"lat", $"lon", $"lday"))
  }

  /** w26 oracle: w12's daily CTE + the identical quantized-mean
    * normal and subtraction.
    */
  val w26Sql: String =
    s"""$w12SqlDaily,
      |c AS (SELECT lat, lon, lday, hi,
      |        CAST(floor(hi * 1e6 + 0.5) AS BIGINT) AS c6
      |      FROM daily),
      |n AS (SELECT lat, lon, lday, hi,
      |        (sum(c6) OVER (PARTITION BY lat, lon)
      |           / count(*) OVER (PARTITION BY lat, lon)) / 1e6 AS normal_hi
      |      FROM c)
      |SELECT lat, lon, lday, hi, normal_hi, hi - normal_hi AS anom
      |FROM n
      |ORDER BY lat, lon, lday""".stripMargin

  // ---------- w25: heat blobs (spatial components of hot cells) ----------

  /** Hot-day threshold (K) and minimum hot-day count for a cell to
    * enter the blob graph: 300.15 K (27 °C) daily max on ≥ 10 of the
    * ~30 local days — the persistent-heat criterion (a one-day
    * spike is w21's per-cell episode; w25 asks which cells are hot
    * TOGETHER in space).
    */
  private val w25HotK = 300.15
  private val w25MinDays = 10L

  /** w25: HEAT BLOBS — spatially CONNECTED regions of persistently
    * hot cells, the event-detection layer climatology products run
    * above per-cell extremes (heatwave-region extraction: NOAA/
    * Copernicus publish exactly such contiguous-area event masks).
    * w21 found heat episodes in TIME per cell; w25 finds the blobs
    * in SPACE: cells whose daily max exceeded [[w25HotK]] on ≥
    * [[w25MinDays]] local days, connected by 4-neighborhood
    * adjacency on the 5° grid WITH east-west wraparound (lon is
    * circular; lat is not), labeled by connected component.
    *
    * Composition: w12's daily-extremes core (one (cell, lday)
    * shuffle) → hot-cell aggregate → arithmetic neighbor-key edges
    * (east = (li, (lj+1) mod 72), north = (li+1, lj); an equality
    * SELF-join of the hot-cell id set on the computed key — id-only
    * payloads, no spatial range join) → [[Dedup.ccStars]]
    * contraction (log-round bound, diameter-independent — the g4
    * path, which matters here: the fixture's largest blob spans 450
    * cells and wraps the globe, so label propagation would need
    * hundreds of rounds). Blob grain: cells, hot-day mass, peak
    * temperature (max of quantized values — exact cross-engine).
    * Oracle: recursive min-label closure (g4's implementation-
    * independent ground truth).
    */
  def w25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hot = w12Daily(spark, dir)
      .filter($"hi" > w25HotK)
      .groupBy($"lat", $"lon")
      .agg(count(lit(1)).as("hot_days"), max($"hi").as("peak"))
      .filter($"hot_days" >= w25MinDays)
      .selectExpr(
        "CAST(floor((lat + 70.0) / 5.0 + 0.5) AS BIGINT) * 72 " +
          "+ CAST(floor((lon + 177.5) / 5.0 + 0.5) AS BIGINT) AS id",
        "hot_days", "peak")
      .cache()
    val ids = hot.select($"id")
    val edges = ids
      .selectExpr("id AS src", "(id div 72) * 72 + ((id % 72) + 1) % 72 AS nb")
      .unionAll(ids.selectExpr("id AS src", "id + 72 AS nb"))
      .join(ids.withColumnRenamed("id", "nb"), Seq("nb"))
      .selectExpr("src", "nb AS dst")
    val (labels, _, conv) = Dedup.ccStars(edges, 50)
    require(conv, "w25 ccStars did not converge within 50 rounds")
    hot.join(labels, Seq("id"), "left_outer")
      .select(coalesce($"lbl", $"id").as("blob"), $"hot_days", $"peak")
      .groupBy($"blob")
      .agg(count(lit(1)).as("n_cells"),
        sum($"hot_days").as("hot_day_total"),
        max($"peak").as("peak_hi"))
      .transform(Tables.ordered(_, $"blob"))
  }

  /** w25 oracle: w12's daily CTE prefix, the same arithmetic
    * neighbor keys, min-label transitive closure via recursive CTE
    * (UNION dedups → fixpoint), blob-grain aggregate.
    */
  val w25Sql: String =
    s"""${w12SqlDaily.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |hotc AS (
      |  SELECT CAST(floor((lat + 70.0) / 5.0 + 0.5) AS BIGINT) * 72
      |           + CAST(floor((lon + 177.5) / 5.0 + 0.5) AS BIGINT) AS id,
      |    CAST(count(*) AS BIGINT) AS hot_days, max(hi) AS peak
      |  FROM daily WHERE hi > $w25HotK
      |  GROUP BY 1 HAVING count(*) >= $w25MinDays),
      |e AS (
      |  SELECT h.id AS src, n.id AS dst FROM hotc h
      |  JOIN hotc n ON n.id = (h.id // 72) * 72 + ((h.id % 72) + 1) % 72
      |  UNION ALL
      |  SELECT h.id, n.id FROM hotc h JOIN hotc n ON n.id = h.id + 72),
      |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
      |reach(id, lbl) AS (
      |  SELECT id, id FROM hotc
      |  UNION
      |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id),
      |comp AS (SELECT id, min(lbl) AS blob FROM reach GROUP BY id)
      |SELECT c.blob, count(*) AS n_cells,
      |  CAST(sum(h.hot_days) AS BIGINT) AS hot_day_total,
      |  max(h.peak) AS peak_hi
      |FROM hotc h JOIN comp c ON c.id = h.id
      |GROUP BY c.blob
      |ORDER BY c.blob""".stripMargin

  // ---------- w27: spatiotemporal heat-blob TRACKS ----------

  /** The track threshold: within 0.02 K of the synthetic
    * temperature's 303.15 K saturation cap — sparse (~20% of
    * cell-days) yet persistent enough that blobs actually drift and
    * survive across days (at the cap itself every box-day is an
    * isolated singleton — measured), and bitwise identical in both
    * engines (hi is the oracle-green w12 value).
    */
  private val w27HotK = 303.13

  /** w27: HEAT-BLOB TRACKING — the spatioTEMPORAL extension of w25
    * (storm/heatwave tracking: the event-catalog product a weather
    * pipeline derives from gridded dailies; same shape as cyclone
    * tracking in reanalysis post-processing). A TRACK is a connected
    * component of hot (5°-box, day) nodes under BOTH adjacency
    * kinds: spatial (w25's arithmetic east-with-wrap / north
    * neighbor keys, same day) and temporal (the SAME box on
    * consecutive days) — so a blob that drifts, splits or merges
    * over days stays ONE event, exactly how storm catalogs define
    * lifetime. Per track: box-day count, distinct boxes, distinct
    * days, first/last day and the peak box occupancy (raw cells at
    * cap inside one box-day).
    *
    * Scale shape: everything heavy rides w12's daily machinery; the
    * track graph lives at the (box, day) grain — a ~100-1000×
    * contraction of cell grain — with id-only arithmetic-key edges
    * (no spatial join, no cartesian; w25's discipline plus one
    * temporal equality self-join), closed by ccStars' log-round
    * contraction. The node id packs (box, day) as box·1000 + day —
    * collision-free (day < 1000) and pure integer math both engines.
    */
  def w27(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hotd = w12Daily(spark, dir)
      .filter($"hi" > w27HotK)
      .selectExpr(
        "CAST(floor((lat + 70.0) / 5.0 + 0.5) AS BIGINT) * 72 " +
          "+ CAST(floor((lon + 177.5) / 5.0 + 0.5) AS BIGINT) AS cell",
        "lday")
      .groupBy($"cell", $"lday")
      .agg(count(lit(1)).as("n_raw"))
      .selectExpr("cell * 1000 + lday AS nid", "cell", "lday", "n_raw")
      .cache()
    val ids = hotd.select($"nid", $"cell", $"lday")
    val spatialE = ids
      .selectExpr("nid AS src",
        "((cell div 72) * 72 + ((cell % 72) + 1) % 72) * 1000 + lday AS nb")
      .unionAll(ids.selectExpr("nid AS src", "(cell + 72) * 1000 + lday AS nb"))
    val temporalE = ids.selectExpr("nid AS src", "cell * 1000 + lday + 1 AS nb")
    val edges = spatialE.unionAll(temporalE)
      .join(ids.select($"nid".as("nb")), Seq("nb"))
      .selectExpr("src", "nb AS dst")
    val (labels, _, conv) = Dedup.ccStars(edges, 50)
    require(conv, "w27 ccStars did not converge within 50 rounds")
    hotd.join(labels.withColumnRenamed("id", "nid"), Seq("nid"), "left_outer")
      .select(coalesce($"lbl", $"nid").as("track"), $"cell", $"lday", $"n_raw")
      .groupBy($"track")
      .agg(count(lit(1)).as("n_box_days"),
        countDistinct($"cell").as("n_boxes"),
        countDistinct($"lday").as("n_days"),
        min($"lday").as("first_day"),
        max($"lday").as("last_day"),
        max($"n_raw").as("peak_box_cells"))
      .transform(Tables.ordered(_, $"track"))
  }

  /** w27 oracle: w12's daily CTE prefix, identical packed (box, day)
    * node ids and arithmetic edge keys (spatial wrap + temporal
    * successor), min-label recursive closure, track-grain aggregate.
    */
  val w27Sql: String =
    s"""${w12SqlDaily.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |hotd AS (
      |  SELECT cell, lday, cell * 1000 + lday AS nid,
      |    CAST(count(*) AS BIGINT) AS n_raw
      |  FROM (SELECT CAST(floor((lat + 70.0) / 5.0 + 0.5) AS BIGINT) * 72
      |            + CAST(floor((lon + 177.5) / 5.0 + 0.5) AS BIGINT) AS cell,
      |          lday
      |        FROM daily WHERE hi > $w27HotK)
      |  GROUP BY cell, lday),
      |e AS (
      |  SELECT h.nid AS src, n.nid AS dst FROM hotd h
      |  JOIN hotd n ON n.nid = ((h.cell // 72) * 72 + ((h.cell % 72) + 1) % 72) * 1000 + h.lday
      |  UNION ALL
      |  SELECT h.nid, n.nid FROM hotd h JOIN hotd n ON n.nid = (h.cell + 72) * 1000 + h.lday
      |  UNION ALL
      |  SELECT h.nid, n.nid FROM hotd h JOIN hotd n ON n.nid = h.cell * 1000 + h.lday + 1),
      |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
      |reach(id, lbl) AS (
      |  SELECT nid, nid FROM hotd
      |  UNION
      |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id),
      |comp AS (SELECT id, min(lbl) AS track FROM reach GROUP BY id)
      |SELECT c.track, count(*) AS n_box_days,
      |  CAST(count(DISTINCT h.cell) AS BIGINT) AS n_boxes,
      |  CAST(count(DISTINCT h.lday) AS BIGINT) AS n_days,
      |  min(h.lday) AS first_day, max(h.lday) AS last_day,
      |  max(h.n_raw) AS peak_box_cells
      |FROM hotd h JOIN comp c ON c.id = h.nid
      |GROUP BY c.track
      |ORDER BY c.track""".stripMargin

  // ---------- w30: marching-squares contour ISOLINES ----------

  /** The 9 band boundaries (w14's `divisions`, main.py:378-390) —
    * each is an isoline level; levels outside the field's range
    * contribute no segments (the chart's empty-band case). */
  private[graft] val w30Levels =
    Seq(-40.0, -27.0, -13.0, 0.0, 9.0, 26.0, 32.0, 38.0, 46.0)

  /** w30: CONTOUR ISOLINES — the last algorithmic step to the
    * reference's chart geometry (main.py:409-416 `contourf` draws
    * filled isoline POLYGONS; w14/w18 stop at per-cell band grain).
    * MARCHING SQUARES in three relational moves, all grid-key
    * arithmetic: (1) squares assemble by the w19 stencil discipline
    * — each cell contributes itself to the ≤ 4 squares it corners
    * (one bounded explode + one shuffle on the square key; squares
    * missing a corner — the lat boundary — drop out, longitude
    * wraps mod 72 like w25); (2) each (square, level) classifies
    * into the 4-bit marching-squares case (SW=1, SE=2, NE=4, NW=8)
    * and emits its segment(s) from the standard case table as a
    * 6-way UNION of edge-midpoint pairs — MIDPOINT decimation, so
    * every endpoint is an exact half-grid rational (w22's integer
    * discipline: coordinates ride as 2× integers, never floats;
    * the two ambiguous saddles 5/10 take the fixed standard
    * resolution, identical on both engines); (3) segments stitch
    * into rings/polylines by [[graft.operators.Dedup.ccStars]]
    * over endpoint keys (level-tagged, so components never span
    * levels — the w25 path, log-round, diameter-independent: a
    * globe-circling isoline is one component in ~6 rounds, not
    * 144). Output: one row per (level, ring) with segment/point
    * counts, the closed-ring flag (closed ⇔ |segments| = |points|;
    * an isoline hitting the lat boundary is an open polyline), and
    * the half-grid bounding box. Cartographic projection and PNG
    * overlay stay out of scope (presentation geometry).
    *
    * Scale: squares = one bounded explode + one shuffle at grid
    * grain (corpus-size independent); the case table and segment
    * union are row-local; stitching is ccStars over O(crossing
    * cells) id-only rows per level. The oracle recomputes the whole
    * construction including the ring closure (recursive min-label —
    * the w25/w27 precedent). */
  def w30(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the field: per-cell all-days max UTCI — w14's banded value at
    // seasonal grain (one scalar per grid cell)
    val cell = chain(spark, dir, 22)
      .groupBy($"lat", $"lon").agg(max($"utci_c").as("v"))
      .selectExpr(
        "CAST(floor((lat + 70.0) / 5.0 + 0.5) AS BIGINT) AS li",
        "CAST(floor((lon + 177.5) / 5.0 + 0.5) AS BIGINT) AS lj",
        "v")
    w30Rings(cell, w30Levels)
  }

  /** The marching-squares kernel over an arbitrary (li, lj, v) grid
    * frame — factored so the spec can stitch a KNOWN synthetic
    * field's rings (the single-cell diamond, the globe-circling
    * wrap pair, the open boundary polyline). */
  private[graft] def w30Rings(cell: DataFrame, lvls: Seq[Double])
      : DataFrame = {
    val spark = cell.sparkSession
    import spark.implicits._
    // (1) square assembly — w19's stencil: cell (li, lj) is corner
    // (dy, dx) of square (li-dy, (lj-dx) mod 72)
    val sq = cell
      .selectExpr("li", "lj", "v", "explode(array(0, 1)) AS dy")
      .selectExpr("li - dy AS si", "lj", "v", "dy",
        "explode(array(0, 1)) AS dx")
      .selectExpr("si", "((lj - dx) + 72) % 72 AS sj", "dy", "dx", "v")
      .groupBy($"si", $"sj")
      .agg(count(lit(1)).as("nc"),
        max(when($"dy" === 0 && $"dx" === 0, $"v")).as("vsw"),
        max(when($"dy" === 0 && $"dx" === 1, $"v")).as("vse"),
        max(when($"dy" === 1 && $"dx" === 0, $"v")).as("vnw"),
        max(when($"dy" === 1 && $"dx" === 1, $"v")).as("vne"))
      .filter($"nc" === 4)
    val levels = lvls.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("ti", "thr")
    // (2) case classification + edge-midpoint node keys: half-grid
    // integer coordinates (y2 = 2·lat-index, x2 = 2·lon-index,
    // wrapping at 144), packed level-tagged as ti·10^6 + y2·10^3 + x2
    val cg = sq.crossJoin(broadcast(levels))
      .selectExpr("ti", "thr",
        "CAST(vsw >= thr AS INT) + 2 * CAST(vse >= thr AS INT) + " +
          "4 * CAST(vne >= thr AS INT) + 8 * CAST(vnw >= thr AS INT) AS mcase",
        "ti * 1000000 + (2 * si) * 1000 + (2 * sj + 1) AS s",
        "ti * 1000000 + (2 * si + 1) * 1000 + ((2 * sj + 2) % 144) AS e",
        "ti * 1000000 + (2 * si + 2) * 1000 + (2 * sj + 1) AS n",
        "ti * 1000000 + (2 * si + 1) * 1000 + (2 * sj) AS w")
      .filter("mcase > 0 AND mcase < 15")
      .localCheckpoint() // six consumers below — cut the recompute
    // the standard marching-squares case table, undirected, as a
    // 6-way union of the distinct segment patterns (saddles 5/10
    // fixed to {W-N, S-E} / {N-E, W-S})
    val seg = Seq(
      ("w", "s", Seq(1, 10, 14)), ("s", "e", Seq(2, 5, 13)),
      ("w", "e", Seq(3, 12)), ("n", "e", Seq(4, 10, 11)),
      ("w", "n", Seq(5, 7, 8)), ("s", "n", Seq(6, 9))
    ).map { case (p1, p2, cs) =>
      cg.filter(col("mcase").isin(cs: _*))
        .selectExpr("ti", "thr",
          s"least($p1, $p2) AS a", s"greatest($p1, $p2) AS b")
    }.reduce(_ unionByName _)
    // (3) ring assembly: connected components over endpoint keys
    val (labels, _, conv) = Dedup.ccStars(
      seg.selectExpr("a AS src", "b AS dst"), 50)
    require(conv, "w30 ccStars did not converge within 50 rounds")
    val pts = seg.selectExpr("ti", "a AS p")
      .unionByName(seg.selectExpr("ti", "b AS p")).distinct()
    val nSeg = seg.join(labels.withColumnRenamed("id", "a"), Seq("a"))
      .groupBy($"ti", $"thr", $"lbl")
      .agg(count(lit(1)).as("n_segments"))
    val nPts = pts.join(labels.withColumnRenamed("id", "p"), Seq("p"))
      .groupBy($"ti", $"lbl")
      .agg(count(lit(1)).as("n_points"),
        min(expr("(p % 1000000) div 1000")).as("y2_min"),
        max(expr("(p % 1000000) div 1000")).as("y2_max"),
        min(expr("p % 1000")).as("x2_min"),
        max(expr("p % 1000")).as("x2_max"))
    nSeg.join(nPts, Seq("ti", "lbl"))
      .selectExpr("thr", "lbl AS ring", "n_segments", "n_points",
        "n_segments = n_points AS closed",
        "y2_min", "y2_max", "x2_min", "x2_max")
      .transform(Tables.ordered(_, $"thr", $"ring"))
  }

  /** w30 oracle: the identical construction — stencil squares by
    * 3-way corner self-join, the same case arithmetic and segment
    * case table, recursive min-label ring closure (the w25
    * precedent), same packed half-grid keys. */
  val w30Sql: String = {
    val values = w30Levels.zipWithIndex
      .map { case (v, i) => s"(CAST($i AS BIGINT), CAST($v AS DOUBLE))" }
      .mkString(", ")
    s"""WITH RECURSIVE g AS (${ThermalChain.sql(22)}),
      |c AS (SELECT CAST(floor((lat + 70.0) / 5.0 + 0.5) AS BIGINT) AS li,
      |        CAST(floor((lon + 177.5) / 5.0 + 0.5) AS BIGINT) AS lj,
      |        max(utci_c) AS v
      |      FROM g GROUP BY 1, 2),
      |sq AS (SELECT sw.li AS si, sw.lj AS sj, sw.v AS vsw, se.v AS vse,
      |        nw.v AS vnw, ne.v AS vne
      |      FROM c sw
      |      JOIN c se ON se.li = sw.li AND se.lj = (sw.lj + 1) % 72
      |      JOIN c nw ON nw.li = sw.li + 1 AND nw.lj = sw.lj
      |      JOIN c ne ON ne.li = sw.li + 1 AND ne.lj = (sw.lj + 1) % 72),
      |t(ti, thr) AS (VALUES $values),
      |cg AS (SELECT ti, thr,
      |        CAST(vsw >= thr AS INT) + 2 * CAST(vse >= thr AS INT)
      |          + 4 * CAST(vne >= thr AS INT) + 8 * CAST(vnw >= thr AS INT) AS mcase,
      |        ti * 1000000 + (2 * si) * 1000 + (2 * sj + 1) AS s,
      |        ti * 1000000 + (2 * si + 1) * 1000 + ((2 * sj + 2) % 144) AS e,
      |        ti * 1000000 + (2 * si + 2) * 1000 + (2 * sj + 1) AS n,
      |        ti * 1000000 + (2 * si + 1) * 1000 + (2 * sj) AS w
      |      FROM sq CROSS JOIN t),
      |seg AS (
      |  SELECT ti, thr, least(w, s) AS a, greatest(w, s) AS b FROM cg WHERE mcase IN (1, 10, 14)
      |  UNION ALL
      |  SELECT ti, thr, least(s, e), greatest(s, e) FROM cg WHERE mcase IN (2, 5, 13)
      |  UNION ALL
      |  SELECT ti, thr, least(w, e), greatest(w, e) FROM cg WHERE mcase IN (3, 12)
      |  UNION ALL
      |  SELECT ti, thr, least(n, e), greatest(n, e) FROM cg WHERE mcase IN (4, 10, 11)
      |  UNION ALL
      |  SELECT ti, thr, least(w, n), greatest(w, n) FROM cg WHERE mcase IN (5, 7, 8)
      |  UNION ALL
      |  SELECT ti, thr, least(s, n), greatest(s, n) FROM cg WHERE mcase IN (6, 9)),
      |pts AS (SELECT DISTINCT ti, p FROM (
      |      SELECT ti, a AS p FROM seg
      |      UNION ALL SELECT ti, b FROM seg)),
      |und AS (SELECT a AS src, b AS dst FROM seg UNION SELECT b, a FROM seg),
      |reach(id, lbl) AS (
      |  SELECT p, p FROM pts
      |  UNION
      |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id),
      |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
      |nseg AS (SELECT s.ti, s.thr, c1.lbl,
      |        CAST(count(*) AS BIGINT) AS n_segments
      |      FROM seg s JOIN comp c1 ON c1.id = s.a GROUP BY 1, 2, 3),
      |npts AS (SELECT p.ti, c2.lbl, CAST(count(*) AS BIGINT) AS n_points,
      |        min((p.p % 1000000) // 1000) AS y2_min,
      |        max((p.p % 1000000) // 1000) AS y2_max,
      |        min(p.p % 1000) AS x2_min, max(p.p % 1000) AS x2_max
      |      FROM pts p JOIN comp c2 ON c2.id = p.p GROUP BY 1, 2)
      |SELECT n.thr, n.lbl AS ring, n.n_segments, m.n_points,
      |  n.n_segments = m.n_points AS closed,
      |  m.y2_min, m.y2_max, m.x2_min, m.x2_max
      |FROM nseg n JOIN npts m ON m.ti = n.ti AND m.lbl = n.lbl
      |ORDER BY 1, 2""".stripMargin
  }
}
