package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ThermalChain.q

/** Data-quality validation and geospatial operators.
  *
  * dq1: the constraint sweep every ETL run wants before publishing —
  * null checks, domain checks, referential integrity — emitted as one
  * (check, n_violations) report so a single scan of each table feeds
  * many assertions.
  *
  * w15: nearest-mask-point by haversine distance — the geospatial
  * lookup the reference approximates with exact (lat, lon) equality
  * (main.py:281-304); here each grid cell finds its closest near-land
  * anchor. Small anchor set broadcasts; per-cell work is |anchors|.
  */
object Quality {

  def dq1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val ev = Tables.events(spark, dir)
    val checks = Seq(
      li.agg(count(when($"l_quantity".isNull || $"l_quantity" <= 0, 1)).as("n"))
        .select(lit("lineitem_quantity_positive").as("chk"), $"n"),
      li.agg(count(when($"l_discount" < 0 || $"l_discount" > 0.5, 1)).as("n"))
        .select(lit("lineitem_discount_domain").as("chk"), $"n"),
      li.join(ord, $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("lineitem_orphan_orders").as("chk"), $"n"),
      ord.agg(count(when($"o_totalprice" <= 0, 1)).as("n"))
        .select(lit("orders_price_positive").as("chk"), $"n"),
      ev.agg(count(when(!$"event_type".isin("click", "error", "purchase", "signup", "view"), 1)).as("n"))
        .select(lit("events_type_domain").as("chk"), $"n"),
      ev.agg(count(when($"ts".isNull, 1)).as("n"))
        .select(lit("events_ts_not_null").as("chk"), $"n"),
    )
    checks.reduce(_ unionByName _).orderBy($"chk")
  }

  val dq1Sql: String =
    """SELECT 'lineitem_quantity_positive' AS chk, count(*) FILTER (WHERE l_quantity IS NULL OR l_quantity <= 0) AS n FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_discount_domain', count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5) FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_orphan_orders', count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |UNION ALL
      |SELECT 'orders_price_positive', count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
      |UNION ALL
      |SELECT 'events_type_domain', count(*) FILTER (WHERE event_type NOT IN ('click', 'error', 'purchase', 'signup', 'view')) FROM events
      |UNION ALL
      |SELECT 'events_ts_not_null', count(*) FILTER (WHERE ts IS NULL) FROM events
      |ORDER BY 1""".stripMargin

  /** Haversine distance (km) between quantized radian coordinates —
    * shared template, q-quantized trig keeps both engines bitwise.
    */
  private def haversine(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val sdlat = q(s"sin((($lat2) - ($lat1)) * pi() / 360.0)")
    val sdlon = q(s"sin((($lon2) - ($lon1)) * pi() / 360.0)")
    val coslat1 = q(s"cos(($lat1) * pi() / 180.0)")
    val coslat2 = q(s"cos(($lat2) * pi() / 180.0)")
    s"12742.0 * ${q(s"asin(least(1.0, sqrt($sdlat * $sdlat + $coslat1 * $coslat2 * $sdlon * $sdlon)))")}"
  }

  def w15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = ThermalCells.cells(spark, dir)
    val anchors = Tables.part(spark, dir).filter($"p_size" > 45)
      .selectExpr("CAST(p_partkey % 29 AS DOUBLE) * 5.0 - 70.0 AS alat",
        "CAST((p_partkey * 3) % 72 AS DOUBLE) * 5.0 - 177.5 AS alon")
      .distinct()
    val dist = haversine("lat", "lon", "alat", "alon")
    // argmin as min(struct(d, alat, alon)) — lexicographic struct
    // ordering IS the window's (d, alat, alon) tie-break, but as one
    // partially-aggregated shuffle of O(1) state per cell instead of
    // a full sort of every (cell, anchor) pair
    cells.join(broadcast(anchors))
      .selectExpr("lat", "lon", "alat", "alon", s"($dist) AS d")
      .groupBy($"lat", $"lon")
      .agg(min(struct($"d", $"alat", $"alon")).as("m"))
      .selectExpr("lat", "lon", "m.alat AS alat", "m.alon AS alon", "m.d AS d")
      .transform(graft.Tables.ordered(_, $"lat", $"lon"))
  }

  val w15Sql: String = {
    val dist = haversine("lat", "lon", "alat", "alon")
    s"""WITH cells AS (${ThermalCells.cellsSql}),
      |anchors AS (SELECT DISTINCT CAST(p_partkey % 29 AS DOUBLE) * 5.0 - 70.0 AS alat,
      |              CAST((p_partkey * 3) % 72 AS DOUBLE) * 5.0 - 177.5 AS alon
      |            FROM part WHERE p_size > 45),
      |scored AS (SELECT lat, lon, alat, alon, ($dist) AS d,
      |             row_number() OVER (PARTITION BY lat, lon ORDER BY ($dist), alat, alon) AS rn
      |           FROM cells CROSS JOIN anchors)
      |SELECT lat, lon, alat, alon, d
      |FROM scored WHERE rn = 1
      |ORDER BY lat, lon""".stripMargin
  }
}

/** Distinct grid cells shared by w15's two sides. */
object ThermalCells {
  def cells(spark: SparkSession, dir: String): DataFrame =
    graft.functions.ThermalChain.df(spark, dir, 1)
      .select(org.apache.spark.sql.functions.col("lat"),
        org.apache.spark.sql.functions.col("lon")).distinct()

  val cellsSql: String =
    s"SELECT DISTINCT lat, lon FROM (${graft.functions.ThermalChain.sql(1)})"
}
