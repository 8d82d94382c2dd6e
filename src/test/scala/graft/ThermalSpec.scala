package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ThermalChain
import graft.operators.Weather

class ThermalSpec extends AnyFunSuite {
  test("w17: heat index exceeds T when hot+humid; wind chill below T when cold+windy") {
    val spark = SharedSpark.spark
    val rows = graft.operators.Weather.w17(spark, SharedSpark.sf).collect()
    assert(rows.nonEmpty)
    var hotHumid = 0
    var chilled = 0
    rows.foreach { r =>
      val t = r.getAs[Double]("t_f")
      val v = r.getAs[Double]("v_mph")
      val hi = r.getAs[Double]("heat_index_f")
      val wc = r.getAs[Double]("wind_chill_f")
      if (t >= 80.0 && hi > t) hotHumid += 1
      if (t <= 50.0 && v > 3.0) { assert(wc <= t + 1e-9); chilled += 1 }
      if (t > 50.0) assert(wc == t)
    }
    assert(hotHumid > 0 && chilled > 0)
  }

  test("w28: humidex/apparent/NET behave physically and match a direct recompute") {
    val spark = SharedSpark.spark
    val rows = graft.operators.Weather.w28(spark, SharedSpark.sf).collect()
    assert(rows.nonEmpty)
    var humidBoost = 0
    var windCooled = 0
    rows.foreach { r =>
      val t = r.getAs[Double]("ta_c")
      val e = r.getAs[Double]("es_td")
      val hx = r.getAs[Double]("humidex")
      val at = r.getAs[Double]("apparent_t")
      // humidex formula is exactly reconstructible from its inputs
      assert(math.abs(hx - (t + 0.5555 * (e - 10.0))) < 1e-9)
      // moist air raises humidex above T; wind drags apparent T below
      // the calm-air value (0.33e − 4 alone)
      if (e > 10.0 && hx > t) humidBoost += 1
      if (at < t + 0.33 * e - 4.0 - 1e-12) windCooled += 1
      // NET stays a temperature-like quantity on physical inputs
      val net = r.getAs[Double]("net_effective")
      assert(net > -90.0 && net < 60.0, s"NET unphysical: $net at t=$t")
    }
    assert(humidBoost > 0 && windCooled > 0)
  }

  test("w29: day length obeys the sunset-hour-angle physics") {
    val spark = SharedSpark.spark
    val rows = graft.operators.Weather.w29(spark, SharedSpark.sf).collect()
      .map(r => (r.getAs[Double]("lat"), r.getAs[Long]("doy"),
        r.getAs[Double]("daylight_h"), r.getAs[Double]("sunrise_h"),
        r.getAs[Double]("sunset_h"), r.getAs[Long]("polar")))
    assert(rows.nonEmpty)
    rows.foreach { case (lat, _, dl, sr, ss, polar) =>
      // bounds (quantized acos may overshoot pi by <= 5e-7)
      assert(dl >= 0.0 && dl <= 24.0 + 1e-4, s"day length $dl at lat $lat")
      assert(math.abs(ss - sr - dl) < 1e-9, "sunrise/sunset/daylight inconsistent")
      assert(math.abs((sr + ss) - 24.0) < 1e-9, "solar noon not at 12")
      if (polar == 1L) assert(dl > 23.999, s"midnight sun should be ~24h, got $dl")
      if (polar == -1L) assert(dl < 1e-9, s"polar night should be 0h, got $dl")
      // near the equator every day is ~12 h
      if (math.abs(lat) < 5.0) assert(math.abs(dl - 12.0) < 1.0,
        s"equatorial day length $dl at lat $lat")
    }
    // the fixture genuinely exercises the polar branches and the
    // seasonal spread
    assert(rows.exists(_._6 != 0L))
    val dls = rows.filter(r => math.abs(r._1) > 55 && r._6 == 0L).map(_._3)
    assert(dls.nonEmpty && dls.max - dls.min > 4.0, "no seasonal spread at high lat")
  }

  test("w16: anomalies bounded by the synthetic field's amplitude") {
    val spark = SharedSpark.spark
    val rows = graft.operators.Weather.w16(spark, SharedSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // t = 263.15 + 40*sin => any deviation from an hourly mean is < 80
      assert(math.abs(r.getAs[Double]("max_anom")) <= 80.0)
      assert(r.getAs[Long]("n_anom") >= 0)
    }
    // the threshold must discriminate: anomalies exist but are a
    // sparse minority of the ~720 readings per cell
    val total = rows.map(_.getAs[Long]("n_anom")).sum
    assert(total > 0)
    assert(total < rows.length * 720 / 20, s"flags not sparse: $total")
  }

  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf
  import spark.implicits._

  lazy val full = ThermalChain.df(spark, sf, ThermalChain.full).cache()

  test("avg_cza lies in [0, 1]") {
    assert(full.filter($"avg_cza" < 0 || $"avg_cza" > 1).count() == 0)
  }

  test("erbs split: dhi <= ghi, dni >= 0, kt in [0,1]") {
    val bad = full.filter(
      $"dhi" > $"dswrfsfc" + 1e-9 || $"dni" < 0 || $"kt" < 0 || $"kt" > 1).count()
    assert(bad == 0)
  }

  test("mrt is physically plausible for the synthetic grid") {
    val stats = full.agg(min($"mrt_c"), max($"mrt_c")).head()
    assert(stats.getDouble(0) > -90 && stats.getDouble(1) < 120)
  }

  test("utci stays in the encodable band for clamped inputs") {
    val bad = full.filter($"utci_c" < -100 || $"utci_c" > 99.9).count()
    assert(bad == 0)
  }

  test("encode/decode roundtrip is exact") {
    val bad = full.filter(
      $"utci_d" =!= $"utci_e" || $"wbgt_d" =!= $"wbgt_e" || $"off_d" =!= $"offh").count()
    assert(bad == 0)
  }

  test("encoded fits in int32 and is non-negative") {
    val stats = full.agg(min($"encoded"), max($"encoded")).head()
    assert(stats.getInt(0) >= 0)
    assert(stats.getInt(1) <= Int.MaxValue)
  }

  test("w9 merge prefers new data on overlap") {
    val overlap = Weather.w9(spark, sf)
      .filter($"aoff" >= 240 && $"aoff" < 300 && $"src" === "old").count()
    assert(overlap == 0)
  }

  test("w12 keeps only complete 24h local days, and drops some") {
    val ext = Weather.w12(spark, sf)
    val kept = ext.count()
    assert(kept > 0)
    // cells x 30 days upper bound; incompleteness must have dropped days
    val cells = ThermalChain.df(spark, sf, 1).select($"lat", $"lon").distinct().count()
    assert(kept < cells * 30)
  }

  test("w13 series is sorted by offset") {
    val rows = Weather.w13(spark, sf).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val offs = r.getAs[String]("series").split(",").map(_.split(":")(0).toLong)
      assert(offs.sameElements(offs.sorted))
    }
  }

  test("w14 bands cover only 0..9 and count all cells per day") {
    val rows = Weather.w14(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val b = r.getAs[Int]("band"); b >= 0 && b <= 9
    })
  }

  test("w21: episodes are >=3h runs, internally dense and mutually non-touching") {
    val eps = Weather.w21(spark, sf).collect()
      .map(r => (r.getAs[Double]("lat"), r.getAs[Double]("lon"),
        r.getAs[Long]("ep_start"), r.getAs[Long]("ep_end"),
        r.getAs[Long]("n_hours"), r.getAs[Double]("peak_t")))
    assert(eps.nonEmpty)
    eps.foreach { case (_, _, s, e, n, peak) =>
      // islands are dense: every hour between start and end is hot
      assert(n == e - s + 1, s"episode [$s,$e] claims $n hours")
      assert(n >= 3)
      assert(peak >= 295.0)
    }
    // maximality: two episodes of one cell never touch (a touching
    // pair would have been one island)
    eps.groupBy(t => (t._1, t._2)).values.foreach { es =>
      es.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) => assert(b._3 > a._4 + 1, s"touching episodes at ${a._1},${a._2}")
        case _ =>
      }
    }
  }

  test("w26: anomalies equal a sequential normals recompute and sum to ~0 per cell") {
    val daily = Weather.w12(spark, sf).collect()
      .map(r => ((r.getAs[Double]("lat"), r.getAs[Double]("lon")),
        r.getAs[Long]("lday"), r.getAs[Double]("hi")))
    val normals = daily.groupBy(_._1).view.mapValues { rs =>
      val c6 = rs.map(r => math.floor(r._3 * 1e6 + 0.5).toLong)
      (c6.sum.toDouble / c6.length.toDouble) / 1e6
    }.toMap
    val got = Weather.w26(spark, sf).collect()
      .map(r => ((r.getAs[Double]("lat"), r.getAs[Double]("lon")), r.getAs[Long]("lday"),
        r.getAs[Double]("hi"), r.getAs[Double]("normal_hi"), r.getAs[Double]("anom")))
    assert(got.length == daily.length && got.nonEmpty)
    got.foreach { case (cell, _, hi, nrm, anom) =>
      assert(nrm == normals(cell), s"normal mismatch at $cell")
      assert(anom == hi - nrm)
    }
    // departures from the record mean cancel per cell (up to the
    // 1e-6 quantization of the mean), and the field is not flat
    got.groupBy(_._1).values.foreach { rs =>
      val s = rs.map(_._5).sum
      assert(math.abs(s) < 1e-3, s"per-cell anomaly sum $s")
    }
    assert(got.map(_._5).max > 1.0 && got.map(_._5).min < -1.0)
  }

  test("w25: blobs equal a sequential union-find over w12's hot cells (wrap included)") {
    val daily = Weather.w12(spark, sf).collect()
      .map(r => (r.getAs[Double]("lat"), r.getAs[Double]("lon"), r.getAs[Double]("hi")))
    val hot = daily.filter(_._3 > 300.15)
      .groupBy(r => (r._1, r._2))
      .map { case ((lat, lon), rs) =>
        val id = math.round((lat + 70.0) / 5.0) * 72L + math.round((lon + 177.5) / 5.0)
        (id, rs.size.toLong, rs.map(_._3).max)
      }
      .filter(_._2 >= 10L).toSeq
    val cells = hot.map(_._1).toSet
    val parent = scala.collection.mutable.Map(cells.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    cells.foreach { id =>
      val east = (id / 72) * 72 + ((id % 72) + 1) % 72
      Seq(east, id + 72).filter(cells.contains).foreach { nb =>
        val (ra, rb) = (find(id), find(nb)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val want = hot.groupBy(h => find(h._1)).map { case (blob, hs) =>
      (blob, hs.size.toLong, hs.map(_._2).sum, hs.map(_._3).max)
    }.toSeq.sortBy(_._1)
    val got = Weather.w25(spark, sf).collect()
      .map(r => (r.getAs[Long]("blob"), r.getAs[Long]("n_cells"),
        r.getAs[Long]("hot_day_total"), r.getAs[Double]("peak_hi"))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // blob labels are the component minimum, so every blob id is a member cell
    assert(got.forall { case (b, _, _, _) => cells.contains(b) })
  }

  test("w27: tracks equal a sequential spatiotemporal union-find; multi-day tracks exist") {
    val daily = Weather.w12(spark, sf).collect()
      .map(r => (r.getAs[Double]("lat"), r.getAs[Double]("lon"),
        r.getAs[Long]("lday"), r.getAs[Double]("hi")))
    // the same (box, day) nodes: 5-degree key, hot mask, packed nid
    val hotd = daily.filter(_._4 > 303.13)
      .groupBy(r => (math.round((r._1 + 70.0) / 5.0) * 72L +
        math.round((r._2 + 177.5) / 5.0), r._3))
      .map { case ((cell, lday), rs) => (cell * 1000 + lday, cell, lday, rs.size.toLong) }
      .toSeq
    val nodes = hotd.map(_._1).toSet
    val parent = scala.collection.mutable.Map(nodes.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    hotd.foreach { case (nid, cell, lday, _) =>
      val east = ((cell / 72) * 72 + ((cell % 72) + 1) % 72) * 1000 + lday
      val north = (cell + 72) * 1000 + lday
      val tomorrow = cell * 1000 + lday + 1
      Seq(east, north, tomorrow).filter(nodes.contains).foreach { nb =>
        val (ra, rb) = (find(nid), find(nb))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val want = hotd.groupBy(h => find(h._1)).map { case (track, hs) =>
      (track, hs.size.toLong, hs.map(_._2).distinct.size.toLong,
        hs.map(_._3).distinct.size.toLong, hs.map(_._3).min, hs.map(_._3).max,
        hs.map(_._4).max)
    }.toSeq.sortBy(_._1)
    val got = Weather.w27(spark, sf).collect()
      .map(r => (r.getAs[Long]("track"), r.getAs[Long]("n_box_days"),
        r.getAs[Long]("n_boxes"), r.getAs[Long]("n_days"),
        r.getAs[Long]("first_day"), r.getAs[Long]("last_day"),
        r.getAs[Long]("peak_box_cells"))).toSeq
    assert(got == want && got.nonEmpty)
    // the tracking is doing temporal work: some track spans multiple
    // days, and lifetimes are consistent
    assert(got.exists(_._4 > 1L), "no multi-day track — threshold degenerate")
    got.foreach { case (_, nbd, nb, nd, fd, ld, _) =>
      assert(ld - fd + 1 >= nd && nbd >= nb && nbd >= nd)
    }
  }

  test("w20: fills carry the latest prior observation; leading holes stay absent") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val obs = graft.functions.ThermalChain.df(spark, SharedSpark.sf, 2)
      .filter($"aoff" < 240)
      .groupBy($"lat", $"lon", $"aoff").agg(max($"tmp2m").as("t"))
      .as[(Double, Double, Long, Double)].collect()
      .groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(r => r._3 -> r._4).toMap).toMap
    val got = Weather.w20(spark, SharedSpark.sf)
      .as[(Double, Double, Long, Double, String)].collect()
    assert(got.nonEmpty && got.exists(_._5 == "fill") && got.exists(_._5 == "obs"))
    val cellsToCheck = got.map(r => (r._1, r._2)).distinct.take(20)
    val byCell = got.groupBy(r => (r._1, r._2))
    cellsToCheck.foreach { cell =>
      val series = byCell(cell).sortBy(_._3)
      val cellObs = obs(cell)
      // nothing before the first observation
      assert(series.head._3 == cellObs.keys.min)
      series.foreach { case (_, _, aoff, t, src) =>
        if (src == "obs") assert(t == cellObs(aoff))
        else {
          val prior = cellObs.keys.filter(_ < aoff)
          assert(prior.nonEmpty && !cellObs.contains(aoff))
          assert(t == cellObs(prior.max), s"cell $cell aoff $aoff")
        }
      }
    }
  }

  test("w19: stencil counts match an independent neighbor walk; smoothing contracts") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val raw = graft.functions.ThermalChain.df(spark, SharedSpark.sf, 2)
      .groupBy($"lat", $"lon").agg(max($"tmp2m").as("t"))
      .as[(Double, Double, Double)].collect()
    val cells = raw.map(r => (r._1, r._2)).toSet
    def wrap(lon: Double, d: Double): Double =
      ((lon + 177.5 + d + 360.0) % 360.0) - 177.5
    val got = Weather.w19(spark, SharedSpark.sf)
      .as[(Double, Double, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == cells)
    got.foreach { case (lat, lon, n, _) =>
      val expect = (for {
        dlat <- Seq(-5.0, 0.0, 5.0); dlon <- Seq(-5.0, 0.0, 5.0)
        if cells.contains((lat + dlat, wrap(lon, dlon)))
      } yield 1).size
      assert(n == expect, s"cell ($lat,$lon): $n vs $expect")
    }
    // a box filter contracts the field's spread
    val ts = raw.map(_._3)
    val ss = got.map(_._4)
    assert(ss.max - ss.min <= ts.max - ts.min + 1e-9)
    // and smoothed values stay inside the raw envelope
    assert(ss.min >= ts.min - 1e-6 && ss.max <= ts.max + 1e-6)
  }

  test("w22: bilinear values equal the 4-corner weighted sum and stay in the corner envelope") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val raw = graft.functions.ThermalChain.df(spark, SharedSpark.sf, 2)
      .groupBy($"lat", $"lon").agg(max($"tmp2m").as("t"))
      .as[(Double, Double, Double)].collect()
    val c6 = raw.map(r => (r._1, r._2) ->
      math.floor(r._3 * 1e6 + 0.5).toLong).toMap
    def wrap(lon: Double, d: Double): Double =
      ((lon + 177.5 + d + 360.0) % 360.0) - 177.5
    val got = Weather.w22(spark, SharedSpark.sf)
      .as[(Double, Double, Double)].collect()
    assert(got.nonEmpty)
    // exactly the targets whose 4 corners exist
    val wantKeys = raw.map(r => (r._1, r._2)).filter { case (la, lo) =>
      Seq((0.0, 0.0), (5.0, 0.0), (0.0, 5.0), (5.0, 5.0)).forall { case (dy, dx) =>
        c6.contains((la + dy, wrap(lo, dx))) }
    }.map { case (la, lo) => (la + 1.25, wrap(lo, 1.25)) }.toSet
    assert(got.map(r => (r._1, r._2)).toSet == wantKeys)
    got.foreach { case (lat, lon, t) =>
      val (la, lo) = (lat - 1.25, wrap(lon, -1.25))
      val corners = Seq(
        (c6((la, lo)), 5625L), (c6((la + 5.0, lo)), 1875L),
        (c6((la, wrap(lo, 5.0))), 1875L), (c6((la + 5.0, wrap(lo, 5.0))), 625L))
      val expect = corners.map { case (v, w) => v * w }.sum / 1e10
      assert(t == expect, s"target ($lat,$lon): $t != $expect")
      // interpolation stays inside its corner envelope
      val vs = corners.map(_._1 / 1e6)
      assert(t >= vs.min - 1e-9 && t <= vs.max + 1e-9)
    }
  }

  test("w23: degree days equal a quantized recompute from w12's daily extremes") {
    import spark.implicits._
    val got = Weather.w23(spark, SharedSpark.sf).collect()
      .map(r => ((r.getAs[Double]("lat"), r.getAs[Double]("lon")),
        (r.getAs[Long]("n_days"), r.getAs[Double]("hdd"), r.getAs[Double]("cdd"))))
      .toMap
    val daily = Weather.w12(spark, SharedSpark.sf).collect()
      .map(r => ((r.getAs[Double]("lat"), r.getAs[Double]("lon")),
        (r.getAs[Double]("hi") + r.getAs[Double]("lo")) / 2.0))
    val want = daily.groupBy(_._1).map { case (cell, rows) =>
      val means = rows.map(_._2)
      def q2sum(xs: Seq[Double]) =
        xs.map(x => math.floor(x * 100.0 + 0.5).toLong).sum / 100.0
      (cell, (means.length.toLong,
        q2sum(means.map(m => math.max(0.0, 18.0 - m))),
        q2sum(means.map(m => math.max(0.0, m - 18.0)))))
    }
    assert(got == want && got.nonEmpty)
    // a cell's day cannot heat and cool past the base simultaneously
    got.values.foreach { case (n, hdd, cdd) =>
      assert(n > 0 && hdd >= 0.0 && cdd >= 0.0)
    }
  }

  test("w24: sector histogram equals a sequential atan2 recompute; mass conserved") {
    import spark.implicits._
    val got = Weather.w24(spark, SharedSpark.sf).collect()
      .map(r => (r.getAs[Long]("sector"),
        (r.getAs[Long]("n_obs"), r.getAs[Double]("speed_sum")))).toMap
    val rows = graft.functions.ThermalChain.df(spark, SharedSpark.sf, 2)
      .selectExpr("ugrd10m", "vgrd10m", "wind_speed")
      .as[(Double, Double, Double)].collect()
    val want = rows.groupBy { case (u, v, _) =>
      // meteorological from-direction: (270 − atan2°) mod 360
      val dq = math.floor(math.toDegrees(math.atan2(v, u)) * 1e6 + 0.5) / 1e6
      val met = 270.0 - dq
      math.floor((if (met >= 360.0) met - 360.0 else met) / 22.5).toLong
    }.map { case (sec, g) =>
      (sec, (g.length.toLong,
        g.map(r => math.floor(r._3 * 100.0 + 0.5).toLong).sum / 100.0))
    }
    assert(got == want)
    assert(got.keys.forall(s => s >= 0 && s < 16))
    assert(got.values.map(_._1).sum == rows.length.toLong)
  }

  test("w30: marching squares stitches known synthetic rings — the diamond, the globe-wrap pair, the open boundary polyline") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val W = graft.operators.Weather
    def rings(cells: Seq[(Long, Long, Double)], lvls: Seq[Double]) =
      W.w30Rings(cells.toDF("li", "lj", "v"), lvls).collect()
        .map(r => (r.getAs[Double]("thr"), r.getAs[Long]("ring"),
          r.getAs[Long]("n_segments"), r.getAs[Long]("n_points"),
          r.getAs[Boolean]("closed"), r.getAs[Long]("y2_min"),
          r.getAs[Long]("y2_max"), r.getAs[Long]("x2_min"),
          r.getAs[Long]("x2_max"))).toSeq
    // (a) one hot cell in a cold interior: a single closed DIAMOND —
    // 4 segments through the 4 surrounding squares' edge midpoints,
    // stitched in sequence (ring label = the min packed node key)
    val oneHot = for { i <- 0L until 5L; j <- 0L until 5L }
      yield (i, j, if (i == 2 && j == 2) 10.0 else 0.0)
    val d = rings(oneHot, Seq(5.0))
    assert(d == Seq((5.0, 3004L, 4L, 4L, true, 3L, 5L, 3L, 5L)),
      s"diamond ring mismatch: $d")
    // level-tagged keys: adding a level nothing crosses changes
    // NOTHING (no cross-level component bleed, no phantom rings)
    assert(rings(oneHot, Seq(5.0, 99.0)) == d)
    // (b) a full hot ROW wrapping the globe: exactly two closed
    // rings of 72 segments each (north and south of the row) — the
    // lon-wrap stitch, diameter 72, closed THROUGH the seam
    val hotRow = for { i <- 0L until 3L; j <- 0L until 72L }
      yield (i, j, if (i == 1) 10.0 else 0.0)
    val w = rings(hotRow, Seq(5.0))
    assert(w.length == 2, s"wrap pair: $w")
    assert(w.forall(t => t._3 == 72L && t._4 == 72L && t._5),
      s"globe rings must close through the wrap: $w")
    assert(w.map(_._6).sorted == Seq(1L, 3L),
      "one ring below the row, one above")
    // (c) a hot cell ON the lat boundary: the isoline leaves the
    // gridded area — an OPEN polyline (2 segments, 3 points)
    val top = for { i <- 0L until 4L; j <- 8L until 13L }
      yield (i, j, if (i == 3 && j == 10) 10.0 else 0.0)
    val o = rings(top, Seq(5.0))
    assert(o.length == 1 && o.head._3 == 2L && o.head._4 == 3L &&
      !o.head._5, s"boundary polyline: $o")
    // the real field: path-or-cycle invariant (marching squares
    // yields degree ≤ 2 nodes, so every component is one of the two)
    val real = W.w30(spark, SharedSpark.sf).collect()
      .map(r => (r.getAs[Long]("n_segments"), r.getAs[Long]("n_points"),
        r.getAs[Boolean]("closed")))
    assert(real.nonEmpty)
    real.foreach { case (ns, np, cl) =>
      assert(if (cl) np == ns else np == ns + 1L)
    }
    // at sf0.001 the synthetic grid is SPARSE (~62% of cells), so
    // real-field isolines fragment at the holes into open polylines
    // — closed rings are the synthetic cases' pin above; here pin
    // that cross-square STITCHING happens on the real field
    assert(real.exists(_._1 > 1L),
      "no multi-segment component — stitching degenerate")
  }
}
