package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.Layout

/** Z-order layout: the Morton key is injective on the cell grid and
  * every 16-code bucket is a compact 4×4 block — the locality that
  * makes a zval-sorted write prune 2-D box predicates at the scan.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf
  import spark.implicits._

  test("p2: morton codes are injective over the cells") {
    val cells = Layout.cells(spark, sf)
    val n = cells.count()
    assert(cells.select("zval").distinct().count() == n)
  }

  test("p2: every z-bucket is a compact 4x4 cell block") {
    val rows = Layout.p2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("lat_max") - r.getAs[Long]("lat_min") <= 3)
      assert(r.getAs[Long]("lon_max") - r.getAs[Long]("lon_min") <= 3)
      assert(r.getAs[Long]("n_cells") <= 16)
    }
    // all cells accounted for exactly once
    val total = rows.map(_.getAs[Long]("n_cells")).sum
    assert(total == Layout.cells(spark, sf).count())
  }

  test("p2: zval-range files bound BOTH axes where lexicographic bounds one") {
    // simulate the write: 8 files by zval range vs 8 by lexicographic
    // (lat-major) order. A lexicographic file is a lat slab — tight on
    // lat, FULL WIDTH on lon — so a 2-D box predicate can never prune
    // on the second axis. The z-order metric is the per-file worst
    // axis span: morton files stay compact on both.
    val cells = Layout.cells(spark, sf).cache()
    def meanWorstSpan(df: org.apache.spark.sql.DataFrame, key: String): Double = {
      val boxes = df.withColumn("f", org.apache.spark.sql.functions.ntile(8)
          .over(org.apache.spark.sql.expressions.Window.orderBy(key)))
        .groupBy("f")
        .agg(org.apache.spark.sql.functions.expr(
          "greatest(max(lat_k) - min(lat_k), max(lon_k) - min(lon_k)) AS s"))
        .select("s").as[Long].collect()
      boxes.sum.toDouble / boxes.length
    }
    val lexOrder = meanWorstSpan(cells.withColumn("ord",
      org.apache.spark.sql.functions.expr("lat_k * 72 + lon_k")), "ord")
    val zOrder = meanWorstSpan(cells, "zval")
    assert(zOrder < lexOrder * 0.6, s"z=$zOrder lex=$lexOrder")
    cells.unpersist()
  }

  test("p7: compaction plan equals the sequential concatenate-and-cut bitwise") {
    val rows = Layout.p7(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("out_file"),
        r.getAs[Long]("n_files"), r.getAs[Long]("bytes"),
        r.getAs[Long]("first_id"), r.getAs[Long]("last_id")))
    val inv = Tables.documents(spark, sf)
      .selectExpr("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect()
    // sequential reference: running offset per source, cut at 2048
    val want = inv.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      var off = 0L
      val assigned = g.sortBy(_._2).map { case (_, id, sz) =>
        val grp = off / 2048L; off += sz; (grp, id, sz)
      }
      assigned.groupBy(_._1).map { case (grp, fs) =>
        (src, grp, fs.length.toLong, fs.map(_._3).sum,
          fs.map(_._2).min, fs.map(_._2).max)
      }
    }.sortBy(t => (t._1, t._2))
    assert(rows.toSeq == want)
    // the plan PARTITIONS the inventory (every file lands exactly once)
    assert(rows.map(_._3).sum == inv.length)
    // within a source, output files cover disjoint increasing id
    // ranges (the rewrite job can run them independently)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val sorted = g.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, s"$src: ranges overlap")
        case _ =>
      }
      // and actually compacts: fewer outputs than inputs
      val nIn = inv.count(_._1 == src)
      assert(sorted.length < nIn, s"$src: no compaction ($nIn files)")
    }
  }

  test("p8: column stats agree with per-column direct aggregates") {
    import graft.operators.Layout
    val rows = Layout.p8(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("ndv"),
          r.getAs[String]("min_s"), r.getAs[String]("max_s"))).toMap
    assert(rows.keySet ==
      Set("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
    val li = Tables.lineitem(spark, sf).cache()
    val total = li.count()
    rows.foreach { case (c, (nr, nn, ndv, mn, mx)) =>
      assert(nr == total, s"$c n_rows")
      // independent recompute per column (the one-pass stack result
      // must equal what four separate scans would produce)
      assert(nn == li.filter(col(c).isNull).count(), s"$c nulls")
      assert(ndv == li.select(c).na.drop().distinct().count(), s"$c ndv")
      val (wmn, wmx) = li.selectExpr(s"CAST(min($c) AS STRING)", s"CAST(max($c) AS STRING)")
        .as[(String, String)].head()
      assert(mn == wmn && mx == wmx, s"$c min/max: ($mn,$mx) != ($wmn,$wmx)")
    }
    li.unpersist()
  }

  test("p12: skipping audit equals a sequential recompute; the date layout actually skips") {
    val got = Layout.p12(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("files_scanned"),
          r.getAs[Long]("rows_scanned"), r.getAs[Long]("rows_matched")))).toMap
    val inv = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS BIGINT) AS day")
      .as[(Long, Long)].collect()
    def mirror(fileOf: ((Long, Long)) => Long) = {
      val files = inv.groupBy(fileOf).map { case (_, rs) =>
        val days = rs.map(_._2)
        (rs.size.toLong, days.min, days.max,
          days.count(d => d >= 1000L && d <= 1029L).toLong)
      }
      (files.size.toLong,
        files.count { case (_, mn, mx, _) => mn <= 1029L && mx >= 1000L }.toLong,
        files.collect { case (n, mn, mx, _) if mn <= 1029L && mx >= 1000L => n }.sum,
        files.map(_._4).sum)
    }
    assert(got("insertion") == mirror { case (k, _) => k / 256 })
    assert(got("shipdate_week") == mirror { case (_, d) => d / 7 })
    val (ins, wk) = (got("insertion"), got("shipdate_week"))
    // both layouts agree on the true match count (the audit's
    // internal consistency invariant)
    assert(ins._4 == wk._4 && ins._4 > 0)
    // the date layout must actually skip: a small fraction of files
    // scanned, while the insertion layout's zone maps prune nothing
    assert(wk._2 * 10 <= wk._1, s"date layout scanned ${wk._2}/${wk._1} files")
    assert(ins._2 == ins._1, s"insertion layout unexpectedly skipped")
    assert(wk._3 < ins._3)
  }

  test("p15: delete vectors subtract exactly the predicate rows; accounting closes") {
    val got = Layout.p15(spark, sf).collect()
      .map(r => (r.getAs[Long]("file_id"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_deleted"), r.getAs[Long]("live_rows"),
        r.getAs[Long]("del_permille"), r.getAs[Long]("rewrite"),
        r.getAs[Long]("live_sum"))).toSeq.sortBy(_._1)
    // sequential mirror: the surviving set is predicate-determined,
    // so the audit is computable with NO positions at all — the
    // position machinery must agree with it exactly
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey div 64 AS f", "l_orderkey", "l_linenumber",
        "l_quantity", "l_returnflag", "l_discount")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getString(4), r.getDouble(5)))
    val want = rows.groupBy(_._1).toSeq.map { case (f, rs) =>
      val dead = rs.filter(t => t._4 > 45.0 || (t._5 == "R" && t._6 > 0.05))
      val live = rs.filterNot(t => t._4 > 45.0 || (t._5 == "R" && t._6 > 0.05))
      val perm = dead.length.toLong * 1000L / rs.length
      (f, rs.length.toLong, dead.length.toLong, live.length.toLong, perm,
        if (perm >= 220L) 1L else 0L,
        live.map(t => t._2 * 7L + t._3).sum)
    }.sortBy(_._1)
    assert(got == want && got.nonEmpty)
    // accounting closes per file; both rewrite verdicts appear; the
    // two commits genuinely overlap (dedup does real work)
    got.foreach { t => assert(t._3 + t._4 == t._2) }
    assert(got.exists(_._6 == 1L) && got.exists(_._6 == 0L))
    val rawDeletes = rows.count(_._4 > 45.0) +
      rows.count(t => t._5 == "R" && t._6 > 0.05)
    assert(rawDeletes > got.map(_._3).sum,
      "commits should overlap so the position-distinct union dedups")
  }

  test("p14: blooms have zero false negatives and hold the k=2 FP budget") {
    val got = graft.operators.Layout.p14(spark, SharedSpark.sf).collect()
      .map(r => (r.getAs[Long]("probe_key"), r.getAs[Long]("present"),
        r.getAs[Long]("n_files"), r.getAs[Long]("files_bloom_hit"),
        r.getAs[Long]("files_containing"), r.getAs[Long]("false_pos"))).toSeq
    assert(got.length == 20)
    val nFiles = got.head._3
    got.foreach { case (k, present, nf, hit, cont, fp) =>
      assert(nf == nFiles)
      // soundness: a containing file always hits — no false negatives
      assert(hit >= cont, s"probe $k: bloom missed a containing file")
      assert(fp == hit - cont)
      assert((present == 1L) == (cont > 0L))
    }
    // the existing probes are found, the absent billion-range ones are not
    assert(got.filter(_._1 < 1000000000L).exists(_._2 == 1L))
    assert(got.filter(_._1 >= 1000000000L).forall(_._2 == 0L))
    // FP budget: k=2 independent seeded hashes at ~12% load give
    // ~1-3% — a correlated/degenerate hash pair (the suffix-seed
    // trap: FNV suffix variants differ by a constant) reads ~12%
    val totalPairs = got.map(_._3).sum
    val totalFp = got.map(_._6).sum
    assert(totalFp * 100 <= totalPairs * 5,
      s"FP rate ${totalFp.toDouble / totalPairs} exceeds the k=2 budget")
    // and the filter genuinely prunes: an ABSENT key keeps almost no
    // files (a present key may legitimately live in most files at
    // small scale — pruning is only promised where nothing matches)
    got.filter(_._1 >= 1000000000L).foreach { case (k, _, nf, hit, _, _) =>
      assert(hit * 2 <= nf, s"absent probe $k: bloom kept $hit/$nf files")
    }
  }
}
