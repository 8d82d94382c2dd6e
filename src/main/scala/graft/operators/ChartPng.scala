package graft.operators

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.apache.spark.sql.DataFrame

/** PNG emission for the w18 chart raster — the reference's rendering
  * stage (main.py:399-443: `contourf` → `fig.savefig` → storage PUT
  * → catalog status) with JDK-only tooling (`javax.imageio`; no
  * external raster library needed after all). The image is the DATA
  * raster: one pixel per grid cell, band color from the reference's
  * 10-color palette, north up, west→east, the cyclic-wrap column
  * included so the left and right edges agree like a closed global
  * contour. Map projection, coastlines and contour smoothing are
  * presentation geometry (cartopy/matplotlib territory) and
  * deliberately out of scope — the banded field is what the chart
  * communicates. The storage PUT stays environment-bound (zero
  * egress): files land in an output directory and the chart catalog
  * is updated per rendered file, mirroring the reference's
  * upload → `set_status` sequence (main.py:425-440).
  */
object ChartPng {

  /** The chart palette (main.py:370-381), index = w14/w18 band. */
  val palette: IndexedSeq[Int] = IndexedSeq(
    0x004adb, 0x306cde, 0x468de0, 0x5aadde, 0x75cdd6,
    0xb3e8b6, 0xffde98, 0xfcad6e, 0xf27946, 0xe43a20)

  /** Render ONE chart — a single (lday, vertex) slice of w18's
    * raster, rows (lat, glon, band) — to a PNG at `out`. Returns
    * (width, height) in pixels.
    *
    * The collect here is the terminal presentation boundary, not a
    * distributed-compute smell: a chart's grid is bounded (the full
    * 0.25° global grid is 721×1441 ≈ 1M cells) and the reference
    * crosses the same boundary when it hands the day's array to
    * matplotlib. Everything upstream — the thermal chain, extremes,
    * banding, wrap — stays distributed in w18.
    */
  def render(slice: DataFrame, out: java.nio.file.Path): (Int, Int) = {
    val rows = slice.selectExpr("lat", "glon", "CAST(band AS INT) AS band")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getInt(2)))
    require(rows.nonEmpty, s"empty chart slice for $out")
    val lats = rows.map(_._1).distinct.sorted(Ordering[Double].reverse) // north up
    val lons = rows.map(_._2).distinct.sorted // west -> east, wrap col last
    val latIdx = lats.zipWithIndex.toMap
    val lonIdx = lons.zipWithIndex.toMap
    val img = new BufferedImage(lons.length, lats.length, BufferedImage.TYPE_INT_RGB)
    rows.foreach { case (la, lo, b) =>
      img.setRGB(lonIdx(lo), latIdx(la), palette(b))
    }
    java.nio.file.Files.createDirectories(out.getParent)
    ImageIO.write(img, "png", out.toFile)
    (lons.length, lats.length)
  }

  /** Render every (lday, vertex) chart of a w18-shaped raster into
    * `outDir` with the reference's file-name shape
    * (`{day}Z_utci_{vertex}_from_{sourceVersion}.png`,
    * main.py:418), calling `onRendered(day, fileName)` after each
    * file lands — the hook where W4hJob updates the chart catalog.
    * Chart count is bounded (days × 2), so the driver-side loop is
    * the reference's own per-day/per-vertex loop (main.py:401-443).
    */
  def renderAll(raster: DataFrame, outDir: java.nio.file.Path,
                sourceVersion: String)(
      onRendered: (Long, String) => Unit): Int = {
    import org.apache.spark.sql.functions.col
    val sess = raster.sparkSession
    import sess.implicits._
    val cached = raster.cache()
    try {
      val keys = cached.select($"lday".as[Long], $"vertex".as[String])
        .distinct().collect().sorted
      keys.foreach { case (day, vertex) =>
        val name = s"${day}Z_utci_${vertex}_from_$sourceVersion.png"
        render(cached.filter(col("lday") === day && col("vertex") === vertex),
          outDir.resolve(name))
        onRendered(day, name)
      }
      keys.length
    } finally { cached.unpersist(); () }
  }
}
