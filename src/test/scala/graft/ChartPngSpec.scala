package graft

import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO

/** Pixel-exact checks of the PNG chart emission (ChartPng) against
  * the w18 banded raster it renders.
  */
class ChartPngSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  test("ChartPng renders the banded field pixel-exactly, wrap column closed") {
    import spark.implicits._
    val raster = graft.operators.Weather.w18(spark, sf)
    val (day, vertex) = raster.select($"lday".as[Long], $"vertex".as[String])
      .distinct().collect().sorted.head
    val slice = raster.filter($"lday" === day && $"vertex" === vertex)
    val rows = slice.select($"lat".as[Double], $"glon".as[Double],
      $"band".as[Int]).collect()
    val out = java.nio.file.Files.createTempDirectory("graft_png").resolve("c.png")
    val (w, h) = graft.operators.ChartPng.render(slice, out)
    assert(w == rows.map(_._2).distinct.length)
    assert(h == rows.map(_._1).distinct.length)
    val img = ImageIO.read(out.toFile)
    assert(img.getWidth == w && img.getHeight == h)
    // every cell's pixel is exactly its band's palette entry
    val lats = rows.map(_._1).distinct.sorted(Ordering[Double].reverse)
    val lons = rows.map(_._2).distinct.sorted
    val li = lats.zipWithIndex.toMap
    val gi = lons.zipWithIndex.toMap
    rows.foreach { case (la, lo, b) =>
      assert((img.getRGB(gi(lo), li(la)) & 0xffffff) ==
        graft.operators.ChartPng.palette(b))
    }
    // the cyclic wrap column: left and right edges agree pixelwise
    (0 until h).foreach(y => assert(img.getRGB(0, y) == img.getRGB(w - 1, y)))
  }

  test("m7 intermediate bytes are genuine PNGs with the expected pixels") {
    val rows = graft.operators.Media.m7Png(spark, sf).take(5)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // PNG signature: 0x89 'P' 'N' 'G'
      assert((r.png(0) & 0xff) == 0x89 && r.png(1) == 'P' &&
        r.png(2) == 'N' && r.png(3) == 'G')
      val img = ImageIO.read(new java.io.ByteArrayInputStream(r.png))
      assert(img.getWidth == 8 && img.getHeight == 8)
      // pixel (0,0) is the 'I' of the IMG header — the codec
      // roundtrip preserved the raw value
      assert((img.getRGB(0, 0) & 0xff) == ('I'.toInt & 127))
    }
  }
}
