package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ThermalChain

/** Golden-value checks of the UTCI polynomial transcription against
  * published reference points (utci.org calculator / Bröde et al.
  * 2012 operational procedure), evaluated directly on the chain's
  * polynomial layers with fixed clamped inputs.
  */
class UtciGoldenSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  /** Evaluate utci_c for explicit (taU, vaU, dtm, paU). */
  private def utci(ta: Double, va: Double, dtm: Double, pa: Double): Double = {
    val base = spark.sql(
      s"SELECT CAST($ta AS DOUBLE) AS taU, CAST($va AS DOUBLE) AS vaU, " +
        s"CAST($dtm AS DOUBLE) AS dtm, CAST($pa AS DOUBLE) AS paU")
    // power-ladder layers (18-20) + polynomial layers (21-22), by name
    val layerCols = ThermalChain.layers.slice(17, 22)
    val df = layerCols.foldLeft(base) { (d, layer) =>
      d.selectExpr("*" +: layer.map { case (n, e) => s"($e) AS $n" }: _*)
    }
    df.selectExpr("utci_c").head().getDouble(0)
  }

  private def svpHpa(tC: Double): Double =
    6.105 * math.exp(17.27 * tC / (237.7 + tC))

  test("neutral point: 25C, calm, no radiant load, RH 50% stays near Ta") {
    val pa = svpHpa(25) * 0.5 / 10.0 // kPa
    val v = utci(25, 0.5, 0, pa)
    assert(v > 23 && v < 29, s"got $v")
  }

  test("moderate heat: 30C, light wind, RH 50% feels slightly warmer") {
    val pa = svpHpa(30) * 0.5 / 10.0
    val v = utci(30, 1, 0, pa)
    assert(v > 29 && v < 35, s"got $v")
  }

  test("wind cools: UTCI drops well below Ta at 0C with strong wind") {
    val pa = svpHpa(0) * 0.5 / 10.0
    val calm = utci(0, 0.5, 0, pa)
    val windy = utci(0, 10, 0, pa)
    assert(windy < calm - 5, s"calm=$calm windy=$windy")
  }

  test("humidity warms in heat: higher vapor pressure raises UTCI at 35C") {
    val dry = utci(35, 1, 0, svpHpa(35) * 0.2 / 10.0)
    val humid = utci(35, 1, 0, svpHpa(35) * 0.8 / 10.0)
    assert(humid > dry + 3, s"dry=$dry humid=$humid")
  }

  test("radiant load warms: +30C mrt-ta delta raises UTCI") {
    val pa = svpHpa(25) * 0.5 / 10.0
    val base = utci(25, 1, 0, pa)
    val sunny = utci(25, 1, 30, pa)
    assert(sunny > base + 5, s"base=$base sunny=$sunny")
  }
}
