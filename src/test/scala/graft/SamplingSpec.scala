package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf
  import spark.implicits._

  private def md5hv(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("t22: stratified sample is each stratum's exact bottom-k hash ranks") {
    val rows = Sampling.t22(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"doc_id").as[(String, Long)].collect()
    // sequential replay: per stratum, sort ALL docs by (hash, id), take 50
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (lang, ds) =>
      ds.map { case (_, id) => (md5hv(id.toString), id) }.sorted.take(50)
        .zipWithIndex.map { case ((_, id), i) => (lang, id, i + 1L) }
    }.toSet
    assert(rows.map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("rk"))).toSet == expect)
    // per-stratum sample size = min(k, stratum size) — balanced across skew
    val bySize = docs.groupBy(_._1).map { case (l, ds) => l -> math.min(50, ds.length) }
    assert(rows.groupBy(_.getAs[String]("lang"))
      .map { case (l, rs) => l -> rs.length } == bySize)
  }

  test("t23: A-ES keys replay sequentially; sample is length-biased") {
    val rows = Sampling.t23(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    // sequential replay of the integerized Efraimidis-Spirakis key
    val keyed = docs.map { case (id, nc) =>
      val hv = md5hv(id.toString)
      val nln9 = math.floor(-math.log((hv + 1).toDouble / 1.152921504606846976e18)
        * 1e9 + 0.5).toLong
      (nln9 * 1000000L / nc, id, nc)
    }
    val expect = keyed.sortBy { case (k, id, _) => (k, id) }.take(100).toSeq
    assert(rows.map(r => (r.getAs[Long]("ek"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_chars"))).toSeq == expect)
    // the weighting works: a length-weighted sample skews long
    val sAvg = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    val cAvg = docs.map(_._2).sum.toDouble / docs.length
    assert(sAvg > cAvg, s"sample avg $sAvg not above corpus avg $cAvg")
  }

  test("BottomKAgg: order-free merge equals sorted-take") {
    val a = new graft.functions.BottomKAgg(5)
    val xs = Seq((9L, 1L), (3L, 2L), (7L, 3L), (3L, 1L), (1L, 9L), (8L, 8L), (2L, 2L))
    val (l, r) = xs.splitAt(3)
    val lb = l.foldLeft(a.zero)(a.reduce)
    val rb = r.foldLeft(a.zero)(a.reduce)
    assert(a.finish(a.merge(lb, rb)) == xs.sorted.take(5))
    // commutes: partial buffers may arrive in any order
    assert(a.finish(a.merge(rb, lb)) == xs.sorted.take(5))
  }
}
