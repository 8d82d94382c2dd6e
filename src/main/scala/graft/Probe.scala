package graft

import org.apache.spark.sql.SparkSession

/** v21 serving-parameter tuning harness (diagnostic main, not part
  * of the driver contract): sweeps the graph-ANN knobs exposed as
  * `graft.v21.*` confs — hops, entry-index cells/probes/reps, graph
  * degree — and prints measured recall@5 per combo. The degree sweep
  * documented in [[graft.operators.Knn.v21]]'s Scaladoc came from
  * this (`runMain graft.Probe /root/testdata/sf0.1 6:8:2:8:16 ...`).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("probe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    for (combo <- args.drop(1)) {
      // combo = hops:ncents:probes:reps:degree[:beam]
      val parts = combo.split(":")
      val Array(h, nc, np, nr, dg) = parts.take(5)
      val bm = if (parts.length > 5) parts(5) else "8"
      spark.conf.set("graft.v21.hops", h)
      spark.conf.set("graft.v21.ncents", nc)
      spark.conf.set("graft.v21.probes", np)
      spark.conf.set("graft.v21.reps", nr)
      spark.conf.set("graft.v21.degree", dg)
      spark.conf.set("graft.v21.beam", bm)
      val t0 = System.nanoTime()
      val df = graft.operators.Knn.v21(spark, dir)
      val rec = df.selectExpr("avg(in_exact)").collect()(0).getDouble(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] hops=$h ncents=$nc probes=$np reps=$nr deg=$dg beam=$bm recall@5=$rec%.2f sec=$sec%.1f")
    }
    spark.stop()
  }
}
