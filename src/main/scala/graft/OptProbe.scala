package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-18 optimization measurement harness (diagnostic main, not
  * part of the driver contract): runs named queries under a
  * SparkListener that aggregates per-query job/stage/task counts,
  * shuffle bytes and executor task time — the guide-§1 "where is the
  * time going" numbers that a headless bench line can't show. Also
  * dumps `.explain("formatted")` per query when OPT_EXPLAIN_DIR is
  * set (the plans/r18 before/after evidence).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.OptProbe /root/testdata/sf0.1 g27_louvain_multilevel v31_delta_publish"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explainDir = sys.env.get("OPT_EXPLAIN_DIR")
    explainDir.foreach(d => new java.io.File(d).mkdirs())

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val taskTimeMs = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          taskTimeMs.addAndGet(m.executorRunTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // session warmup (same as Bench)
    spark.read.parquet(s"$dir/lineitem.parquet").limit(1000).foreach(_ => ())

    println(f"${"query"}%-32s ${"t1"}%7s ${"t2"}%7s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"cpu_s"}%7s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      val times = (1 to 2).map { i =>
        if (i == 2) { // measure the warm run's job profile
          jobs.set(0); stages.set(0); tasks.set(0)
          shufRead.set(0L); shufWrite.set(0L); taskTimeMs.set(0L)
          spark.catalog.clearCache()
        }
        val t0 = System.nanoTime()
        fn(spark, dir).foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(300) // let the listener bus drain (no public waitUntilEmpty)
      println(f"$name%-32s ${times(0)}%7.2f ${times(1)}%7.2f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${shufRead.get / 1e6}%8.1f ${shufWrite.get / 1e6}%8.1f ${taskTimeMs.get / 1e3}%7.1f")
      explainDir.foreach { d =>
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$d/$name.txt"), plan)
      }
    }
    spark.stop()
  }
}
