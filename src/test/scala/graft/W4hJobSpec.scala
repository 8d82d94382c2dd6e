package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{StatusStore, W4hJob}

/** End-to-end integration of the full composed ETL run. */
class W4hJobSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  test("full job: compute, merge, mask, upload, charts, status") {
    val root = java.nio.file.Files.createTempDirectory("w4h_job").toString

    val r1 = W4hJob.run(spark, sf, root, "gfs20240101_00z")
    assert(r1.outcome == "completed")
    assert(r1.mergedRows > 0 && r1.uploadedDocs > 0 && r1.chartDays > 0)

    // uploads exist and are valid JSONL
    val up = java.nio.file.Paths.get(root, "uploads", "gfs20240101_00z")
    val files = java.nio.file.Files.list(up).toArray
    assert(files.nonEmpty)

    // status bookkeeping
    val st = new StatusStore(root).fetch()
    assert(st("latestSuccessfulUpdateSource") == "gfs20240101_00z")
    assert(st("isUpdating") == "false")
    assert(st.keys.exists(_.startsWith("globalCharts.")))

    // idempotence: same source => no-op
    val r2 = W4hJob.run(spark, sf, root, "gfs20240101_00z")
    assert(r2.outcome == "already-current")

    // a newer source merges over the stored forecast
    val r3 = W4hJob.run(spark, sf, root, "gfs20240101_06z")
    assert(r3.outcome == "completed")
    assert(r3.mergedRows >= r1.mergedRows)

    // lock blocks concurrent runs
    val status = new StatusStore(root)
    assert(status.tryAcquireUpdateLock())
    try assert(W4hJob.run(spark, sf, root, "gfs20240101_12z").outcome == "locked")
    finally status.releaseUpdateLock()
  }
}
