package graft.functions

/** Run INDEPENDENT Spark actions concurrently from driver threads —
  * the optimization-guide §2.6 overlap ("actions are only sequential
  * because your driver code calls them sequentially"): a lifecycle
  * operator that must land N independent component writes, gate
  * counts or replica digests pays N sequential job latencies when
  * each of those jobs is far too small to fill the cluster;
  * submitting them together lets the scheduler back-fill the idle
  * cores (FIFO keeps earlier jobs first — exactly the guide's
  * back-fill behaviour). At 100 TB the same overlap hides each
  * store-component write behind its siblings instead of serializing
  * full write latencies.
  *
  * Results are POSITIONAL (never completion-ordered), so callers are
  * bitwise order-deterministic; every task runs to completion before
  * the first failure (if any) is rethrown — no half-abandoned sibling
  * writes. Spark job submission is thread-safe, and job-local
  * properties (description/group) are inherited by child threads.
  */
object Par {
  def run[A](tasks: Seq[() => A]): Seq[A] =
    if (tasks.lengthCompare(1) <= 0) tasks.map(_())
    else {
      val out = new Array[Any](tasks.length)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val ts = tasks.zipWithIndex.map { case (t, i) =>
        val th = new Thread(
          () => try out(i) = t() catch { case e: Throwable => errs.add(e) },
          s"graft-par-$i")
        th.setDaemon(true)
        th.start()
        th
      }
      ts.foreach(_.join())
      if (!errs.isEmpty) throw errs.peek()
      out.toSeq.asInstanceOf[Seq[A]]
    }
}
