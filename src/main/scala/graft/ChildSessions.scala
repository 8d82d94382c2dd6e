package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Cache of per-parent child sessions carrying execution-time conf
  * overrides (optimizer exclusions, state-partition counts, state
  * store providers) that must not leak into the parent — see SURVEY
  * §8.14. One shared implementation so every cache gets the same two
  * guarantees:
  *
  *  - weak parent keys: a stopped/dropped parent session does not pin
  *    its children forever (the child holds the SparkContext, not the
  *    parent session object, so the entry is collectable);
  *  - full runtime-conf inheritance: `newSession()` restarts from
  *    SparkConf defaults, silently dropping anything the parent set at
  *    runtime (session time zone, ANSI flags, ...). Children copy the
  *    parent's whole runtime conf before applying their own overrides
  *    so e.g. timestamp-bearing queries answer identically.
  */
object ChildSessions {
  private val caches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, SparkSession]]())

  /** The child session for (`parent`, `tag`), created on first use. */
  def of(parent: SparkSession, tag: String)(
      configure: SparkSession => Unit): SparkSession = {
    val perParent = caches.computeIfAbsent(parent,
      _ => new java.util.concurrent.ConcurrentHashMap[String, SparkSession]())
    perParent.computeIfAbsent(tag, _ => {
      val ns = parent.newSession()
      parent.conf.getAll.foreach { case (k, v) =>
        // static confs (e.g. spark.sql.extensions) reject runtime set
        try ns.conf.set(k, v) catch { case NonFatal(_) => () }
      }
      configure(ns)
      ns
    })
  }
}
