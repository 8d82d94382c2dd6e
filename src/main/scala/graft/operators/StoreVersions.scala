package graft.operators

/** The ONE copy of the versioned-store directory convention every
  * store in the library shares (the ANN index store — bases and
  * delta segments, Knn.scala — and the replica write-back store,
  * Quality.scala): versions are directories `v1, v2, …` under one
  * root; a version is COMMITTED iff its `_MANIFEST` exists (always
  * written LAST — the ForecastStore ordering, so a torn publish is
  * never visible); the next version number is max(all dirs) + 1,
  * committed or torn (a torn attempt's number is never reused —
  * parquet writes refuse existing paths). Centralized after round
  * 17's review found the listing/regex/gate logic copied five times
  * across two files — a change to the convention (naming, manifest
  * gate, torn-dir rules) must land exactly once or the stores
  * silently diverge in crash behavior.
  */
private[graft] object StoreVersions {

  /** Every version directory under `root`, committed or torn,
    * ascending. */
  def versions(root: String): Seq[Int] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toInt)
      .sorted
  }

  /** The committed subset: versions whose `_MANIFEST` landed. */
  def committed(root: String): Seq[Int] =
    versions(root).filter(v =>
      new java.io.File(root, s"v$v/_MANIFEST").exists())

  def latestCommitted(root: String): Option[Int] =
    committed(root).lastOption

  /** The next version number a publisher should claim. */
  def next(root: String): Int = (versions(root) :+ 0).max + 1
}
