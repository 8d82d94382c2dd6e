package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface mirrored from the reference container:
  *
  *  - [[GridSource]] — the OPeNDAP/xarray ingest
  *    (/root/reference/main.py:81-107): long-format weather grids
  *    with the reference's variable/box/hour-range slicing, as
  *    pushdown-friendly parquet reads (xarray `.sel`/`.isel` become
  *    filters that reach the scan).
  *  - [[ForecastStore]] — the GCS `w4h_data.nc` persistence
  *    (main.py:209-217, 331-336): save/load the latest forecast with
  *    an atomic directory swap, plus the combine_first merge with a
  *    time cutoff (main.py:245-250) as a library call.
  *  - [[Catalog]] — the NOMADS scrape (main.py:39-62): discovery of
  *    the latest complete (date, cycle) source from a catalog table.
  */
object GridSource {

  /** Lat/lon box, inclusive, as in `ds.sel(lat=slice(...), lon=...)`. */
  case class Box(south: Double, north: Double, west: Double, east: Double)

  /** Read a long-format grid (lat, lon, ts, vars...) keeping only
    * `vars`, the box, and forecast hours [hourFrom, hourTo) relative
    * to the grid's first timestamp — the reference's
    * `isel(time=slice(1, 121))`. All filters are scan-level
    * (`PushedFilters` on lat/lon; the hour window needs the min ts,
    * resolved via a scalar subquery-style first pass).
    */
  def read(spark: SparkSession, path: String, vars: Seq[String],
      box: Box, hourFrom: Int, hourTo: Int): DataFrame = {
    val base = spark.read.parquet(path)
      .filter(col("lat") >= box.south && col("lat") <= box.north &&
        col("lon") >= box.west && col("lon") <= box.east)
    val t0 = base.agg(min("ts")).head().getTimestamp(0)
    val lo = new java.sql.Timestamp(t0.getTime + hourFrom * 3600000L)
    val hi = new java.sql.Timestamp(t0.getTime + hourTo * 3600000L)
    base.filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      .select((Seq("lat", "lon", "ts") ++ vars).map(col): _*)
  }
}

/** Persisted latest-forecast store with atomic swap: writers never
  * leave a half-written "current" state (write to a versioned dir,
  * then atomically repoint a marker file — the parquet analog of the
  * reference's download-merge-upload of `w4h_data.nc`).
  */
class ForecastStore(root: String) {
  private val marker = Paths.get(root, "CURRENT")

  def currentPath(): Option[String] =
    if (Files.exists(marker))
      Some(Paths.get(root, new String(Files.readAllBytes(marker)).trim).toString)
    else None

  def load(spark: SparkSession): Option[DataFrame] =
    currentPath().flatMap(p =>
      loadVersion(spark, Paths.get(p).getFileName.toString))

  /** Write `df` as the new current version (atomic marker swap).
    * Also writes the version's `_MANIFEST` — the sorted list of
    * committed data files, the Iceberg-style source of truth orphan
    * detection needs: a directory listing alone cannot tell a
    * committed file from a failed task's leftover.
    */
  def save(df: DataFrame, version: String): Unit = {
    val dir = Paths.get(root, version)
    df.write.mode("overwrite").parquet(dir.toString)
    // record RELATIVE paths, walked recursively — so a version
    // written with a nested/partitioned layout is fully manifested
    // and orphan reclaim can never mistake committed data for junk
    def walk(d: java.io.File, rel: String): Seq[String] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { c =>
        val r = if (rel.isEmpty) c.getName else s"$rel/${c.getName}"
        if (c.isDirectory) walk(c, r)
        else if (c.getName.endsWith(".parquet")) Seq(r)
        else Seq.empty
      }
    val data = walk(dir.toFile, "").sorted
    Files.write(dir.resolve("_MANIFEST"), data.mkString("\n").getBytes)
    pointCurrent(version)
  }

  /** Atomically repoint the CURRENT marker (write-then-rename — a
    * reader never sees a half-written marker). */
  private def pointCurrent(version: String): Unit = {
    val tmp = Paths.get(root, "CURRENT.tmp")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, version.getBytes)
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** ROLLBACK: repoint CURRENT to an EXISTING stored version —
    * Iceberg's `rollback_to_snapshot`: the undo every versioned
    * store owes its operators when a bad batch lands. Pure
    * metadata (one atomic marker swap); no data file is touched,
    * so the rolled-past version stays readable for forensics
    * ([[loadVersion]]) until vacuum's retention reclaims it.
    * Returns false (and changes nothing) if the version does not
    * exist — rollback must never invent a target.
    */
  def rollback(version: String): Boolean = {
    if (!Files.isDirectory(Paths.get(root, version))) false
    else { pointCurrent(version); true }
  }

  private def metaFile(n: String): Boolean =
    n == "_MANIFEST" || n == "_SUCCESS" || n.endsWith(".crc")

  /** Store-relative paths no manifest references — failed-task
    * leftovers, stale side files, abandoned `_temporary` trees: the
    * reclaim target of Iceberg's `remove_orphan_files`. A version
    * dir WITHOUT a manifest (pre-manifest store) is left alone; a
    * directory inside a version is orphan WHOLESALE only when no
    * manifest entry lives beneath it (manifests record relative
    * paths, so a nested/partitioned layout's data dirs are
    * protected and swept file-by-file instead); metadata files
    * (CURRENT, _MANIFEST, _SUCCESS, .crc) are never orphans.
    * Detection is metadata-only — no data file is read.
    */
  def orphans(): Seq[String] = {
    val rootLoose = Option(Paths.get(root).toFile.listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName != "CURRENT" && !metaFile(f.getName))
      .map(_.getName).toSeq
    val inVersions = versions().map(_._1).flatMap { v =>
      val dir = Paths.get(root, v)
      val mf = dir.resolve("_MANIFEST")
      if (!Files.exists(mf)) Seq.empty
      else {
        val listed = new String(Files.readAllBytes(mf))
          .split("\n").filter(_.nonEmpty).toSet
        def sweep(d: java.io.File, rel: String): Seq[String] =
          Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { c =>
            val r = if (rel.isEmpty) c.getName else s"$rel/${c.getName}"
            if (c.isDirectory) {
              if (listed.exists(_.startsWith(r + "/"))) sweep(c, r)
              else Seq(s"$v/$r")
            } else if (metaFile(c.getName) || listed.contains(r)) Seq.empty
            else Seq(s"$v/$r")
          }
        sweep(dir.toFile, "")
      }
    }
    (rootLoose ++ inVersions).sorted
  }

  /** Delete every orphan (recursively for orphan directories) and
    * return what was removed — the reclaim half of the audit. Never
    * touches manifest-listed data, version markers, or metadata.
    */
  def removeOrphans(): Seq[String] = {
    val os = orphans()
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    os.foreach(rel => rm(Paths.get(root, rel).toFile))
    os
  }

  /** TIME TRAVEL: read a specific stored version by name, whether or
    * not it is current — the AS OF read every versioned store owes
    * its consumers (reproducing yesterday's training run, auditing
    * what a model saw, diffing survivor sets across curation
    * policies). A version is immutable once written (save() never
    * rewrites an existing dir, it swaps the CURRENT marker), so this
    * read is stable under concurrent writers; it races only vacuum,
    * which is the retention contract (keep N versions = N readable
    * points in time).
    */
  def loadVersion(spark: SparkSession, version: String): Option[DataFrame] = {
    val dir = Paths.get(root, version)
    if (!Files.isDirectory(dir)) None
    else {
      val mf = dir.resolve("_MANIFEST")
      if (Files.exists(mf)) {
        // COMMITTED-READ semantics (the Iceberg reader contract):
        // scan exactly the manifest-listed files, never the
        // directory listing — so failed-task leftovers and
        // half-written junk sitting next to committed data can
        // neither corrupt nor crash a read (p17 proves this with
        // planted orphans).
        val files = new String(Files.readAllBytes(mf))
          .split("\n").filter(_.nonEmpty).map(n => dir.resolve(n).toString)
        Some(spark.read.parquet(files.toIndexedSeq: _*))
      } else Some(spark.read.parquet(dir.toString))
    }
  }

  /** All readable version names, oldest first (vacuum's numeric-aware
    * order), with the current one flagged.
    */
  def versions(): Seq[(String, Boolean)] = {
    val cur = currentPath().map(p => Paths.get(p).getFileName.toString)
    def num(n: String): Long =
      (if (n.startsWith("v")) n.drop(1) else n).toLongOption.getOrElse(Long.MinValue)
    Option(Paths.get(root).toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .sortBy(f => (num(f.getName), f.getName))
      .map(f => (f.getName, cur.contains(f.getName))).toSeq
  }

  /** Delete all but the newest `keep` version directories, never the
    * current one — the retention pass any version-per-write store
    * needs (s14's MERGE sink writes one version per micro-batch, so
    * an unbounded stream would otherwise accumulate forever). Safe
    * against readers of CURRENT: the marker is never repointed here,
    * and the current version is always retained regardless of age.
    * Returns the removed version names.
    */
  def vacuum(keep: Int): Seq[String] = {
    require(keep >= 1, "must keep at least one version")
    val cur = currentPath().map(p => Paths.get(p).getFileName.toString)
    // numeric-aware order: "v10" must outrank "v2" (falls back to
    // name order for non-v<N> version schemes)
    def num(n: String): Long =
      (if (n.startsWith("v")) n.drop(1) else n).toLongOption.getOrElse(Long.MinValue)
    val dirs = Option(Paths.get(root).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory)
      .sortBy(f => (num(f.getName), f.getName))
    val victims = dirs.dropRight(keep)
      .filterNot(f => cur.contains(f.getName))
    // recursive delete (a version dir may contain e.g. a _temporary
    // subtree from an interrupted write), and report only versions
    // that are actually gone — a survivor must not be listed as
    // removed, or the caller's accounting diverges from disk.
    def rmTree(f: java.io.File): Boolean = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
      f.delete()
    }
    victims.filter(rmTree).map(_.getName).toSeq
  }

  /** combine_first: prefer `fresh` rows, keep `previous` rows for keys
    * it lacks, and clip everything before `cutoff` — the reference's
    * merge of a new forecast over the stored one (main.py:245-250).
    * One full-outer join on the grid key.
    */
  def combineFirst(fresh: DataFrame, previous: DataFrame,
      keys: Seq[String], valueCols: Seq[String],
      cutoffCol: String, cutoff: java.sql.Timestamp): DataFrame = {
    val f = fresh.select(keys.map(col) ++ valueCols.map(c => col(c).as(s"__f_$c")): _*)
    val p = previous.select(keys.map(col) ++ valueCols.map(c => col(c).as(s"__p_$c")): _*)
    f.join(p, keys, "full_outer")
      .select(keys.map(col) ++ valueCols.map(c =>
        coalesce(col(s"__f_$c"), col(s"__p_$c")).as(c)): _*)
      .filter(col(cutoffCol) >= lit(cutoff))
  }
}

/** Latest-source discovery over a catalog of (date, cycle, complete)
  * — the scrape of the NOMADS directory listing reduced to its
  * semantics: the max complete (date, cycle), and "is it newer than
  * what we last used".
  */
object Catalog {
  def latestComplete(catalog: DataFrame): Option[(String, String)] = {
    val rows = catalog.filter(col("complete"))
      .orderBy(col("date").desc, col("cycle").desc)
      .limit(1).collect()
    rows.headOption.map(r => (r.getAs[String]("date"), r.getAs[String]("cycle")))
  }

  def isNewer(candidate: (String, String), lastUsed: Option[(String, String)]): Boolean =
    lastUsed.forall { last =>
      candidate._1 > last._1 || (candidate._1 == last._1 && candidate._2 > last._2)
    }
}
