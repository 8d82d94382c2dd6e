package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Write-time data layout: Z-order (Morton) clustering keys.
  *
  * §8.16 demonstrated bucketed integral-cell layout for zero-exchange
  * joins; this is the OTHER layout tool a 100 TB grid store needs —
  * multi-dimensional range locality. Sorting a write by the Morton
  * interleave of the cell indices puts spatially-near cells in the
  * same files, so 2-D box predicates (lat BETWEEN .. AND lon BETWEEN
  * ..) prune to a small set of row groups via parquet min/max stats,
  * where a lexicographic (lat, lon) sort only prunes on lat.
  *
  * The key is pure integer arithmetic (bit interleave as div/mod —
  * exact in any engine), so it is cheap (a narrow map at write time)
  * and oracle-checkable bitwise.
  */
object Layout {

  private val mortonBits = 8

  /** Morton interleave of two cell indices (8 bits each → 16-bit
    * code), written as div/mod arithmetic valid in both dialects via
    * the dialect's integer-division operator (`div` Spark, `//`
    * DuckDB). latK rides the odd bits, lonK the even bits.
    */
  def mortonExpr(latK: String, lonK: String, divOp: String): String =
    (0 until mortonBits).flatMap { b =>
      Seq(
        s"((($latK) $divOp ${1L << b}) % 2) * ${1L << (2 * b + 1)}",
        s"((($lonK) $divOp ${1L << b}) % 2) * ${1L << (2 * b)}")
    }.mkString("(", " + ", ")")

  private val latK = "CAST(user_id % 29 AS BIGINT)"
  private val lonK = "CAST((event_id * 7) % 72 AS BIGINT)"

  /** The distinct grid cells with their Z-codes (spec support: the
    * write path sorts by zval).
    */
  private[graft] def cells(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .selectExpr(s"$latK AS lat_k", s"$lonK AS lon_k")
      .distinct()
      .selectExpr("lat_k", "lon_k",
        s"${mortonExpr("lat_k", "lon_k", "div")} AS zval")

  /** p2: Z-order layout audit — each bucket of 16 consecutive Z-codes
    * is a compact 4×4 cell block, so per-bucket cell counts and
    * bounding boxes quantify the locality the layout buys (every
    * bucket spans ≤ 3 cells per axis, vs the whole grid for a
    * row-order write). One distinct + one aggregate; the Z-code
    * itself is the narrow-map write-time key.
    */
  def p2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cells(spark, dir)
      .selectExpr("zval div 16 AS zbucket", "lat_k", "lon_k")
      .groupBy($"zbucket")
      .agg(count(lit(1)).as("n_cells"),
        min($"lat_k").as("lat_min"), max($"lat_k").as("lat_max"),
        min($"lon_k").as("lon_min"), max($"lon_k").as("lon_max"))
      .transform(Tables.ordered(_, $"zbucket"))
  }

  val p2Sql: String = {
    val z = mortonExpr("lat_k", "lon_k", "//")
    s"""WITH c AS (SELECT DISTINCT CAST(user_id % 29 AS BIGINT) AS lat_k,
      |             CAST((event_id * 7) % 72 AS BIGINT) AS lon_k
      |           FROM events),
      |z AS (SELECT lat_k, lon_k, $z AS zval FROM c)
      |SELECT zval // 16 AS zbucket, count(*) AS n_cells,
      |  min(lat_k) AS lat_min, max(lat_k) AS lat_max,
      |  min(lon_k) AS lon_min, max(lon_k) AS lon_max
      |FROM z
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
  }

  /** Compaction plan target size, in document characters (stands in
    * for bytes of the real file inventory).
    */
  private val compactTarget = 2048L

  /** p7: small-file compaction planning — THE recurring maintenance
    * op of a 100 TB table that ingests incrementally: millions of
    * small files destroy scan throughput (one task + one open per
    * file), so a nightly pass bin-packs them into ~target-size
    * outputs. Input here is the documents inventory read AS file
    * metadata — (source = partition, doc_id = file, n_chars = size);
    * a real run would `binaryFile`-list or read the table manifest,
    * and the planner is pure metadata either way.
    *
    * Plan rule (concatenate-and-cut): within each partition, order
    * files by id, take the running byte offset, and assign each file
    * to output group start_offset div target — deterministic, one
    * pass, no driver loop (greedy first-fit would serialize). Output
    * is the per-output-file manifest: file count, byte total, and
    * the id range each compacted file covers (what the rewrite job
    * consumes).
    *
    * Scale shape: ONE shuffle on the partition key; the prefix sum
    * is a window WITHIN each partition — bounded by per-partition
    * file counts, never a global sort (t9's three-level scan is the
    * escape hatch if one partition alone held billions of files).
    * The plan is metadata-sized (rows = files, not data), so the
    * planner costs ~nothing next to the rewrite it schedules.
    */
  def p7(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    Tables.documents(spark, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("start_off",
        coalesce(sum($"n_chars").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .selectExpr("source", "doc_id", "n_chars",
        s"start_off div $compactTarget AS out_file")
      .groupBy($"source", $"out_file")
      .agg(count(lit(1)).as("n_files"), sum($"n_chars").as("bytes"),
        min($"doc_id").as("first_id"), max($"doc_id").as("last_id"))
      .transform(Tables.ordered(_, $"source", $"out_file"))
  }

  val p7Sql: String =
    s"""WITH inv AS (
      |  SELECT source, doc_id, n_chars,
      |    coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
      |  FROM documents)
      |SELECT source, CAST(start_off // $compactTarget AS BIGINT) AS out_file,
      |  count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bytes,
      |  min(doc_id) AS first_id, max(doc_id) AS last_id
      |FROM inv
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Columns p8 profiles — one numeric, one low-cardinality string,
    * one timestamp, one high-cardinality key, so the stats row set
    * exercises every cast path.
    */
  private val p8Cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")

  /** NULL sentinel for p8's value-string key: a leading U+0000 (NUL) cannot occur
    * in a cast value, so null-count rows never collide with data.
    */
  private val p8NullSentinel = "\u0000NULL"

  /** p8: ANALYZE-style per-column table statistics — row count,
    * null count, EXACT distinct count, min and max (canonical string
    * form) — the optimizer/pruning metadata a 100 TB table
    * maintenance pass materializes (Spark's own ANALYZE TABLE ...
    * COMPUTE STATISTICS FOR COLUMNS writes exactly these to the
    * catalog for CBO join reordering and broadcast decisions).
    *
    * Shape: ONE scan + a MANUAL two-level aggregate. Each row
    * explodes to 4 narrow (col_name, value-string) pairs; level 1
    * groups by (col_name, v) with a COUNT-ONLY buffer — fixed-size,
    * so the whole stage stays inside whole-stage-codegen
    * HashAggregate, and map-side combine collapses each partition
    * to its per-column distinct values (the shuffle moves
    * per-partition ndv rows, not data rows). Level 2 folds the
    * ≈ Σndv survivors into one row per column: ndv = group count,
    * null count via a sentinel key, and min/max recovered from the
    * distinct values THEMSELVES by parsing back to the typed form
    * (a column's min/max is the min/max of its distinct values;
    * string round-trips are exact for bigint/double/timestamp).
    *
    * Two rejected one-pass shapes, both measured ~3× slower at
    * sf0.1 (§8.32): Catalyst's multi-distinct Expand rewrite (keys
    * the first aggregate on gid + all four distinct columns at
    * once), and carrying TYPED min/max buffers through level 1 —
    * a STRING min/max buffer is variable-length, which evicts the
    * entire level-1 aggregate from codegen HashAggregate.
    */
  def p8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val branches = p8Cols.map(c =>
      s"struct('$c' AS col_name, coalesce(CAST($c AS STRING), '$p8NullSentinel') AS v)")
    val pairs = li.selectExpr(s"explode(array(${branches.mkString(", ")})) AS p")
      .select("p.*")
    val lvl1 = pairs.groupBy($"col_name", $"v").agg(count(lit(1)).as("c"))
    def typedMinMax(f: String, typ: String, name: String) =
      s"$f(CASE WHEN col_name = '$name' AND v <> '$p8NullSentinel' THEN CAST(v AS $typ) END)"
    def minMax(f: String, out: String) =
      s"CASE col_name WHEN 'l_orderkey' THEN CAST(${typedMinMax(f, "BIGINT", "l_orderkey")} AS STRING) " +
        s"WHEN 'l_quantity' THEN CAST(${typedMinMax(f, "DOUBLE", "l_quantity")} AS STRING) " +
        s"WHEN 'l_returnflag' THEN $f(CASE WHEN col_name = 'l_returnflag' AND v <> '$p8NullSentinel' THEN v END) " +
        s"ELSE CAST(${typedMinMax(f, "TIMESTAMP", "l_shipdate")} AS STRING) END AS $out"
    lvl1.groupBy($"col_name")
      .agg(sum($"c").as("n_rows"),
        sum(when($"v" === p8NullSentinel, $"c").otherwise(0L)).as("n_nulls"),
        sum(when($"v" =!= p8NullSentinel, 1L).otherwise(0L)).as("ndv"),
        expr(minMax("min", "min_s")), expr(minMax("max", "max_s")))
      .transform(Tables.ordered(_, $"col_name"))
  }

  /** p8 oracle: the same stats as four UNION ALL legs (DuckDB reads
    * the parquet four times; the compared VALUES are what matter).
    */
  val p8Sql: String =
    p8Cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
         |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // ---------- p12: zone-map data-skipping audit ----------

  /** Predicate window for the audit: a 30-day shipdate range
    * (days since 1995-01-01; the corpus spans ~2500 days).
    */
  private val p12Lo = 1000L
  private val p12Hi = 1029L

  /** p12: ZONE-MAP DATA-SKIPPING AUDIT — the layout question that
    * decides scan cost at 100 TB: for a given predicate, how many
    * FILES does each candidate layout let the reader skip on min/max
    * statistics alone (parquet row-group stats / Iceberg-Delta file
    * stats — the mechanism behind partition pruning and z-order)?
    * p2 measured z-order LOCALITY; p12 measures the consequence:
    * files_scanned under (a) the insertion-order layout every
    * append-only ingest produces (file = orderkey bucket of 256 —
    * shipdate uncorrelated with arrival, so zone maps span
    * everything and nothing skips) vs (b) a shipdate-week
    * partitioning (file = day÷7 — the predicate touches ≤ 6 of
    * ~360 weekly files). The report row per layout: file count,
    * files/rows a zone-map reader must scan for the fixed 30-day
    * predicate, and the true match count (layout-invariant — the
    * audit's internal consistency check).
    *
    * Scale shape: ONE scan per layout audited, one file-grain
    * aggregate (map-side combined) + one bounded report aggregate —
    * the audit is metadata-sized regardless of table size, and the
    * simulated file ids are exactly the write-time keys a real
    * rewrite would use (p7's manifest discipline). All outputs exact
    * BIGINTs.
    */
  def p12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // greatest(·, 0) makes `day` PROVABLY non-negative before the
    // integral week division (§8.39: div truncates, // floors — they
    // only agree ≥ 0). The fixture's min shipdate is 1995-01-02 so
    // the clamp is a no-op today; it pins the invariant against any
    // future pre-epoch date rather than relying on the generator.
    val inv = Tables.lineitem(spark, dir).selectExpr("l_orderkey",
      "greatest(CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS BIGINT), CAST(0 AS BIGINT)) AS day")
    def audit(name: String, fileExpr: String): DataFrame = inv
      .selectExpr(s"$fileExpr AS file_id", "day")
      .groupBy($"file_id")
      .agg(count(lit(1)).as("n_rows"),
        min($"day").as("min_day"), max($"day").as("max_day"),
        sum(when($"day".between(p12Lo, p12Hi), 1L).otherwise(0L)).as("n_match"))
      .agg(count(lit(1)).as("n_files"),
        sum(when($"min_day" <= p12Hi && $"max_day" >= p12Lo, 1L)
          .otherwise(0L)).as("files_scanned"),
        sum(when($"min_day" <= p12Hi && $"max_day" >= p12Lo, $"n_rows")
          .otherwise(0L)).as("rows_scanned"),
        sum($"n_match").as("rows_matched"))
      .withColumn("layout", lit(name))
      .select($"layout", $"n_files", $"files_scanned", $"rows_scanned", $"rows_matched")
    audit("insertion", "l_orderkey div 256")
      .unionByName(audit("shipdate_week", "day div 7"))
      .transform(Tables.ordered(_, $"layout"))
  }

  /** p12 oracle: identical file keys, zone maps and overlap test. */
  val p12Sql: String = {
    def leg(name: String, fileExpr: String): String =
      s"""SELECT '$name' AS layout, CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(CASE WHEN min_day <= $p12Hi AND max_day >= $p12Lo
         |                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         |  CAST(sum(CASE WHEN min_day <= $p12Hi AND max_day >= $p12Lo
         |                THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
         |  CAST(sum(n_match) AS BIGINT) AS rows_matched
         |FROM (SELECT $fileExpr AS file_id, count(*) AS n_rows,
         |        min(day) AS min_day, max(day) AS max_day,
         |        sum(CASE WHEN day BETWEEN $p12Lo AND $p12Hi
         |            THEN 1 ELSE 0 END) AS n_match
         |      FROM inv GROUP BY 1)""".stripMargin
    s"""WITH inv AS (
      |  SELECT l_orderkey,
      |    greatest(CAST(datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS BIGINT), CAST(0 AS BIGINT)) AS day
      |  FROM lineitem)
      |${leg("insertion", "l_orderkey // 256")}
      |UNION ALL
      |${leg("shipdate_week", "day // 7")}
      |ORDER BY layout""".stripMargin
  }

  // ---------- p14: Bloom-filter data-skipping audit ----------

  /** p14 geometry: 4096-bit per-file blooms as (file, lane) rows of
    * 32-bit BIGINT lanes (DuckDB refuses 1<<63, so lanes stay at 32
    * bits), k = 2 seeded FNV hashes, files of 64 orders (~256 rows)
    * ⇒ measured FP ≈ 1-2% — the Parquet-bloom operating point.
    * Position = hash & 4095: the POWER-OF-TWO mask is load-bearing —
    * signed pmod and the oracle's unsigned % agree only when the
    * modulus divides 2^64 (a non-power modulus would break bitwise
    * parity on negative hashes). The seed index is a PREFIX, not a
    * suffix: FNV-1a hashes differing only in the LAST byte differ by
    * a constant (h1 = h0 + p·Δ), so suffix-seeded "independent"
    * hashes share one masked offset and the bloom degenerates to
    * k = 1 — measured FP 12.8% vs 1.3% (the spec pins the fixed
    * geometry's FP budget so the regression cannot return).
    */
  private val p14Bits = 4096L
  private val p14Probes: Seq[Long] = (0L to 9L) ++ (0L to 9L).map(1000000000L + _)

  /** p14: BLOOM-FILTER DATA SKIPPING (the Parquet column-index
    * bloom / Delta bloom story): p12's zone maps skip NOTHING for
    * point lookups on a high-cardinality column the layout is not
    * sorted by (every file's min/max straddles every key), but a
    * per-file Bloom filter prunes almost every file — the audit
    * measures exactly that complement. Per-file 4096-bit blooms
    * from the distinct (file, key) grain (insertion is idempotent,
    * so the distinct costs nothing semantically and bounds work);
    * each probe key needs BOTH its lanes present-and-set
    * (inner-join on lane + per-(probe, file) both-hashes check —
    * missing lane rows ARE the zero lanes). Bloom soundness is
    * structural: a containing file always hits (no false
    * negatives — spec-pinned), so files_bloom_hit −
    * files_containing is exactly the false-positive count the FP
    * budget grades. All integer/bit ops, bitwise cross-engine.
    *
    * Scale shape: the bloom build is ONE map-side-combined
    * (file, lane)-keyed bit_or aggregate over 2 id-free rows per
    * distinct key — the p8-stats economics; the probe side is a
    * ≤ 40-row broadcast; the audit join touches only the probes'
    * lanes. At petabyte scale this is the metadata-sidecar build
    * every lakehouse runs beside the data files.
    */
  def p14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fk = Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey div 64 AS file_id", "l_partkey AS k").distinct()
    def pos(e: org.apache.spark.sql.Column, i: Int) =
      graft.functions.Fnv64.fnv64(concat(lit(s"$i#"), e.cast("string")))
        .bitwiseAND(lit(p14Bits - 1L))
    def bitsOf(df: DataFrame, keyCol: String): DataFrame =
      (0 to 1).map { i =>
        df.withColumn("pos", pos(col(keyCol), i)).withColumn("hix", lit(i.toLong))
      }.reduce(_.unionByName(_))
        .selectExpr("*", "pos div 32 AS lane",
          "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)) AS mask")
    val blooms = bitsOf(fk, "k")
      .groupBy($"file_id", $"lane").agg(expr("bit_or(mask)").as("bits"))
    val nFiles = fk.select($"file_id").distinct()
      .agg(count(lit(1)).as("n_files"))
    val probes = p14Probes.toDF("probe_key")
    val hits = bitsOf(probes, "probe_key")
      .select($"probe_key", $"hix", $"lane", $"mask")
      .join(blooms, Seq("lane"))
      .filter(($"bits".bitwiseAND($"mask")) =!= 0L)
      .groupBy($"probe_key", $"file_id")
      .agg(countDistinct($"hix").as("nh"))
      .filter($"nh" === 2L)
      .groupBy($"probe_key").agg(count(lit(1)).as("files_bloom_hit"))
    val containing = fk.join(probes, $"k" === $"probe_key")
      .groupBy($"probe_key")
      .agg(countDistinct($"file_id").as("files_containing"))
    probes
      .join(hits, Seq("probe_key"), "left_outer")
      .join(containing, Seq("probe_key"), "left_outer")
      .crossJoin(broadcast(nFiles))
      .selectExpr("probe_key",
        "CAST(CASE WHEN coalesce(files_containing, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS present",
        "n_files",
        "coalesce(files_bloom_hit, CAST(0 AS BIGINT)) AS files_bloom_hit",
        "coalesce(files_containing, CAST(0 AS BIGINT)) AS files_containing",
        "coalesce(files_bloom_hit, CAST(0 AS BIGINT)) - coalesce(files_containing, CAST(0 AS BIGINT)) AS false_pos")
      .transform(Tables.ordered(_, $"probe_key"))
  }

  // ---------- p15: merge-on-read position deletes (deletion vectors) ----------

  private val p15RewritePermille = 220L

  /** p15: ROW-LEVEL DELETES, MERGE-ON-READ — the position-delete
    * sidecar every modern table format runs (Iceberg v2 position
    * deletes, Delta deletion vectors): data files are immutable, so
    * a delete commit writes (file, row_position) tombstones instead
    * of rewriting files, readers subtract them at scan time, and a
    * maintenance job rewrites a file only once its dead fraction
    * crosses a threshold. Mechanics exercised end-to-end: row
    * positions are assigned at the FILE grain (row_number within
    * file over the (orderkey, linenumber) clustering key — the
    * Parquet row-group position, bounded by file size, which is why
    * a per-file window is the legitimate grain here); two delete
    * commits (quantity > 45; returnflag R with discount > 0.05)
    * record OVERLAPPING position sets; the deletion vector is their
    * position-distinct union keeping the FIRST commit id (min —
    * the commit that actually killed the row); the read path
    * subtracts by (file, pos) ANTI-JOIN — positions, NOT
    * predicates, exactly what the format's reader does. Per file:
    * row/tombstone/live accounting, dead fraction in permille
    * (§8.39 non-negative integral division), the ≥
    * [[p15RewritePermille]] rewrite decision, and a live-content
    * attestation (Σ 7·orderkey + linenumber over surviving rows —
    * exact BIGINT) proving the anti-join dropped exactly the
    * tombstoned rows and nothing else.
    *
    * Scale shape: position assignment is per-file (bounded by file
    * size — the row-group contract); the delete scans are plain
    * filters; the vector build is one (file, pos) aggregate; the
    * read-path subtraction is one anti-join on the same key the
    * positions were assigned on (co-partitioned); the audit is one
    * file-grain aggregate. At petabyte scale this is the
    * read-amplification-vs-write-amplification dial every lakehouse
    * table tunes.
    */
  def p15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"file_id").orderBy($"l_orderkey", $"l_linenumber")
    // (orderkey, linenumber) is NOT unique in the synthetic table, so
    // position assignment under ties is engine-arbitrary — every
    // consumer (delete scans, read path, audit) must therefore read
    // ONE materialized assignment (localCheckpoint here, the CTE
    // MATERIALIZED in the oracle — §8.38's multi-consumer trap), and
    // every output column is position-INDEPENDENT (counts and sums
    // over predicate-determined row sets), so cross-engine parity
    // survives the tie-order difference.
    val rows = Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey div 64 AS file_id", "l_orderkey",
        "l_linenumber", "l_quantity", "l_returnflag", "l_discount")
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .localCheckpoint()
    val del1 = rows.filter($"l_quantity" > 45.0)
      .select($"file_id", $"pos", lit(1L).as("commit"))
    val del2 = rows.filter($"l_returnflag" === "R" && $"l_discount" > 0.05)
      .select($"file_id", $"pos", lit(2L).as("commit"))
    // the deletion vector: position-distinct, first deleting commit
    val dv = del1.unionByName(del2)
      .groupBy($"file_id", $"pos").agg(min($"commit").as("first_commit"))
    val live = rows.join(dv.select($"file_id", $"pos"),
      Seq("file_id", "pos"), "left_anti")
    val stats = rows.groupBy($"file_id").agg(count(lit(1)).as("n_rows"))
      .join(dv.groupBy($"file_id").agg(count(lit(1)).as("n_deleted")),
        Seq("file_id"), "left_outer")
      .join(live.groupBy($"file_id").agg(count(lit(1)).as("live_rows"),
          sum($"l_orderkey" * 7L + $"l_linenumber").as("live_sum")),
        Seq("file_id"), "left_outer")
    stats.selectExpr("file_id", "n_rows",
        "coalesce(n_deleted, CAST(0 AS BIGINT)) AS n_deleted",
        "coalesce(live_rows, CAST(0 AS BIGINT)) AS live_rows",
        "(coalesce(n_deleted, CAST(0 AS BIGINT)) * 1000) div n_rows AS del_permille",
        s"CAST(CASE WHEN (coalesce(n_deleted, CAST(0 AS BIGINT)) * 1000) div n_rows >= $p15RewritePermille THEN 1 ELSE 0 END AS BIGINT) AS rewrite",
        "coalesce(live_sum, CAST(0 AS BIGINT)) AS live_sum")
      .transform(Tables.ordered(_, $"file_id"))
  }

  /** p15 oracle: the same per-file positions, the two delete scans,
    * the min-commit distinct vector, the NOT-EXISTS position
    * subtraction and the file-grain audit.
    */
  val p15Sql: String =
    s"""WITH rows_ AS MATERIALIZED (
      |  SELECT l_orderkey // 64 AS file_id, l_orderkey, l_linenumber,
      |    l_quantity, l_returnflag, l_discount,
      |    CAST(row_number() OVER (PARTITION BY l_orderkey // 64
      |      ORDER BY l_orderkey, l_linenumber) AS BIGINT) - 1 AS pos
      |  FROM lineitem),
      |dv AS (SELECT file_id, pos, CAST(min(c) AS BIGINT) AS first_commit FROM (
      |    SELECT file_id, pos, 1 AS c FROM rows_ WHERE l_quantity > 45.0
      |    UNION ALL
      |    SELECT file_id, pos, 2 FROM rows_
      |    WHERE l_returnflag = 'R' AND l_discount > 0.05) GROUP BY 1, 2),
      |live AS (SELECT r.* FROM rows_ r
      |    WHERE NOT EXISTS (SELECT 1 FROM dv d
      |      WHERE d.file_id = r.file_id AND d.pos = r.pos)),
      |st AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows FROM rows_ GROUP BY 1),
      |dd AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_deleted FROM dv GROUP BY 1),
      |lv AS (SELECT file_id, CAST(count(*) AS BIGINT) AS live_rows,
      |        CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS live_sum
      |      FROM live GROUP BY 1)
      |SELECT st.file_id, st.n_rows,
      |  coalesce(dd.n_deleted, CAST(0 AS BIGINT)) AS n_deleted,
      |  coalesce(lv.live_rows, CAST(0 AS BIGINT)) AS live_rows,
      |  (coalesce(dd.n_deleted, CAST(0 AS BIGINT)) * 1000) // st.n_rows AS del_permille,
      |  CAST(CASE WHEN (coalesce(dd.n_deleted, CAST(0 AS BIGINT)) * 1000) // st.n_rows >= $p15RewritePermille
      |       THEN 1 ELSE 0 END AS BIGINT) AS rewrite,
      |  coalesce(lv.live_sum, CAST(0 AS BIGINT)) AS live_sum
      |FROM st
      |LEFT JOIN dd ON dd.file_id = st.file_id
      |LEFT JOIN lv ON lv.file_id = st.file_id
      |ORDER BY st.file_id""".stripMargin

  /** p14 oracle: the same seeded-FNV positions (unsigned HUGEINT %
    * 4096 — power-of-two equivalence with the signed mask), lane
    * bit_or build, both-lanes probe test and containment count.
    */
  val p14Sql: String = {
    def posSql(e: String, i: Int) =
      s"(${graft.functions.Fnv64.duckUnsigned(s"'$i#' || CAST($e AS VARCHAR)")}) % $p14Bits"
    val probeList = p14Probes.mkString(", ")
    s"""WITH fk AS (SELECT DISTINCT l_orderkey // 64 AS file_id, l_partkey AS k
      |      FROM lineitem),
      |kb AS (SELECT file_id, k, CAST(0 AS BIGINT) AS hix,
      |        CAST(${posSql("k", 0)} AS BIGINT) AS pos FROM fk
      |      UNION ALL
      |      SELECT file_id, k, 1, CAST(${posSql("k", 1)} AS BIGINT) FROM fk),
      |bl AS (SELECT file_id, pos // 32 AS lane,
      |        bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
      |      FROM kb GROUP BY 1, 2),
      |nf AS (SELECT CAST(count(DISTINCT file_id) AS BIGINT) AS n_files FROM fk),
      |pr AS (SELECT CAST(unnest([$probeList]) AS BIGINT) AS probe_key),
      |pb AS (SELECT probe_key, CAST(0 AS BIGINT) AS hix,
      |        CAST(${posSql("probe_key", 0)} AS BIGINT) AS pos FROM pr
      |      UNION ALL
      |      SELECT probe_key, 1, CAST(${posSql("probe_key", 1)} AS BIGINT) FROM pr),
      |pm AS (SELECT probe_key, hix, pos // 32 AS lane,
      |        CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER) AS mask FROM pb),
      |ht AS (SELECT p.probe_key, b.file_id
      |      FROM pm p JOIN bl b ON b.lane = p.lane
      |      WHERE (b.bits & p.mask) != 0
      |      GROUP BY 1, 2 HAVING count(DISTINCT p.hix) = 2),
      |hc AS (SELECT probe_key, CAST(count(*) AS BIGINT) AS files_bloom_hit
      |      FROM ht GROUP BY 1),
      |ct AS (SELECT p.probe_key, CAST(count(DISTINCT f.file_id) AS BIGINT) AS files_containing
      |      FROM fk f JOIN pr p ON f.k = p.probe_key GROUP BY 1)
      |SELECT pr.probe_key,
      |  CAST(CASE WHEN coalesce(ct.files_containing, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS present,
      |  nf.n_files,
      |  coalesce(hc.files_bloom_hit, CAST(0 AS BIGINT)) AS files_bloom_hit,
      |  coalesce(ct.files_containing, CAST(0 AS BIGINT)) AS files_containing,
      |  coalesce(hc.files_bloom_hit, CAST(0 AS BIGINT)) - coalesce(ct.files_containing, CAST(0 AS BIGINT)) AS false_pos
      |FROM pr
      |LEFT JOIN hc ON hc.probe_key = pr.probe_key
      |LEFT JOIN ct ON ct.probe_key = pr.probe_key
      |CROSS JOIN nf
      |ORDER BY pr.probe_key""".stripMargin
  }
}
