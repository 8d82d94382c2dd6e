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

  /** p8: ANALYZE-style per-column table statistics — row count,
    * null count, EXACT distinct count, min and max (canonical string
    * form) — the optimizer/pruning metadata a 100 TB table
    * maintenance pass materializes (Spark's own ANALYZE TABLE ...
    * COMPUTE STATISTICS FOR COLUMNS writes exactly these to the
    * catalog for CBO join reordering and broadcast decisions).
    *
    * Shape: ONE scan — all four columns' aggregates ride a single
    * multi-distinct aggregate (Catalyst plans n distinct aggregates
    * as one Expand ×(n+1) + two-phase aggregate: one pass over the
    * data, partial combine on every branch), then a 1-row stack()
    * unpivots to the per-column layout. No per-column rescan; at
    * scale the Expand's extra rows are all nulls outside their
    * branch and compress to nothing in the shuffle.
    */
  def p8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val aggs = count(lit(1)).as("n_rows") +: p8Cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val stackArgs = p8Cols.map(c =>
      s"'$c', nulls_$c, ndv_$c, min_$c, max_$c").mkString(", ")
    li.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${p8Cols.size}, $stackArgs) AS (col_name, n_nulls, ndv, min_s, max_s)")
      .select($"col_name", $"n_rows", $"n_nulls", $"ndv", $"min_s", $"max_s")
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
}
