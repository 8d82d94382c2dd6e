package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic cross-engine Count-Min sketch (Cormode &
  * Muthukrishnan 2005, J. Algorithms 55) — the shared frequency
  * sketch behind q32 (batch heavy hitters) and s19 (streaming heavy
  * hitters), the second member of the mergeable-sketch family next
  * to [[Hll]].
  *
  * Layout: [[d]] = 4 hash rows × [[w]] = 512 columns. Row j hashes a
  * key through the md5-prefix idiom salted with the row index
  * (`md5("j:" || key)`), so the rows are independent and BOTH
  * engines compute the identical cell. A point estimate is the MIN
  * over the d cells the key touches — each cell only OVERcounts
  * (collisions add), so min is the tightest bound and
  * `est ≥ n_exact` always (the audit column proves it per query).
  *
  * Scale properties: the increment pass is a narrow map + a 4-way
  * posexplode; the cell aggregate moves ≤ d·w = 2048 rows per
  * executor regardless of input size (map-side partial sum). Cells
  * MERGE by cell-wise sum, so per-partition / per-day /
  * per-micro-batch sketches union without rescanning — and the same
  * cell aggregate runs unchanged as a streaming stateful aggregate
  * whose state is the ≤ 2048 cells, bounded forever (see s19).
  * Unlike [[Hll]] (distinct counts), CMS answers "how MANY times"
  * — together they are the two one-pass answers a 100 TB profiler
  * needs without a key-grain shuffle.
  */
object Cms {
  val d = 4 // hash rows
  val w = 512 // columns per row

  private def sparkCell(j: Int, keyCol: String): String =
    s"CAST(conv(substring(md5(concat('$j:', $keyCol)), 1, 15), 16, 10) AS BIGINT) % $w"

  /** The cell table (j, c, cnt): ≤ d·w rows, mergeable by sum. As a
    * streaming aggregate this is the sketch's state store.
    * `keyExpr` is any SQL expression over `df`'s columns; streams
    * welcome.
    */
  def cells(df: DataFrame, keyExpr: String): DataFrame =
    df.selectExpr(s"CAST(($keyExpr) AS STRING) AS ks")
      .selectExpr("posexplode(array(" +
        (0 until d).map(sparkCell(_, "ks")).mkString(", ") + ")) AS (j, c)")
      .groupBy(col("j"), col("c")).agg(count(lit(1)).as("cnt"))

  /** Point-estimate the keys of a (key: STRING `ks`, n_exact) frame
    * against a cell table: est = min over the d rows, overcount =
    * est − n_exact (≥ 0 by construction). The keys side is expected
    * tiny (heavy-hitter candidates) and is broadcast; the cell table
    * never exceeds d·w rows.
    */
  def estimate(cellTable: DataFrame, keys: DataFrame): DataFrame = {
    val probes = keys.selectExpr("ks", "n_exact",
      "posexplode(array(" +
        (0 until d).map(sparkCell(_, "ks")).mkString(", ") + ")) AS (j, c)")
    cellTable.join(broadcast(probes), Seq("j", "c"))
      .groupBy(col("ks"), col("n_exact")).agg(min(col("cnt")).as("est"))
      .selectExpr("ks", "n_exact", "est", "est - n_exact AS overcount")
  }

  private def duckCell(j: String, keyCol: String): String =
    s"CAST(('0x' || substring(md5($j || ':' || $keyCol), 1, 15)) AS BIGINT) % $w"

  /** The full audited sketch as DuckDB SQL: build the cells from
    * `table`, exact-count the true top-`topN` keys by `keyExpr`
    * (ties broken by key), point-estimate each — the one oracle
    * both q32 and s19 instantiate.
    */
  def oracleSql(table: String, keyExpr: String, topN: Int): String =
    s"""WITH ks AS (SELECT CAST(($keyExpr) AS VARCHAR) AS ks FROM $table),
      |js AS (SELECT unnest([${(0 until d).mkString(", ")}]) AS j),
      |cells AS (
      |  SELECT j, ${duckCell("CAST(j AS VARCHAR)", "ks")} AS c,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM ks, js GROUP BY 1, 2),
      |top AS (SELECT ks, CAST(count(*) AS BIGINT) AS n_exact
      |        FROM ks GROUP BY ks ORDER BY n_exact DESC, ks LIMIT $topN),
      |est AS (
      |  SELECT t.ks, t.n_exact, min(cells.cnt) AS est
      |  FROM top t JOIN js ON true
      |  JOIN cells ON cells.j = js.j
      |   AND cells.c = ${duckCell("CAST(js.j AS VARCHAR)", "t.ks")}
      |  GROUP BY 1, 2)
      |SELECT ks, n_exact, est, est - n_exact AS overcount
      |FROM est ORDER BY n_exact DESC, ks""".stripMargin
}
