package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph centrality for crawl curation (SURVEY.md §2 g1): large-scale
  * corpus pipelines rank hosts/pages by link centrality to prioritize
  * what gets crawled and kept (CommonCrawl publishes harmonic
  * centrality + PageRank host rankings for exactly this use). The
  * iterative shape here — score join edges, re-aggregate on dst,
  * lineage cut per round — is the template every power-method
  * centrality shares.
  */
object Graph {

  /** Total rank mass, fixed-point. Integer mass makes every iteration
    * EXACT: float PageRank drifts across engines (order-dependent
    * sums), while integer shares with truncating division reproduce
    * bitwise anywhere. The tiny mass lost to truncation each round is
    * deterministic and identical in both engines — a documented
    * property of the fixed-point formulation, not noise.
    */
  private val massS = 1000000000000L // 1e12
  private val g1Rounds = 10

  /** g1: PageRank (Page et al. 1999) over a derived link graph, the
    * power method run [[g1Rounds]] rounds with damping 85/100.
    *
    * Graph: every customer key (0-based, 0..N−1) links to two
    * arithmetic neighbors ((id·31+7) % N, (id·17+3) % N) and its
    * parent (id div 2, for id ≥ 2) — deterministic, 2-3 out-links
    * per node, every target a REAL node (no phantom mass sink), so
    * both engines build the identical edge multiset (self-loops and
    * duplicate targets are legitimate edges and count in deg).
    *
    * Iteration (all BIGINT): share(u) = ((r(u)·85) div 100) div
    * deg(u) per out-edge; next(v) = base + Σ in-shares with base =
    * (S·15/100) div N. Scale shape: one edges⋈rank equality join +
    * one dst aggregate per round (map-side partial), rank state
    * localCheckpoint'd per round and freed via
    * [[graft.functions.Lineage.freeCheckpoint]] — the q27/d6
    * iterative contract. At 100 TB, edges co-partition by src across
    * rounds so the join reuses one partitioning; the dst aggregate
    * is the only other exchange.
    */
  def g1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nodes = Tables.customer(spark, dir).select($"c_custkey".as("id")).cache()
    val n = nodes.count()
    val edges = nodes.selectExpr("id AS src", s"(id * 31 + 7) % $n AS dst")
      .unionAll(nodes.selectExpr("id AS src", s"(id * 17 + 3) % $n AS dst"))
      .unionAll(nodes.filter($"id" >= 2).selectExpr("id AS src", "id div 2 AS dst"))
    // out-degree is loop-invariant: fold it into the CACHED edge
    // table ONCE — left lazy outside the loop, the deg aggregate
    // (a full-edge-set shuffle) would re-execute in all 10 rounds
    val linked = edges
      .join(edges.groupBy($"src").agg(count(lit(1)).as("deg")), Seq("src"))
      .cache()
    val base = (massS * 15L / 100L) / n
    var rank = nodes.withColumn("r", lit(massS / n)).localCheckpoint()
    (1 to g1Rounds).foreach { _ =>
      val contrib = linked
        .join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .selectExpr("dst", "((r * 85) div 100) div deg AS share")
        .groupBy($"dst").agg(sum($"share").as("m"))
      val next = nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left_outer")
        .selectExpr("id", s"CAST($base AS BIGINT) + coalesce(m, CAST(0 AS BIGINT)) AS r")
        .localCheckpoint()
      graft.functions.Lineage.freeCheckpoint(rank)
      rank = next
    }
    rank.select($"id".as("c_custkey"), $"r".as("rank_mass"))
      .transform(graft.Tables.ordered(_, $"c_custkey"))
  }

  /** g1 oracle: the identical integer power method unrolled — one
    * (contrib, rank) CTE pair per round over the same arithmetic
    * edge multiset; `//` (floor) equals Spark's `div` on these
    * all-positive values.
    */
  val g1Sql: String = {
    val rounds = (1 to g1Rounds).map { i =>
      s"""c$i AS (SELECT e.dst, ((r.r * 85) // 100) // d.deg AS share
         |        FROM e JOIN r${i - 1} r ON r.id = e.src JOIN deg d ON d.src = e.src),
         |r$i AS (SELECT nd.id, b.base + coalesce(s.m, 0) AS r
         |        FROM nodes nd
         |        LEFT JOIN (SELECT dst, CAST(sum(share) AS BIGINT) AS m FROM c$i GROUP BY dst) s
         |          ON s.dst = nd.id
         |        CROSS JOIN bs b)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT count(*) AS n FROM customer),
      |nodes AS (SELECT c_custkey AS id FROM customer),
      |e AS (SELECT id AS src, (id * 31 + 7) % nn.n AS dst FROM nodes, nn
      |      UNION ALL SELECT id, (id * 17 + 3) % nn.n FROM nodes, nn
      |      UNION ALL SELECT id, id // 2 FROM nodes WHERE id >= 2),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      |bs AS (SELECT CAST(($massS * 15 / 100) // n AS BIGINT) AS base FROM nn),
      |r0 AS (SELECT id, CAST($massS // nn.n AS BIGINT) AS r FROM nodes, nn),
      |$rounds
      |SELECT id AS c_custkey, CAST(r AS BIGINT) AS rank_mass
      |FROM r$g1Rounds
      |ORDER BY c_custkey""".stripMargin
  }
}
