package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, greatest, least, lit}

/** Single façade over the library — the entry points a user of the
  * reference container needs to run the same workloads on Spark.
  * Everything here delegates to the packages documented in README.md;
  * `SparkEntry.queries` remains the exhaustive registry.
  */
object Graft {

  /** A session configured the way the engine expects (UTC, AQE on,
    * sane local shuffle width). On a cluster, add
    * `spark.sql.extensions=graft.plans.GraftSessionExtensions` to
    * register the custom operators at session build.
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .getOrCreate()

  // ---- the reference's ETL, composed ----
  def runW4h(spark: SparkSession, dataDir: String, workRoot: String,
      sourceVersion: String): pipeline.W4hJob.Summary =
    pipeline.W4hJob.run(spark, dataDir, workRoot, sourceVersion)

  // ---- thermal indices over a grid ----
  def thermalChain(spark: SparkSession, dataDir: String): DataFrame =
    functions.ThermalChain.df(spark, dataDir, functions.ThermalChain.full)

  // ---- joins Spark lacks natively ----
  def asofJoin(left: DataFrame, lKey: Column, lTime: Column,
      right: DataFrame, rKey: Column, rTime: Column,
      matchedName: String): DataFrame =
    plans.AsOfJoin.asofJoin(left, lKey, lTime, right, rKey, rTime, matchedName)

  def rangeJoin(left: DataFrame, lKey: Column, lTime: Column,
      right: DataFrame, rKey: Column, rTime: Column,
      lowDelta: Long, highDelta: Long): DataFrame =
    plans.RangeJoin.rangeJoin(left, lKey, lTime, right, rKey, rTime, lowDelta, highDelta)

  // ---- scalar / aggregate extensions ----
  def fnv64(c: Column): Column = functions.Fnv64.fnv64(c)
  def topK(k: Int) = new functions.TopKAgg(k)

  // ---- dedup decision tables, applied (the d7/d13 pattern) ----
  /** Near-dup keep/remove decisions from PRE-VERIFIED pairs (src, dst)
    * — components + min-id survivor; join the result back to the
    * corpus to apply.
    */
  def neardupDecisions(verifiedPairs: DataFrame): DataFrame =
    operators.Dedup.d13Apply(verifiedPairs)

  /** Containment + Jaccard scores for candidate (id_a, id_b) pairs
    * over a (doc_id, text) corpus — d17/d18's `containmentOf` with
    * the shingle index built in: returns (id_a, id_b, inter, na,
    * nb, containment, jaccard); threshold downstream (containment
    * ≥ τ as the integer cut `inter * q >= na * p` for τ = p/q).
    */
  def containment(pairs: DataFrame, corpus: DataFrame): DataFrame = {
    val shx = operators.Dedup.shingleExplode(corpus)
    val sizes = shx.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    operators.Dedup.containmentOf(pairs, shx, sizes)
  }

  /** Community labels by deterministic synchronous label
    * propagation (g6's core) over an UNDIRECTED edge list (src,
    * dst) — symmetrized and deduplicated here; returns (id,
    * community) for every endpoint after `rounds` rounds.
    */
  def communities(edges: DataFrame, rounds: Int = 6): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val sym = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
    val nodes = sym.select(col("src").as("id")).distinct()
    operators.Graph.lpaLabels(nodes, sym, rounds)
      .select(col("id"), col("lbl").as("community"))
  }

  /** k-core peel-depth labels (g7's core) over an UNDIRECTED edge
    * list (src, dst) — symmetrize/canonicalize here; returns (id,
    * peel_round, core_deg) for every endpoint after `rounds`
    * synchronous sweeps at threshold `k` (peel_round 0 = still in
    * the core, core_deg = degree inside the surviving subgraph).
    */
  def kcore(edges: DataFrame, k: Int = 3, rounds: Int = 8): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val nodes = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id"))).distinct()
    operators.Graph.kcorePeel(nodes, und, k, rounds)
  }

  // ---- skew tooling ----
  /** Split-and-broadcast equi-join for a skewed probe side against a
    * unique-keyed build side (see [[operators.Skew.hotKeyJoin]]).
    */
  def hotKeyJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, hotThreshold: Long): DataFrame =
    operators.Skew.hotKeyJoin(probe, build, probeKey, buildKey, hotThreshold)

  /** Release the block-manager storage of a localCheckpoint'd
    * DataFrame — `Dataset.unpersist()` cannot see it (see
    * [[functions.Lineage]]); iterative callers need this per round.
    */
  def freeCheckpoint(df: DataFrame): Unit = functions.Lineage.freeCheckpoint(df)

  // ---- data selection (DSIR), train offline / serve online ----
  /** Train the DSIR importance estimator on a corpus directory:
    * returns (quantized per-feature log-ratio table, Σ corpus weight,
    * doc count) — bounded by construction (512 + 1 rows).
    */
  def dsirModel(spark: SparkSession, dataDir: String): (Map[Long, Long], Long, Long) =
    operators.TextStats.dsirModel(spark, dataDir)

  /** Score (doc_id, text) rows against a trained DSIR model as a
    * stateless narrow map — safe on `readStream` (see s16).
    */
  def dsirScore(docs: DataFrame, lr9: Map[Long, Long], tot: Long, nd: Long): DataFrame =
    operators.TextStats.dsirScore(docs, lr9, tot, nd)

  // ---- rule-based quality gating (Gopher/C4), batch or stream ----
  /** Per-document gate flags + composed keep verdict for (doc_id,
    * text) rows — a stateless narrow map, safe on `readStream`
    * (t21 batch / s17 stream door share this exact function).
    */
  def qualityGate(docs: DataFrame): DataFrame =
    operators.TextStats.gopherFlags(docs)

  // ---- deterministic HyperLogLog ndv (batch or streaming) ----
  /** The ≤1024-row HLL register table for any value expression —
    * mergeable by max-per-register; run it as a streaming aggregate
    * for an always-on distinct monitor (s18).
    */
  def hllRegisters(df: DataFrame, valueExpr: String): DataFrame =
    functions.Hll.registers(df, valueExpr)

  /** 1-row ndv estimate (raw HLL + linear-counting correction) from
    * a register table.
    */
  def hllEstimate(registers: DataFrame): DataFrame =
    functions.Hll.estimate(registers)

  // ---- deterministic Count-Min frequency sketch (batch or streaming) ----
  /** The ≤ d·w = 2048-cell CMS table for any key expression —
    * mergeable by cell-wise sum; run it as a streaming aggregate for
    * an always-on heavy-hitter monitor (s19).
    */
  def cmsCells(df: DataFrame, keyExpr: String): DataFrame =
    functions.Cms.cells(df, keyExpr)

  /** Point estimates (min over rows; only ever overcounts) for a
    * tiny (ks, n_exact) candidate frame against a cell table.
    */
  def cmsEstimate(cells: DataFrame, keys: DataFrame): DataFrame =
    functions.Cms.estimate(cells, keys)

  // ---- mergeable histogram quantile sketch (batch or streaming) ----
  /** The ≤256-cell equi-width histogram for any value expression —
    * mergeable by cell-wise sum; run it as a streaming aggregate for
    * an always-on percentile monitor (s22).
    */
  def histCells(df: DataFrame, valueExpr: String, width: Long): DataFrame =
    functions.HistQ.histogram(df, valueExpr, width)

  /** Per-permille bucket estimates with rank-guarantee bounds from a
    * histogram cell table (q34/s22 share this).
    */
  def histQuantiles(hist: DataFrame, width: Long, permilles: Seq[Int]): DataFrame =
    functions.HistQ.locate(hist, width, permilles)

  // ---- connected components over any edge list ----
  /** Labels (id, lbl) for an undirected (src, dst) edge list via the
    * O(log n)-round large-star/small-star contraction —
    * diameter-independent (g4/d6's engine). Throws if the contraction
    * fails to converge within `maxRounds`.
    */
  def components(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val (labels, _, conv) = operators.Dedup.ccStars(edges, maxRounds)
    require(conv, s"stars contraction did not converge within $maxRounds rounds")
    labels
  }

  /** Registry of every operator: name -> (session, sfDir) => result. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = SparkEntry.queries
}
