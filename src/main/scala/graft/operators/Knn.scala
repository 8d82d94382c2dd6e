package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (SURVEY.md §2 v1-v3):
  * brute-force cosine top-k as the exact baseline, plus the two
  * standard scale paths — random-hyperplane LSH (multi-table) and an
  * IVF-style coarse quantizer with nprobe.
  *
  * Scale design: the query set is small and broadcast; the corpus is
  * never joined to itself. LSH/IVF prune the corpus before scoring,
  * so at 100 TB the per-query work is |bucket| / |cluster|, not |corpus|.
  * Dot products are codegen'd higher-order functions over the native
  * array column — no UDFs, no vector objects.
  */
object Knn {

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr("vec_id", "v",
        "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)) AS nrm")

  private val dotExpr =
    "aggregate(zip_with(qv, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
  private val cosExpr = s"round(($dotExpr / (qnrm * nrm)) * 1e6) / 1e6"

  // ---------- v1: brute-force cosine top-k (exact baseline) ----------

  def v1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, dir)
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qnrm"))
    val corpus = e.filter($"vec_id" >= 10)
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"vec_id")
    corpus.crossJoin(broadcast(queries))
      .selectExpr("qid", "vec_id", s"$cosExpr AS cos_sim")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"qid", $"rnk", $"vec_id", $"cos_sim")
      .orderBy($"qid", $"rnk")
  }

  val v1Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
      |s AS (SELECT q.vec_id AS qid, c.vec_id AS vec_id,
      |        round((list_inner_product(q.v, c.v) / (q.nrm * c.nrm)) * 1e6) / 1e6 AS cos_sim
      |      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id >= 10),
      |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rnk FROM s)
      |SELECT qid, rnk, vec_id, cos_sim FROM r WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin

  // ---------- v2: random-hyperplane LSH, multi-table (rows-only) ----------

  private val nTables = 8
  private val bitsPerTable = 6
  private val dim = 64

  /** Deterministic pseudo-random hyperplanes (no RNG: fixed sine mix). */
  private def planes: Seq[Seq[Double]] =
    (0 until nTables * bitsPerTable).map { j =>
      (0 until dim).map { i =>
        val x = math.sin(j * 131.7 + i * 17.3) * 43758.5453
        x - math.floor(x) - 0.5
      }
    }

  /** bucket ids per table for vector column `v`. */
  private def bucketCols: Seq[String] =
    (0 until nTables).map { t =>
      val bits = (0 until bitsPerTable).map { b =>
        val p = planes(t * bitsPerTable + b)
        val arr = p.map(x => s"CAST($x AS DOUBLE)").mkString("array(", ", ", ")")
        s"(CASE WHEN aggregate(zip_with(v, $arr, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x) >= 0 THEN ${1 << b} ELSE 0 END)"
      }.mkString(" + ")
      s"($bits) AS b$t"
    }

  def v2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, dir)
      .selectExpr(Seq("vec_id", "v", "nrm") ++ bucketCols: _*)
    val buckets = e.selectExpr("vec_id", "v", "nrm",
      s"posexplode(array(${(0 until nTables).map(t => s"named_struct('t', $t, 'b', b$t)").mkString(", ")})) AS (pos, tb)")
      .selectExpr("vec_id", "v", "nrm", "tb.t AS t", "tb.b AS b")
    val q = buckets.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qnrm"), $"t", $"b")
    val c = buckets.filter($"vec_id" >= 10)
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"vec_id")
    c.join(q, Seq("t", "b"))
      .select($"qid", $"vec_id", $"qv", $"qnrm", $"v", $"nrm").distinct()
      .selectExpr("qid", "vec_id", s"$cosExpr AS cos_sim")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"qid", $"rnk", $"vec_id", $"cos_sim")
      .orderBy($"qid", $"rnk")
  }

  // ---------- v3: IVF-style coarse quantizer + nprobe (rows-only) ----------

  def v3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, dir)
    // deterministic coarse centroids: the first 8 corpus vectors
    val cents = e.filter($"vec_id" >= 10 && $"vec_id" < 18)
      .select($"vec_id".as("cid"), $"v".as("qv"), $"nrm".as("qnrm"))
    val corpus = e.filter($"vec_id" >= 18)
    // assign each corpus vector to its nearest centroid
    val wAssign = Window.partitionBy($"vec_id").orderBy($"cos_sim".desc, $"cid")
    val assigned = corpus.crossJoin(broadcast(cents))
      .selectExpr("vec_id", "v", "nrm", "cid", s"$cosExpr AS cos_sim")
      .withColumn("arnk", row_number().over(wAssign))
      .filter($"arnk" === 1)
      .select($"vec_id", $"v", $"nrm", $"cid")
    // per query: probe the 2 nearest centroids
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qnrm"))
    val wProbe = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"cid")
    val probes = queries.crossJoin(broadcast(cents.withColumnRenamed("qv", "v").withColumnRenamed("qnrm", "nrm")))
      .selectExpr("qid", "qv", "qnrm", "cid", s"$cosExpr AS cos_sim")
      .withColumn("prnk", row_number().over(wProbe))
      .filter($"prnk" <= 2)
      .select($"qid", $"qv", $"qnrm", $"cid")
    // search only the probed clusters
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"vec_id")
    probes.join(assigned, Seq("cid"))
      .selectExpr("qid", "vec_id", s"$cosExpr AS cos_sim")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"qid", $"rnk", $"vec_id", $"cos_sim")
      .orderBy($"qid", $"rnk")
  }
}
