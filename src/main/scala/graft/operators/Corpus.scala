package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The composed LLM-corpus run — the training-data side's analogue of
  * `W4hJob`'s composed ETL: one job that chains the curation gates a
  * pretraining pipeline actually applies, reporting per-stage
  * retention (the "data funnel" every corpus card publishes).
  */
object Corpus {

  /** Quality gate threshold (t2's score; exactly representable, and
    * both engines compute bitwise-identical scores, so the boundary
    * compare is deterministic).
    */
  private val qualityMin = "0.5"

  /** p5: the corpus curation funnel — quality gate (t2's score) →
    * language-ID agreement gate (t3's classifier) → exact dedup
    * (d1's digest, min-id survivor) → eval decontamination (t10's
    * 8-gram overlap) — over a seeded corpus (train docs plus d1-style
    * copies of every 5th; docs with doc_id % 13 == 0 are the held-out
    * eval set and never enter the corpus). Output: one row per stage
    * with (n_in, n_kept, n_removed), n_in chaining from the previous
    * stage — the per-stage retention report.
    *
    * Scale shape: stages 1-2 are flags on the narrow feature map
    * (zero extra shuffles); stage 3 is ONE window over the digest
    * (survivor min restricted to still-alive rows via a conditional
    * min — no second pass); stage 4 joins survivor grams to the
    * broadcast-sized eval gram set (t10's shared gram expression,
    * never train × eval). Every contaminated id is by construction a
    * distinct stage-3 survivor, so stage 4 is a COUNT SUBTRACTION
    * (n4 = n3 − |contaminated|) — no per-doc join-back; the staged
    * flags cache so the counts aggregate and the decontam branch
    * share one computation of the feature map + digest window.
    * Nothing per-doc ever reaches the driver.
    */
  def p5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import TextStats.{gram8Expr, markers, predExpr, scoreExpr, stopSqlSet}
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text", $"lang")
    val train = docs.filter($"doc_id" % 13 =!= 0)
    val corpus = train.unionByName(
      train.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 10000).as("doc_id"), $"text", $"lang"))
    // t2's features + t3's marker scores on one narrow map
    val feats = corpus
      .selectExpr("doc_id", "text", "lang",
        "CAST(length(text) AS BIGINT) AS n_chars",
        "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n_words",
        s"CAST(size(filter(split(lower(text), ' '), w -> w IN $stopSqlSet)) AS BIGINT) AS n_stop",
        "CAST(regexp_count(text, '[.,;:!?]') AS BIGINT) AS n_punct",
        "split(lower(text), ' ') AS lwords")
      .selectExpr(Seq("doc_id", "text", "lang", "n_chars", "n_words",
        "CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio",
        "CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio") ++
        markers.map { case (l, set) => s"${scoreExpr("lwords", set)} AS s_$l" }: _*)
      .selectExpr("doc_id", "text", "lang",
        ("least(1.0, CAST(n_words AS DOUBLE) / 100.0) * 0.4" +
          " + least(1.0, stop_ratio * 5.0) * 0.4" +
          " + (1.0 - least(1.0, punct_ratio * 10.0)) * 0.2") + " AS quality",
        s"($predExpr) AS predicted")
      .selectExpr("doc_id", "text",
        s"quality >= $qualityMin AS q_ok",
        s"(quality >= $qualityMin AND predicted = lang) AS l_ok",
        "md5(lower(trim(text))) AS digest")
    // stage 3: survivor = min doc_id per digest AMONG l_ok rows
    val wD = org.apache.spark.sql.expressions.Window.partitionBy($"digest")
    val staged = feats
      .withColumn("dmin", min(when($"l_ok", $"doc_id")).over(wD))
      .withColumn("d_ok", $"l_ok" && $"doc_id" === $"dmin")
      .select($"doc_id", $"text", $"q_ok", $"l_ok", $"d_ok")
      .cache()
    // stage 4: survivors sharing an 8-gram with any eval doc
    val evalGrams = docs.filter($"doc_id" % 13 === 0)
      .selectExpr("split(lower(trim(text)), ' ') AS words")
      .selectExpr(s"explode($gram8Expr) AS g").distinct()
    val contamCount = staged.filter($"d_ok")
      .selectExpr("doc_id", "split(lower(trim(text)), ' ') AS words")
      .selectExpr("doc_id", s"explode($gram8Expr) AS g")
      .join(evalGrams, Seq("g"))
      .select($"doc_id").distinct()
      .agg(count(lit(1)).as("nbad"))
    staged
      .agg(
        count(lit(1)).as("n0"),
        sum(when($"q_ok", 1L).otherwise(0L)).as("n1"),
        sum(when($"l_ok", 1L).otherwise(0L)).as("n2"),
        sum(when($"d_ok", 1L).otherwise(0L)).as("n3"))
      .crossJoin(contamCount)
      .selectExpr(
        """stack(4,
          | '1_quality',     n0, n1,
          | '2_langid',      n1, n2,
          | '3_exact_dedup', n2, n3,
          | '4_decontam',    n3, n3 - nbad) AS (stage, n_in, n_kept)""".stripMargin)
      .selectExpr("stage", "n_in", "n_kept", "n_in - n_kept AS n_removed")
      .transform(graft.Tables.ordered(_, $"stage"))
  }

  val p5Sql: String = {
    import TextStats.{gram8Sql => gramSql, markers, predExpr, scoreSqlExpr, stopSqlSet}
    val scores = markers.map { case (l, set) =>
      s"${scoreSqlExpr("lwords", set)} AS s_$l"
    }.mkString(",\n       ")
    s"""WITH docs AS (SELECT doc_id, text, lang FROM documents),
       |train AS (SELECT * FROM docs WHERE doc_id % 13 <> 0),
       |corpus AS (
       |  SELECT doc_id, text, lang FROM train
       |  UNION ALL
       |  SELECT doc_id + 10000, text, lang FROM train WHERE doc_id % 5 = 0),
       |f AS (SELECT doc_id, text, lang,
       |        CAST(length(text) AS BIGINT) AS n_chars,
       |        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
       |        CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN $stopSqlSet)) AS BIGINT) AS n_stop,
       |        CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       |        string_split(lower(text), ' ') AS lwords
       |      FROM corpus),
       |r AS (SELECT *,
       |        CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
       |        CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
       |       $scores
       |      FROM f),
       |q AS (SELECT doc_id, text, lang,
       |        least(1.0, CAST(n_words AS DOUBLE) / 100.0) * 0.4
       |          + least(1.0, stop_ratio * 5.0) * 0.4
       |          + (1.0 - least(1.0, punct_ratio * 10.0)) * 0.2 AS quality,
       |        ($predExpr) AS predicted
       |      FROM r),
       |g AS (SELECT doc_id, text,
       |        quality >= $qualityMin AS q_ok,
       |        (quality >= $qualityMin AND predicted = lang) AS l_ok,
       |        md5(lower(trim(text))) AS digest
       |      FROM q),
       |d AS (SELECT *,
       |        (l_ok AND doc_id = min(CASE WHEN l_ok THEN doc_id END)
       |           OVER (PARTITION BY digest)) AS d_ok
       |      FROM g),
       |eg AS (SELECT DISTINCT unnest($gramSql) AS g2
       |       FROM (SELECT string_split(lower(trim(text)), ' ') AS words
       |             FROM docs WHERE doc_id % 13 = 0)),
       |sg AS (SELECT doc_id, unnest($gramSql) AS g2
       |       FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS words
       |             FROM d WHERE d_ok)),
       |bad AS (SELECT DISTINCT doc_id FROM sg JOIN eg USING (g2)),
       |fin AS (SELECT d.*,
       |          (d_ok AND doc_id NOT IN (SELECT doc_id FROM bad)) AS c_ok
       |        FROM d),
       |c AS (SELECT CAST(count(*) AS BIGINT) AS n0,
       |        CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |        CAST(sum(CASE WHEN l_ok THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |        CAST(sum(CASE WHEN d_ok THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |        CAST(sum(CASE WHEN c_ok THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |      FROM fin)
       |SELECT '1_quality' AS stage, n0 AS n_in, n1 AS n_kept, n0 - n1 AS n_removed FROM c
       |UNION ALL SELECT '2_langid', n1, n2, n1 - n2 FROM c
       |UNION ALL SELECT '3_exact_dedup', n2, n3, n2 - n3 FROM c
       |UNION ALL SELECT '4_decontam', n3, n4, n3 - n4 FROM c
       |ORDER BY stage""".stripMargin
  }

  // ---------- p9: opt-out purge (right-to-be-forgotten) ----------

  /** Opt-out derivation threshold: users whose error-event count
    * reaches this are treated as the consent-revocation registry
    * (the corpus carries no real registry; the derivation is the
    * fixture, the purge is the operator).
    */
  private[graft] val p9ErrorMin = 18L

  /** The derived consent-revocation registry — ONE definition shared
    * by the batch purge (p9) and the streaming door gate (s21), so
    * the two sides of the erasure workflow cannot drift.
    */
  private[graft] def optoutRegistry(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    ev.filter($"event_type" === "error")
      .groupBy($"user_id").agg(count(lit(1)).as("n_err"))
      .filter($"n_err" >= p9ErrorMin)
      .select($"user_id", lit(1L).as("revoked"))
  }

  /** The registry as oracle SQL (threshold from [[p9ErrorMin]]). */
  private[graft] val optoutRegistrySql: String =
    s"""SELECT user_id FROM events WHERE event_type = 'error'
      |  GROUP BY user_id HAVING count(*) >= $p9ErrorMin""".stripMargin

  /** p9: OPT-OUT PURGE — the retroactive data-subject-deletion pass
    * every stored corpus needs (GDPR/CCPA erasure, robots.txt
    * honored after the fact, author takedowns): given a registry of
    * revoked users, remove ALL their events and report the removal
    * per event_type (n_before, n_removed, n_after) — the audit trail
    * a deletion request must produce. The registry is derived here
    * (users with ≥ [[p9ErrorMin]] error events); a real run reads a
    * consent table.
    *
    * Scale shape: the registry is user-grain TINY next to the event
    * corpus — it BROADCASTS, so the purge flag is a broadcast hash
    * join (no shuffle of the corpus by user), and the audit is one
    * event_type aggregate (map-side combine, type-bounded output).
    * The corpus is scanned ONCE; n_after = n_before − n_removed
    * comes from the same pass. A registry too large to broadcast
    * falls back to the pk-bucketed anti join (p4/p6's zero-exchange
    * posture).
    */
  def p9(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    ev.join(broadcast(optoutRegistry(ev)), Seq("user_id"), "left_outer")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_before"),
        sum(coalesce($"revoked", lit(0L))).as("n_removed"))
      .withColumn("n_after", $"n_before" - $"n_removed")
      .transform(graft.Tables.ordered(_, $"event_type"))
  }

  /** p9 oracle: the same derived registry as a plain IN-subquery. */
  val p9Sql: String =
    s"""WITH optout AS (
      |$optoutRegistrySql)
      |SELECT event_type, count(*) AS n_before,
      |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM optout)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  count(*) - CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM optout)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_after
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------- p13: constraint enforcement with quarantine routing ----------

  /** The seeded-corruption ingest batch (the d2/dq2 fixture
    * discipline — the testdata is CLEAN, so violations are
    * constructed and the router's answer is known): three disjoint
    * deterministic slices get a negated quantity, an out-of-domain
    * discount, and an orphaned order key.
    */
  private val p13CorruptExprs = Seq(
    "CASE WHEN l_orderkey % 83 = 5 AND l_linenumber = 1 " +
      "THEN l_orderkey + 10000000 ELSE l_orderkey END AS bkey",
    "CASE WHEN l_orderkey % 97 = 0 AND l_linenumber = 1 " +
      "THEN -l_quantity ELSE l_quantity END AS bqty",
    "CASE WHEN l_orderkey % 89 = 3 AND l_linenumber = 1 " +
      "THEN 0.9 ELSE l_discount END AS bdisc")

  private val p13VerdictExpr =
    """CASE WHEN bqty <= 0 THEN 'q1_quantity'
      |     WHEN bdisc < 0 OR bdisc > 0.5 THEN 'q2_discount'
      |     WHEN fk_ok IS NULL THEN 'q3_orphan'
      |     ELSE 'pass' END AS verdict""".stripMargin

  /** p13: CONSTRAINT ENFORCEMENT with QUARANTINE — dq1 REPORTS
    * violations; p13 is the pipeline stage that ACTS on them (the
    * Delta-Live-Tables "expectations" pattern): every ingest row is
    * routed to `pass` or to its FIRST violated constraint (priority
    * order: quantity domain → discount domain → referential
    * integrity), and the gate emits the routing audit — row count +
    * offending-key range per verdict — that a quarantine table's
    * writer and the on-call both consume. A real run writes the
    * quarantined rows alongside; the routing decision audited here
    * is the whole logic.
    *
    * Scale shape: one scan + narrow corruption/flag maps; the FK
    * check is an equality left-semi-style join against the order-key
    * set (co-partitionable on the key at 100 TB — the one exchange
    * rows pay); the audit is a ≤ 4-row aggregate. First-violated
    * routing makes verdicts DISJOINT, so quarantine counts add up
    * to the batch (spec conservation).
    */
  def p13(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val batch = Tables.lineitem(spark, dir).selectExpr(p13CorruptExprs: _*)
    val withFk = batch.join(
      Tables.orders(spark, dir).select($"o_orderkey".as("bkey"), lit(1L).as("fk_ok")),
      Seq("bkey"), "left_outer")
    withFk
      .selectExpr("bkey", p13VerdictExpr)
      .groupBy($"verdict")
      .agg(count(lit(1)).as("n_rows"),
        min($"bkey").as("min_key"), max($"bkey").as("max_key"))
      .transform(Tables.ordered(_, $"verdict"))
  }

  /** p13 oracle: identical corruption, first-violated routing and
    * audit.
    */
  val p13Sql: String =
    s"""WITH b AS (SELECT ${p13CorruptExprs.mkString(", ")} FROM lineitem),
      |f AS (SELECT b.*,
      |        CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = b.bkey)
      |             THEN 1 ELSE NULL END AS fk_ok
      |      FROM b),
      |v AS (SELECT bkey, $p13VerdictExpr
      |      FROM f)
      |SELECT verdict, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(min(bkey) AS BIGINT) AS min_key,
      |  CAST(max(bkey) AS BIGINT) AS max_key
      |FROM v
      |GROUP BY verdict
      |ORDER BY verdict""".stripMargin
}
