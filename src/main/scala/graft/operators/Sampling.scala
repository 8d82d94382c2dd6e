package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic corpus sampling (SURVEY.md §2 t22/t23/s20): the
  * selection step of a training-data pipeline. Random sampling is
  * useless cross-engine (and irreproducible run-to-run at 100 TB);
  * hash-rank sampling gives the SAME statistical guarantees with a
  * deterministic, mergeable, resumable definition:
  *
  *  - uniform sample = the k smallest md5-rank keys ("bottom-k
  *    sketch", Cohen & Kaplan 2007) — a mergeable sketch like
  *    [[graft.functions.Hll]]/[[graft.functions.Cms]]: the union's
  *    bottom-k is the bottom-k of the per-partition bottom-k's,
  *    which is why it runs unchanged as streaming state (s20);
  *  - weighted sample without replacement = Efraimidis-Spirakis
  *    A-ES exponential keys (IPL 97(5) 2006): key = −ln(u)/weight
  *    with u the hash rank — the k smallest keys are a
  *    weight-proportional sample, again order-free and mergeable.
  *
  * The reference has no sampling surface (single-node Python would
  * reach for `random.sample`); these are §2 LLM-pipeline additions,
  * the capability re-expressed as distributed order statistics.
  */
object Sampling {

  /** The shared 60-bit md5-prefix rank (the [[graft.functions.Hll]]
    * hash idiom): uniform on [0, 2^60), identical in both engines.
    */
  private[graft] def hv(expr: String) =
    s"CAST(conv(substring(md5(CAST(($expr) AS STRING)), 1, 15), 16, 10) AS BIGINT)"

  private[graft] def duckHv(expr: String) =
    s"CAST(('0x' || substring(md5(CAST(($expr) AS VARCHAR)), 1, 15)) AS BIGINT)"

  private val t22K = 50

  /** t22: stratified uniform sample — [[t22K]] documents per
    * language, selected as the stratum's bottom-[[t22K]] hash
    * ranks. Reproducible (adding/removing OTHER documents never
    * flips a selection except through displacement at the boundary)
    * and balanced across strata regardless of stratum skew — the
    * standard way to hold out per-language eval slices from a
    * multilingual crawl.
    *
    * Scale shape: strata are FEW (5 langs) so a plain per-stratum
    * window would rank an entire stratum in one task —
    * [[graft.functions.TwoLevel.topK]] ranks within (lang, salt)
    * first and re-ranks only the ≤ salts·k survivors (the audited
    * two-level invariant). One narrow map + the two bounded window
    * passes; nothing else moves.
    */
  def t22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .selectExpr("lang", "doc_id", s"${hv("doc_id")} AS hvr")
    graft.functions.TwoLevel.topK(docs,
        part = Seq($"lang"), order = Seq($"hvr", $"doc_id"),
        saltSrc = $"doc_id", k = t22K, rankName = "rk")
      .selectExpr("lang", "doc_id", "CAST(rk AS BIGINT) AS rk")
      .transform(Tables.ordered(_, $"lang", $"rk"))
  }

  /** t22 oracle: the same bottom-k per stratum as one window. */
  val t22Sql: String =
    s"""WITH h AS (
      |  SELECT lang, doc_id, ${duckHv("doc_id")} AS hvr FROM documents),
      |r AS (SELECT lang, doc_id,
      |        row_number() OVER (PARTITION BY lang ORDER BY hvr, doc_id) AS rk
      |      FROM h)
      |SELECT lang, doc_id, rk FROM r WHERE rk <= $t22K
      |ORDER BY lang, rk""".stripMargin

  private val t23K = 100
  /** 2^60 as a double literal — the hash-rank normalizer. */
  private val hvScale = "1152921504606846976.0"

  /** t23: weighted sample without replacement (Efraimidis-Spirakis
    * A-ES), weight = `n_chars` — i.e. documents drawn
    * length-proportionally, the token-budget view of a corpus (a
    * 10k-char doc is 10× the training mass of a 1k-char one, so it
    * gets 10× the inclusion odds). Key = −ln(u)/w integerized the
    * §8.4 way: the ONE transcendental (ln of the hash rank) is
    * quantized to 10⁻⁹ once, then `nln9·10⁶ div n_chars` is exact
    * non-negative BIGINT division in both engines; the k smallest
    * keys win, ties broken by doc_id.
    *
    * Scale shape: a narrow map then `orderBy.limit` —
    * TakeOrderedAndProject, i.e. per-partition bounded top-k
    * heaps + one k-row merge, never a global sort. The A-ES keys
    * are order-free and mergeable, so per-shard samples of a
    * 100 TB corpus combine by re-ranking k·shards candidate rows.
    */
  def t23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "n_chars", s"${hv("doc_id")} AS hvr")
      .selectExpr("doc_id", "n_chars",
        s"CAST(floor(-ln((hvr + 1) / $hvScale) * 1e9 + 0.5) AS BIGINT) AS nln9")
      .selectExpr("doc_id", "n_chars",
        "(nln9 * 1000000) div n_chars AS ek")
      .orderBy($"ek", $"doc_id").limit(t23K)
      .transform(Tables.ordered(_, $"ek", $"doc_id"))
  }

  /** t23 oracle: identical keys, identical quantization. */
  val t23Sql: String =
    s"""WITH h AS (
      |  SELECT doc_id, n_chars, ${duckHv("doc_id")} AS hvr FROM documents),
      |k AS (SELECT doc_id, n_chars,
      |        CAST(floor(-ln((hvr + 1) / $hvScale) * 1e9 + 0.5) AS BIGINT) AS nln9
      |      FROM h)
      |SELECT doc_id, n_chars, (nln9 * 1000000) // n_chars AS ek
      |FROM k ORDER BY ek, doc_id LIMIT $t23K""".stripMargin

  private[graft] val s20K = 100

  /** s20 oracle (the streaming bottom-k sample lives in
    * `graft.streaming.EventStreams.s20`; its oracle is the batch
    * bottom-k, which the stream must hit bitwise — min is
    * order-free).
    */
  val s20Sql: String =
    s"""WITH h AS (
      |  SELECT event_id, ${duckHv("event_id")} AS hvr FROM events),
      |r AS (SELECT event_id, hvr,
      |        row_number() OVER (ORDER BY hvr, event_id) AS rk
      |      FROM h)
      |SELECT rk, event_id, hvr FROM r WHERE rk <= $s20K
      |ORDER BY rk""".stripMargin

  /** The s20 stream-side projection: (hvr, event_id) pairs for the
    * bottom-k aggregator — shared here so stream and oracle use the
    * same hash expression.
    */
  private[graft] def s20Pairs(events: DataFrame): DataFrame =
    events.selectExpr(s"${hv("event_id")} AS hvr", "event_id")
}
