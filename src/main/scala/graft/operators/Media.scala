package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2 m1): media payloads as
  * opaque `binary` columns with typed metadata, pushed through a
  * batched decode stage.
  *
  * The Spark-side machinery is real — typed Dataset, per-partition
  * batched iteration (the shape a vectorized image/audio decoder
  * needs: amortize model/codec init per batch, not per row), explicit
  * output schema. The byte-level decoder itself is a clearly-marked
  * DETERMINISTIC STUB (`FakeDecoder`): this container has no image
  * codecs, so it derives metadata arithmetically from the payload
  * bytes. Swapping in a real codec changes only `FakeDecoder.decode`.
  */
object Media {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, format: String, width: Int,
      height: Int, n_bytes: Long, checksum: Long)

  /** DETERMINISTIC STUB for the codec: real decode would parse the
    * container header / run the codec here, one batch at a time.
    */
  object FakeDecoder {
    val batchSize = 64

    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] =
      batch.map { r =>
        val b = r.payload
        val fmt = if (b.length >= 3) new String(b.take(3), "UTF-8") else "UNK"
        val w = 16 * ((if (b.length > 4) b(4) & 0x3f else 0) + 1)
        val h = 16 * ((if (b.length > 5) b(5) & 0x3f else 0) + 1)
        MediaMeta(r.doc_id, fmt, w, h, b.length.toLong,
          graft.functions.Fnv64.hashBytes(b))
      }
  }

  /** Synthesize binary payloads from `documents` (testdata has no
    * media table; payload bytes are deterministic from the text).
    */
  def payloads(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        encode(concat(
          when($"doc_id" % 3 === 0, "IMG").when($"doc_id" % 3 === 1, "AUD").otherwise("VID"),
          substring($"text", 1, 61)), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** m1: payload -> batched decode -> typed metadata. */
  def m1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir)
      .mapPartitions(_.grouped(FakeDecoder.batchSize).flatMap(FakeDecoder.decodeBatch))
      .toDF()
      .orderBy($"doc_id")
  }

  /** Full m1 oracle: the payloads are ASCII (prefix + document text),
    * so the stub decoder's byte arithmetic maps 1:1 onto DuckDB char
    * ops — `ord(substr(..))` IS the payload byte — and the checksum
    * reuses the shared FNV-1a HUGEINT mirror.
    */
  val m1Sql: String =
    s"""WITH p AS (SELECT doc_id,
      |  (CASE WHEN doc_id % 3 = 0 THEN 'IMG' WHEN doc_id % 3 = 1 THEN 'AUD' ELSE 'VID' END)
      |    || substr(text, 1, 61) AS s
      |  FROM documents)
      |SELECT doc_id,
      |  substr(s, 1, 3) AS format,
      |  CAST(16 * ((CASE WHEN length(s) > 4 THEN (ord(substr(s, 5, 1)) & 63) ELSE 0 END) + 1) AS INTEGER) AS width,
      |  CAST(16 * ((CASE WHEN length(s) > 5 THEN (ord(substr(s, 6, 1)) & 63) ELSE 0 END) + 1) AS INTEGER) AS height,
      |  CAST(length(s) AS BIGINT) AS n_bytes,
      |  ${graft.functions.Fnv64.duckSigned("s")} AS checksum
      |FROM p
      |ORDER BY doc_id""".stripMargin

  case class Resized(doc_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int, payload: Array[Byte])
  case class Frames(doc_id: Long, n_frames: Int, frame_idx: Int,
      frame_checksum: Long)

  /** m2 as a driver-contract query: the resize boxes without the
    * payload column (binary payloads don't compare across engines;
    * the box arithmetic is the operator under test).
    */
  def m2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    m2Resize(spark, dir).toDF()
      .select($"doc_id", $"width", $"height", $"out_width", $"out_height")
      .orderBy($"doc_id")
  }

  /** m2 oracle: byte-derived box sizes; `(w * scale).toInt` truncates
    * toward zero and w*scale >= 0, so floor() mirrors it exactly.
    */
  val m2Sql: String =
    """WITH p AS (SELECT doc_id,
      |  (CASE WHEN doc_id % 3 = 0 THEN 'IMG' WHEN doc_id % 3 = 1 THEN 'AUD' ELSE 'VID' END)
      |    || substr(text, 1, 61) AS s
      |  FROM documents),
      |m AS (SELECT doc_id,
      |  16 * ((CASE WHEN length(s) > 4 THEN (ord(substr(s, 5, 1)) & 63) ELSE 0 END) + 1) AS w,
      |  16 * ((CASE WHEN length(s) > 5 THEN (ord(substr(s, 6, 1)) & 63) ELSE 0 END) + 1) AS h
      |  FROM p),
      |r AS (SELECT doc_id, w, h, 256.0 / greatest(w, h) AS scale FROM m)
      |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(CASE WHEN scale >= 1.0 THEN w
      |            ELSE greatest(1, CAST(floor(w * scale) AS BIGINT)) END AS INTEGER) AS out_width,
      |  CAST(CASE WHEN scale >= 1.0 THEN h
      |            ELSE greatest(1, CAST(floor(h * scale) AS BIGINT)) END AS INTEGER) AS out_height
      |FROM r
      |ORDER BY doc_id""".stripMargin

  /** m3 as a driver-contract query. */
  def m3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    m3Frames(spark, dir).toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  /** m3's frame-explode CTE chain (ends with `f` = (doc_id, s,
    * n_frames, frame_idx)) and the signed per-frame FNV checksum
    * expression — shared by the m3 and m8 oracles so the frame
    * derivation cannot silently diverge between them.
    */
  private val m3FrameCtes: String =
    """p AS (SELECT doc_id,
      |  'VID' || substr(text, 1, 61) AS s
      |  FROM documents WHERE doc_id % 3 = 2),
      |n AS (SELECT doc_id, s,
      |        (ord(substr(s, length(s), 1)) & 31) + 8 AS n_frames
      |      FROM p),
      |f AS (SELECT doc_id, s, CAST(n_frames AS INTEGER) AS n_frames,
      |        CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx
      |      FROM n)""".stripMargin

  /** The per-frame checksum: FNV over the payload bytes plus ONE
    * extra fold step for the frame index byte — the shared HUGEINT
    * FNV state with one more (xor · prime · mod), re-signed.
    */
  private def frameChecksumExpr: String = {
    import graft.functions.Fnv64
    val hu = Fnv64.duckUnsigned("s")
    Fnv64.duckToSigned(
      s"((xor($hu, CAST(frame_idx AS HUGEINT)) * CAST('1099511628211' AS HUGEINT))" +
        s" % CAST('18446744073709551616' AS HUGEINT))")
  }

  val m3Sql: String =
    s"WITH $m3FrameCtes\n" +
      s"""SELECT doc_id, n_frames, frame_idx,
        |  $frameChecksumExpr AS frame_checksum
        |FROM f
        |ORDER BY doc_id, frame_idx""".stripMargin

  /** m2: resize stage — decode metadata, compute a target box
    * (max 256 on the long edge, aspect preserved), emit a derived
    * payload. The arithmetic and batching are real; the pixel work is
    * the stub (payload passthrough).
    */
  def m2Resize(spark: SparkSession, dir: String): Dataset[Resized] = {
    import spark.implicits._
    payloads(spark, dir)
      .mapPartitions(_.grouped(FakeDecoder.batchSize).flatMap { batch =>
        val metas = FakeDecoder.decodeBatch(batch)
        batch.zip(metas).map { case (row, m) =>
          val scale = 256.0 / math.max(m.width, m.height)
          val (ow, oh) =
            if (scale >= 1.0) (m.width, m.height)
            else (math.max(1, (m.width * scale).toInt),
              math.max(1, (m.height * scale).toInt))
          Resized(row.doc_id, m.width, m.height, ow, oh, row.payload)
        }
      })
  }

  /** m4: exact media dedup — the binary-column member of the dedup
    * family: payloads keyed by FNV-1a checksum (the codegen'd
    * Catalyst expression), per-format retention report with a
    * min-id survivor per duplicate group. Seeded duplicates (every
    * 10th payload re-appears under a shifted id, like d1's seeding)
    * make the dedup observable on the synthetic corpus. Scale: one
    * checksum map + one (format, checksum) shuffle — identical shape
    * to d1 at any corpus size; payload bytes never shuffle twice
    * (the checksum replaces them as the key).
    */
  def m4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = payloads(spark, dir).toDF()
    val all = base.unionByName(
      base.filter($"doc_id" % 10 === 0)
        .withColumn("doc_id", $"doc_id" + 100000L))
    val keyed = all
      .select($"doc_id", expr("decode(payload, 'UTF-8')").as("s"))
      .select($"doc_id", expr("substring(s, 1, 3)").as("format"),
        graft.functions.Fnv64.fnv64($"s").as("checksum"))
    keyed.groupBy($"format", $"checksum")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("survivor"))
      .groupBy($"format")
      .agg(count(lit(1)).as("n_distinct"),
        sum($"n").as("n_payloads"),
        sum(when($"n" > 1, 1).otherwise(0)).as("n_dup_groups"),
        sum($"n" - 1).as("n_removed"))
      .transform(graft.Tables.ordered(_, $"format"))
  }

  /** m4 oracle: the ASCII payload mirror (m1Sql's `s`) + the FNV
    * HUGEINT fold as the group key.
    */
  val m4Sql: String =
    s"""WITH p AS (SELECT doc_id,
      |  (CASE WHEN doc_id % 3 = 0 THEN 'IMG' WHEN doc_id % 3 = 1 THEN 'AUD' ELSE 'VID' END)
      |    || substr(text, 1, 61) AS s
      |  FROM documents),
      |a AS (SELECT doc_id, s FROM p
      |      UNION ALL
      |      SELECT doc_id + 100000, s FROM p WHERE doc_id % 10 = 0),
      |c AS (SELECT doc_id, substr(s, 1, 3) AS format,
      |        ${graft.functions.Fnv64.duckSigned("s")} AS checksum
      |      FROM a),
      |g AS (SELECT format, checksum, count(*) AS n, min(doc_id) AS survivor
      |      FROM c GROUP BY 1, 2)
      |SELECT format, count(*) AS n_distinct,
      |  CAST(sum(n) AS BIGINT) AS n_payloads,
      |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
      |  CAST(sum(n - 1) AS BIGINT) AS n_removed
      |FROM g
      |GROUP BY format
      |ORDER BY format""".stripMargin

  case class AudioFrame(doc_id: Long, n_frames: Int, frame_idx: Int, energy: Long)

  /** m5: audio frame energy — every AUD payload is treated as 8-bit
    * PCM (the decode stub: sample = byte − 128), cut into 16-sample
    * windows at stride 8, each emitting its integer energy (sum of
    * squared samples — exact, no floats anywhere). The overlapping-
    * window fan-out and batched per-partition decode are the real
    * audio-featurization plumbing (VAD, loudness gating, silence
    * trimming all start exactly here); only the codec is stubbed.
    */
  /** The m5 frame loop, shared with m9's fingerprint corpus: 16-sample
    * windows at stride 8 over the 8-bit-PCM decode stub, exact
    * integer energies.
    */
  private def audioFrames(rows: Dataset[MediaRow]): Dataset[AudioFrame] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.grouped(FakeDecoder.batchSize).flatMap { batch =>
      batch.flatMap { row =>
        val fmt = new String(row.payload.take(3), "UTF-8")
        val len = row.payload.length
        if (fmt != "AUD" || len < 16) Iterator.empty
        else {
          val samples = row.payload.map(b => ((b & 0xff) - 128).toLong)
          val nFrames = (len - 16) / 8 + 1
          (0 until nFrames).map { f =>
            var e = 0L
            var i = 0
            while (i < 16) { val s = samples(f * 8 + i); e += s * s; i += 1 }
            AudioFrame(row.doc_id, nFrames, f, e)
          }
        }
      }
    })
  }

  def m5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioFrames(payloads(spark, dir)).toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  /** m5's oracle CTE chain through `e`(doc_id, n_frames, frame_idx,
    * energy) — shared by m5Sql and m12Sql (the VAD composes islands
    * on top of the same frames).
    */
  private val m5Chain: String =
    """p AS (SELECT doc_id, 'AUD' || substr(text, 1, 61) AS s
      |  FROM documents WHERE doc_id % 3 = 1),
      |n AS (SELECT doc_id, s,
      |        CAST((length(s) - 16) // 8 + 1 AS INTEGER) AS n_frames
      |      FROM p WHERE length(s) >= 16),
      |f AS (SELECT doc_id, s, n_frames,
      |        CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx
      |      FROM n),
      |e AS (SELECT doc_id, n_frames, frame_idx,
      |        CAST(list_sum(list_transform(
      |          list_transform(range(1, 17),
      |            i -> CAST(ord(substr(s, frame_idx * 8 + i, 1)) AS BIGINT) - 128),
      |          x -> x * x)) AS BIGINT) AS energy
      |      FROM f)""".stripMargin

  /** m5 oracle: ASCII payload bytes mirror to ord(substr(..)) − 128;
    * the window energies are exact BIGINT sums in both engines.
    */
  val m5Sql: String =
    s"""WITH $m5Chain
      |SELECT doc_id, n_frames, frame_idx, energy FROM e
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------- m12: voice-activity detection (speech segments) ----------

  /** Energy gate and minimum run length for a speech segment: the
    * corpus' median frame energy (so the gate provably swings both
    * ways) and the standard ≥ 3-frame hangover.
    */
  private val m12Thresh = 33000L
  private val m12MinFrames = 3L

  /** m12: VOICE-ACTIVITY DETECTION — the speech-segment extraction
    * every ASR-training-data pipeline runs over raw audio (silence
    * trimming / utterance splitting; m5's docstring promised VAD
    * starts at its frames, and this is that operator): frames with
    * energy ≥ [[m12Thresh]] group into maximal CONSECUTIVE runs
    * (gaps-and-islands — frame_idx minus the per-doc dense rank, the
    * w21/e11 idiom), runs shorter than [[m12MinFrames]] are dropped
    * (the hangover rule), and each surviving segment reports its
    * frame span, exact BIGINT energy mass and peak. Everything is
    * integer — bitwise cross-engine by m5's argument.
    *
    * Scale shape: m5's batched decode fan-out, then ONE doc-key
    * shuffle shared by the islands window and the segment aggregate
    * (the m8 scene-split contract) — per-doc frame counts bound the
    * window, never a global sort.
    */
  def m12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"frame_idx")
    audioFrames(payloads(spark, dir)).toDF()
      .filter($"energy" >= m12Thresh)
      .withColumn("grp", $"frame_idx" - row_number().over(w))
      .groupBy($"doc_id", $"grp")
      .agg(min($"frame_idx").as("seg_start"), max($"frame_idx").as("seg_end"),
        count(lit(1)).as("n_frames"), sum($"energy").as("energy_total"),
        max($"energy").as("peak_energy"))
      .filter($"n_frames" >= m12MinFrames)
      .select($"doc_id", $"seg_start", $"seg_end", $"n_frames",
        $"energy_total", $"peak_energy")
      .transform(graft.Tables.ordered(_, $"doc_id", $"seg_start"))
  }

  /** m12 oracle: m5's frame chain + the identical islands grouping. */
  val m12Sql: String =
    s"""WITH $m5Chain,
      |h AS (SELECT doc_id, frame_idx, energy,
      |        frame_idx - row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS grp
      |      FROM e WHERE energy >= $m12Thresh),
      |seg AS (SELECT doc_id, grp,
      |          min(frame_idx) AS seg_start, max(frame_idx) AS seg_end,
      |          CAST(count(*) AS BIGINT) AS n_frames,
      |          CAST(sum(energy) AS BIGINT) AS energy_total,
      |          CAST(max(energy) AS BIGINT) AS peak_energy
      |        FROM h GROUP BY 1, 2)
      |SELECT doc_id, seg_start, seg_end, n_frames, energy_total, peak_energy
      |FROM seg WHERE n_frames >= $m12MinFrames
      |ORDER BY doc_id, seg_start""".stripMargin

  // ---------- m6: perceptual-hash near-duplicate media ----------

  /** Integer DCT-II basis, scaled ×64: W(k)(n) = round(64·cos(π(2n+1)k/16)).
    * Integerizing the basis (instead of floating cosines) makes every
    * DCT coefficient an EXACT BIGINT linear form of the pixels, so the
    * DuckDB oracle reproduces the hash bitwise — |coef| ≤ 127·(8·64)²
    * ≈ 2^25, nowhere near overflow. The same constants feed both
    * engines (the oracle SQL below is generated from this table).
    */
  private[graft] val dctW: Array[Array[Long]] =
    Array.tabulate(8, 8)((k, n) =>
      math.round(64.0 * math.cos(math.Pi * (2 * n + 1) * k / 16.0)))

  /** ONE PNG encode convention for the whole m-family: 64 masked
    * payload chars as an 8×8 grayscale TYPE_INT_RGB image, written
    * to genuine PNG bytes with javax.imageio. Shared by [[m7Png]]
    * (the codec-roundtrip query) and [[pngLuminance]] (m6/s15's hash
    * input) so the two paths cannot drift apart.
    */
  private[graft] def encodePng8x8(s: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      img.setRGB(i % 8, i / 8, (s.charAt(i).toInt & 127) * 0x010101)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** REAL codec roundtrip for the hash input (m7's path): encode via
    * [[encodePng8x8]], DECODE back with ImageIO inside the executor.
    * PNG is lossless, so the decoded luminance equals `char & 127` —
    * which is exactly what lets the oracle verify a real-codec
    * pipeline arithmetically.
    */
  private[graft] def pngLuminance(s: String): Array[Int] = {
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encodePng8x8(s)))
    Array.tabulate(64)(i => dec.getRGB(i % 8, i / 8) & 0xff)
  }

  /** pHash proper: 8×8 integer DCT-II of the luminance (row pass then
    * column pass over [[dctW]]), one bit per AC coefficient's SIGN —
    * 63 bits (DC is excluded, as in standard pHash: it carries mean
    * brightness, not structure). Bit u*8+v−1 is set iff coef(u,v) > 0.
    * A small pixel perturbation moves each coefficient by at most
    * ±W(u)(x)·W(v)(y) ≤ 4096 ≪ the typical coefficient magnitude, so
    * near-identical images land within small Hamming distance — the
    * locality property the blocking needs, now from a real transform.
    */
  private[graft] def dctPhash(px: Array[Int]): Long = {
    // r(u)(y) = Σ_x W(u)(x)·px(y·8+x): the horizontal pass
    val r = Array.ofDim[Long](8, 8)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) { acc += dctW(u)(x) * px(y * 8 + x); x += 1 }
        r(u)(y) = acc
        y += 1
      }
      u += 1
    }
    var ph = 0L
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var c = 0L
          var y = 0
          while (y < 8) { c += dctW(v)(y) * r(u)(y); y += 1 }
          if (c > 0) ph |= 1L << (u * 8 + v - 1)
        }
        v += 1
      }
      u += 1
    }
    ph
  }

  /** Pigeonhole blocking scheme for the hamming ≤ 4 verify filter:
    * k+1 = 5 blocks (13,13,13,13,12 bits — offsets 0/13/26/39/52), so
    * any pair within hamming 4 leaves ≥ 1 block untouched and is
    * guaranteed to meet in that block's bucket. 4 blocks of 16 bits
    * would only guarantee hamming ≤ 3 (4 flips can hit all 4 blocks).
    * The guarantee holds for ANY 64-bit hash — it is pure pigeonhole
    * on bit positions — so swapping the stub for a real DCT pHash
    * changes no blocking machinery (BlockingSpec pins this).
    */
  val m6Blocks: Seq[(Int, Int)] = Seq((0, 13), (13, 13), (26, 13), (39, 13), (52, 12))

  /** m6: perceptual-hash near-duplicate detection over media payloads
    * — the image-dedup pass of a multimodal pipeline, now END-TO-END
    * REAL for the PNG path: each payload's 64 masked bytes are encoded
    * to genuine PNG, DECODED back with the JDK's ImageIO inside the
    * executor ([[pngLuminance]] — m7's proven codec path), and hashed
    * with a real 8×8 integer DCT pHash ([[dctPhash]]): one sign bit
    * per AC coefficient. Everything downstream is the scale machinery
    * shared in shape with d3: k+1-block pigeonhole blocking (hamming
    * ≤ 4 ⇒ ≥ 1 of 5 blocks exactly equal — see [[m6Blocks]], pure
    * pigeonhole, hash-agnostic), bucket equality join, bit_count(xor)
    * verification — never an all-pairs pass. Near-dups are seeded by
    * flipping one low bit of one payload byte on every 6th payload
    * (a ±1 luminance change in one pixel — tiny DCT movement, so the
    * pair stays within the hamming ≤ 4 verify bound).
    */
  def m6(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        "concat(CASE WHEN doc_id % 3 = 0 THEN 'IMG' WHEN doc_id % 3 = 1 THEN 'AUD' ELSE 'VID' END, substring(text, 1, 61)) AS s")
    val variants = base.filter($"doc_id" % 6 === 0)
      .selectExpr("doc_id + 30000 AS doc_id",
        "CASE WHEN length(s) >= 8 THEN concat(substring(s, 1, 7), chr(ascii(substring(s, 8, 1)) ^ 1), substring(s, 9, length(s))) ELSE s END AS s")
    val hashed = base.unionByName(variants)
      .selectExpr("doc_id", "rpad(s, 64, ' ') AS s")
      .as[(Long, String)]
      // NARROW per-row codec + transform work (PNG roundtrip + DCT):
      // embarrassingly parallel, no shuffle — the 100 TB decode shape
      .mapPartitions(_.map { case (id, s) => (id, dctPhash(pngLuminance(s))) })
      .toDF("doc_id", "ph")
      // consumed by the bucket-count branch and both sides of the
      // candidate self-join — uncached, the codec roundtrip + DCT
      // would run up to 4×
      .cache()
    val blockArr = m6Blocks.map { case (off, w) =>
      s"shiftright(ph, $off) & ${(1 << w) - 1}"
    }.mkString("array(", ", ", ")")
    val chunks = hashed.selectExpr("doc_id", "ph",
      s"posexplode($blockArr) AS (chunk_idx, chunk)")
    // Occupancy-relative skew guard on the 12-13-bit block buckets
    // (Dedup.occupancyCap, see d3): a fixed cap would silently zero
    // the block's recall once the corpus outgrows cap·2^w; scaling
    // with the uniform mean drops only true hot buckets. Recall
    // stays guaranteed for pairs in uncapped buckets, and the oracle
    // mirrors the cap arithmetic.
    val nDocs = hashed.count()
    val capExpr = m6Blocks.zipWithIndex.map { case ((_, w), c) =>
      s"WHEN $c THEN ${Dedup.occupancyCap(nDocs, w)}"
    }.mkString("CASE chunk_idx ", " ", " END")
    val bounded = chunks
      .join(chunks.groupBy($"chunk_idx", $"chunk").agg(count(lit(1)).as("bsz")),
        Seq("chunk_idx", "chunk"))
      .filter($"bsz" <= expr(capExpr))
      .select($"doc_id", $"ph", $"chunk_idx", $"chunk")
    bounded.as("a").join(bounded.as("b"),
        $"a.chunk_idx" === $"b.chunk_idx" && $"a.chunk" === $"b.chunk" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        expr("bit_count(a.ph ^ b.ph)").as("hamming"))
      .distinct()
      .filter($"hamming" <= 4)
      .transform(graft.Tables.ordered(_, $"id_a", $"id_b"))
  }

  /** m6 oracle: ASCII payload mirror (ord == byte — what the lossless
    * PNG roundtrip preserves, m7's argument), the SAME integer DCT as
    * a factored two-pass linear form (px → row pass r_u_y → sign
    * bits), div/mod chunk extraction and bit_count(xor) Hamming — all
    * BIGINT-exact. The weight literals are generated from [[dctW]],
    * so both engines share one basis by construction.
    */
  /** The corpus + integer-DCT hash CTE chain of [[m6Sql]] (ends with
    * `hashed` = (doc_id, ph)), shared with the streaming media-dedup
    * oracle (s15).
    */
  val m6HashCtes: String = {
    // px: one column per pixel; rows: the horizontal DCT pass
    // (r_u_y = Σ_x W(u)(x)·p(y·8+x)); ph: vertical pass + sign bits
    val pxCols = (0 until 64)
      .map(i => s"(ord(substr(s, ${i + 1}, 1)) & 127) AS p$i")
      .mkString(", ")
    val rowCols = (for (u <- 0 until 8; y <- 0 until 8) yield {
      val terms = (0 until 8).map(x => s"(${dctW(u)(x)})*p${y * 8 + x}").mkString("+")
      s"($terms) AS r${u}_$y"
    }).mkString(", ")
    val phExpr = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0) yield {
      val c = (0 until 8).map(y => s"(${dctW(v)(y)})*r${u}_$y").mkString("+")
      s"(CASE WHEN ($c) > 0 THEN CAST(${1L << (u * 8 + v - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }).mkString(" + ")
    s"""base AS (SELECT doc_id,
      |  (CASE WHEN doc_id % 3 = 0 THEN 'IMG' WHEN doc_id % 3 = 1 THEN 'AUD' ELSE 'VID' END)
      |    || substr(text, 1, 61) AS s
      |  FROM documents),
      |corpus AS (
      |  SELECT doc_id, rpad(s, 64, ' ') AS s FROM (
      |  SELECT doc_id, s FROM base
      |  UNION ALL
      |  SELECT doc_id + 30000,
      |    CASE WHEN length(s) >= 8
      |         THEN substr(s, 1, 7) || chr(xor(ord(substr(s, 8, 1)), 1)) || substr(s, 9)
      |         ELSE s END
      |  FROM base WHERE doc_id % 6 = 0)),
      |px AS (SELECT doc_id, $pxCols FROM corpus),
      |rows_ AS (SELECT doc_id, $rowCols FROM px),
      |hashed AS (SELECT doc_id, $phExpr AS ph FROM rows_)""".stripMargin
  }

  val m6Sql: String = {
    val chunkSelects = m6Blocks.zipWithIndex.map { case ((off, w), c) =>
      s"SELECT doc_id, ph, $c AS chunk_idx, (ph // ${1L << off}) % ${1L << w} AS chunk FROM hashed"
    }.mkString("\n  UNION ALL ")
    // occupancy-relative cap (Dedup.occupancyCap) in SQL — n from a
    // count CTE, mirroring the Spark side's hashed.count()
    val capCase = m6Blocks.zipWithIndex.map { case ((_, w), c) =>
      val b = 1L << w
      s"WHEN $c THEN greatest(100, 8 * ((n + ${b - 1}) // $b))"
    }.mkString("CASE chunk_idx ", " ", " END")
    // concatenated, NOT interpolated under stripMargin: the embedded
    // chain's "||" concat lines would lose a pipe to a second strip
    s"WITH $m6HashCtes,\n" + s"""chunks AS ($chunkSelects),
      |bcnt AS (SELECT chunk_idx, chunk, count(*) AS bsz FROM chunks GROUP BY 1, 2),
      |ncnt AS (SELECT count(*) AS n FROM hashed),
      |bounded AS (SELECT doc_id, ph, chunk_idx, chunk FROM chunks
      |            JOIN bcnt USING (chunk_idx, chunk), ncnt
      |            WHERE bsz <= $capCase),
      |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |            CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
      |          FROM bounded a JOIN bounded b
      |            ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 4
      |ORDER BY id_a, id_b""".stripMargin
  }

  /** m3: frame sampling — every video payload yields ceil(n/stride)
    * frame records (stride 4 over a fake frame count derived from the
    * payload), each with a per-frame checksum. The explode shape and
    * per-frame records are real; frame extraction is the stub.
    */
  def m3Frames(spark: SparkSession, dir: String): Dataset[Frames] = {
    import spark.implicits._
    payloads(spark, dir)
      .mapPartitions(_.grouped(FakeDecoder.batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val fmt = new String(row.payload.take(3), "UTF-8")
          if (fmt != "VID") Iterator.empty
          else {
            val nFrames = (row.payload.last & 0x1f) + 8
            (0 until nFrames by 4).map { i =>
              Frames(row.doc_id, nFrames, i,
                graft.functions.Fnv64.hashBytes(row.payload :+ i.toByte))
            }
          }
        }
      })
  }

  // ---------- m7: REAL codec roundtrip (ImageIO PNG encode → decode) ----------

  case class PngRow(doc_id: Long, png: Array[Byte])
  case class PngFeat(doc_id: Long, width: Int, height: Int,
      q00: Long, q01: Long, q10: Long, q11: Long)

  /** Encode stage of [[m7]]: each IMG payload's 64 masked bytes
    * become an 8×8 grayscale image written to REAL PNG bytes with
    * javax.imageio — a binary media column (m1's schema) whose
    * content is genuine compressed image data, produced distributed
    * in the executors.
    */
  private[graft] def m7Png(spark: SparkSession, dir: String): Dataset[PngRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 0)
      .selectExpr("doc_id",
        "rpad(concat('IMG', substring(text, 1, 61)), 64, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) => PngRow(id, encodePng8x8(s)) })
  }

  /** m7: the m-family stage with a REAL codec — javax.imageio ships
    * with the JDK, so the PNG path needs no stub. Stage 1 ([[m7Png]])
    * encodes each payload to real PNG bytes; stage 2 DECODES them
    * with ImageIO.read and extracts per-quadrant luminance sums. PNG
    * is lossless, so decoded pixels equal encoded ones bitwise, and
    * the DuckDB oracle verifies the whole
    * encode → compress → decode → feature pipeline arithmetically
    * from the payload characters — a bitwise correctness gate OVER a
    * real codec roundtrip. This narrows the m-family's stub boundary
    * to external formats only (JPEG/video of arbitrary crawl data):
    * running codecs inside executors, batched, with binary columns
    * between stages, is demonstrated for real. Zero shuffles — two
    * narrow stages.
    */
  def m7(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    m7Png(spark, dir).mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.png))
      val w = img.getWidth
      val h = img.getHeight
      val q = Array.ofDim[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          q((y / 4) * 2 + (x / 4)) += (img.getRGB(x, y) & 0xff).toLong
          x += 1
        }
        y += 1
      }
      PngFeat(r.doc_id, w, h, q(0), q(1), q(2), q(3))
    }).toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  /** m7 oracle: the quadrant sums straight from the payload
    * characters (`ord & 127` — the exact pixel values the PNG
    * roundtrip preserves losslessly).
    */
  val m7Sql: String = {
    def qsum(q: Int): String = {
      val rows = if (q < 2) 0 until 4 else 4 until 8
      val cols = if (q % 2 == 0) 0 until 4 else 4 until 8
      rows.flatMap(r => cols.map { c =>
        val pos = r * 8 + c + 1
        s"(ord(substr(s, $pos, 1)) & 127)"
      }).mkString("(", " + ", ")")
    }
    s"""WITH p AS (SELECT doc_id, rpad('IMG' || substr(text, 1, 61), 64, ' ') AS s
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id, 8 AS width, 8 AS height,
      |  CAST(${qsum(0)} AS BIGINT) AS q00,
      |  CAST(${qsum(1)} AS BIGINT) AS q01,
      |  CAST(${qsum(2)} AS BIGINT) AS q10,
      |  CAST(${qsum(3)} AS BIGINT) AS q11
      |FROM p
      |ORDER BY doc_id""".stripMargin
  }

  // ---------- m10: REAL lossy codec (ImageIO JPEG encode → decode) ----------

  case class JpegFeat(doc_id: Long, width: Int, height: Int,
      q00: Long, q01: Long, q10: Long, q11: Long,
      within_quadrant_tol: Boolean, within_pixel_tol: Boolean)

  /** Fixed encode quality for the whole m10 path — golden spec values
    * are pinned at this setting.
    */
  private[graft] val jpegQuality = 0.9f

  /** Documented decode tolerances at [[jpegQuality]]: measured worst
    * case over random text-derived payloads is 16 on both axes
    * (8×8 single-component JPEG, one DCT block); the gate bounds at
    * 2× resp. 4× that. A broken decode cannot hide inside them — a
    * zeroed plane misses the ~1900-per-quadrant sums by 30×.
    */
  private[graft] val jpegPixelTol = 32L
  private[graft] val jpegQuadrantTol = 64L

  /** Encode 64 masked payload chars as a GRAYSCALE (single-component)
    * JPEG at [[jpegQuality]] — TYPE_BYTE_GRAY keeps the codec on the
    * luminance plane alone (no chroma subsampling noise), so the
    * decode error is pure DCT quantization, the thing the tolerance
    * bounds. The m-family's second REAL codec: PNG (m7) proves the
    * lossless roundtrip bitwise; JPEG is the dominant crawl format,
    * where only a bounded-error contract is possible.
    */
  private[graft] def encodeJpeg8x8(s: String): Array[Byte] =
    encodeJpegGray8x8(Array.tabulate(64)(i => s.charAt(i).toInt & 127))

  /** General 8×8 grayscale JPEG encode from explicit pixel values
    * (0-255) at [[jpegQuality]] — [[encodeJpeg8x8]]'s body factored
    * so m13's video frames share the exact codec path m10 gated.
    */
  private[graft] def encodeJpegGray8x8(px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < 64) {
      img.getRaster.setSample(i % 8, i / 8, 0, px(i))
      i += 1
    }
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(jpegQuality)
    val baos = new java.io.ByteArrayOutputStream()
    val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    w.setOutput(mos)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); mos.close()
    baos.toByteArray
  }

  /** Decoded 64-pixel luminance of a JPEG byte stream (executor-side,
    * like [[pngLuminance]]).
    */
  private[graft] def jpegLuminance(bytes: Array[Byte]): Array[Int] = {
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    Array.tabulate(64)(i => dec.getRaster.getSample(i % 8, i / 8, 0))
  }

  /** m10: LOSSY codec roundtrip — m7's pipeline with JPEG in place of
    * PNG, which changes what the correctness gate CAN say: lossiness
    * breaks the bitwise-oracle trick, so the contract becomes a
    * BOUNDED-ERROR one, exactly like real crawl image processing.
    * Each payload encodes to genuine JPEG bytes ([[encodeJpeg8x8]]),
    * decodes back with ImageIO in the executor, and the row carries
    * (a) the SOURCE quadrant luminance sums — lossless-side features
    * the DuckDB oracle reproduces arithmetically from the payload
    * chars, proving the feature derivation; and (b) two booleans
    * computed from the REAL decoded plane: every quadrant sum within
    * [[jpegQuadrantTol]] of its source, every pixel within
    * [[jpegPixelTol]] — the oracle asserts both TRUE, so a decode
    * that drifts outside JPEG's documented bound fails the hash
    * gate. Golden decoded values at the fixed quality are pinned in
    * the spec (regression against codec-parameter drift); the
    * m-family stub boundary narrows to video codecs only.
    *
    * Zero shuffles — one narrow mapPartitions stage; codec work is
    * embarrassingly parallel and batches per partition, the m7
    * scale shape unchanged.
    */
  def m10(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 1)
      .selectExpr("doc_id",
        "rpad(concat('JPG', substring(text, 1, 61)), 64, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) =>
        val src = Array.tabulate(64)(i => s.charAt(i).toInt & 127)
        val dec = jpegLuminance(encodeJpeg8x8(s))
        val qs = Array.ofDim[Long](4)
        val qd = Array.ofDim[Long](4)
        var pixOk = true
        var i = 0
        while (i < 64) {
          val q = (i / 8 / 4) * 2 + (i % 8 / 4)
          qs(q) += src(i)
          qd(q) += dec(i)
          if (math.abs(dec(i) - src(i)) > jpegPixelTol) pixOk = false
          i += 1
        }
        val quadOk = (0 until 4).forall(q => math.abs(qd(q) - qs(q)) <= jpegQuadrantTol)
        JpegFeat(id, 8, 8, qs(0), qs(1), qs(2), qs(3), quadOk, pixOk)
      }).toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  /** m10 oracle: source quadrant sums from the payload characters
    * (m7's arithmetic) + the bounded-error contract — both booleans
    * must be TRUE for every row.
    */
  val m10Sql: String = {
    def qsum(q: Int): String = {
      val rows = if (q < 2) 0 until 4 else 4 until 8
      val cols = if (q % 2 == 0) 0 until 4 else 4 until 8
      rows.flatMap(r => cols.map { c =>
        val pos = r * 8 + c + 1
        s"(ord(substr(s, $pos, 1)) & 127)"
      }).mkString("(", " + ", ")")
    }
    s"""WITH p AS (SELECT doc_id, rpad('JPG' || substr(text, 1, 61), 64, ' ') AS s
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT doc_id, 8 AS width, 8 AS height,
      |  CAST(${qsum(0)} AS BIGINT) AS q00,
      |  CAST(${qsum(1)} AS BIGINT) AS q01,
      |  CAST(${qsum(2)} AS BIGINT) AS q10,
      |  CAST(${qsum(3)} AS BIGINT) AS q11,
      |  TRUE AS within_quadrant_tol,
      |  TRUE AS within_pixel_tol
      |FROM p
      |ORDER BY doc_id""".stripMargin
  }

  // ---------- m11: ViT-style patch extraction ----------

  case class PatchRow(doc_id: Long, py: Int, px: Int,
      p_sum: Long, p_min: Long, p_max: Long)

  /** 16x16 grayscale PNG from 256 masked payload chars — m7's
    * encoder at the resolution patching needs (4x4 patch grid).
    */
  private[graft] def encodePng16x16(s: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 256) {
      img.setRGB(i % 16, i / 16, (s.charAt(i).toInt & 127) * 0x010101)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** m11: PATCH EXTRACTION — the ViT tokenization step (Dosovitskiy
    * et al. 2021, "An Image is Worth 16x16 Words"): split each image
    * into a fixed grid of non-overlapping patches and emit one row
    * per patch, the long-form grain a vision-training pipeline
    * feeds to embedding/masking/packing stages (m-family's analog
    * of t5's text chunking). Runs over a REAL codec roundtrip
    * (m7's proven path at 16x16): encode the payload to genuine
    * PNG bytes, DECODE with ImageIO in the executor, then window
    * the decoded plane into 4x4-pixel patches (a 4x4 grid) with
    * integer stats per patch (sum / min / max luminance) — lossless
    * PNG keeps the whole pipeline bitwise, so the oracle verifies
    * codec + patch geometry + stats arithmetically from the payload
    * characters.
    *
    * Scale shape: ONE narrow mapPartitions stage (codec work is
    * embarrassingly parallel; the 16-patch fan-out is row-local),
    * zero shuffles — the output grain is (doc, py, px), ready for a
    * downstream (doc, patch)-keyed exchange only if a later stage
    * needs one. Completes the m-family residue classes: m7 takes
    * doc_id % 3 = 0, m10 = 1, m11 = 2.
    */
  def m11(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 2)
      .selectExpr("doc_id",
        "rpad(concat('PAT', substring(text, 1, 253)), 256, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, s) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(encodePng16x16(s)))
        (0 until 4).iterator.flatMap { py =>
          (0 until 4).iterator.map { px =>
            var sum = 0L
            var mn = Long.MaxValue
            var mx = Long.MinValue
            var dy = 0
            while (dy < 4) {
              var dx = 0
              while (dx < 4) {
                val v = (img.getRGB(px * 4 + dx, py * 4 + dy) & 0xff).toLong
                sum += v
                if (v < mn) mn = v
                if (v > mx) mx = v
                dx += 1
              }
              dy += 1
            }
            PatchRow(id, py, px, sum, mn, mx)
          }
        }
      }).toDF()
      .transform(graft.Tables.ordered(_, $"doc_id", $"py", $"px"))
  }

  /** m11 oracle: per-patch stats straight from the payload chars
    * (`ord & 127` — the pixels the PNG roundtrip preserves), the
    * patch grid generated by a 16-element index comprehension.
    */
  val m11Sql: String =
    """WITH p AS (SELECT doc_id, rpad('PAT' || substr(text, 1, 253), 256, ' ') AS s
      |  FROM documents WHERE doc_id % 3 = 2),
      |g AS (SELECT doc_id, pi,
      |        list_transform(range(0, 16), j ->
      |          ord(substr(s,
      |            CAST(((pi // 4) * 4 + (j // 4)) * 16 + (pi % 4) * 4 + (j % 4) + 1 AS INTEGER),
      |            1)) & 127) AS vals
      |      FROM p, (SELECT unnest(range(0, 16)) AS pi))
      |SELECT doc_id, CAST(pi // 4 AS INTEGER) AS py, CAST(pi % 4 AS INTEGER) AS px,
      |  CAST(list_sum(vals) AS BIGINT) AS p_sum,
      |  CAST(list_min(vals) AS BIGINT) AS p_min,
      |  CAST(list_max(vals) AS BIGINT) AS p_max
      |FROM g ORDER BY doc_id, py, px""".stripMargin

  // ---------- m8: video scene segmentation over sampled frames ----------

  /** m8: scene segmentation — the video-curation pass that cuts each
    * video into shots before per-scene captioning/sampling (training
    * pipelines dedupe and caption SCENES, not whole videos). Composes
    * [[m3Frames]]'s sampled frames with the gaps-and-islands shape
    * (w21/q24): a per-frame signature (here a bounded projection of
    * the frame checksum — the decode-side stand-in for a frame
    * histogram, consistent with the m-family's stub boundary), a
    * frame-to-frame delta via lag, a cut wherever the delta exceeds
    * the threshold, and a running cut-count as the scene id; one
    * aggregate emits (video, scene, start_frame, length).
    *
    * Scale: one shuffle on doc_id shared by the lag/scene windows and
    * the aggregate; per-video frame counts bound every window. Exact
    * integer arithmetic end-to-end — bitwise oracle.
    */
  def m8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"frame_idx")
    m3Frames(spark, dir).toDF()
      .withColumn("sig", pmod($"frame_checksum", lit(997L)))
      .withColumn("delta", abs($"sig" - lag($"sig", 1).over(w)))
      .withColumn("cut",
        when($"delta".isNull, 0).when($"delta" > 500, 1).otherwise(0))
      .withColumn("scene_id",
        sum($"cut").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"scene_id")
      .agg(min($"frame_idx").as("start_frame"),
        count(lit(1)).as("n_scene_frames"))
      .transform(graft.Tables.ordered(_, $"doc_id", $"scene_id"))
  }

  /** m8 oracle: m3's SHARED frame CTEs + checksum expression
    * ([[m3FrameCtes]]/[[frameChecksumExpr]] — one source of truth
    * for the frame derivation) + the identical signed-mod signature,
    * lag delta, cut flag and running-sum scene id.
    */
  val m8Sql: String =
    s"WITH $m3FrameCtes,\n" +
      s"""c AS (SELECT doc_id, frame_idx,
      |        $frameChecksumExpr AS fc
      |      FROM f),
      |sg AS (SELECT doc_id, frame_idx, ((fc % 997) + 997) % 997 AS sig FROM c),
      |d AS (SELECT doc_id, frame_idx, sig,
      |        abs(sig - lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS delta
      |      FROM sg),
      |cuts AS (SELECT doc_id, frame_idx,
      |           CASE WHEN delta IS NULL THEN 0 WHEN delta > 500 THEN 1 ELSE 0 END AS cut
      |         FROM d),
      |sc AS (SELECT doc_id, frame_idx,
      |         CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT) AS scene_id
      |       FROM cuts)
      |SELECT doc_id, scene_id, CAST(min(frame_idx) AS INTEGER) AS start_frame,
      |  count(*) AS n_scene_frames
      |FROM sc GROUP BY doc_id, scene_id
      |ORDER BY doc_id, scene_id""".stripMargin

  // ---------- m9: audio landmark fingerprinting ----------

  /** Landmark-bucket cap: a fingerprint shared by more audios than
    * this is a stop-landmark (non-discriminative) and is dropped
    * before pairing — the d2 bucketCap discipline keeping the
    * fp self-join from going quadratic on common landmarks.
    */
  private val m9FpCap = 16

  /** m9: AUDIO LANDMARK FINGERPRINTING (the Shazam scheme — Wang
    * 2003, ISMIR): energy peaks per audio become anchor→next-peak
    * landmark pairs, hashed as (frame gap, coarse anchor energy,
    * coarse target energy); audios sharing landmarks are duplicate/
    * containment candidates. The key property is SHIFT INVARIANCE:
    * a stream-offset copy keeps every interior (gap, energies)
    * landmark even though absolute frame indices moved — the seeded
    * corpus proves it (every 30th AUD doc gets a copy with 8 extra
    * leading bytes = exactly one stride, so its frames land one
    * index later with identical energies).
    *
    * Scale shape: frames and peaks ride ONE doc_id shuffle (lag/lead
    * + next-peak windows share the partitioning); fingerprints are
    * 8-byte integers; the match is an equality self-join on fp with
    * the [[m9FpCap]] stop-landmark cap — never all-pairs audio
    * comparison, and payload bytes never leave the frame stage.
    */
  def m9(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shifted = Tables.documents(spark, dir)
      .filter($"doc_id" % 30 === 25)
      .select(($"doc_id" + 200000L).as("doc_id"),
        encode(concat(lit("AUDXXXXXXXX"), substring($"text", 1, 61)), "UTF-8")
          .as("payload"))
      .as[MediaRow]
    val frames = audioFrames(payloads(spark, dir).unionByName(shifted)).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"frame_idx")
    val peaks = frames
      .withColumn("pe", lag($"energy", 1).over(w))
      .withColumn("ne", lead($"energy", 1).over(w))
      .filter($"pe".isNotNull && $"ne".isNotNull &&
        $"energy" > $"pe" && $"energy" > $"ne")
      .select($"doc_id", $"frame_idx", $"energy")
    val lm = peaks
      .withColumn("nf", lead($"frame_idx", 1).over(w))
      .withColumn("nrg2", lead($"energy", 1).over(w))
      .filter($"nf".isNotNull)
      .selectExpr("doc_id",
        "(nf - frame_idx) * 1048576 + (energy div 1024) * 1024 + (nrg2 div 1024) AS fp")
      .distinct()
    val ok = lm.groupBy($"fp").agg(count(lit(1)).as("n_docs"))
      .filter($"n_docs" <= m9FpCap)
    val capped = lm.join(ok.select($"fp"), Seq("fp"))
    capped.as("a").join(capped.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .transform(graft.Tables.ordered(_, $"id_a", $"id_b"))
  }

  /** m9 oracle: m5's byte-energy CTEs over the extended corpus +
    * identical peak/landmark windows and capped fp self-join; all
    * integer.
    */
  val m9Sql: String =
    s"""WITH p AS (SELECT doc_id, 'AUD' || substr(text, 1, 61) AS s
      |  FROM documents WHERE doc_id % 3 = 1
      |  UNION ALL
      |  SELECT doc_id + 200000, 'AUDXXXXXXXX' || substr(text, 1, 61)
      |  FROM documents WHERE doc_id % 30 = 25),
      |n AS (SELECT doc_id, s,
      |        CAST((length(s) - 16) // 8 + 1 AS INTEGER) AS n_frames
      |      FROM p WHERE length(s) >= 16),
      |f AS (SELECT doc_id, s, n_frames,
      |        CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx
      |      FROM n),
      |e AS (SELECT doc_id, frame_idx,
      |        CAST(list_sum(list_transform(
      |          list_transform(range(1, 17),
      |            i -> CAST(ord(substr(s, frame_idx * 8 + i, 1)) AS BIGINT) - 128),
      |          x -> x * x)) AS BIGINT) AS energy
      |      FROM f),
      |pk AS (SELECT doc_id, frame_idx, energy,
      |         lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pe,
      |         lead(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS ne
      |       FROM e),
      |peaks AS (SELECT doc_id, frame_idx, energy FROM pk
      |          WHERE pe IS NOT NULL AND ne IS NOT NULL
      |            AND energy > pe AND energy > ne),
      |lmr AS (SELECT doc_id, frame_idx, energy,
      |          lead(frame_idx) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS nf,
      |          lead(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS nrg2
      |        FROM peaks),
      |lm AS (SELECT DISTINCT doc_id,
      |         (nf - frame_idx) * 1048576 + (energy // 1024) * 1024 + (nrg2 // 1024) AS fp
      |       FROM lmr WHERE nf IS NOT NULL),
      |ok AS (SELECT fp FROM lm GROUP BY fp HAVING count(*) <= $m9FpCap),
      |capped AS (SELECT doc_id, fp FROM lm JOIN ok USING (fp))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      |FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2
      |ORDER BY id_a, id_b""".stripMargin

  // ---------- m14: PNG container metadata (chunk walk + CRC verify) ----------

  case class PngMeta(doc_id: Long, width: Int, height: Int, bit_depth: Int,
      color_type: Int, sig_ok: Boolean, ihdr_first: Boolean,
      iend_last: Boolean, crc_ok: Boolean, idat_nonempty: Boolean)

  /** Parse one PNG byte stream's container structure: signature,
    * chunk walk (big-endian length, 4-char type, data, CRC32),
    * IHDR geometry fields, per-chunk CRC VERIFICATION (the real
    * java.util.zip.CRC32 over type+data vs the stored value) and
    * stream-shape flags. Factored so the spec can feed a corrupted
    * stream and prove the CRC check actually bites.
    */
  private[graft] def pngMeta(docId: Long, b: Array[Byte]): PngMeta = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val sigOk = b.length > 8 && (0 until 8).forall(i => (b(i) & 0xff) == sig(i))
    def be32(p: Int): Int =
      ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    var pos = 8
    var first = true
    var ihdrFirst = false
    var lastTyp = ""
    var crcOk = true
    var idatLen = 0L
    var w = 0; var h = 0; var depth = 0; var ct = 0
    val crc = new java.util.zip.CRC32()
    while (pos + 12 <= b.length) {
      val len = be32(pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(b, pos + 4, 4 + len)
      if (crc.getValue != (be32(pos + 8 + len) & 0xffffffffL)) crcOk = false
      if (first) { ihdrFirst = typ == "IHDR"; first = false }
      if (typ == "IHDR") {
        w = be32(pos + 8); h = be32(pos + 12)
        depth = b(pos + 16) & 0xff; ct = b(pos + 17) & 0xff
      }
      if (typ == "IDAT") idatLen += len
      lastTyp = typ
      pos += 12 + len
    }
    PngMeta(docId, w, h, depth, ct, sigOk, ihdrFirst,
      lastTyp == "IEND" && pos == b.length, crcOk, idatLen > 0)
  }

  /** m14: MEDIA CONTAINER METADATA — the EXIF-class extraction pass
    * every multimodal ingest runs before decode (format sniffing,
    * geometry, integrity): walk the REAL PNG container m7 encodes
    * (signature, length-prefixed chunks, IHDR geometry, CRC32 of
    * every chunk VERIFIED against the stored value — corrupted
    * payloads surface here, before a decoder ever runs) and emit
    * geometry + structural health flags per document. The oracle
    * side is the KNOWN structure of the encoder's output (8×8
    * truecolor, depth 8, well-formed stream, all CRCs valid) — the
    * m10 bounded-contract idiom: the executor PROVES the parse, the
    * oracle pins what a healthy stream must look like, and the spec
    * corrupts a byte to show the CRC gate bites (a broken parser
    * or a constant-emitting fake cannot survive both).
    *
    * Scale: one narrow mapPartitions stage over the encoded
    * binaries — zero shuffles; bytes never leave the stage.
    */
  def m14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    m7Png(spark, dir)
      .mapPartitions(_.map(r => pngMeta(r.doc_id, r.png)))
      .toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  /** m14 oracle: the healthy-stream constants for every encoded doc
    * (truecolor 8×8 at depth 8; flags all TRUE).
    */
  val m14Sql: String =
    """SELECT doc_id, 8 AS width, 8 AS height, 8 AS bit_depth,
      |  2 AS color_type, TRUE AS sig_ok, TRUE AS ihdr_first,
      |  TRUE AS iend_last, TRUE AS crc_ok, TRUE AS idat_nonempty
      |FROM documents WHERE doc_id % 3 = 0
      |ORDER BY doc_id""".stripMargin

  // ---------- m13: REAL video leg — MJPEG container → decoded scene split ----------

  /** Per-frame scene-cut threshold and decode gate for [[m13]]:
    * scene boundaries shift the whole frame's luminance by exactly
    * 64·64 = 4096 (a pure DC offset), intra-scene frames differ by
    * ≤ 30, and the JPEG decode error per frame sum is bounded by
    * [[m13FrameTol]] (4 quadrants × [[jpegQuadrantTol]], doubled
    * for margin) — so cut decisions from DECODED sums are exact:
    * boundary deltas ≥ 4096 − 30 − 2·tol > threshold, intra-scene
    * deltas ≤ 30 + 2·tol < threshold, for ANY document text.
    */
  private[graft] val m13CutThreshold = 2048L
  private[graft] val m13FrameTol = 512L

  case class MjFrame(doc_id: Long, frame_idx: Int, src_sum: Long, dec_sum: Long)

  /** Build stage of [[m13]]: each VID document becomes a real MJPEG
    * container — 8 + (doc_id mod 9) genuine 8×8 grayscale JPEG
    * frames (the [[encodeJpegGray8x8]] codec m10 gated),
    * concatenated length-prefixed (4-byte frame count, then 4-byte
    * length + bytes per frame — the AVI-chunk idea reduced to its
    * skeleton). Frame f's pixels: (char & 63) texture + a 64-unit
    * DC offset that flips every 4 frames (the constructed scene
    * structure) + a 10·(f mod 4) shift on pixel 0 (intra-scene
    * motion, so consecutive frames are NOT byte-identical and the
    * per-frame decode is provably real work).
    */
  private[graft] def m13Container(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte], String)] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 0)
      .selectExpr("doc_id",
        "rpad(concat('VID', substring(text, 1, 61)), 64, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) =>
        val n = (8 + id % 9).toInt
        val baos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(baos)
        out.writeInt(n)
        var f = 0
        while (f < n) {
          val px = Array.tabulate(64) { i =>
            (s.charAt(i).toInt & 63) + 64 * ((f / 4) % 2) +
              (if (i == 0) 10 * (f % 4) else 0)
          }
          val jb = encodeJpegGray8x8(px)
          out.writeInt(jb.length)
          out.write(jb)
          f += 1
        }
        out.flush()
        (id, baos.toByteArray, s)
      })
  }

  /** m13: the VIDEO leg made REAL end-to-end — the round-9 verdict's
    * #3: the JDK has no video codec, but MJPEG is just concatenated
    * JPEG frames, so composing m10's real lossy decode with m8's
    * scene-split shape erases the m-family's last stub. Stage 1
    * ([[m13Container]]) writes a length-prefixed MJPEG container per
    * document; stage 2 PARSES the binary container (frame count,
    * per-frame lengths — real chunk walking), DECODES every frame
    * with ImageIO in the executor, and runs m8's gaps-and-islands
    * scene segmentation over the DECODED luminance sums: delta via
    * lag, cut where |delta| > [[m13CutThreshold]], running cut-count
    * as scene id. Output per scene: start frame, length, the exact
    * SOURCE luminance total (the lossless-side feature the oracle
    * reproduces arithmetically from the payload characters) and the
    * m10-style bounded-error gate (every frame's decoded sum within
    * [[m13FrameTol]] of its source sum — `every(...)` per scene).
    *
    * The oracle derives the same scenes from the CONSTRUCTION
    * (scene = frame div 4): the margin argument on [[m13FrameTol]]
    * proves decoded-side cuts land exactly there for any text, so a
    * decode that drifts outside JPEG's bound breaks the hash gate —
    * the m10 contract lifted from one image to a video container.
    *
    * Scale shape: both stages are ONE narrow mapPartitions each
    * (codec work embarrassingly parallel, ~16 frames per row); the
    * only shuffle is the doc_id exchange the lag/scene windows and
    * the aggregate SHARE (m8's shape); per-video frame counts bound
    * every window. Payload bytes never leave the decode stage.
    */
  def m13(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = m13Container(spark, dir)
      .mapPartitions(_.flatMap { case (id, video, s) =>
        val in = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(video))
        val n = in.readInt()
        var base = 0L
        var i = 0
        while (i < 64) { base += (s.charAt(i).toInt & 63); i += 1 }
        val rows = new scala.collection.mutable.ArrayBuffer[MjFrame](n)
        var f = 0
        while (f < n) {
          val len = in.readInt()
          val jb = new Array[Byte](len)
          in.readFully(jb)
          val dec = jpegLuminance(jb)
          var decSum = 0L
          var j = 0
          while (j < 64) { decSum += dec(j); j += 1 }
          val srcSum = base + 4096L * ((f / 4) % 2) + 10L * (f % 4)
          rows += MjFrame(id, f, srcSum, decSum)
          f += 1
        }
        rows.iterator
      }).toDF()
    val w = Window.partitionBy($"doc_id").orderBy($"frame_idx")
    frames
      .withColumn("delta", abs($"dec_sum" - lag($"dec_sum", 1).over(w)))
      .withColumn("cut",
        when($"delta".isNull, 0).when($"delta" > m13CutThreshold, 1).otherwise(0))
      .withColumn("scene_id",
        sum($"cut").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("frame_ok", abs($"dec_sum" - $"src_sum") <= m13FrameTol)
      .groupBy($"doc_id", $"scene_id")
      .agg(min($"frame_idx").as("start_frame"),
        count(lit(1)).as("n_scene_frames"),
        sum($"src_sum").as("scene_src_sum"),
        expr("every(frame_ok)").as("within_tol"))
      .transform(graft.Tables.ordered(_, $"doc_id", $"scene_id"))
  }

  /** m13 oracle: frames and scenes from the construction arithmetic
    * (base luminance from the payload chars, DC parity offset,
    * pixel-0 motion; scene = frame div 4), the decode gate asserted
    * TRUE — the bounded-error contract over the real container.
    */
  val m13Sql: String = {
    val baseExpr = (1 to 64).map(p => s"(ord(substr(s, $p, 1)) & 63)")
      .mkString("(", " + ", ")")
    s"""WITH p AS (SELECT doc_id, rpad('VID' || substr(text, 1, 61), 64, ' ') AS s,
      |         8 + doc_id % 9 AS n_frames
      |       FROM documents WHERE doc_id % 3 = 0),
      |b AS (SELECT doc_id, n_frames, CAST($baseExpr AS BIGINT) AS base FROM p),
      |f AS (SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
      |        base + 4096 * ((fi // 4) % 2) + 10 * (fi % 4) AS src_sum
      |      FROM b, (SELECT unnest(range(0, 16)) AS fi) WHERE fi < n_frames)
      |SELECT doc_id, CAST(frame_idx // 4 AS BIGINT) AS scene_id,
      |  CAST(min(frame_idx) AS INTEGER) AS start_frame,
      |  count(*) AS n_scene_frames,
      |  CAST(sum(src_sum) AS BIGINT) AS scene_src_sum,
      |  TRUE AS within_tol
      |FROM f GROUP BY doc_id, frame_idx // 4
      |ORDER BY doc_id, scene_id""".stripMargin
  }

  // ---------- m15: WAV/RIFF container metadata (chunk walk + PCM stats) ----------

  /** m15's fixed fmt parameters: mono 8-bit unsigned PCM at 8 kHz —
    * the canonical telephony capture format; byte rate and block
    * align DERIVE from them (sr·ch·bits/8), which is exactly the
    * consistency the parser re-checks.
    */
  private val m15SampleRate = 8000

  case class WavMeta(doc_id: Long, riff_ok: Boolean, wave_ok: Boolean,
      fmt_ok: Boolean, audio_format: Int, channels: Int, sample_rate: Int,
      byte_rate_ok: Boolean, bits_per_sample: Int, data_len: Long,
      size_ok: Boolean, pcm_energy: Long, pcm_peak: Long)

  /** Build one REAL canonical WAV file: RIFF header, 16-byte PCM fmt
    * chunk, data chunk carrying the samples as unsigned 8-bit PCM,
    * odd-length data padded per the RIFF spec.
    */
  private[graft] def buildWav(samples: Array[Byte]): Array[Byte] = {
    val dataLen = samples.length
    val padded = dataLen + (dataLen & 1) // RIFF: chunks pad to even
    val out = java.nio.ByteBuffer.allocate(44 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + padded)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort).putShort(1.toShort)           // PCM, mono
    out.putInt(m15SampleRate).putInt(m15SampleRate)       // rate, byte rate
    out.putShort(1.toShort).putShort(8.toShort)           // block align, bits
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.put(samples)
    out.array()
  }

  /** Parse one WAV byte stream's container structure: RIFF/WAVE
    * magic, generic chunk walk (4-char id, little-endian length,
    * even padding), fmt field extraction with byte-rate/block-align
    * consistency re-derivation, declared-vs-actual size check, and
    * exact integer PCM stats over the data chunk (energy =
    * Σ(s−128)², peak = max |s−128| — m5's sample convention).
    * Factored so the spec can corrupt bytes and prove each gate
    * bites.
    */
  private[graft] def wavMeta(docId: Long, b: Array[Byte]): WavMeta = {
    def le32(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    def le16(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def tag(p: Int): String = new String(b, p, 4, "US-ASCII")
    val riffOk = b.length >= 12 && tag(0) == "RIFF"
    val waveOk = riffOk && tag(8) == "WAVE"
    val sizeOk = riffOk && le32(4).toLong == b.length - 8
    var pos = 12
    var fmtOk = false; var audioFmt = 0; var ch = 0; var sr = 0
    var byteRateOk = false; var bits = 0
    var dataLen = 0L; var energy = 0L; var peak = 0L
    while (pos + 8 <= b.length) {
      val id = tag(pos)
      val len = le32(pos + 4)
      if (id == "fmt " && len >= 16 && pos + 8 + 16 <= b.length) {
        audioFmt = le16(pos + 8); ch = le16(pos + 10)
        sr = le32(pos + 12); bits = le16(pos + 22)
        // re-derive: byteRate = sr*ch*bits/8, blockAlign = ch*bits/8
        byteRateOk = ch > 0 && bits > 0 &&
          le32(pos + 16) == sr * ch * bits / 8 &&
          le16(pos + 20) == ch * bits / 8
        fmtOk = true
      }
      if (id == "data") {
        dataLen = len.toLong
        val end = math.min(pos + 8 + len, b.length)
        var i = pos + 8
        while (i < end) {
          val s = (b(i) & 0xff) - 128L
          energy += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
      }
      pos += 8 + len + (len & 1) // even padding
    }
    WavMeta(docId, riffOk, waveOk, fmtOk, audioFmt, ch, sr,
      byteRateOk, bits, dataLen, sizeOk, energy, peak)
  }

  /** m15: WAV/RIFF CONTAINER METADATA — m14's container-integrity
    * pass for the AUDIO leg (the EXIF-class extraction an ASR
    * ingest runs before any resampling/VAD): the AUD payloads are
    * packed into REAL canonical WAV files in executors
    * ([[buildWav]] — RIFF header, 16-byte PCM fmt, data chunk, the
    * actual on-disk format), then [[wavMeta]] walks the container
    * back generically (chunk ids, little-endian lengths, even
    * padding), RE-DERIVES the fmt consistency equations
    * (byteRate = sr·ch·bits/8) instead of trusting them, checks
    * declared-vs-actual sizes, and computes exact integer PCM
    * stats over the data chunk. The oracle pins the healthy
    * structure constants AND the per-doc energy/peak from the
    * document text (the m14 bounded-contract idiom: the executor
    * proves the roundtrip, the oracle pins what a canonical file
    * must contain, the spec corrupts bytes to show each gate
    * bites — a constant-emitting fake survives neither).
    *
    * Scale: one narrow mapPartitions stage (build + parse fused,
    * bytes never leave it) — zero shuffles but presentation; the
    * decode-fleet shape of m7/m10.
    */
  def m15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir)
      .filter($"doc_id" % 3 === 1) // the AUD leg
      .mapPartitions(_.map(r => wavMeta(r.doc_id, buildWav(r.payload))))
      .toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  // ---------- m16: JPEG marker-segment walk ----------

  case class JpegMarkers(doc_id: Long, soi_ok: Boolean, width: Int, height: Int,
      precision: Int, n_components: Int, n_dqt: Long, n_dht: Long,
      has_app0: Boolean, sos_ok: Boolean, eoi_last: Boolean, scan_nonempty: Boolean)

  /** Walk one JPEG byte stream's marker segments: SOI, then
    * length-prefixed segments (0xFF type + big-endian length
    * including itself) up to SOS, then the entropy-coded scan
    * (skipping 0xFF00 byte stuffing and RSTn markers) to EOI.
    * Extracts SOF0 geometry (precision, height, width, component
    * count) and table/structure counts. Factored so the spec can
    * corrupt bytes and prove the gates bite.
    */
  private[graft] def jpegMarkers(docId: Long, b: Array[Byte]): JpegMarkers = {
    def u8(p: Int): Int = b(p) & 0xff
    def be16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    val soiOk = b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8
    var pos = 2
    var w = 0; var h = 0; var prec = 0; var ncomp = 0
    var nDqt = 0L; var nDht = 0L
    var app0 = false; var sos = false
    var scanBytes = 0L; var eoiLast = false
    var done = false
    while (!done && pos + 4 <= b.length && u8(pos) == 0xff) {
      val typ = u8(pos + 1)
      if (typ == 0xdb) nDqt += 1
      if (typ == 0xc4) nDht += 1
      if (typ == 0xe0) app0 = true
      if (typ == 0xc0) { // SOF0: baseline geometry
        prec = u8(pos + 4); h = be16(pos + 5); w = be16(pos + 7)
        ncomp = u8(pos + 9)
      }
      if (typ == 0xda) { // SOS: skip header, walk the entropy scan
        sos = true
        var p = pos + 2 + be16(pos + 2)
        var stop = false
        while (!stop && p + 1 < b.length) {
          if (u8(p) == 0xff && u8(p + 1) == 0xd9) {
            eoiLast = p + 2 == b.length; stop = true
          } else {
            // 0xFF00 stuffing and RSTn (D0-D7) stay inside the scan
            scanBytes += 1
            p += (if (u8(p) == 0xff) 2 else 1)
          }
        }
        done = true
      } else pos += 2 + be16(pos + 2)
    }
    JpegMarkers(docId, soiOk, w, h, prec, ncomp, nDqt, nDht,
      app0, sos, eoiLast, scanBytes > 0L)
  }

  /** m16: JPEG MARKER METADATA — the third container walk (PNG m14,
    * WAV m15): the EXIF-class marker-segment parse a crawl ingest
    * runs on the dominant image format before decode (format
    * sniff, geometry, table inventory, truncation detection). Over
    * m10's REAL encoder output the parse must recover the known
    * baseline structure — 8×8 single-component precision-8 SOF0,
    * ≥1 quantization and ≥1 Huffman table, JFIF APP0, an SOS scan
    * that ends in EOI exactly at the last byte — the m14 contract
    * idiom (executor proves the parse, oracle pins the healthy
    * constants, spec corrupts bytes so each gate bites). The scan
    * walk honors 0xFF00 byte stuffing and RSTn — the classic JPEG
    * parser traps.
    *
    * Scale: encode+walk fused in one narrow mapPartitions stage —
    * zero shuffles, the m7/m10 decode-fleet shape.
    */
  def m16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 1)
      .selectExpr("doc_id",
        "rpad(concat('JPG', substring(text, 1, 61)), 64, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) =>
        jpegMarkers(id, encodeJpeg8x8(s))
      })
      .toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  /** m16 oracle: the healthy baseline-JPEG constants for every
    * encoded doc (ImageIO's fixed segment inventory at the fixed
    * quality: one DQT segment, TWO DHT segments — DC and AC
    * Huffman tables ship separately — JFIF APP0; measured, then
    * pinned).
    */
  val m16Sql: String =
    """SELECT doc_id, TRUE AS soi_ok, 8 AS width, 8 AS height,
      |  8 AS precision, 1 AS n_components,
      |  CAST(1 AS BIGINT) AS n_dqt, CAST(2 AS BIGINT) AS n_dht,
      |  TRUE AS has_app0, TRUE AS sos_ok, TRUE AS eoi_last,
      |  TRUE AS scan_nonempty
      |FROM documents WHERE doc_id % 3 = 1
      |ORDER BY doc_id""".stripMargin

  /** m15 oracle: healthy-structure constants for the canonical
    * encoder + exact PCM energy/peak from the ASCII payload bytes
    * (m5's ord−128 convention).
    */
  // ---------- m17: MP4 / ISO-BMFF box-tree walk ----------

  case class Mp4Meta(doc_id: Long, major_brand: String, timescale: Int,
      duration: Long, width: Int, height: Int, n_samples: Long,
      sample_bytes: Long, mdat_bytes: Long, sizes_ok: Boolean,
      moov_before_mdat: Boolean, stsz_matches_mdat: Boolean,
      brands_ok: Boolean)

  /** Build one minimal-but-well-formed ISO-BMFF (MP4) file: `ftyp`
    * (major brand isom, compatible mp41), `moov` ▸ `mvhd`
    * (timescale 1000, duration 40·n) + `trak` ▸ `tkhd` (8×8 in
    * 16.16 fixed point) + `mdia` ▸ `mdhd` + `minf` ▸ `stbl` ▸
    * `stsz` (per-sample sizes), then `mdat` carrying the sample
    * bytes. Box = 4-byte big-endian size (incl. header) + 4-char
    * type, containers nest — the public ISO/IEC 14496-12 layout.
    * Sample f's size is 100 + (payload char f & 63), so the oracle
    * re-derives every size/total arithmetically from the text.
    */
  private[graft] def buildMp4(s: String, n: Int): Array[Byte] = {
    val sizes = Array.tabulate(n)(f => 100 + (s.charAt(f).toInt & 63))
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(baos)
    def cc(t: String): Unit = out.write(t.getBytes("ISO-8859-1"))
    // ftyp
    out.writeInt(24); cc("ftyp"); cc("isom"); out.writeInt(0x200)
    cc("isom"); cc("mp41")
    // sizes inside moov
    val stszSz = 20 + 4 * n
    val stblSz = 8 + stszSz
    val minfSz = 8 + stblSz
    val mdhdSz = 32
    val mdiaSz = 8 + mdhdSz + minfSz
    val tkhdSz = 92
    val trakSz = 8 + tkhdSz + mdiaSz
    val mvhdSz = 108
    val moovSz = 8 + mvhdSz + trakSz
    out.writeInt(moovSz); cc("moov")
    // mvhd v0: creation/modification 0, timescale 1000, duration 40n,
    // rate 1.0 (16.16), volume 1.0 (8.8), 10 reserved bytes, unity
    // matrix, 6 predefined ints, next track id 2
    out.writeInt(mvhdSz); cc("mvhd"); out.writeInt(0)
    out.writeInt(0); out.writeInt(0); out.writeInt(1000); out.writeInt(40 * n)
    out.writeInt(0x00010000); out.writeShort(0x0100); out.writeShort(0)
    out.writeLong(0L)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.writeInt)
    (0 until 6).foreach(_ => out.writeInt(0))
    out.writeInt(2)
    // trak ▸ tkhd v0 (flags 7 = enabled): track 1, duration 40n,
    // layer/alt/volume 0, unity matrix, width/height 8.0 in 16.16
    out.writeInt(trakSz); cc("trak")
    out.writeInt(tkhdSz); cc("tkhd"); out.writeInt(7)
    out.writeInt(0); out.writeInt(0); out.writeInt(1); out.writeInt(0)
    out.writeInt(40 * n); out.writeLong(0L)
    out.writeShort(0); out.writeShort(0); out.writeShort(0); out.writeShort(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.writeInt)
    out.writeInt(8 << 16); out.writeInt(8 << 16)
    // mdia ▸ mdhd v0 (timescale 90000, 3600 ticks per 40 ms sample)
    out.writeInt(mdiaSz); cc("mdia")
    out.writeInt(mdhdSz); cc("mdhd"); out.writeInt(0)
    out.writeInt(0); out.writeInt(0); out.writeInt(90000)
    out.writeInt(3600 * n); out.writeShort(0x55c4); out.writeShort(0)
    // minf ▸ stbl ▸ stsz (variable sizes: sample_size field 0)
    out.writeInt(minfSz); cc("minf")
    out.writeInt(stblSz); cc("stbl")
    out.writeInt(stszSz); cc("stsz"); out.writeInt(0)
    out.writeInt(0); out.writeInt(n)
    sizes.foreach(out.writeInt)
    // mdat: opaque sample bytes (deterministic filler)
    out.writeInt(8 + sizes.sum); cc("mdat")
    var f = 0
    while (f < n) {
      var i = 0
      while (i < sizes(f)) { out.write((f * 7 + i) & 0xff); i += 1 }
      f += 1
    }
    out.flush()
    baos.toByteArray
  }

  /** Walk one ISO-BMFF byte stream's box tree: 4-byte big-endian
    * size + 4-char type per box (size 1 ⇒ 64-bit `largesize`
    * follows; size 0 ⇒ box extends to the end of its container —
    * both public-spec cases handled and spec-proved), recursing
    * into the container types on the moov path. Extracts the ftyp
    * brand, mvhd timescale/duration, tkhd 16.16 geometry and the
    * stsz sample inventory, and verifies the structural invariants
    * an ingest trusts before demuxing untrusted bytes: every box
    * lands exactly on its parent's boundary (`sizes_ok`), metadata
    * precedes media (`moov_before_mdat`), and the declared sample
    * bytes equal the mdat payload (`stsz_matches_mdat` — the
    * truncation/smuggling check). Factored so the spec can corrupt
    * bytes and prove each gate bites.
    */
  private[graft] def mp4Meta(docId: Long, b: Array[Byte]): Mp4Meta = {
    def u8(p: Int): Int = b(p) & 0xff
    def be32(p: Int): Long =
      ((u8(p).toLong << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)) & 0xffffffffL
    def be64(p: Int): Long = (be32(p) << 32) | be32(p + 4)
    def fourcc(p: Int): String = new String(b.slice(p, p + 4), "ISO-8859-1")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var majorBrand = ""; var brandsOk = false
    var timescale = 0; var duration = 0L
    var w = 0; var h = 0
    var nSamples = 0L; var sampleBytes = 0L; var mdatBytes = -1L
    var sizesOk = true
    var moovOff = -1L; var mdatOff = -1L
    def walk(start: Long, end: Long): Unit = {
      var pos = start
      while (pos < end) {
        if (pos + 8 > end) { sizesOk = false; return }
        val sz32 = be32(pos.toInt)
        val typ = fourcc(pos.toInt + 4)
        var hdr = 8L
        val size: Long =
          if (sz32 == 1L) {
            if (pos + 16 > end) { sizesOk = false; return }
            hdr = 16L; be64(pos.toInt + 8)
          } else if (sz32 == 0L) end - pos // spec: to end of container
          else sz32
        if (size < hdr || pos + size > end) { sizesOk = false; return }
        typ match {
          case "ftyp" =>
            majorBrand = fourcc(pos.toInt + 8)
            val nb = ((size - 16) / 4).toInt
            brandsOk = (0 until nb)
              .exists(i => fourcc(pos.toInt + 16 + 4 * i) == "mp41")
          case "mvhd" =>
            timescale = be32(pos.toInt + 8 + 12).toInt
            duration = be32(pos.toInt + 8 + 16)
          case "tkhd" =>
            w = (be32(pos.toInt + 8 + 76) >> 16).toInt
            h = (be32(pos.toInt + 8 + 80) >> 16).toInt
          case "stsz" =>
            val fixed = be32(pos.toInt + 8 + 4)
            val cnt = be32(pos.toInt + 8 + 8)
            nSamples = cnt
            sampleBytes =
              if (fixed != 0L) fixed * cnt
              else {
                var t = 0L; var i = 0
                while (i < cnt) { t += be32(pos.toInt + 20 + 4 * i); i += 1 }
                t
              }
          case "moov" => moovOff = pos
          case "mdat" => mdatOff = pos; mdatBytes = size - hdr
          case _ =>
        }
        if (containers(typ)) walk(pos + hdr, pos + size)
        pos += size
      }
    }
    walk(0L, b.length.toLong)
    Mp4Meta(docId, majorBrand, timescale, duration, w, h, nSamples,
      sampleBytes, mdatBytes, sizesOk,
      moovOff >= 0L && mdatOff >= 0L && moovOff < mdatOff,
      mdatBytes == sampleBytes, brandsOk)
  }

  /** m17: MP4 / ISO-BMFF BOX WALK — the fourth container-forensics
    * leg (PNG m14, WAV m15, JPEG m16), on the container most real
    * multimodal corpora actually ship video in (ISO/IEC 14496-12's
    * length-prefixed box tree; round-10 verdict #3). Each MP4 doc
    * becomes a well-formed fixture file ([[buildMp4]]: ftyp/moov/
    * mvhd/trak/tkhd/mdia/mdhd/minf/stbl/stsz + mdat, per-sample
    * sizes derived from the payload characters), and [[mp4Meta]]
    * walks the tree back out — brand, timescale/duration, 16.16
    * geometry, sample inventory — verifying the pre-demux trust
    * gates: exact size closure at every nesting level, metadata-
    * before-media ordering, and stsz↔mdat byte agreement. The
    * oracle re-derives duration and the sample totals ARITHMETICALLY
    * from the text (m13's construction-oracle idiom: sample f =
    * 100 + (char f & 63)), so a walker that mis-reads any size or
    * offset breaks the hash gate; the spec corrupts bytes (size
    * fields, stsz entries, box order, truncation) and hand-builds
    * the largesize/size-0 spec cases to prove every gate bites.
    *
    * Scale: build+walk fused in ONE narrow mapPartitions stage —
    * zero shuffles (the m7/m10 decode-fleet shape); payload bytes
    * never leave the stage.
    */
  def m17(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 2)
      .selectExpr("doc_id",
        "rpad(concat('MP4', substring(text, 1, 61)), 64, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) =>
        mp4Meta(id, buildMp4(s, (8 + id % 9).toInt))
      })
      .toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  /** m17 oracle: healthy-structure constants plus the sample totals
    * re-derived from the payload characters (sample f of n = 100 +
    * (ord(char f) & 63); duration = 40·n at timescale 1000).
    */
  val m17Sql: String =
    """WITH p AS (SELECT doc_id,
      |        rpad(concat('MP4', substring(text, 1, 61)), 64, ' ') AS s,
      |        CAST(8 + doc_id % 9 AS BIGINT) AS n
      |      FROM documents WHERE doc_id % 3 = 2),
      |st AS (SELECT doc_id, n,
      |        CAST(list_sum(list_transform(range(1, CAST(n AS INT) + 1),
      |          f -> 100 + (ord(substr(s, f, 1)) & 63))) AS BIGINT) AS sample_bytes
      |      FROM p)
      |SELECT doc_id, 'isom' AS major_brand, 1000 AS timescale,
      |  40 * n AS duration, 8 AS width, 8 AS height, n AS n_samples,
      |  sample_bytes, sample_bytes AS mdat_bytes, TRUE AS sizes_ok,
      |  TRUE AS moov_before_mdat, TRUE AS stsz_matches_mdat,
      |  TRUE AS brands_ok
      |FROM st
      |ORDER BY doc_id""".stripMargin

  val m15Sql: String =
    """WITH p AS (SELECT doc_id, 'AUD' || substr(text, 1, 61) AS s
      |      FROM documents WHERE doc_id % 3 = 1),
      |st AS (SELECT doc_id, CAST(length(s) AS BIGINT) AS data_len,
      |        CAST(list_sum(list_transform(range(1, length(s) + 1),
      |          i -> (CAST(ord(substr(s, i, 1)) AS BIGINT) - 128)
      |               * (CAST(ord(substr(s, i, 1)) AS BIGINT) - 128))) AS BIGINT) AS pcm_energy,
      |        CAST(list_max(list_transform(range(1, length(s) + 1),
      |          i -> abs(CAST(ord(substr(s, i, 1)) AS BIGINT) - 128))) AS BIGINT) AS pcm_peak
      |      FROM p)
      |SELECT doc_id, TRUE AS riff_ok, TRUE AS wave_ok, TRUE AS fmt_ok,
      |  1 AS audio_format, 1 AS channels, 8000 AS sample_rate,
      |  TRUE AS byte_rate_ok, 8 AS bits_per_sample, data_len,
      |  TRUE AS size_ok, pcm_energy, pcm_peak
      |FROM st
      |ORDER BY doc_id""".stripMargin

  // ---------- m18: fragmented MP4 (fMP4 / CMAF) walk ----------

  case class Fmp4Meta(doc_id: Long, major_brand: String, n_fragments: Long,
      seq_contiguous: Boolean, n_samples: Long, sample_bytes: Long,
      mdat_bytes: Long, frag_sizes_ok: Boolean, sizes_ok: Boolean,
      moov_before_moof: Boolean, default_dur: Long, duration: Long,
      brands_ok: Boolean)

  /** Build one minimal fragmented MP4 (the CMAF/DASH shape most web
    * video actually ships — ISO/IEC 14496-12 §8.8): `ftyp` (iso6 +
    * cmfc/mp41), a `moov` carrying track METADATA ONLY — `mvhd`
    * with duration 0 (in fMP4 the movie-level duration is unknown
    * up front), `trak` ▸ `tkhd`/`mdia` with an EMPTY `stbl` (stsz
    * count 0: samples live in the fragments), and `mvex` ▸ `trex`
    * (the track defaults: sample duration 3600 at the 90 kHz media
    * timescale) — then per fragment f = 1..nf a `moof` ▸ `mfhd`
    * (sequence number f) + `traf` ▸ `tfhd` (default-base-is-moof)
    * + `trun` (per-sample sizes), each followed by ITS OWN `mdat`.
    * Fragment f carries k_f = 2 + (payload char f & 3) samples;
    * sample j of fragment f has size 60 + ((char f + 7·j) & 63) —
    * every total re-derivable arithmetically from the text.
    */
  private[graft] def buildFmp4(s: String, nf: Int): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(baos)
    def cc(t: String): Unit = out.write(t.getBytes("ISO-8859-1"))
    out.writeInt(24); cc("ftyp"); cc("iso6"); out.writeInt(0x200)
    cc("cmfc"); cc("mp41")
    val stszSz = 20
    val stblSz = 8 + stszSz
    val minfSz = 8 + stblSz
    val mdhdSz = 32
    val mdiaSz = 8 + mdhdSz + minfSz
    val tkhdSz = 92
    val trakSz = 8 + tkhdSz + mdiaSz
    val mvhdSz = 108
    val mvexSz = 8 + 32
    val moovSz = 8 + mvhdSz + trakSz + mvexSz
    out.writeInt(moovSz); cc("moov")
    out.writeInt(mvhdSz); cc("mvhd"); out.writeInt(0)
    out.writeInt(0); out.writeInt(0); out.writeInt(1000); out.writeInt(0)
    out.writeInt(0x00010000); out.writeShort(0x0100); out.writeShort(0)
    out.writeLong(0L)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.writeInt)
    (0 until 6).foreach(_ => out.writeInt(0))
    out.writeInt(2)
    out.writeInt(trakSz); cc("trak")
    out.writeInt(tkhdSz); cc("tkhd"); out.writeInt(7)
    out.writeInt(0); out.writeInt(0); out.writeInt(1); out.writeInt(0)
    out.writeInt(0); out.writeLong(0L)
    out.writeShort(0); out.writeShort(0); out.writeShort(0); out.writeShort(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.writeInt)
    out.writeInt(8 << 16); out.writeInt(8 << 16)
    out.writeInt(mdiaSz); cc("mdia")
    out.writeInt(mdhdSz); cc("mdhd"); out.writeInt(0)
    out.writeInt(0); out.writeInt(0); out.writeInt(90000)
    out.writeInt(0); out.writeShort(0x55c4); out.writeShort(0)
    out.writeInt(minfSz); cc("minf")
    out.writeInt(stblSz); cc("stbl")
    out.writeInt(stszSz); cc("stsz"); out.writeInt(0)
    out.writeInt(0); out.writeInt(0)
    out.writeInt(mvexSz); cc("mvex")
    out.writeInt(32); cc("trex"); out.writeInt(0)
    out.writeInt(1); out.writeInt(1); out.writeInt(3600)
    out.writeInt(0); out.writeInt(0)
    var f = 1
    while (f <= nf) {
      val c = s.charAt(f - 1).toInt
      val k = 2 + (c & 3)
      val sizes = Array.tabulate(k)(j => 60 + ((c + 7 * (j + 1)) & 63))
      val trunSz = 16 + 4 * k
      val tfhdSz = 16
      val trafSz = 8 + tfhdSz + trunSz
      val mfhdSz = 16
      val moofSz = 8 + mfhdSz + trafSz
      out.writeInt(moofSz); cc("moof")
      out.writeInt(mfhdSz); cc("mfhd"); out.writeInt(0); out.writeInt(f)
      out.writeInt(trafSz); cc("traf")
      out.writeInt(tfhdSz); cc("tfhd"); out.writeInt(0x020000); out.writeInt(1)
      out.writeInt(trunSz); cc("trun"); out.writeInt(0x000200); out.writeInt(k)
      sizes.foreach(out.writeInt)
      out.writeInt(8 + sizes.sum); cc("mdat")
      var j = 0
      while (j < k) {
        var i = 0
        while (i < sizes(j)) { out.write((f * 11 + j * 7 + i) & 0xff); i += 1 }
        j += 1
      }
      f += 1
    }
    out.flush()
    baos.toByteArray
  }

  /** Walk one fragmented-MP4 byte stream — [[mp4Meta]]'s box
    * discipline (size closure, largesize/size-0) extended with the
    * CROSS-FRAGMENT accounting progressive MP4 never exercises:
    * every `moof`'s declared `trun` sample bytes must equal the
    * payload of the `mdat` that FOLLOWS it (`frag_sizes_ok` — the
    * per-segment truncation/smuggling gate a DASH ingest runs per
    * arriving segment), `mfhd` sequence numbers must run 1..F in
    * order (`seq_contiguous` — the lost/reordered-segment gate),
    * movie metadata must precede the first fragment, and the total
    * duration is re-derived as n_samples × the `trex` default
    * sample duration (the fMP4 duration contract: the moov alone
    * cannot know it).
    */
  private[graft] def fmp4Meta(docId: Long, b: Array[Byte]): Fmp4Meta = {
    def u8(p: Int): Int = b(p) & 0xff
    def be32(p: Int): Long =
      ((u8(p).toLong << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)) & 0xffffffffL
    def be64(p: Int): Long = (be32(p) << 32) | be32(p + 4)
    def fourcc(p: Int): String = new String(b.slice(p, p + 4), "ISO-8859-1")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl", "mvex",
      "moof", "traf")
    var majorBrand = ""; var brandsOk = false
    var defaultDur = 0L
    var sizesOk = true
    var moovOff = -1L; var firstMoofOff = -1L
    var nFrags = 0L; var nSamples = 0L; var sampleBytes = 0L
    var mdatBytes = 0L
    var fragSizesOk = true
    var seqOk = true
    var curTrun = 0L      // Σ sizes inside the moof being walked
    var pendingTrun = -1L // awaiting the moof's mdat (-1 = none open)
    def walk(start: Long, end: Long): Unit = {
      var pos = start
      while (pos < end) {
        if (pos + 8 > end) { sizesOk = false; return }
        val sz32 = be32(pos.toInt)
        val typ = fourcc(pos.toInt + 4)
        var hdr = 8L
        val size: Long =
          if (sz32 == 1L) {
            if (pos + 16 > end) { sizesOk = false; return }
            hdr = 16L; be64(pos.toInt + 8)
          } else if (sz32 == 0L) end - pos
          else sz32
        if (size < hdr || pos + size > end) { sizesOk = false; return }
        typ match {
          case "ftyp" =>
            majorBrand = fourcc(pos.toInt + 8)
            val nb = ((size - 16) / 4).toInt
            brandsOk = (0 until nb)
              .exists(i => fourcc(pos.toInt + 16 + 4 * i) == "cmfc")
          case "trex" =>
            defaultDur = be32(pos.toInt + 8 + 12)
          case "mfhd" =>
            // sequence numbers must arrive as 1..F in stream order
            // (the enclosing moof already counted itself)
            seqOk = seqOk && be32(pos.toInt + 12) == nFrags
          case "trun" =>
            val cnt = be32(pos.toInt + 12)
            nSamples += cnt
            var t = 0L; var i = 0
            while (i < cnt) { t += be32(pos.toInt + 16 + 4 * i); i += 1 }
            sampleBytes += t
            curTrun += t
          case "moov" => moovOff = pos
          case "moof" =>
            if (firstMoofOff < 0L) firstMoofOff = pos
            if (pendingTrun >= 0L) fragSizesOk = false // moof without its mdat
            nFrags += 1
            curTrun = 0L
          case "mdat" =>
            mdatBytes += size - hdr
            if (pendingTrun >= 0L) {
              fragSizesOk = fragSizesOk && (size - hdr == pendingTrun)
              pendingTrun = -1L
            } else fragSizesOk = false // mdat with no owning fragment
          case _ =>
        }
        if (containers(typ)) {
          walk(pos + hdr, pos + size)
          if (typ == "moof") pendingTrun = curTrun
        }
        pos += size
      }
    }
    walk(0L, b.length.toLong)
    if (pendingTrun >= 0L) fragSizesOk = false // trailing moof, no mdat
    Fmp4Meta(docId, majorBrand, nFrags, seqOk, nSamples, sampleBytes,
      mdatBytes, fragSizesOk, sizesOk,
      moovOff >= 0L && firstMoofOff >= 0L && moovOff < firstMoofOff,
      defaultDur, nSamples * defaultDur, brandsOk)
  }

  /** m18: FRAGMENTED MP4 (fMP4 / CMAF) WALK — the fifth
    * container-forensics leg (PNG m14, WAV m15, JPEG m16,
    * progressive MP4 m17), on the SEGMENTED form most web/DASH
    * video actually arrives in (round-11 verdict #3). Each doc
    * becomes a well-formed fragmented fixture ([[buildFmp4]]:
    * ftyp/moov+mvex/trex, then per fragment moof ▸ mfhd/traf ▸
    * tfhd/trun + its own mdat) and [[fmp4Meta]] walks it back out,
    * adding the one box relationship progressive MP4 never
    * exercises: CROSS-FRAGMENT sample accounting — each moof's
    * trun byte total against ITS mdat (`frag_sizes_ok`), sequence
    * contiguity (`seq_contiguous`), metadata-before-fragments
    * ordering, and the trex-default duration contract (total
    * duration is derivable only as n_samples × default duration —
    * the moov alone cannot know it). The oracle re-derives
    * fragment counts, per-fragment sample counts and byte totals
    * ARITHMETICALLY from the payload characters (m13/m17's
    * construction-oracle idiom); the spec corrupts trun entries,
    * mfhd sequence numbers, fragment order and truncation to prove
    * each gate bites independently.
    *
    * Scale: build+walk fused in ONE narrow mapPartitions stage —
    * zero shuffles (the m7/m10/m17 decode-fleet shape); payload
    * bytes never leave the stage. At 100 TB this is the per-object
    * segment-integrity pass a DASH/CMAF ingest fleet runs.
    */
  def m18(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 0)
      .selectExpr("doc_id",
        "rpad(concat('FMP', substring(text, 1, 61)), 64, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) =>
        fmp4Meta(id, buildFmp4(s, (4 + id % 5).toInt))
      })
      .toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  /** m18 oracle: healthy-structure constants plus fragment/sample
    * totals re-derived from the payload characters (fragment f of
    * nf = 4 + doc_id % 5 carries 2 + (ord(char f) & 3) samples;
    * sample j of fragment f is 60 + ((ord(char f) + 7·j) & 63)
    * bytes; duration = 3600 · n_samples at the trex default).
    */
  val m18Sql: String =
    """WITH p AS (SELECT doc_id,
      |        rpad(concat('FMP', substring(text, 1, 61)), 64, ' ') AS s,
      |        CAST(4 + doc_id % 5 AS BIGINT) AS nf
      |      FROM documents WHERE doc_id % 3 = 0),
      |st AS (SELECT doc_id, nf,
      |        CAST(list_sum(list_transform(range(1, CAST(nf AS INT) + 1),
      |          f -> 2 + (ord(substr(s, f, 1)) & 3))) AS BIGINT) AS n_samples,
      |        CAST(list_sum(list_transform(range(1, CAST(nf AS INT) + 1),
      |          f -> list_sum(list_transform(
      |            range(1, 2 + (ord(substr(s, f, 1)) & 3) + 1),
      |            j -> 60 + ((ord(substr(s, f, 1)) + 7 * j) & 63))))) AS BIGINT)
      |          AS sample_bytes
      |      FROM p)
      |SELECT doc_id, 'iso6' AS major_brand, nf AS n_fragments,
      |  TRUE AS seq_contiguous, n_samples, sample_bytes,
      |  sample_bytes AS mdat_bytes, TRUE AS frag_sizes_ok,
      |  TRUE AS sizes_ok, TRUE AS moov_before_moof,
      |  CAST(3600 AS BIGINT) AS default_dur,
      |  3600 * n_samples AS duration, TRUE AS brands_ok
      |FROM st
      |ORDER BY doc_id""".stripMargin

  // ---------- m19: SRT subtitle-track parse ----------

  /** Render one SRT text track (the SubRip format: per cue an
    * index line, a `HH:MM:SS,mmm --> HH:MM:SS,mmm` range line, the
    * caption text, then a blank line — the sidecar format most
    * video corpora ship transcripts in). Cue i starts at
    * (i−1)·2000 + (char i & 1023) ms, lasts 800 + ((char i · 7) &
    * 127)·12 ms and carries 10 + (char i & 7) payload chars — all
    * re-derivable arithmetically from the text. */
  private[graft] def buildSrt(s: String, n: Int): String = {
    def fmt(ms: Long): String =
      f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d,${ms % 1000}%03d"
    (1 to n).map { i =>
      val c = s.charAt(i - 1).toInt
      val start = (i - 1) * 2000L + (c & 1023)
      val dur = 800L + ((c * 7) & 127) * 12
      val text = s.substring(i - 1, i - 1 + 10 + (c & 7))
      s"$i\n${fmt(start)} --> ${fmt(start + dur)}\n$text\n"
    }.mkString("\n")
  }

  /** Parse an SRT track generically (blank-line-separated cues,
    * index line, timestamp-range line, verbatim caption text) —
    * the real parser, not the builder inverted. */
  private[graft] def srtCues(srt: String): Seq[(Int, Long, Long, String)] = {
    val cueRe =
      ("""(?s)(\d+)\n(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> """ +
        """(\d{2}):(\d{2}):(\d{2}),(\d{3})\n(.*)""").r
    def t(h: String, m: String, sec: String, ms: String): Long =
      h.toLong * 3600000 + m.toLong * 60000 + sec.toLong * 1000 + ms.toLong
    srt.split("\n\n").toSeq.filter(_.trim.nonEmpty).map {
      case cueRe(idx, h1, m1, s1, ms1, h2, m2, s2, ms2, text) =>
        (idx.toInt, t(h1, m1, s1, ms1), t(h2, m2, s2, ms2),
          text.stripSuffix("\n"))
    }
  }

  /** m19: SRT SUBTITLE-TRACK PARSE + TIMING AUDIT — the sixth
    * container leg, on the TEXT side of multimodal corpora: most
    * video ships with a SubRip transcript, and an ASR/caption
    * curation pass parses it back to cue timings before alignment,
    * filtering on reading speed (chars/sec — the broadcast
    * accessibility limit) and cue overlap (the malformed-track
    * signal). Each doc renders a real SRT track ([[buildSrt]]) and
    * [[srtCues]] parses it back GENERICALLY (regex over the public
    * format — a parser that misreads any timestamp field or drops
    * a cue breaks the hash gate, since the oracle re-derives every
    * timing arithmetically from the payload characters). Output
    * per cue: parsed start/end ms, caption length, reading speed
    * in permille chars/sec (integral division, non-negative), and
    * whether the cue overlaps the next (end > next start).
    *
    * Scale: build+parse fused in ONE narrow flatMap stage — zero
    * shuffles (the m7/m17 decode-fleet shape); track text never
    * leaves the stage.
    */
  def m19(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 1)
      .selectExpr("doc_id",
        "rpad(concat('SRT', substring(text, 1, 61)), 64, ' ') AS s")
      .as[(Long, String)]
      .flatMap { case (id, s) =>
        val n = (4 + id % 5).toInt
        val cues = srtCues(buildSrt(s, n))
        cues.zipWithIndex.map { case ((idx, st, en, tx), k) =>
          val dur = en - st
          val ov =
            if (k + 1 < cues.size && en > cues(k + 1)._2) 1L else 0L
          (id, idx.toLong, st, en, tx.length.toLong,
            tx.length.toLong * 1000000L / dur, ov)
        }
      }
      .toDF("doc_id", "cue_idx", "start_ms", "end_ms", "n_chars",
        "cps_permille", "overlaps_next")
      .transform(graft.Tables.ordered(_, $"doc_id", $"cue_idx"))
  }

  /** m19 oracle: every cue timing, length, reading speed and
    * overlap flag re-derived arithmetically from the payload
    * characters (the m13/m17 construction-oracle idiom). */
  val m19Sql: String =
    """WITH p AS (SELECT doc_id,
      |        rpad(concat('SRT', substring(text, 1, 61)), 64, ' ') AS s,
      |        CAST(4 + doc_id % 5 AS BIGINT) AS n
      |      FROM documents WHERE doc_id % 3 = 1),
      |c AS (SELECT doc_id, n, CAST(i AS BIGINT) AS i, s,
      |        ord(substr(s, CAST(i AS INT), 1)) AS ch
      |      FROM p, generate_series(1, 8) g(i) WHERE i <= n),
      |m AS (SELECT doc_id, n, i,
      |        (i - 1) * 2000 + (ch & 1023) AS start_ms,
      |        800 + ((ch * 7) & 127) * 12 AS dur,
      |        CAST(10 + (ch & 7) AS BIGINT) AS nch,
      |        CASE WHEN i < n THEN i * 2000 +
      |          (ord(substr(s, CAST(i + 1 AS INT), 1)) & 1023) END AS next_start
      |      FROM c)
      |SELECT doc_id, i AS cue_idx, CAST(start_ms AS BIGINT) AS start_ms,
      |  CAST(start_ms + dur AS BIGINT) AS end_ms, nch AS n_chars,
      |  CAST((nch * 1000000) // dur AS BIGINT) AS cps_permille,
      |  CAST(CASE WHEN next_start IS NOT NULL AND start_ms + dur > next_start
      |    THEN 1 ELSE 0 END AS BIGINT) AS overlaps_next
      |FROM m
      |ORDER BY doc_id, cue_idx""".stripMargin

  // ---------- m20: frame→caption alignment ----------

  /** m20: FRAME→CAPTION ALIGNMENT — the multimodal JOIN the
    * vision-language literature trains on: pair every sampled video
    * frame with the caption active at its timestamp (CLIP-style
    * image–text pairs from video+subtitles; the frame grain of m3
    * composed with the cue grain of m19). Semantics: a frame at t
    * is captioned by the cue with the LARGEST start ≤ t whose end
    * is still > t (the as-of rule — when malformed cues overlap,
    * the most recent wins), else uncaptioned (cue_idx = −1) — the
    * coverage gaps are exactly what a captioning pipeline routes to
    * ASR backfill. Cues come through the REAL parser
    * ([[srtCues]] over [[buildSrt]] — the m19 path, so a parser
    * regression breaks this query too); frames tick every 200 ms (the
    * clock was tightened from 400 ms after measuring that NO frame
    * ever landed inside an overlap window at any scale — the as-of
    * rule would have shipped untested; at 200 ms every scale
    * exercises it, spec-pinned).
    *
    * Scale shape: a VARIABLE-WIDTH interval join — BandJoinRewrite
    * needs fixed bands, so this is the q26 bucketed sweep instead:
    * cue length is ≤ 2324 ms < 4096, so each cue spans ≤ 2 buckets;
    * cues explode to their covered buckets, frames key by their
    * bucket, and ONE (doc, bucket) equality join + row-local
    * predicate replaces the theta join (the oracle, running on one
    * node, states the theta join directly — same rows). Argmax by
    * (start, idx) is a max + pk join-back (starts are strictly
    * increasing per doc). Everything shuffles id+ms rows only.
    */
  def m20(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = 4096L
    val docs = Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 1)
      .selectExpr("doc_id",
        "rpad(concat('SRT', substring(text, 1, 61)), 64, ' ') AS s")
      .as[(Long, String)].cache()
    val cues = docs.flatMap { case (id, s) =>
      srtCues(buildSrt(s, (4 + id % 5).toInt)).map { case (idx, st, en, _) =>
        (id, idx.toLong, st, en)
      }
    }.toDF("doc_id", "cue_idx", "cue_start", "cue_end")
    val frames = docs.flatMap { case (id, s) =>
      val nf = 2 * (20 + (s.charAt(4).toInt & 15))
      (0 until nf).map(f => (id, f.toLong, f * 200L))
    }.toDF("doc_id", "frame_idx", "t")
    val cueB = cues.withColumn("bkt",
        explode(expr(s"sequence(cue_start div $bucket, (cue_end - 1) div $bucket)")))
    val frameB = frames.withColumn("bkt", expr(s"t div $bucket"))
    val cand = frameB.join(cueB, Seq("doc_id", "bkt"))
      .filter($"cue_start" <= $"t" && $"t" < $"cue_end")
    val best = cand.groupBy($"doc_id", $"frame_idx")
      .agg(max($"cue_start").as("cs"))
      .join(cues.select($"doc_id", $"cue_start".as("cs"), $"cue_idx"),
        Seq("doc_id", "cs"))
    frames.join(best.select($"doc_id", $"frame_idx", $"cue_idx"),
        Seq("doc_id", "frame_idx"), "left")
      .selectExpr("doc_id", "frame_idx", "t AS frame_ms",
        "coalesce(cue_idx, CAST(-1 AS BIGINT)) AS cue_idx",
        "CAST(CASE WHEN cue_idx IS NULL THEN 0 ELSE 1 END AS BIGINT) AS covered")
      .transform(graft.Tables.ordered(_, $"doc_id", $"frame_idx"))
  }

  /** m20 oracle: m19's cue arithmetic + the 200 ms frame clock and
    * the direct theta interval join with the same as-of argmax. The
    * per-doc frame count reads the 2nd DOCUMENT character (index 4
    * past the constant 'SRT' prefix) so clip lengths genuinely vary
    * per document, 40..70 frames. */
  val m20Sql: String =
    """WITH p AS (SELECT doc_id,
      |        rpad(concat('SRT', substring(text, 1, 61)), 64, ' ') AS s,
      |        CAST(4 + doc_id % 5 AS BIGINT) AS n,
      |        2 * (20 + (ord(substr(s, 5, 1)) & 15)) AS nf
      |      FROM documents WHERE doc_id % 3 = 1),
      |cu AS (SELECT doc_id, CAST(i AS BIGINT) AS cue_idx,
      |        (i - 1) * 2000 + (ord(substr(s, CAST(i AS INT), 1)) & 1023) AS start_ms,
      |        (i - 1) * 2000 + (ord(substr(s, CAST(i AS INT), 1)) & 1023)
      |          + 800 + ((ord(substr(s, CAST(i AS INT), 1)) * 7) & 127) * 12 AS end_ms
      |      FROM p, generate_series(1, 8) g(i) WHERE i <= n),
      |fr AS (SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |        CAST(f * 200 AS BIGINT) AS t
      |      FROM p, generate_series(0, 80) q(f) WHERE f < nf),
      |cand AS (SELECT f.doc_id, f.frame_idx, c.cue_idx, c.start_ms
      |      FROM fr f JOIN cu c ON c.doc_id = f.doc_id
      |        AND c.start_ms <= f.t AND f.t < c.end_ms),
      |best AS (SELECT doc_id, frame_idx, max(start_ms) AS cs
      |      FROM cand GROUP BY 1, 2),
      |sel AS (SELECT b.doc_id, b.frame_idx, c.cue_idx
      |      FROM best b JOIN cu c ON c.doc_id = b.doc_id AND c.start_ms = b.cs)
      |SELECT f.doc_id, f.frame_idx, f.t AS frame_ms,
      |  CAST(coalesce(s.cue_idx, -1) AS BIGINT) AS cue_idx,
      |  CAST(CASE WHEN s.cue_idx IS NULL THEN 0 ELSE 1 END AS BIGINT) AS covered
      |FROM fr f LEFT JOIN sel s ON s.doc_id = f.doc_id AND s.frame_idx = f.frame_idx
      |ORDER BY f.doc_id, f.frame_idx""".stripMargin

  // ---------- m21: WARC record walk ----------

  /** Render a minimal WARC 1.0 file (ISO 28500) for one document:
    * warcinfo + request + response records, each a version line,
    * CRLF-terminated named headers, a blank line, `Content-Length`
    * block bytes and the two-CRLF record terminator. The response
    * block is an HTTP/1.1 message whose body is a
    * document-derived payload (40 + id % 24 chars of the padded
    * text) — so every field the walker recovers is
    * document-dependent, not constant. */
  private[graft] def buildWarc(id: Long, s: String): String = {
    val crlf = "\r\n"
    val plen = (40 + id % 24).toInt
    val payload = s.substring(0, plen)
    val blocks = Seq(
      ("warcinfo",
        "software: graft/1.0" + crlf + "format: WARC file version 1.0",
        false),
      ("request",
        s"GET /doc/$id HTTP/1.1" + crlf + "Host: example.org" + crlf + crlf,
        true),
      ("response",
        "HTTP/1.1 200 OK" + crlf + "Content-Type: text/plain" + crlf + crlf
          + payload,
        true))
    blocks.zipWithIndex.map { case ((t, block, uri), i) =>
      val hdrs = Seq(s"WARC-Type: $t", s"WARC-Record-ID: <urn:graft:$id/$i>",
        "WARC-Date: 2026-01-01T00:00:00Z") ++
        (if (uri) Seq(s"WARC-Target-URI: http://example.org/doc/$id")
         else Seq.empty) ++
        Seq(s"Content-Length: ${block.length}")
      "WARC/1.0" + crlf + hdrs.mkString(crlf) + crlf + crlf + block +
        crlf + crlf
    }.mkString
  }

  private[graft] case class WarcRec(recIdx: Long, recType: String,
      contentLength: Long, nHeaders: Long, versionOk: Long, blockOk: Long,
      firstByte: Long, lastByte: Long, httpStatus: Long)

  /** Walk a WARC file generically — the REAL parser, not the
    * builder inverted: version-line check, header scan to the
    * blank line, `Content-Length`-delimited block read, terminator
    * check, HTTP status sniff on the block. The walk is
    * best-effort under corruption (the trust checks a crawl
    * pipeline needs): a bad length or missing terminator flags the
    * record and HALTS — record boundaries downstream of a length
    * lie are unrecoverable, which is exactly why the accounting
    * gate exists. */
  private[graft] def warcRecords(w: String): Seq[WarcRec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRec]
    var pos = 0
    var idx = 0L
    var halt = false
    def line(): String = {
      val e = w.indexOf("\r\n", pos)
      if (e < 0) { halt = true; val r = w.substring(pos); pos = w.length; r }
      else { val r = w.substring(pos, e); pos = e + 2; r }
    }
    while (!halt && pos < w.length) {
      val vOk = if (line() == "WARC/1.0") 1L else 0L
      val hdrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var l = line()
      while (!halt && l.nonEmpty) {
        val c = l.indexOf(": ")
        if (c > 0) hdrs(l.substring(0, c)) = l.substring(c + 2)
        l = line()
      }
      val cl = hdrs.get("Content-Length").flatMap(_.toLongOption).getOrElse(-1L)
      val t = hdrs.getOrElse("WARC-Type", "?")
      if (cl < 0 || pos + cl > w.length) {
        out += WarcRec(idx, t, cl, hdrs.size.toLong, vOk, 0L, -1L, -1L, -1L)
        halt = true
      } else {
        val block = w.substring(pos, pos + cl.toInt)
        pos += cl.toInt
        val term = pos + 4 <= w.length && w.substring(pos, pos + 4) == "\r\n\r\n"
        if (term) pos += 4
        val status =
          if (block.startsWith("HTTP/1.1 ") && block.length >= 12)
            block.substring(9, 12).toLongOption.getOrElse(-1L)
          else -1L
        out += WarcRec(idx, t, cl, hdrs.size.toLong, vOk,
          if (term) 1L else 0L,
          if (cl > 0) block.head.toLong else -1L,
          if (cl > 0) block.last.toLong else -1L, status)
        if (!term) halt = true
      }
      idx += 1
    }
    out.toSeq
  }

  /** m21: WARC RECORD WALK — the container leg for the format crawl
    * corpora actually SHIP IN: WARC 1.0 (ISO 28500) is what
    * CommonCrawl, Heritrix and every archival crawler write, and a
    * 100 TB text pipeline's first storage-side trust boundary is
    * "does each record's Content-Length account for its block, is
    * the terminator where the length says, does the HTTP payload
    * start where the headers end". Per document this renders a
    * minimal 3-record WARC ([[buildWarc]] — warcinfo + request +
    * response with a document-derived payload) and walks it with
    * the generic parser ([[warcRecords]] — m14/m16/m18's
    * render-then-really-parse idiom): per record the type, the
    * declared Content-Length, header count, version/terminator
    * gates, first/last block bytes (the content-plumbing witness)
    * and the sniffed HTTP status. The oracle re-derives every
    * field arithmetically from the same construction (the m13/m17
    * construction-oracle idiom); the spec corrupts bytes —
    * truncation, a wrecked version line, a LYING Content-Length —
    * and proves each gate bites.
    *
    * Scale shape: ONE narrow flatMap fuses render + walk (zero
    * shuffles before the ordered output); blocks never leave the
    * stage — only the per-record audit rows (10 small columns)
    * move. At 100 TB: this is a scan-shaped audit over `binaryFile`
    * WARC segments, embarrassingly parallel by file split.
    */
  def m21(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 2)
      .selectExpr("doc_id", "rpad(substring(text, 1, 63), 63, ' ') AS s")
      .as[(Long, String)]
      .flatMap { case (id, s) =>
        warcRecords(buildWarc(id, s)).map(r =>
          (id, r.recIdx, r.recType, r.contentLength, r.nHeaders,
            r.versionOk, r.blockOk, r.firstByte, r.lastByte, r.httpStatus))
      }
      .toDF("doc_id", "rec_idx", "rec_type", "content_length", "n_headers",
        "version_ok", "block_ok", "first_byte", "last_byte", "http_status")
      .transform(graft.Tables.ordered(_, $"doc_id", $"rec_idx"))
  }

  /** m21 oracle: every record field re-derived arithmetically from
    * the construction — the lengths are computed from the SAME
    * header/block strings the builder renders (string
    * concatenation, not copied constants), so a builder drift
    * breaks the gate. */
  val m21Sql: String = {
    val crlf = "chr(13) || chr(10)"
    s"""WITH p AS (SELECT doc_id,
      |        rpad(substring(text, 1, 63), 63, ' ') AS s,
      |        CAST(40 + doc_id % 24 AS BIGINT) AS plen
      |      FROM documents WHERE doc_id % 3 = 2),
      |r0 AS (SELECT doc_id, CAST(0 AS BIGINT) AS rec_idx,
      |        'warcinfo' AS rec_type,
      |        CAST(length('software: graft/1.0' || $crlf ||
      |          'format: WARC file version 1.0') AS BIGINT) AS content_length,
      |        CAST(4 AS BIGINT) AS n_headers, CAST(1 AS BIGINT) AS version_ok,
      |        CAST(1 AS BIGINT) AS block_ok,
      |        CAST(ord('s') AS BIGINT) AS first_byte,
      |        CAST(ord('0') AS BIGINT) AS last_byte,
      |        CAST(-1 AS BIGINT) AS http_status
      |      FROM p),
      |r1 AS (SELECT doc_id, CAST(1 AS BIGINT), 'request',
      |        CAST(length('GET /doc/' || CAST(doc_id AS VARCHAR) ||
      |          ' HTTP/1.1' || $crlf || 'Host: example.org' || $crlf ||
      |          $crlf) AS BIGINT),
      |        CAST(5 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
      |        CAST(ord('G') AS BIGINT), CAST(10 AS BIGINT),
      |        CAST(-1 AS BIGINT)
      |      FROM p),
      |r2 AS (SELECT doc_id, CAST(2 AS BIGINT), 'response',
      |        CAST(length('HTTP/1.1 200 OK' || $crlf ||
      |          'Content-Type: text/plain' || $crlf || $crlf) AS BIGINT)
      |          + plen,
      |        CAST(5 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
      |        CAST(ord('H') AS BIGINT),
      |        CAST(ord(substr(s, CAST(plen AS INT), 1)) AS BIGINT),
      |        CAST(200 AS BIGINT)
      |      FROM p)
      |SELECT * FROM (
      |  SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL
      |  SELECT * FROM r2)
      |ORDER BY doc_id, rec_idx""".stripMargin
  }

  // ---------- m22: WebDataset TAR shard walk ----------

  /** The NUL byte as a char — kept out of string literals so the
    * source file stays text (and clear of Scala's pre-lexer \\u
    * processing). */
  private val nul: Char = 0.toChar

  /** One POSIX ustar header (512 chars; every char code IS the byte
    * value — the fixture is pure ASCII/NUL) with the checksum
    * computed the way tar defines it: sum of all header bytes with
    * the chksum field read as eight spaces, stored as six octal
    * digits + NUL + space. */
  private def tarHeader(name: String, size: Long): String = {
    def pad(s: String, n: Int): String =
      if (s.length >= n) s.substring(0, n) else s + nul.toString * (n - s.length)
    def oct(v: Long, digits: Int): String = {
      val o = java.lang.Long.toOctalString(v)
      ("0" * (digits - o.length)) + o + nul
    }
    val pre = pad(name, 100) + "0000644" + nul + oct(0, 7) + oct(0, 7) +
      oct(size, 11) + oct(0, 11)
    val post = "0" + nul.toString * 100 + "ustar" + nul + "00" +
      (nul.toString * 32) + (nul.toString * 32) + oct(0, 7) + oct(0, 7) +
      (nul.toString * 155)
    val withSpaces = pre + "        " + post
    val full = pad(withSpaces, 512)
    val sum = full.map(_.toInt).sum
    val chk = java.lang.Long.toOctalString(sum)
    val chkField = ("0" * (6 - chk.length)) + chk + nul + " "
    full.substring(0, 148) + chkField + full.substring(156)
  }

  /** Render a WebDataset-style TAR shard for one document: two
    * samples, each a (key.txt, key.cls) member pair — text payload
    * plus its label, the grouping contract WebDataset readers
    * stream training samples by. Content blocks NUL-padded to 512;
    * the archive ends with two zero blocks. */
  private[graft] def buildTar(id: Long, s: String): String = {
    val la = (30 + id % 17).toInt
    val lb = (20 + id % 13).toInt
    val members = Seq(
      (s"${id}a.txt", s.substring(0, la)),
      (s"${id}a.cls", ((id % 10)).toString),
      (s"${id}b.txt", s.substring(0, lb)),
      (s"${id}b.cls", ((id % 7)).toString))
    members.map { case (n, body) =>
      val padded = body + nul.toString * ((512 - body.length % 512) % 512)
      tarHeader(n, body.length.toLong) + padded
    }.mkString + (nul.toString * 1024)
  }

  private[graft] case class TarMember(idx: Long, name: String, ext: String,
      key: String, size: Long, chksumOk: Long, magicOk: Long,
      off: Long = 0L)

  /** Walk a TAR archive generically — header checksum recomputed
    * (chksum field as spaces, per the ustar definition), octal size
    * parse, ustar magic gate, 512-byte content alignment, and the
    * two-zero-block end marker. A malformed size field halts the
    * walk (downstream offsets are unrecoverable — the accounting
    * gate, m21's discipline). Returns the members and whether the
    * end marker was found where the sizes said it would be. */
  private[graft] def tarMembers(t: String): (Seq[TarMember], Long) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TarMember]
    var pos = 0
    var idx = 0L
    var endOk = 0L
    var halt = false
    while (!halt && pos + 512 <= t.length) {
      val hdr = t.substring(pos, pos + 512)
      if (hdr.forall(_ == nul)) {
        // end marker: TWO zero blocks required
        endOk = if (pos + 1024 <= t.length &&
          t.substring(pos + 512, pos + 1024).forall(_ == nul)) 1L else 0L
        halt = true
      } else {
        val name = hdr.substring(0, 100).takeWhile(_ != nul)
        val sizeStr = hdr.substring(124, 135).takeWhile(c => c != nul && c != ' ')
        val size = try java.lang.Long.parseLong(sizeStr, 8)
          catch { case _: NumberFormatException => -1L }
        val magicOk =
          if (hdr.substring(257, 263) == "ustar" + nul) 1L else 0L
        val stated = hdr.substring(148, 154)
        val recomputed = (hdr.substring(0, 148) + "        " +
          hdr.substring(156)).map(_.toInt).sum
        val chksumOk =
          if (stated.forall(c => c >= '0' && c <= '7') &&
            java.lang.Long.parseLong(stated, 8) == recomputed.toLong) 1L
          else 0L
        val dot = name.lastIndexOf('.')
        val (key, ext) =
          if (dot > 0) (name.substring(0, dot), name.substring(dot + 1))
          else (name, "")
        out += TarMember(idx, name, ext, key, size, chksumOk, magicOk,
          pos.toLong)
        // a size the archive cannot contain is a lie — halt, the
        // downstream offsets are unrecoverable (and never let a
        // huge field overflow the block arithmetic)
        if (size < 0 || size > (t.length - pos - 512).toLong) halt = true
        else pos += 512 + ((size.toInt + 511) / 512) * 512
        idx += 1
      }
    }
    (out.toSeq, endOk)
  }

  /** m22: WEBDATASET TAR-SHARD WALK — the container leg for the
    * format multimodal TRAINING DATA actually ships in: WebDataset
    * (tar shards whose members group into samples by key —
    * `000123.jpg` + `000123.txt` + `000123.cls`) is the standard
    * streaming shard layout for large-scale image-text training
    * (LAION, DataComp distribute exactly this), and tar itself
    * (POSIX ustar) is the archival substrate. The trust boundary a
    * 100 TB shard store audits per member: does the header
    * CHECKSUM verify (sum of header bytes with the chksum field as
    * spaces — the ustar definition), does the octal size field
    * place the next header on its 512-byte boundary, is the magic
    * present, do the shard's members GROUP into complete samples,
    * and is the two-zero-block end marker where the sizes say.
    * Per document this renders a 2-sample shard ([[buildTar]] —
    * each sample a .txt payload + .cls label, document-derived
    * sizes) and walks it generically ([[tarMembers]] — the
    * m14/m16/m18/m21 render-then-really-parse idiom). Oracle:
    * every field re-derived arithmetically from the construction;
    * the spec corrupts a header byte, the magic, a size field and
    * the end marker — each gate bites.
    *
    * Scale shape: ONE narrow flatMap fuses render + walk, zero
    * shuffles; at 100 TB this is the binaryFile-split shard audit
    * a WebDataset ingest runs before training readers stream the
    * shards — embarrassingly parallel, payload bytes never leave
    * the stage.
    */
  def m22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 0)
      .selectExpr("doc_id", "rpad(substring(text, 1, 61), 61, ' ') AS s")
      .as[(Long, String)]
      .flatMap { case (id, s) =>
        val (ms, endOk) = tarMembers(buildTar(id, s))
        ms.map(m => (id, m.idx, m.name, m.ext, m.key, m.size,
          m.chksumOk, m.magicOk, endOk))
      }
      .toDF("doc_id", "member_idx", "name", "ext", "key", "size",
        "chksum_ok", "magic_ok", "end_ok")
      .transform(graft.Tables.ordered(_, $"doc_id", $"member_idx"))
  }

  /** m22 oracle: the four members' names, keys, extensions and
    * document-derived sizes re-derived arithmetically; the header
    * gates pin known-healthy structure (the m13/m17
    * construction-oracle idiom — the spec corrupts bytes to prove
    * each gate bites). */
  val m22Sql: String =
    """WITH p AS (SELECT doc_id,
      |        CAST(30 + doc_id % 17 AS BIGINT) AS la,
      |        CAST(20 + doc_id % 13 AS BIGINT) AS lb
      |      FROM documents WHERE doc_id % 3 = 0),
      |m AS (
      |  SELECT doc_id, 0 AS idx,
      |    CAST(doc_id AS VARCHAR) || 'a.txt' AS name, 'txt' AS ext,
      |    CAST(doc_id AS VARCHAR) || 'a' AS key, la AS size FROM p
      |  UNION ALL SELECT doc_id, 1, CAST(doc_id AS VARCHAR) || 'a.cls',
      |    'cls', CAST(doc_id AS VARCHAR) || 'a', 1 FROM p
      |  UNION ALL SELECT doc_id, 2, CAST(doc_id AS VARCHAR) || 'b.txt',
      |    'txt', CAST(doc_id AS VARCHAR) || 'b', lb FROM p
      |  UNION ALL SELECT doc_id, 3, CAST(doc_id AS VARCHAR) || 'b.cls',
      |    'cls', CAST(doc_id AS VARCHAR) || 'b', 1 FROM p)
      |SELECT doc_id, CAST(idx AS BIGINT) AS member_idx, name, ext, key,
      |  size, CAST(1 AS BIGINT) AS chksum_ok, CAST(1 AS BIGINT) AS magic_ok,
      |  CAST(1 AS BIGINT) AS end_ok
      |FROM m
      |ORDER BY doc_id, member_idx""".stripMargin

  // ---------- m24: WebDataset shard-level sample audit ----------

  /** Render the corpus-under-audit variant of [[buildTar]]: the same
    * two-sample WebDataset shard, with the two defect classes a
    * shard-store audit exists to catch planted DETERMINISTICALLY in
    * the bytes — every `doc_id % 7 = 0` shard ships sample b WITHOUT
    * its `.cls` label (an incomplete sample: the training reader
    * would throw or silently drop it), and every `doc_id % 11 = 0`
    * shard names sample b's key the literal `dup` (the SAME key in
    * every such shard — a cross-shard key collision, the bug that
    * makes resumable/deduplicating readers skip or double-count). */
  private[graft] def buildTar24(id: Long, s: String): String = {
    val la = (30 + id % 17).toInt
    val lb = (20 + id % 13).toInt
    val bKey = if (id % 11 == 0) "dup" else s"${id}b"
    val members = Seq(
      (s"${id}a.txt", s.substring(0, la)),
      (s"${id}a.cls", (id % 10).toString),
      (s"$bKey.txt", s.substring(0, lb))) ++
      (if (id % 7 == 0) Seq.empty
       else Seq((s"$bKey.cls", (id % 7).toString)))
    members.map { case (n, body) =>
      val padded = body + nul.toString * ((512 - body.length % 512) % 512)
      tarHeader(n, body.length.toLong) + padded
    }.mkString + (nul.toString * 1024)
  }

  /** m24: WEBDATASET SHARD-LEVEL SAMPLE AUDIT — the corpus-grain
    * follow-up m22's per-member walk feeds: BEFORE training readers
    * stream a shard store, the audit LAION-scale stores actually run
    * is (1) do every sample's members form a COMPLETE extension set
    * (a `.txt` without its `.cls` is a sample the loader drops or
    * throws on), and (2) is every sample key UNIQUE ACROSS SHARDS
    * (cross-shard collisions break resumable readers and dedup
    * accounting). Walks each document's shard ([[buildTar24]] — both
    * defect classes planted in the bytes), then aggregates the
    * member rows to the sample grain (doc, key → extension set,
    * completeness) and the key grain (distinct shards per key →
    * collision flag) — two equality-keyed map-side-combinable
    * aggregates over columns the walk already emits, joined back on
    * the key.
    *
    * Scale: the walk is m22's narrow flatMap (zero shuffles, bytes
    * never leave the stage); the audit adds exactly two combinable
    * aggregates + one key-equality join — at 100 TB the key-grain
    * table is samples-sized (id + count only, no payloads) and the
    * whole audit is the d1-class single-shuffle shape.
    */
  def m24(spark: SparkSession, dir: String): DataFrame =
    shardAudit(shardMembers(Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 0)
      .selectExpr("doc_id", "rpad(substring(text, 1, 61), 61, ' ') AS s")))

  /** The member walk of [[m24]] factored over an arbitrary
    * (doc_id, s) frame — the streaming shard-ingest door (s41)
    * walks each micro-batch's arriving shards through the identical
    * code. */
  private[graft] def shardMembers(shards: DataFrame): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col("doc_id"), col("s")).as[(Long, String)]
      .flatMap { case (id, s) =>
        val (ms, _) = tarMembers(buildTar24(id, s))
        ms.map(m => (id, m.key, m.ext))
      }.toDF("doc_id", "skey", "ext")
  }

  /** The audit aggregates of [[m24]] factored over an arbitrary
    * member frame — sample grain (extension-set completeness) and
    * key grain (distinct shards per key), joined on the key. */
  private[graft] def shardAudit(members: DataFrame): DataFrame = {
    val spark = members.sparkSession
    import spark.implicits._
    val samp = members.groupBy($"doc_id", $"skey")
      .agg(count(lit(1)).as("n_members"),
        (max(when($"ext" === "txt", 1).otherwise(0)) === 1).as("has_txt"),
        (max(when($"ext" === "cls", 1).otherwise(0)) === 1).as("has_cls"))
    val kg = members.groupBy($"skey")
      .agg(countDistinct($"doc_id").as("n_shards"))
    samp.join(kg, Seq("skey"))
      .selectExpr("doc_id", "skey", "n_members", "has_txt", "has_cls",
        "has_txt AND has_cls AS complete", "n_shards",
        "n_shards > 1 AS cross_shard")
      .transform(graft.Tables.ordered(_, $"doc_id", $"skey"))
  }

  /** m24 oracle: the member inventory re-derived arithmetically from
    * the construction (the m22 idiom), then the SAME two aggregates
    * as plain GROUP BYs. */
  val m24Sql: String =
    """WITH p AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
      |mem AS (
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) || 'a' AS skey, 'txt' AS ext FROM p
      |  UNION ALL SELECT doc_id, CAST(doc_id AS VARCHAR) || 'a', 'cls' FROM p
      |  UNION ALL SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN 'dup'
      |         ELSE CAST(doc_id AS VARCHAR) || 'b' END, 'txt' FROM p
      |  UNION ALL SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN 'dup'
      |         ELSE CAST(doc_id AS VARCHAR) || 'b' END, 'cls' FROM p
      |    WHERE doc_id % 7 <> 0),
      |samp AS (SELECT doc_id, skey, CAST(count(*) AS BIGINT) AS n_members,
      |    max(CASE WHEN ext = 'txt' THEN 1 ELSE 0 END) = 1 AS has_txt,
      |    max(CASE WHEN ext = 'cls' THEN 1 ELSE 0 END) = 1 AS has_cls
      |  FROM mem GROUP BY 1, 2),
      |kg AS (SELECT skey, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_shards
      |  FROM mem GROUP BY 1)
      |SELECT s.doc_id, s.skey, s.n_members, s.has_txt, s.has_cls,
      |  (s.has_txt AND s.has_cls) AS complete, k.n_shards,
      |  k.n_shards > 1 AS cross_shard
      |FROM samp s JOIN kg k ON k.skey = s.skey
      |ORDER BY s.doc_id, s.skey""".stripMargin

  // ---------- m26: WebDataset shard byte-offset index ----------

  /** Render the multi-block shard variant the index op needs:
    * sample a's text member is 400 + (id%17)·20 bytes (up to 720 —
    * crossing the 512-byte block boundary for most documents, so
    * the ceil-to-block offset arithmetic is genuinely exercised,
    * not constant), its label 1 byte; sample b a short text + label
    * (single-block members — both arithmetic arms on the data). */
  private[graft] def buildTar26(id: Long, s: String): String = {
    val sa = (400 + (id % 17) * 20).toInt
    val sb = (30 + id % 13).toInt
    val long = (s * 12).substring(0, sa)
    val members = Seq(
      (s"${id}a.txt", long),
      (s"${id}a.cls", (id % 10).toString),
      (s"${id}b.txt", s.substring(0, sb)),
      (s"${id}b.cls", (id % 7).toString))
    members.map { case (n, body) =>
      val padded = body + nul.toString * ((512 - body.length % 512) % 512)
      tarHeader(n, body.length.toLong) + padded
    }.mkString + (nul.toString * 1024)
  }

  /** m26: SHARD BYTE-OFFSET INDEX — the `.idx` sidecar WebDataset
    * readers build so training can SEEK into tar shards instead of
    * streaming them head-to-tail (random access is what makes
    * shuffled multi-epoch reading affordable: resume, sample, and
    * shard-parallel decode all address members by offset). The
    * index row per member is (header offset, data offset = header +
    * 512, size), read off the REAL walk — the same ustar
    * block-accounting walk as m22, whose position IS the offset —
    * over a multi-block fixture ([[buildTar26]] — member sizes
    * cross the 512 boundary, so ceil-to-block arithmetic is
    * genuinely on the data). The ORACLE re-derives every offset
    * arithmetically from the size formulas (header + ⌈size/512⌉
    * blocks, the construction-oracle idiom), and the spec pins the
    * SEEK CONTRACT itself: the bytes at [data_offset, data_offset +
    * size) are exactly the member's body.
    *
    * Scale: render+walk+index in ONE narrow flatMap, zero shuffles
    * — the index build is a single pass over each shard, and the
    * index table (offsets + sizes, no payloads) is what ships to
    * the readers.
    */
  def m26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 0)
      .selectExpr("doc_id", "rpad(substring(text, 1, 61), 61, ' ') AS s")
      .as[(Long, String)]
      .flatMap { case (id, s) =>
        val t = buildTar26(id, s)
        val (ms, endOk) = tarMembers(t)
        ms.map(m => (id, m.idx, m.name, m.off, m.off + 512L, m.size,
          t.length.toLong, endOk))
      }
      .toDF("doc_id", "member_idx", "name", "hdr_offset", "data_offset",
        "size", "shard_len", "end_ok")
      .transform(graft.Tables.ordered(_, $"doc_id", $"member_idx"))
  }

  /** m26 oracle: offsets re-derived arithmetically — each member
    * occupies 512 header bytes + ⌈size/512⌉ content blocks; the
    * shard ends with two zero blocks. */
  val m26Sql: String =
    """WITH p AS (SELECT doc_id,
      |        CAST(400 + (doc_id % 17) * 20 AS BIGINT) AS sa,
      |        CAST(30 + doc_id % 13 AS BIGINT) AS sb
      |      FROM documents WHERE doc_id % 3 = 0),
      |m AS (
      |  SELECT doc_id, 0 AS idx, CAST(doc_id AS VARCHAR) || 'a.txt' AS name,
      |    sa AS size, CAST(0 AS BIGINT) AS hdr FROM p
      |  UNION ALL SELECT doc_id, 1, CAST(doc_id AS VARCHAR) || 'a.cls', 1,
      |    512 + ((sa + 511) // 512) * 512 FROM p
      |  UNION ALL SELECT doc_id, 2, CAST(doc_id AS VARCHAR) || 'b.txt', sb,
      |    1024 + ((sa + 511) // 512) * 512 + 512 FROM p
      |  UNION ALL SELECT doc_id, 3, CAST(doc_id AS VARCHAR) || 'b.cls', 1,
      |    1536 + ((sa + 511) // 512) * 512 + 512 + ((sb + 511) // 512) * 512
      |    FROM p),
      |tot AS (SELECT doc_id,
      |    CAST(2048 + ((sa + 511) // 512) * 512 + 512
      |      + ((sb + 511) // 512) * 512 + 512 + 1024 AS BIGINT) AS shard_len
      |  FROM p)
      |SELECT m.doc_id, CAST(m.idx AS BIGINT) AS member_idx, m.name,
      |  CAST(m.hdr AS BIGINT) AS hdr_offset,
      |  CAST(m.hdr + 512 AS BIGINT) AS data_offset, m.size,
      |  tot.shard_len, CAST(1 AS BIGINT) AS end_ok
      |FROM m JOIN tot ON tot.doc_id = m.doc_id
      |ORDER BY m.doc_id, member_idx""".stripMargin
  // ---------- m27: shard random-access fetch (the .idx consumer) ----------

  /** Fetch members from one shard by the `.idx` CONTRACT ALONE:
    * each wanted (name, data_offset, size) maps to the exact
    * [data_offset, data_offset + size) slice — no header is parsed,
    * no other byte is read. This is the reader half of m26's seek
    * promise, factored so the spec can corrupt EVERY byte outside
    * the indexed ranges and prove the fetch can't tell. NB the
    * String-backed shard model bounds one shard at 2^31 chars (a
    * JVM array), so `substring(dataOff.toInt, …)` is exact only for
    * fixture-scale shards; what the operator proves — only the
    * indexed byte ranges are ever read — is representation-
    * independent, and [[m28]] IS the real-bytes leg: the same
    * contract over actual files with Long-offset ranged reads
    * (the 2^31 bound lifted and spec-proven on a > 2 GiB sparse
    * shard). */
  private[graft] def shardFetch(t: String,
      wanted: Seq[(String, Long, Long)]): Seq[(String, Long, String)] =
    wanted.map { case (name, dataOff, size) =>
      (name, size, t.substring(dataOff.toInt, (dataOff + size).toInt))
    }

  /** m27: SHARD RANDOM-ACCESS FETCH — the CONSUMER of m26's seek
    * contract, the read pattern that makes the .idx sidecar worth
    * building: a shuffled training reader (or a resume, or a
    * targeted sample inspection) wants SPECIFIC members of specific
    * shards, and with the index in hand it reads exactly
    * [data_offset, data_offset + size) per wanted member — never a
    * head-to-tail walk. Per shard: build the index once (m26's real
    * block-accounting walk), select the wanted members (the `.txt`
    * payloads — what a text-training reader fetches), slice their
    * exact byte ranges via [[shardFetch]], and emit each fetched
    * body's length and MD5 digest — the digest proves the bytes,
    * and the ORACLE re-derives it from the document text alone
    * (repeat + substring — the m26 construction arithmetic), so a
    * fetch that read even one byte off-range hash-mismatches.
    *
    * Scale: index+fetch fused in ONE narrow flatMap — zero
    * shuffles; at 100 TB the .idx tables are what ship to readers
    * and each fetch is a ranged GET against shard storage, which is
    * exactly what this models (the digest column doubles as the
    * transfer-integrity check such readers run).
    */
  def m27(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 0)
      .selectExpr("doc_id", "rpad(substring(text, 1, 61), 61, ' ') AS s")
      .as[(Long, String)]
      .flatMap { case (id, s) =>
        val t = buildTar26(id, s)
        val (ms, _) = tarMembers(t) // the .idx build — m26's walk
        val wanted = ms.filter(_.ext == "txt")
          .map(m => (m.name, m.off + 512L, m.size))
        shardFetch(t, wanted).map { case (n, sz, body) =>
          (id, n, sz, body)
        }
      }
      .toDF("doc_id", "name", "size", "body")
      .selectExpr("doc_id", "name", "size",
        "md5(CAST(body AS BINARY)) AS body_md5")
      .transform(graft.Tables.ordered(_, $"doc_id", $"name"))
  }

  /** m27 oracle: the wanted members' names/sizes from m26's size
    * formulas and each body re-derived from the document text
    * (sample a's text is the 12×-repeated document prefix, sample
    * b's the short prefix), digested with the same MD5. */
  val m27Sql: String =
    """WITH p AS (SELECT doc_id,
      |        CAST(400 + (doc_id % 17) * 20 AS BIGINT) AS sa,
      |        CAST(30 + doc_id % 13 AS BIGINT) AS sb,
      |        rpad(substring(text, 1, 61), 61, ' ') AS s
      |      FROM documents WHERE doc_id % 3 = 0),
      |m AS (
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) || 'a.txt' AS name,
      |    sa AS size, substr(repeat(s, 12), 1, CAST(sa AS INTEGER)) AS body
      |  FROM p
      |  UNION ALL
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) || 'b.txt', sb,
      |    substr(s, 1, CAST(sb AS INTEGER)) FROM p)
      |SELECT doc_id, name, size, md5(body) AS body_md5
      |FROM m
      |ORDER BY doc_id, name""".stripMargin

  // ---------- m28: REAL-BYTES ranged shard fetch (the 2^31 lift) ----------

  /** The real-bytes shard store, materialized once per source dir
    * (the q42/s44 memoization posture): every m26 shard rendered to
    * an actual `.tar` FILE of bytes (ISO-8859-1 — the String
    * model's char==byte identity made explicit; the fixtures are
    * ASCII by construction, which is what made m22's bitwise
    * byte-arithmetic oracle possible in the first place), written
    * by the tasks themselves (foreachPartition — one file per
    * shard, the WebDataset layout), with the `.idx` sidecar
    * PERSISTED beside the shards from the same walk — exactly how
    * production shard writers emit their index, and what lets the
    * reader never re-render or re-walk a shard.
    *
    * STORAGE BOUNDARY: the root must be storage every task can
    * reach — here the local FS stands in for the shared
    * FS/object-store mount a WebDataset render fleet actually
    * writes through (tasks writing shards directly to shared
    * storage IS the production shape; the only local-mode-ism is
    * that /tmp happens to be that shared medium). */
  private val shardByteStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def shardByteStorePath(ss: SparkSession, dir: String)
      : String =
    shardByteStores.computeIfAbsent(dir, { _ =>
      import ss.implicits._
      val d = java.nio.file.Files.createTempDirectory("graft_m28_")
        .toFile
      graft.operators.Incremental.cleanupOnExit(d)
      val root = d.getAbsolutePath
      val docs = Tables.documents(ss, dir)
        .filter($"doc_id" % 3 === 0)
        .selectExpr("doc_id", "rpad(substring(text, 1, 61), 61, ' ') AS s")
        .as[(Long, String)]
      docs.foreachPartition { (it: Iterator[(Long, String)]) =>
        it.foreach { case (id, s) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(root, s"shard_$id.tar"),
            buildTar26(id, s).getBytes(
              java.nio.charset.StandardCharsets.ISO_8859_1))
        }
      }
      // the sidecar: offsets from the walk (m26's contract), no
      // payloads — written once with the shards, read forever
      docs.flatMap { case (id, s) =>
        val (ms, _) = tarMembers(buildTar26(id, s))
        ms.filter(_.ext == "txt")
          .map(m => (id, m.name, m.off + 512L, m.size))
      }.toDF("doc_id", "name", "data_off", "size")
        .write.parquet(s"$root/idx")
      root
    })

  /** The Long-offset RANGED READ: seek to each wanted member's
    * data offset and read exactly `size` bytes — the ranged-GET
    * contract with NO 2^31 bound on the SHARD (offsets are Long
    * end-to-end; only a single member must fit an array, which is
    * the same bound any in-memory consumer of one member has). The
    * spec proves the lift with a sparse > 2 GiB file and proves
    * only-indexed-ranges by corrupting every byte outside them. */
  private[graft] def rangedFetch(path: String,
      wanted: Seq[(String, Long, Long)]): Seq[(String, Long, Array[Byte])] = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try wanted.map { case (name, off, size) =>
      // the SHARD is unbounded (Long offsets); one MEMBER must fit
      // an array — refuse loudly rather than let toInt wrap a
      // >= 2^32 size into a silently short read
      require(size <= Int.MaxValue.toLong,
        s"member $name: $size bytes exceeds the single-member array bound")
      raf.seek(off)
      val buf = new Array[Byte](size.toInt)
      raf.readFully(buf)
      (name, size, buf)
    } finally raf.close()
  }

  /** m28: REAL-BYTES SHARD FETCH — m27's only-indexed-ranges
    * contract moved off the String shard model onto ACTUAL FILES
    * of bytes, lifting the documented 2^31 bound
    * (Media.scala m27 NB): the store holds one real `.tar` per
    * shard; the writer emits the `.idx` rows alongside (offset
    * arithmetic identical to m26's walk — it IS that walk, run at
    * render time); and the reader maps each wanted member to one
    * `seek(Long)` + `readFully(size)` — a ranged GET against shard
    * storage, never a head-to-tail stream, never a whole-shard
    * buffer. Each fetched body ships as its MD5 digest, and the
    * oracle ([[m27Sql]] verbatim — the representation change must
    * be invisible) re-derives every digest from the document text
    * alone, so a fetch that read even one byte off-range — or
    * through any lingering char-width confusion — hash-mismatches.
    *
    * Scale: the store write is one pass (per-shard files, the
    * WebDataset layout); fetches shuffle only the .idx rows (no
    * payloads) to group per shard, then each task issues its own
    * ranged reads — at 100 TB this is N readers seeking into
    * object storage with Long offsets, exactly the deployment
    * shape, with per-member transfer and zero full-shard I/O.
    */
  def m28(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = shardByteStorePath(spark, dir)
    // the reader path is MANIFEST-ONLY until the ranged reads: the
    // persisted .idx rows (no payloads) shuffle per shard, then
    // each task issues its own ranged reads — no shard is ever
    // re-rendered, re-walked, or streamed head-to-tail
    spark.read.parquet(s"$root/idx")
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (id: Long, it: Iterator[(Long, String, Long, Long)]) =>
        val wanted = it.map(t => (t._2, t._3, t._4)).toSeq.sortBy(_._1)
        rangedFetch(s"$root/shard_$id.tar", wanted)
          .map { case (n, sz, body) => (id, n, sz, body) }
      }
      .toDF("doc_id", "name", "size", "body")
      .selectExpr("doc_id", "name", "size", "md5(body) AS body_md5")
      .transform(graft.Tables.ordered(_, $"doc_id", $"name"))
  }

  /** m28 oracle: m27's, verbatim — real files, Long offsets and
    * ranged reads must be representation-invisible. */
  val m28Sql: String = m27Sql

  // ---------- m23: EXIF/APP1 metadata walk (the image-PII leg) ----------

  case class ExifMeta(doc_id: Long, exif_ok: Boolean, byte_order: String,
      n_ifd0: Long, orientation: Int, dt_str: String, has_gps: Boolean,
      lat_deg: Long, lat_min: Long, iso: Long, has_maker: Boolean,
      serial: String, has_thumb: Boolean, needs_strip_gps: Boolean,
      needs_strip_time: Boolean, needs_strip_device: Boolean)

  /** Render one minimal-but-real JPEG carrying an APP1/EXIF segment
    * (the public CIPA DC-008 / TIFF 6.0 layout): SOI, then APP1 =
    * big-endian length + "Exif\0\0" + a TIFF structure in a
    * DOCUMENT-CHOSEN byte order ("II" little-endian for even ids,
    * "MM" big-endian for odd — the walker's byte-order gate must
    * genuinely branch on data), magic 42, IFD0 offset, then the
    * full real-world IFD TOPOLOGY the strip surgery must survive:
    * IFD0 with an inline SHORT Orientation (0x0112), an offset
    * ASCII DateTime (0x0132 — data-chosen presence), an Exif
    * sub-IFD pointer (0x8769 — data-chosen; virtually every camera
    * JPEG carries one) whose IFD holds an inline SHORT ISO
    * (0x8827), a data-chosen out-of-line UNDEFINED MakerNote
    * (0x927c, 16 bytes) and a data-chosen ASCII BodySerialNumber
    * (0xA431, 10 bytes), a GPSInfo pointer (0x8825, data-chosen) to
    * a GPS IFD holding GPSLatitudeRef (inline ASCII, never
    * byte-swapped) and a 3-RATIONAL GPSLatitude, and — data-chosen
    * — a NONZERO next-IFD pointer to a thumbnail IFD1 (one inline
    * SHORT Compression 0x0103 entry); then EOI. Layout: all IFDs
    * first (IFD0, Exif, GPS, IFD1), then the packed value area (dt,
    * maker, serial, latitude) — the same canonical packing the
    * strip serializer emits, so strip(render) equals the
    * policy-free render BYTE FOR BYTE. Every field
    * document-derived so the oracle re-derives them arithmetically;
    * the `Some(...)` overrides let the spec render the policy-free
    * twin of any image.
    */
  private[graft] def buildExifJpeg(id: Long, s: String,
      gpsO: Option[Boolean] = None, dtO: Option[Boolean] = None,
      makerO: Option[Boolean] = None, serialO: Option[Boolean] = None)
      : Array[Byte] = {
    def i(b: Boolean): Int = if (b) 1 else 0
    val le = id % 2 == 0
    val orientation = 1 + (s.charAt(4).toInt & 7)
    val gps = gpsO.getOrElse((s.charAt(5).toInt & 1) == 1)
    val mo = 1 + s.charAt(7).toInt % 12
    val dy = 1 + s.charAt(8).toInt % 28
    val dt = f"2024:$mo%02d:$dy%02d 10:30:00" // 19 chars + NUL = 20
    val latDeg = s.charAt(6).toInt % 90
    val latMin = s.charAt(9).toInt % 60
    val hasExif = (s.charAt(11).toInt & 1) == 1
    val hasMaker = hasExif &&
      makerO.getOrElse((s.charAt(12).toInt & 1) == 1)
    val hasSerial = hasExif &&
      serialO.getOrElse((s.charAt(13).toInt & 1) == 1)
    val hasThumb = (s.charAt(14).toInt & 1) == 1
    val hasDt = dtO.getOrElse((s.charAt(15).toInt & 1) == 1)
    val iso = 100 * (1 + s.charAt(16).toInt % 8)
    val serial = f"${id % 1000000000L}%09d" // 9 chars + NUL = 10
    val n0 = 1 + i(hasDt) + i(hasExif) + i(gps)
    val nE = 1 + i(hasMaker) + i(hasSerial)
    // IFDs first, values after — the canonical packing
    val exifOff = 8 + 6 + 12 * n0
    val gpsOff = exifOff + (if (hasExif) 6 + 12 * nE else 0)
    val ifd1Off = gpsOff + (if (gps) 30 else 0)
    val dtOff = ifd1Off + (if (hasThumb) 18 else 0)
    val makerOff = dtOff + (if (hasDt) 20 else 0)
    val serialOff = makerOff + (if (hasMaker) 16 else 0)
    val latOff = serialOff + (if (hasSerial) 10 else 0)
    val tiffLen = latOff + (if (gps) 24 else 0)
    val t = new Array[Byte](tiffLen)
    def w16(p: Int, v: Int): Unit =
      if (le) { t(p) = (v & 0xff).toByte; t(p + 1) = ((v >> 8) & 0xff).toByte }
      else { t(p) = ((v >> 8) & 0xff).toByte; t(p + 1) = (v & 0xff).toByte }
    def w32(p: Int, v: Int): Unit =
      if (le) { w16(p, v & 0xffff); w16(p + 2, v >>> 16) }
      else { w16(p, v >>> 16); w16(p + 2, v & 0xffff) }
    val bom = if (le) 'I' else 'M'
    t(0) = bom.toByte; t(1) = bom.toByte
    w16(2, 42); w32(4, 8) // magic + IFD0 offset
    var ep = 0
    def entry(tag: Int, typ: Int, cnt: Int)(wv: Int => Unit): Unit = {
      w16(ep, tag); w16(ep + 2, typ); w32(ep + 4, cnt); wv(ep + 8); ep += 12
    }
    // IFD0
    w16(8, n0); ep = 10
    entry(0x0112, 3, 1)(p => w16(p, orientation)) // inline SHORT
    if (hasDt) entry(0x0132, 2, 20)(p => w32(p, dtOff))
    if (hasExif) entry(0x8769, 4, 1)(p => w32(p, exifOff))
    if (gps) entry(0x8825, 4, 1)(p => w32(p, gpsOff))
    w32(ep, if (hasThumb) ifd1Off else 0) // next-IFD: thumbnail chain
    // Exif sub-IFD
    if (hasExif) {
      w16(exifOff, nE); ep = exifOff + 2
      entry(0x8827, 3, 1)(p => w16(p, iso)) // inline SHORT ISO
      if (hasMaker) entry(0x927c, 7, 16)(p => w32(p, makerOff))
      if (hasSerial) entry(0xa431, 2, 10)(p => w32(p, serialOff))
      w32(ep, 0)
    }
    // GPS IFD
    if (gps) {
      w16(gpsOff, 2); ep = gpsOff + 2
      entry(0x0001, 2, 2)(p => t(p) = 'N'.toByte) // inline ASCII, raw bytes
      entry(0x0002, 5, 3)(p => w32(p, latOff))
      w32(gpsOff + 26, 0)
    }
    // IFD1 (thumbnail)
    if (hasThumb) {
      w16(ifd1Off, 1); ep = ifd1Off + 2
      entry(0x0103, 3, 1)(p => w16(p, 6)) // inline SHORT Compression
      w32(ifd1Off + 18 - 4, 0)
    }
    // value area, in IFD/entry order
    if (hasDt) dt.getBytes("US-ASCII").copyToArray(t, dtOff) // + NUL (zeroed)
    if (hasMaker) (0 until 16).foreach(j =>
      t(makerOff + j) = ((id + j) % 256).toByte)
    if (hasSerial) serial.getBytes("US-ASCII").copyToArray(t, serialOff)
    if (gps) {
      w32(latOff, latDeg); w32(latOff + 4, 1)
      w32(latOff + 8, latMin); w32(latOff + 12, 1)
      w32(latOff + 16, 0); w32(latOff + 20, 1)
    }
    val app1Len = 2 + 6 + tiffLen
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0xff); bos.write(0xd8)
    bos.write(0xff); bos.write(0xe1)
    bos.write((app1Len >> 8) & 0xff); bos.write(app1Len & 0xff)
    bos.write(Array[Byte]('E', 'x', 'i', 'f', 0, 0)); bos.write(t)
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }

  /** Walk one JPEG's APP1/EXIF tag tables generically — the
    * privacy-audit leg of image curation (orientation, capture
    * time, GPS COORDINATES, camera MakerNote blobs, and body serial
    * numbers are exactly what a training-data ingest must surface
    * and strip; t7 redacts text PII, this covers the image-metadata
    * channel). m21/m22's halting discipline throughout: the
    * byte-order mark gates the whole parse, the TIFF magic is
    * verified, EVERY offset/length read from the untrusted bytes is
    * bounds-checked IN LONG against the segment before use (the
    * ustar size-lie lesson — truncating first would let a lying
    * offset wrap positive), and the next-IFD chain is budget-capped
    * so a pointer cycle can't spin the walk. Any violated gate sets
    * `exif_ok` false and halts. Emits the strip decision PER POLICY
    * CLASS: `needs_strip_gps` (a GPS IFD is present),
    * `needs_strip_time` (a DateTime is present), and
    * `needs_strip_device` (a MakerNote or serial is present).
    */
  private[graft] def exifWalk(docId: Long, b: Array[Byte]): ExifMeta = {
    def u8(p: Int): Int = b(p) & 0xff
    def be16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    var ok = b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8
    var bo = ""; var nIfd0 = 0L; var ori = 0; var dt = ""
    var gps = false; var latDeg = 0L; var latMin = 0L
    var iso = 0L; var maker = false; var serial = ""; var thumb = false
    // strip-decision flags key on TAG PRESENCE, not payload length:
    // a degenerate (count < 2) DateTime/serial entry carries no
    // readable value but IS an entry the policy strip would remove —
    // the audit flag and the surgery's action must agree on it
    var dtTag = false; var serialTag = false
    def parseTiff(t0: Int, tlen: Int): Unit = {
      def in(off: Long, n: Long): Boolean = off >= 0 && off + n <= tlen
      if (!in(0, 8)) { ok = false; return }
      val boS = new String(b, t0, 2, "US-ASCII")
      val le = boS == "II"
      if (!le && boS != "MM") { ok = false; return } // byte-order gate
      bo = boS
      def r16(p: Long): Int =
        if (le) u8(t0 + p.toInt) | (u8(t0 + p.toInt + 1) << 8)
        else (u8(t0 + p.toInt) << 8) | u8(t0 + p.toInt + 1)
      def r32(p: Long): Long =
        if (le) r16(p).toLong | (r16(p + 2).toLong << 16)
        else (r16(p).toLong << 16) | r16(p + 2).toLong
      if (r16(2) != 42) { ok = false; return } // TIFF magic gate
      def readStr(vo: Long, c: Long): String =
        if (!in(vo, c) || c < 1) { ok = false; "" }
        else new String(b, t0 + vo.toInt, c.toInt - 1, "US-ASCII")
      // TIFF stores any value with byteLen <= 4 INLINE in the entry's
      // value field (bytes p+8..p+11) — the walk must read those
      // bytes directly, NEVER dereference them as an offset
      // (stripTiff's inline/out-of-line split, mirrored here so the
      // gates stay symmetric; a c = 0 string reads empty, as the
      // strip keeps such an entry untouched)
      def strValAt(p: Long, c: Long): String =
        if (c < 1) ""
        else if (c <= 4)
          new String(b, t0 + p.toInt + 8, c.toInt - 1, "US-ASCII")
        else readStr(r32(p + 8), c)
      // WALK/STRIP GATE SYMMETRY: the audit and the surgery must
      // accept exactly the same inputs (a file the strip would
      // quarantine must audit unhealthy, and vice versa), so this
      // walk validates EVERY entry the way stripTiff does — known
      // value-type sizes, out-of-line bounds, well-shaped sub-IFD
      // pointers (LONG, count 1, terminating), and one shared
      // total-IFD budget of 8 against pointer cycles at any depth.
      val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 7 -> 1)
      var budget = 8
      // kind: 0 = IFD0/IFD1 chain grain, 1 = GPS, 2 = Exif sub-IFD,
      // 3 = validate-only (Interop); returns the IFD's next pointer
      def parseIfd(off: Long, kind: Int): Long = {
        if (budget <= 0) { ok = false; return 0L }
        budget -= 1
        if (!in(off, 2)) { ok = false; return 0L }
        val cnt = r16(off)
        if (!in(off, 2L + 12L * cnt + 4L)) { ok = false; return 0L }
        var i = 0
        while (ok && i < cnt) {
          val p = off + 2 + 12 * i
          val tag = r16(p); val typ = r16(p + 2); val c = r32(p + 4)
          if (tag == 0x8769 || tag == 0x8825 || tag == 0xa005) {
            // a known sub-IFD pointer, at ANY depth (Interop nests
            // inside the Exif IFD in real files) — strip parity:
            // malformed shape or a non-terminating sub-IFD rejects
            if (typ != 4 || c != 1) ok = false
            else {
              if (tag == 0x8825) gps = true
              val sub = if (tag == 0x8769) 2
                else if (tag == 0x8825) 1 else 3
              val subNext = parseIfd(r32(p + 8), sub)
              if (ok && subNext != 0) ok = false
            }
          } else {
            val sz = typeSize.getOrElse(typ, 0)
            if (sz == 0) ok = false
            else if (sz.toLong * c > 4 && !in(r32(p + 8), sz.toLong * c))
              ok = false
            if (ok) kind match {
              case 0 =>
                if (tag == 0x0112 && typ == 3 && c == 1) ori = r16(p + 8)
                else if (tag == 0x0132 && typ == 2) {
                  dtTag = true; dt = strValAt(p, c)
                }
              case 1 =>
                // GPSLatitude is a rational TRIPLE (deg, min, sec):
                // only c >= 3 has passed the out-of-line bounds gate
                // above (in(vo, 8c) ⊇ the 16 bytes read here). A
                // shorter count is inline-or-short per TIFF — its
                // value field is NOT a pointer, and stripTiff keeps
                // such an entry untouched, so the walk records no
                // coordinate instead of dereferencing (gate
                // symmetry; previously an attacker-controlled value
                // field could crash the walk a strip would accept)
                if (tag == 0x0002 && typ == 5 && c >= 3) {
                  val vo = r32(p + 8)
                  latDeg = r32(vo); latMin = r32(vo + 8)
                }
              case 2 =>
                if (tag == 0x8827 && typ == 3 && c == 1)
                  iso = r16(p + 8).toLong
                else if (tag == 0x927c && typ == 7) maker = true
                else if (tag == 0xa431 && typ == 2) {
                  serialTag = true; serial = strValAt(p, c)
                }
              case _ => ()
            }
          }
          i += 1
        }
        r32(off + 2 + 12 * cnt)
      }
      // the IFD0 → IFD1 → … chain; a lying next offset exhausts the
      // shared budget inside parseIfd and halts, never spins
      var off = r32(4)
      var first = true
      while (ok && off != 0) {
        val cntBefore = if (in(off, 2)) r16(off) else 0
        val next = parseIfd(off, 0)
        if (ok) {
          if (first) { nIfd0 = cntBefore.toLong; first = false }
          else thumb = true
        }
        off = next
      }
    }
    var pos = 2
    var done = false
    while (ok && !done && pos + 2 <= b.length && u8(pos) == 0xff) {
      val typ = u8(pos + 1)
      if (typ == 0xd9) done = true
      else if (pos + 4 > b.length) ok = false
      else {
        val len = be16(pos + 2)
        if (pos + 2 + len > b.length || len < 2) ok = false
        else {
          if (typ == 0xe1 && len >= 16 &&
              new String(b, pos + 4, 4, "US-ASCII") == "Exif" &&
              u8(pos + 8) == 0 && u8(pos + 9) == 0)
            parseTiff(pos + 10, len - 8)
          pos += 2 + len
        }
      }
    }
    if (!done) ok = false // no EOI — truncated container
    // every payload field is GATED on the healthy walk: a
    // quarantine-class input must not leak partially scraped
    // metadata into the audit output (byte_order stays as the gate
    // diagnostic)
    ExifMeta(docId, ok, bo, if (ok) nIfd0 else 0L, if (ok) ori else 0,
      if (ok) dt else "", gps && ok,
      if (ok) latDeg else 0L, if (ok) latMin else 0L,
      if (ok) iso else 0L, maker && ok, if (ok) serial else "",
      thumb && ok, gps && ok, ok && dtTag,
      ok && (maker || serialTag))
  }

  /** m23: EXIF/APP1 METADATA WALK — the image-PII audit m16's
    * generic marker walk stops short of: the APP1 payload is where
    * orientation, capture timestamps, GPS coordinates, opaque
    * MakerNote blobs, and body serial numbers live, and each is PII
    * a pipeline must AUDIT AND STRIP per policy class before the
    * corpus ships (the image-channel twin of t7's text redaction).
    * Renders a real APP1/EXIF TIFF structure per document
    * ([[buildExifJpeg]] — byte order itself data-chosen, half the
    * corpus little-endian, half big; Exif sub-IFD, GPS IFD, and
    * thumbnail IFD1 topology all data-chosen) and walks the tag
    * tables back generically ([[exifWalk]] — the
    * render-then-really-parse idiom of m14/m16/m21/m22). Oracle:
    * every emitted field re-derived arithmetically from the
    * document text; the spec corrupts the byte-order mark, the TIFF
    * magic, the IFD0 offset, a value offset, and the EOI — each
    * gate bites.
    *
    * Scale: render+walk fused in ONE narrow mapPartitions stage —
    * zero shuffles, payload bytes never leave the stage; the
    * per-class strip decisions join the corpus funnel as boolean
    * columns, not a re-decode.
    */
  def m23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 1)
      .selectExpr("doc_id", "rpad(substring(text, 1, 61), 61, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) =>
        exifWalk(id, buildExifJpeg(id, s))
      })
      .toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  /** m23 oracle: byte order, IFD0 entry count, orientation,
    * timestamp, GPS presence/coordinates, ISO, MakerNote/serial
    * presence, and the thumbnail chain re-derived arithmetically
    * from the same document characters the builder consumed;
    * exif_ok pins the healthy walk. */
  val m23Sql: String =
    """WITH p AS (SELECT doc_id, rpad(substring(text, 1, 61), 61, ' ') AS s
      |      FROM documents WHERE doc_id % 3 = 1),
      |d AS (SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
      |    1 + (ord(substr(s, 5, 1)) & 7) AS orientation,
      |    (ord(substr(s, 6, 1)) & 1) = 1 AS has_gps,
      |    ord(substr(s, 7, 1)) % 90 AS latd,
      |    1 + ord(substr(s, 8, 1)) % 12 AS mo,
      |    1 + ord(substr(s, 9, 1)) % 28 AS dy,
      |    ord(substr(s, 10, 1)) % 60 AS latm,
      |    (ord(substr(s, 12, 1)) & 1) = 1 AS has_exif,
      |    (ord(substr(s, 13, 1)) & 1) = 1 AS mk,
      |    (ord(substr(s, 14, 1)) & 1) = 1 AS sr,
      |    (ord(substr(s, 15, 1)) & 1) = 1 AS has_thumb,
      |    (ord(substr(s, 16, 1)) & 1) = 1 AS has_dt,
      |    ord(substr(s, 17, 1)) % 8 AS isoc
      |  FROM p)
      |SELECT doc_id, TRUE AS exif_ok, byte_order,
      |  CAST(1 + (CASE WHEN has_dt THEN 1 ELSE 0 END)
      |     + (CASE WHEN has_exif THEN 1 ELSE 0 END)
      |     + (CASE WHEN has_gps THEN 1 ELSE 0 END) AS BIGINT) AS n_ifd0,
      |  CAST(orientation AS INTEGER) AS orientation,
      |  CASE WHEN has_dt THEN '2024:' || lpad(CAST(mo AS VARCHAR), 2, '0')
      |    || ':' || lpad(CAST(dy AS VARCHAR), 2, '0') || ' 10:30:00'
      |    ELSE '' END AS dt_str,
      |  has_gps,
      |  CAST(CASE WHEN has_gps THEN latd ELSE 0 END AS BIGINT) AS lat_deg,
      |  CAST(CASE WHEN has_gps THEN latm ELSE 0 END AS BIGINT) AS lat_min,
      |  CAST(CASE WHEN has_exif THEN 100 * (1 + isoc) ELSE 0 END AS BIGINT) AS iso,
      |  (has_exif AND mk) AS has_maker,
      |  CASE WHEN has_exif AND sr
      |    THEN lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0')
      |    ELSE '' END AS serial,
      |  has_thumb,
      |  has_gps AS needs_strip_gps,
      |  has_dt AS needs_strip_time,
      |  (has_exif AND (mk OR sr)) AS needs_strip_device
      |FROM d
      |ORDER BY doc_id""".stripMargin

  // ---------- m25: EXIF policy strip (the redaction m23 decides) ----------

  /** The image-PII strip policy: GPSInfo subtree (0x8825), capture
    * DateTime (0x0132), the opaque camera MakerNote (0x927c — known
    * to embed serials and GPS in vendor formats), and the
    * BodySerialNumber (0xA431). Parameterizes [[stripTiff]]; each
    * class is individually exercised by the spec's per-class
    * byte-equality pins. */
  private[graft] val exifStripPolicy: Set[Int] =
    Set(0x8825, 0x0132, 0x927c, 0xa431)

  /** The sub-IFD pointer tags the surgery RELOCATES as whole
    * subtrees rather than treating as 4-byte values: Exif (0x8769),
    * GPSInfo (0x8825), Interoperability (0xA005). Any of these with
    * a malformed shape (type ≠ LONG, count ≠ 1) gates the file to
    * quarantine — a pointer copied as data would dangle. */
  private val exifSubIfdTags: Set[Int] = Set(0x8769, 0x8825, 0xa005)

  /** One parsed TIFF entry: the raw 12 header bytes, the out-of-line
    * value bytes (if any), and the pointed sub-IFD (if a pointer
    * tag) — exactly one of `blob`/`sub` is populated for non-inline
    * entries. */
  private final class PEntry(val raw: Array[Byte],
      val blob: Option[Array[Byte]], val sub: Option[PIfd])
  /** One parsed IFD: its kept entries, in file order. */
  private final class PIfd(val entries: Vector[PEntry])

  /** Rewrite one TIFF structure with every policy-tagged entry
    * removed — GENERIC surgery over the real IFD topology, not a
    * fixture-shaped rebuild: the structure is parsed into a full
    * IFD tree (the IFD0 → IFD1 next chain, and every KNOWN sub-IFD
    * pointer — Exif/GPS/Interop — followed as a subtree,
    * budget-capped against pointer cycles), entries whose tag is in
    * `strip` are dropped (a pointer tag drops its whole subtree),
    * and the survivors are re-serialized in the canonical packing:
    * all IFDs in pre-order (each IFD's sub-IFDs before the chain's
    * next IFD), then the value area in the same traversal order,
    * every offset and next pointer renumbered in the file's own
    * byte order. Kept entries' raw 12 bytes are preserved (inline
    * values, types and counts bit-for-bit); a nonzero next-IFD
    * (thumbnail IFD1) is RELOCATED, never silently dropped. Any
    * gate the walk would fail — bad byte order, magic, offset/count
    * lies, unknown value type, malformed sub-IFD pointer, a chain
    * cycle — returns None: the caller must NEVER ship
    * half-surgered bytes (quarantine, the p9 posture).
    */
  private[graft] def stripTiff(b: Array[Byte], t0: Int, tlen: Int,
      strip: Set[Int]): Option[Array[Byte]] = {
    def u8(p: Int): Int = b(t0 + p) & 0xff
    def in(off: Long, n: Long): Boolean = off >= 0 && off + n <= tlen
    if (!in(0, 8)) return None
    val boS = new String(b, t0, 2, "US-ASCII")
    val le = boS == "II"
    if (!le && boS != "MM") return None
    def r16(p: Long): Int =
      if (le) u8(p.toInt) | (u8(p.toInt + 1) << 8)
      else (u8(p.toInt) << 8) | u8(p.toInt + 1)
    def r32(p: Long): Long =
      if (le) r16(p).toLong | (r16(p + 2).toLong << 16)
      else (r16(p).toLong << 16) | r16(p + 2).toLong
    if (r16(2) != 42) return None
    val typeSize =
      Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 7 -> 1)
    var budget = 8 // total parsed IFDs — gates pointer cycles
    // parse one IFD; returns (kept-entry model, next-IFD offset)
    def parseIfd(off: Long): Option[(PIfd, Long)] = {
      if (budget <= 0) return None
      budget -= 1
      if (!in(off, 2)) return None
      val cnt = r16(off)
      if (!in(off, 2L + 12L * cnt + 4L)) return None
      val kept = Vector.newBuilder[PEntry]
      var i = 0
      while (i < cnt) {
        val p = off + 2 + 12 * i
        val tag = r16(p); val typ = r16(p + 2); val c = r32(p + 4)
        val raw = java.util.Arrays.copyOfRange(
          b, t0 + p.toInt, t0 + p.toInt + 12)
        // STRIPPED entries are VALIDATED exactly like kept ones —
        // they just aren't copied: redaction must never ship a file
        // the audit walk would have rejected (a corrupt offset in a
        // to-be-stripped entry is still a corrupt file → quarantine)
        val keep = !strip.contains(tag)
        if (exifSubIfdTags.contains(tag)) {
          if (typ != 4 || c != 1) return None // malformed pointer
          parseIfd(r32(p + 8)) match {
            case Some((sub, next)) =>
              if (next != 0) return None // sub-IFDs must terminate
              if (keep) kept += new PEntry(raw, None, Some(sub))
            case None => return None
          }
        } else {
          val sz = typeSize.getOrElse(typ, 0)
          if (sz == 0) return None
          val byteLen = sz.toLong * c
          if (byteLen <= 4) {
            if (keep) kept += new PEntry(raw, None, None)
          } else {
            val vo = r32(p + 8)
            if (!in(vo, byteLen)) return None
            if (keep) kept += new PEntry(raw,
              Some(java.util.Arrays.copyOfRange(
                b, t0 + vo.toInt, t0 + vo.toInt + byteLen.toInt)), None)
          }
        }
        i += 1
      }
      Some((new PIfd(kept.result()), r32(off + 2 + 12 * cnt)))
    }
    // the IFD0 → IFD1 → … chain
    val chain = Vector.newBuilder[PIfd]
    var off = r32(4)
    while (off != 0) {
      parseIfd(off) match {
        case Some((ifd, next)) => chain += ifd; off = next
        case None => return None
      }
    }
    val top = chain.result()
    if (top.isEmpty) return None
    // serialize: pre-order IFD placement, then the value area in
    // the same traversal order — the builder's canonical packing
    def preorder(ifd: PIfd): Vector[PIfd] =
      ifd +: ifd.entries.flatMap(_.sub.toVector.flatMap(preorder))
    val flat = top.flatMap(preorder)
    val ifdOff = new java.util.IdentityHashMap[PIfd, Int]()
    var pos = 8
    flat.foreach { f =>
      ifdOff.put(f, pos); pos += 6 + 12 * f.entries.size
    }
    val blobOff = new java.util.IdentityHashMap[PEntry, Int]()
    flat.foreach(_.entries.foreach(e => e.blob.foreach { bb =>
      blobOff.put(e, pos); pos += bb.length
    }))
    val t = new Array[Byte](pos)
    def w16(p: Int, v: Int): Unit =
      if (le) { t(p) = (v & 0xff).toByte; t(p + 1) = ((v >> 8) & 0xff).toByte }
      else { t(p) = ((v >> 8) & 0xff).toByte; t(p + 1) = (v & 0xff).toByte }
    def w32(p: Int, v: Int): Unit =
      if (le) { w16(p, v & 0xffff); w16(p + 2, v >>> 16) }
      else { w16(p, v >>> 16); w16(p + 2, v & 0xffff) }
    t(0) = b(t0); t(1) = b(t0 + 1)
    w16(2, 42); w32(4, 8)
    flat.foreach { f =>
      val fo = ifdOff.get(f)
      w16(fo, f.entries.size)
      var ep = fo + 2
      f.entries.foreach { e =>
        System.arraycopy(e.raw, 0, t, ep, 12)
        e.sub.foreach(s => w32(ep + 8, ifdOff.get(s)))
        e.blob.foreach { bb =>
          val bo = blobOff.get(e)
          w32(ep + 8, bo)
          System.arraycopy(bb, 0, t, bo, bb.length)
        }
        ep += 12
      }
      // next pointer: the following TOP-CHAIN IFD, if this is one
      val ti = top.indexWhere(f.eq(_))
      val next =
        if (ti >= 0 && ti + 1 < top.size) ifdOff.get(top(ti + 1)) else 0
      w32(ep, next)
    }
    Some(t)
  }

  /** Strip the policy-tagged subtrees from a JPEG's APP1/EXIF
    * segment — byte-level surgery via [[stripTiff]], the APP1
    * length field recomputed, every other segment byte-copied. A
    * file the parse gates reject is returned UNCHANGED (never
    * half-surgered) — un-walkable inputs route to quarantine, not
    * silent edits. */
  private[graft] def exifStrip(b: Array[Byte],
      strip: Set[Int] = exifStripPolicy): Array[Byte] = {
    def u8(p: Int): Int = b(p) & 0xff
    def be16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return b
    var pos = 2
    while (pos + 4 <= b.length && u8(pos) == 0xff && u8(pos + 1) != 0xd9) {
      val len = be16(pos + 2)
      if (pos + 2 + len > b.length || len < 2) return b
      if (u8(pos + 1) == 0xe1 && len >= 16 &&
          new String(b, pos + 4, 4, "US-ASCII") == "Exif" &&
          u8(pos + 8) == 0 && u8(pos + 9) == 0) {
        val nt = stripTiff(b, pos + 10, len - 8, strip)
        if (nt.isEmpty) return b
        val t = nt.get
        val app1Len = 2 + 6 + t.length
        val out = new java.io.ByteArrayOutputStream()
        out.write(b, 0, pos)
        out.write(0xff); out.write(0xe1)
        out.write((app1Len >> 8) & 0xff); out.write(app1Len & 0xff)
        out.write(b, pos + 4, 6)
        out.write(t, 0, t.length)
        out.write(b, pos + 2 + len, b.length - pos - 2 - len)
        return out.toByteArray
      }
      pos += 2 + len
    }
    b
  }

  case class ExifStrip(doc_id: Long, had_gps: Boolean, had_dt: Boolean,
      had_maker: Boolean, had_serial: Boolean, orig_len: Long,
      stripped_len: Long, still_ok: Boolean, gps_after: Boolean,
      time_after: Boolean, device_after: Boolean, orientation: Int,
      iso: Long, thumb_kept: Boolean)

  /** The per-image render→strip→re-walk kernel of [[m25]], factored
    * so the stateless streaming strip door (s42) runs the identical
    * row code. Full policy ([[exifStripPolicy]]): GPS subtree,
    * DateTime, MakerNote, BodySerialNumber. */
  private[graft] def exifStripRow(id: Long, s: String): ExifStrip = {
    val orig = buildExifJpeg(id, s)
    val before = exifWalk(id, orig)
    val stripped = exifStrip(orig)
    val w = exifWalk(id, stripped)
    ExifStrip(id, before.has_gps, before.dt_str.nonEmpty, before.has_maker,
      before.serial.nonEmpty, orig.length.toLong, stripped.length.toLong,
      w.exif_ok, w.has_gps, w.dt_str.nonEmpty,
      w.has_maker || w.serial.nonEmpty, w.orientation, w.iso, w.has_thumb)
  }

  /** m25: EXIF POLICY STRIP — m23 AUDITS the image-PII channel per
    * policy class; m25 ENACTS the full strip policy, the redaction
    * leg itself: rewrite the APP1/EXIF segment with every
    * policy-tagged entry removed — the GPS subtree, the DateTime,
    * the MakerNote blob, and the BodySerialNumber — by generic
    * byte surgery over the real IFD topology ([[exifStrip]] — kept
    * entries' raw bytes preserved, KNOWN sub-IFD pointers
    * (Exif/GPS/Interop) relocated as whole subtrees, the thumbnail
    * IFD1 chain relocated rather than dropped, out-of-line values
    * repacked, offsets renumbered in the file's own byte order,
    * APP1 length recomputed) and PROVE the result by re-walking it
    * with m23's own gates: the stripped file must still parse
    * healthy, report no PII in any class, and preserve orientation,
    * ISO, and the thumbnail chain bit-for-bit. Un-walkable inputs
    * come back byte-identical — redaction never ships half-surgered
    * bytes (the quarantine posture of p9). The paired lengths
    * quantify the reclaim.
    *
    * Scale: render+strip+re-walk fused in ONE narrow mapPartitions
    * stage — zero shuffles; at 100 TB this is the map-only rewrite
    * pass a privacy sweep runs shard-parallel over binaryFile
    * splits, with m23's audit as its planning query.
    */
  def m25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 1)
      .selectExpr("doc_id", "rpad(substring(text, 1, 61), 61, ' ') AS s")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) => exifStripRow(id, s) })
      .toDF()
      .transform(graft.Tables.ordered(_, $"doc_id"))
  }

  /** m25 oracle: the construction's exact pre/post lengths (every
    * IFD is 6 + 12·entries bytes; value blobs 20/16/10/24; both
    * layouts' totals re-derived arithmetically from the same
    * data-chosen presence bits), the healthy re-walk, and the
    * preserved fields from the same document characters. */
  val m25Sql: String =
    """WITH p AS (SELECT doc_id, rpad(substring(text, 1, 61), 61, ' ') AS s
      |      FROM documents WHERE doc_id % 3 = 1),
      |d AS (SELECT doc_id,
      |    (ord(substr(s, 6, 1)) & 1) = 1 AS has_gps,
      |    1 + (ord(substr(s, 5, 1)) & 7) AS orientation,
      |    (ord(substr(s, 12, 1)) & 1) = 1 AS has_exif,
      |    (ord(substr(s, 13, 1)) & 1) = 1 AS mk,
      |    (ord(substr(s, 14, 1)) & 1) = 1 AS sr,
      |    (ord(substr(s, 15, 1)) & 1) = 1 AS has_thumb,
      |    (ord(substr(s, 16, 1)) & 1) = 1 AS has_dt,
      |    ord(substr(s, 17, 1)) % 8 AS isoc
      |  FROM p),
      |e AS (SELECT *,
      |    (has_exif AND mk) AS had_maker, (has_exif AND sr) AS had_serial,
      |    1 + (CASE WHEN has_dt THEN 1 ELSE 0 END)
      |      + (CASE WHEN has_exif THEN 1 ELSE 0 END)
      |      + (CASE WHEN has_gps THEN 1 ELSE 0 END) AS n0,
      |    1 + (CASE WHEN has_exif AND mk THEN 1 ELSE 0 END)
      |      + (CASE WHEN has_exif AND sr THEN 1 ELSE 0 END) AS ne
      |  FROM d)
      |SELECT doc_id, has_gps AS had_gps, has_dt AS had_dt,
      |  had_maker, had_serial,
      |  CAST(28 + 12 * n0
      |    + CASE WHEN has_exif THEN 6 + 12 * ne ELSE 0 END
      |    + CASE WHEN has_gps THEN 54 ELSE 0 END
      |    + CASE WHEN has_thumb THEN 18 ELSE 0 END
      |    + CASE WHEN has_dt THEN 20 ELSE 0 END
      |    + CASE WHEN had_maker THEN 16 ELSE 0 END
      |    + CASE WHEN had_serial THEN 10 ELSE 0 END AS BIGINT) AS orig_len,
      |  CAST(28 + 12 * (1 + CASE WHEN has_exif THEN 1 ELSE 0 END)
      |    + CASE WHEN has_exif THEN 18 ELSE 0 END
      |    + CASE WHEN has_thumb THEN 18 ELSE 0 END AS BIGINT) AS stripped_len,
      |  TRUE AS still_ok, FALSE AS gps_after,
      |  FALSE AS time_after, FALSE AS device_after,
      |  CAST(orientation AS INTEGER) AS orientation,
      |  CAST(CASE WHEN has_exif THEN 100 * (1 + isoc) ELSE 0 END AS BIGINT) AS iso,
      |  has_thumb AS thumb_kept
      |FROM e
      |ORDER BY doc_id""".stripMargin
}
