package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
}
