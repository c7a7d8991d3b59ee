package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star M5): image/audio/video payloads are
  * opaque `binary` columns with a typed metadata struct; decode / feature
  * extraction runs as narrow per-row transforms.
  *
  * The real decode step (image/audio codecs) is STUBBED — the container has
  * no media libraries — with a deterministic fake that derives "decoded"
  * properties purely from the bytes. Everything Spark-side is real: the
  * binary schema, the metadata struct, the partition-parallel transform
  * shape, and the content-hash features (both oracle-checkable).
  *
  * Scale note: binary payload columns ride in parquet alongside metadata;
  * feature extraction is shuffle-free. For 100 TB of media, partition by
  * payload size (`spark.sql.files.maxPartitionBytes`) and keep features in a
  * separate projected table so downstream scans prune the heavy bytes column
  * (ReadSchema without `payload` → parquet never reads those pages).
  */
object Multimodal {

  /** Model `documents.text` as an opaque media payload: bytes + metadata. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("origin"),
        lit("application/octet-stream").as("mime"),
        col("n_chars").as("declared_len")).as("meta"))

  /** Feature extraction over the binary payload: true byte length, content
    * hash, head-bytes fingerprint, plus the stubbed "decode" outputs
    * (deterministic fakes of width/height/frames derived from the bytes —
    * replace with real codecs where available). */
  def features(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("content_sha"),
      lower(hex(substring(col("payload"), 1, 8))).as("head_hex"),
      // ---- stubbed decode (deterministic fake, no media libs in container):
      (length(col("payload")).cast("long") % 640).as("fake_width"),
      (length(col("payload")).cast("long") % 480).as("fake_height"),
      col("meta.origin").as("origin"))

  /** Decoded-media record produced by the (stubbed) codec. */
  final case class Decoded(
      doc_id: Long, width: Int, height: Int, n_frames: Int,
      codec: String, byte_sum: Long)

  /** Partition-parallel "decode": the Scala analog of a pandas-batch UDF —
    * one iterator pass per partition, batch-shaped, no driver involvement.
    * The codec itself is a deterministic STUB (no media libs in this
    * environment): dimensions derive from the payload bytes. Swap
    * `stubDecode` for a real codec binding without touching the plumbing. */
  def decode(media: DataFrame): org.apache.spark.sql.Dataset[Decoded] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex("doc_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        stubDecode(id, bytes)
      }
    }
  }

  /** Deterministic fake decode — replace with a real image/audio codec. */
  private def stubDecode(id: Long, bytes: Array[Byte]): Decoded = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    Decoded(
      doc_id = id,
      width = ((sum % 640) + 1).toInt,
      height = ((sum % 480) + 1).toInt,
      n_frames = (bytes.length % 30) + 1,
      codec = if (bytes.nonEmpty && (bytes(0) & 1) == 1) "fake/odd" else "fake/even",
      byte_sum = sum)
  }

  def featuresSqlDuck: String =
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS content_sha,
      |  lower(substr(hex(CAST(text AS BLOB)), 1, 16)) AS head_hex,
      |  CAST(octet_length(CAST(text AS BLOB)) % 640 AS BIGINT) AS fake_width,
      |  CAST(octet_length(CAST(text AS BLOB)) % 480 AS BIGINT) AS fake_height,
      |  source AS origin
      |FROM documents ORDER BY doc_id""".stripMargin
}
