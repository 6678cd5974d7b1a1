package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns: media payloads ride as opaque `binary` columns
  * with typed metadata. The Spark-side plumbing — schema, batched
  * per-partition decode, partition sizing — is real; the codec itself is
  * STUBBED (no image/audio libraries in this environment) behind
  * `decodeStub`, which produces deterministic metadata from the bytes so
  * the pipeline stays testable end-to-end. Swap `decodeStub` for a real
  * JNI/javacv decoder without touching the plan.
  */
object Multimodal {

  final case class MediaMeta(
      id: Long,
      byteLen: Long,
      contentMd5: String,
      width: Int,
      height: Int,
      nFrames: Int,
      kind: String)

  /** STUB decoder — deterministic fake: dimensions derived from content
    * bytes. A real implementation would parse the container here.
    */
  def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(payload)
    MediaMeta(
      id = id,
      byteLen = payload.length.toLong,
      contentMd5 = graft.carve.Hex.lower(md5),
      width = ((payload.headOption.getOrElse(0: Byte) & 0xff) % 64) + 1,
      height = ((payload.lastOption.getOrElse(0: Byte) & 0xff) % 64) + 1,
      nFrames = (payload.length % 16) + 1,
      kind = "image")
  }

  /** Batched decode over (id, payload) rows — mapPartitions so a real
    * decoder can amortize per-batch init (model load, JNI context) the
    * way a Pandas-UDF batch would.
    */
  def decode(spark: SparkSession, media: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch => batch.map { case (id, payload) => decodeStub(id, payload) } }
  }

  final case class MediaEmbed(id: Long, embedding: Array[Float])

  /** STUB embedder — deterministic fake embedding from the payload's md5
    * (a real implementation would run a vision/audio encoder here, with
    * per-partition model load amortized by `mapPartitions`). Components
    * are (byte - 128)/256 — exactly representable in both float and
    * double, so downstream float math is engine-independent.
    */
  def embedStub(id: Long, payload: Array[Byte], dim: Int = 8): MediaEmbed = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val hex = graft.carve.Hex.lower(md5)
    val emb = Array.tabulate(dim) { j =>
      val v = Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16)
      (v / 256.0 - 0.5).toFloat
    }
    MediaEmbed(id, emb)
  }

  /** Batched embedding over (id, payload) rows — the multimodal bridge
    * into the embedding operators (ANN, near-dup, quantization).
    */
  def embed(spark: SparkSession, media: DataFrame, idCol: String, payloadCol: String,
            dim: Int = 8): Dataset[MediaEmbed] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch => batch.map { case (id, payload) => embedStub(id, payload, dim) } }
  }

  final case class ResizedMedia(id: Long, byteLen: Long, contentMd5: String)

  /** STUB resize — deterministic downsample keeping every `stride`-th
    * payload byte (a real implementation would decode, scale, re-encode).
    * Runs in the same batched mapPartitions shape; emits the resized
    * payload's length and content hash (the payload itself would stream
    * to the blob store, exactly like carved files).
    */
  def resize(spark: SparkSession, media: DataFrame, idCol: String, payloadCol: String,
             stride: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val out = Iterator.range(0, payload.length, stride).map(payload(_)).toArray
          val md5 = java.security.MessageDigest.getInstance("MD5").digest(out)
          ResizedMedia(id, out.length.toLong, graft.carve.Hex.lower(md5))
        }
      }
  }

  /** Frame sampling plan for video-like payloads: deterministic frame
    * indices (every `stride`-th of nFrames) — the shuffle-free metadata
    * half of a sample-and-decode stage.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    meta.toDF().select(
      col("id"),
      explode(sequence(lit(0), col("nFrames") - 1, lit(stride))).as("frame_idx"))
  }
}
