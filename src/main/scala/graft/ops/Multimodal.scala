package graft.ops

import graft.pipeline.PageGen
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched partition passes.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): [[fakeDecode]] is a clearly-marked deterministic stand-in that
  * produces a stable feature vector from the bytes. Everything Spark-side —
  * schema, partition batching, kernel signature, output shape — is real and
  * tested, so swapping in a real decoder is a one-function change.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      // STUB output: deterministic 8-dim "embedding" of the payload
      features: Array[Float],
      frames_sampled: Int)

  /** STUB decode: a real implementation would decode the payload
    * (image/audio/video) and extract features. This deterministic fake keeps
    * the exact batch shape + signature and is stable across runs.
    */
  def fakeDecode(payload: Array[Byte], kind: String): Array[Float] = {
    val out = new Array[Float](8)
    var h = Dedup.stringHash64(kind)
    var i = 0
    while (i < payload.length) { h = TextOps.mix(h ^ (payload(i) * 0x100000001b3L)); i += 1 }
    var d = 0
    while (d < 8) { h = TextOps.mix(h); out(d) = ((h >>> 40).toInt / 8388608.0f) - 1.0f; d += 1 }
    out
  }

  /** Frame sampling stub: deterministic count from metadata. */
  def sampleFrameCount(kind: String, nBytes: Int): Int = kind match {
    case "video" => math.max(1, nBytes / 4096)
    case "audio" => math.max(1, nBytes / 8192)
    case _ => 1
  }

  /** Synthesize a media table from documents (payload = UTF-8 text bytes —
    * an opaque binary as far as the pipeline is concerned).
    */
  def synthMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          width = 64 + (id % 512).toInt, height = 64 + (id % 384).toInt,
          sample_rate = 16000)
      }
  }

  /** Batched decode/feature pass — partition-at-a-time (the JVM analogue of
    * a Pandas-UDF `mapInPandas` batch), kernel reused across rows.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      MediaFeatures(m.media_id, m.kind, m.payload.length,
        fakeDecode(m.payload, m.kind), sampleFrameCount(m.kind, m.payload.length))
    })
  }
}
