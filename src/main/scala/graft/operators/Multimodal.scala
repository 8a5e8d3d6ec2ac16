package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Bloom64

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in per-partition batches.
  *
  * The Spark-side plumbing is REAL and tested — schema, partition-batched
  * processing (mapPartitions over typed rows, the Scala analogue of a
  * mapInPandas batch UDF), deterministic output shapes. The codec step is a
  * STUB: no image/audio library exists in this container, so `decodeStub`
  * derives metadata/features deterministically from the bytes; swap
  * `decodeStub`/`featuresStub` for a real codec at deployment — every other
  * line stays.
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, bytes: Array[Byte])
  final case class Decoded(
      media_id: Long, kind: String, width: Int, height: Int,
      channels: Int, duration_ms: Long, ok: Boolean)
  final case class Features(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, phash: Long)

  /** STUB codec: deterministic pseudo-metadata from content bytes.
    * Real implementation would parse the container header here (???).
    */
  private def decodeStub(m: Media): Decoded = {
    val h = Bloom64.mix(if (m.bytes == null || m.bytes.isEmpty) 0L
      else m.bytes.take(64).foldLeft(1125899906842597L)((a, b) => a * 31 + b))
    Decoded(
      media_id = m.media_id,
      kind = m.kind,
      width = 160 + ((h & 0x7fffffffL) % 1920).toInt,
      height = 120 + (((h >>> 16) & 0x7fffffffL) % 1080).toInt,
      channels = if (m.kind == "audio") 2 else 3,
      duration_ms = if (m.kind == "image") 0L else 1000L + ((h >>> 24) & 0xffffL),
      ok = m.bytes != null && m.bytes.nonEmpty)
  }

  /** STUB feature extractor: deterministic 16-dim float vector from bytes. */
  private def featuresStub(m: Media, dim: Int): Features = {
    val base = Bloom64.mix(if (m.bytes == null) 0L
      else m.bytes.foldLeft(7919L)((a, b) => a * 131 + b))
    Features(m.media_id, (0 until dim).map { i =>
      ((Bloom64.mix(base + i) >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }.toArray)
  }

  /** Decode metadata in per-partition batches (the mapInPandas shape:
    * iterator-of-batches in, iterator-of-batches out; executors never
    * materialize more than one batch of decoded rows).
    */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.grouped(256).flatMap(_.map(decodeStub)) }
  }

  /** Feature extraction, batched the same way. */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.grouped(256).flatMap(_.map(featuresStub(_, dim))) }
  }

  /** Frame sampling for video rows: n frames evenly over the (stub) duration,
    * each with a deterministic perceptual-hash stand-in.
    */
  def sampleFrames(media: Dataset[Media], n: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { m =>
        val d = decodeStub(m)
        (0 until n).map { i =>
          val ts = if (n == 1) 0L else d.duration_ms * i / (n - 1)
          Frame(m.media_id, i, ts, Bloom64.mix(d.width.toLong * 31 + d.height * 7 + i))
        }
      }
    }
  }

  /** Demo source: wrap any (id, string) table as opaque media bytes. */
  def asMedia(spark: SparkSession, df: DataFrame, idCol: String, payloadCol: String): Dataset[Media] = {
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col(payloadCol), "UTF-8").as("bytes"))
      .as[Media]
  }
}
