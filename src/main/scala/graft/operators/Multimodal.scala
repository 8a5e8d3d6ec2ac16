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
      media_id: Long, kind: String, container: String, width: Int, height: Int,
      channels: Int, duration_ms: Long, ok: Boolean)
  final case class Features(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, phash: Long)

  /** REAL container-header metadata for the common web image formats, parsed
    * directly from the bytes per the public format specs — no codec library
    * needed for dimensions/channels. Pixel decode stays stubbed (see
    * [[decodeStub]]).
    */
  private[graft] object HeaderCodec {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    private def sane(w: Long, h: Long): Boolean =
      w >= 1 && w <= 1000000 && h >= 1 && h <= 1000000

    /** (container, width, height, channels) when the bytes carry a parseable
      * PNG / GIF / BMP / JPEG header.
      */
    def parse(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (b == null) return None
      // PNG: 8-byte signature, then the IHDR chunk (len+"IHDR"+w+h+depth+color)
      if (b.length >= 26 && be32(b, 0) == 0x89504e47L && be32(b, 4) == 0x0d0a1a0aL &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val (w, h) = (be32(b, 16), be32(b, 20))
        val channels = u8(b, 25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 3
        }
        if (sane(w, h)) return Some(("png", w.toInt, h.toInt, channels))
      }
      // GIF87a / GIF89a: logical screen width/height as LE u16 at offset 6/8
      if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
          (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        val (w, h) = (le16(b, 6), le16(b, 8))
        if (sane(w, h)) return Some(("gif", w, h, 3))
      }
      // BMP: "BM", DIB header at 14 (BITMAPINFOHEADER family: size 40/108/124)
      if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') {
        val dib = le32(b, 14)
        if (dib == 40 || dib == 108 || dib == 124) {
          val w = le32(b, 18).toInt
          val h = math.abs(le32(b, 22).toInt) // negative height = top-down rows
          val bpp = le16(b, 28)
          val channels = bpp match { case 32 => 4; case 24 => 3; case _ => 1 }
          if (sane(w, h)) return Some(("bmp", w, h, channels))
        }
      }
      // JPEG: walk the marker stream to the first SOF for precision/dims
      if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
        var i = 2
        while (i + 4 <= b.length && u8(b, i) == 0xff) {
          val marker = u8(b, i + 1)
          if (marker == 0xff) {
            // spec-legal 0xFF fill/padding bytes before a marker: consume one
            // and re-classify, else the next marker byte is misread as length
            i += 1
          } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
            i += 2 // standalone markers carry no length
          } else if (marker == 0xd9 || marker == 0xda) {
            return None // EOI / start-of-scan before any SOF
          } else {
            val len = be16(b, i + 2)
            if (len < 2 || i + 2 + len > b.length) return None
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof) {
              if (len >= 8) {
                val h = be16(b, i + 5); val w = be16(b, i + 7)
                val channels = u8(b, i + 9)
                if (sane(w, h)) return Some(("jpeg", w, h, channels))
              }
              return None
            }
            i += 2 + len
          }
        }
      }
      None
    }
  }

  /** Codec entry: REAL header parse for PNG/GIF/BMP/JPEG bytes; every other
    * payload falls back to the deterministic stub (pixel decode and all
    * audio/video containers need codec libraries this container lacks —
    * swap the fallback for a real codec at deployment, nothing else moves).
    */
  private def decodeStub(m: Media): Decoded = {
    HeaderCodec.parse(m.bytes) match {
      case Some((container, w, h, ch)) =>
        Decoded(m.media_id, m.kind, container, w, h, ch, 0L, ok = true)
      case None => decodeFallback(m)
    }
  }

  /** STUB: deterministic pseudo-metadata from content bytes for payloads
    * with no parseable container header (???).
    */
  private def decodeFallback(m: Media): Decoded = {
    val h = Bloom64.mix(if (m.bytes == null || m.bytes.isEmpty) 0L
      else m.bytes.take(64).foldLeft(1125899906842597L)((a, b) => a * 31 + b))
    Decoded(
      media_id = m.media_id,
      kind = m.kind,
      container = "unknown",
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
