package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{HeaderCodec, Media}

/** L12 multimodal plumbing: the container-header codec parses REAL
  * PNG/GIF/BMP/JPEG dimensions from raw bytes (public format specs, no
  * codec library), non-media payloads fall back to the deterministic stub,
  * and the batched decode/features/frames operators keep their shapes.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("PNG header: IHDR dimensions and channels from color type") {
    val png = bytes(
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R', // IHDR chunk
      0x00, 0x00, 0x02, 0x80, // width 640
      0x00, 0x00, 0x01, 0xe0, // height 480
      0x08, 0x06, 0x00, 0x00, 0x00) // depth 8, color type 6 (RGBA)
    assert(HeaderCodec.parse(png).contains(("png", 640, 480, 4)))
    val gray = png.clone(); gray(25) = 0x00 // color type 0 → 1 channel
    assert(HeaderCodec.parse(gray).contains(("png", 640, 480, 1)))
  }

  test("GIF header: LE logical-screen dimensions") {
    val gif = bytes('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, // width 320 LE
      0xc8, 0x00, // height 200 LE
      0x00, 0x00)
    assert(HeaderCodec.parse(gif).contains(("gif", 320, 200, 3)))
    assert(HeaderCodec.parse(gif.updated(4, '7'.toByte)).contains(("gif", 320, 200, 3)))
  }

  test("BMP header: BITMAPINFOHEADER dims, top-down negative height, bpp") {
    val bmp = bytes(
      'B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 0x36, 0, 0, 0, // file header
      0x28, 0x00, 0x00, 0x00, // DIB size 40
      0x64, 0x00, 0x00, 0x00, // width 100
      0xce, 0xff, 0xff, 0xff, // height -50 (top-down)
      0x01, 0x00, // planes
      0x18, 0x00) // 24 bpp
    assert(HeaderCodec.parse(bmp).contains(("bmp", 100, 50, 3)))
  }

  test("JPEG header: marker walk to SOF0 yields dims and components") {
    val jpg = bytes(
      0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4
      0xff, 0xc0, 0x00, 0x08, // SOF0, len 8
      0x08, // precision
      0x01, 0xe0, // height 480
      0x02, 0x80, // width 640
      0x03) // 3 components
    assert(HeaderCodec.parse(jpg).contains(("jpeg", 640, 480, 3)))
    // SOS before any SOF → no metadata
    val noSof = bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)
    assert(HeaderCodec.parse(noSof).isEmpty)
    // spec-legal 0xFF fill bytes before a marker must be consumed, not
    // misread as a length segment
    val padded = bytes(
      0xff, 0xd8, // SOI
      0xff, 0xff, 0xff, // fill bytes
      0xff, 0xc0, 0x00, 0x08, // SOF0, len 8
      0x08, // precision
      0x01, 0xe0, // height 480
      0x02, 0x80, // width 640
      0x03) // 3 components
    assert(HeaderCodec.parse(padded).contains(("jpeg", 640, 480, 3)))
  }

  test("non-media payloads fall back to the deterministic stub") {
    assert(HeaderCodec.parse("just some text".getBytes("UTF-8")).isEmpty)
    assert(HeaderCodec.parse(Array.emptyByteArray).isEmpty)
    assert(HeaderCodec.parse(null).isEmpty)
    // truncated PNG signature only — too short for IHDR
    assert(HeaderCodec.parse(bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)).isEmpty)
  }

  test("batched decode: one row per input, real headers recognized in-pipeline") {
    import spark.implicits._
    val png = bytes(
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x00, 0x10, 0x00, 0x00, 0x00, 0x20,
      0x08, 0x02, 0x00, 0x00, 0x00)
    val media = Seq(
      Media(1L, "image", png),
      Media(2L, "image", "plain text".getBytes("UTF-8")),
      Media(3L, "video", "clip".getBytes("UTF-8"))).toDS()
    val out = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out(0).container == "png" && out(0).width == 16 && out(0).height == 32
      && out(0).channels == 3)
    assert(out(1).container == "unknown" && out(1).ok)
    assert(out(2).container == "unknown" && out(2).duration_ms >= 1000L)
    // determinism of the fallback
    val again = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out.toSeq.map(_.toString) == again.toSeq.map(_.toString))
  }

  test("feature extraction and frame sampling keep their shapes") {
    import spark.implicits._
    val media = Seq(
      Media(1L, "image", "aaa".getBytes("UTF-8")),
      Media(2L, "video", "bbb".getBytes("UTF-8"))).toDS()
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.length == 2 && feats.forall(_.feature.length == 16))
    val frames = Multimodal.sampleFrames(media, n = 4).collect()
    assert(frames.map(_.media_id).distinct.toSeq == Seq(2L), "frames only for video")
    assert(frames.length == 4 && frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(frames.map(_.ts_ms).distinct.length == 4, "timestamps spread over duration")
  }
}
