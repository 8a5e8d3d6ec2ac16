package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{HeaderCodec, Media}

/** L12 multimodal plumbing: the container-header codec parses REAL
  * PNG/GIF/BMP/JPEG dimensions, WAV channels+duration and MP4 (ISO-BMFF)
  * duration+track dims from raw bytes (public format specs, no codec
  * library), non-media payloads fall back to the deterministic stub,
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
    assert(HeaderCodec.parse(png).contains(("png", 640, 480, 4, 0L)))
    val gray = png.clone(); gray(25) = 0x00 // color type 0 → 1 channel
    assert(HeaderCodec.parse(gray).contains(("png", 640, 480, 1, 0L)))
  }

  test("GIF header: LE logical-screen dimensions") {
    val gif = bytes('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, // width 320 LE
      0xc8, 0x00, // height 200 LE
      0x00, 0x00)
    assert(HeaderCodec.parse(gif).contains(("gif", 320, 200, 3, 0L)))
    assert(HeaderCodec.parse(gif.updated(4, '7'.toByte)).contains(("gif", 320, 200, 3, 0L)))
  }

  test("BMP header: BITMAPINFOHEADER dims, top-down negative height, bpp") {
    val bmp = bytes(
      'B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 0x36, 0, 0, 0, // file header
      0x28, 0x00, 0x00, 0x00, // DIB size 40
      0x64, 0x00, 0x00, 0x00, // width 100
      0xce, 0xff, 0xff, 0xff, // height -50 (top-down)
      0x01, 0x00, // planes
      0x18, 0x00) // 24 bpp
    assert(HeaderCodec.parse(bmp).contains(("bmp", 100, 50, 3, 0L)))
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
    assert(HeaderCodec.parse(jpg).contains(("jpeg", 640, 480, 3, 0L)))
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
    assert(HeaderCodec.parse(padded).contains(("jpeg", 640, 480, 3, 0L)))
  }

  private def le16b(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def be32b(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64b(v: Long): Array[Byte] = be32b(v >>> 32) ++ be32b(v & 0xffffffffL)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def wavFixture(channels: Int, byteRate: Int, dataSize: Int, present: Int): Array[Byte] = {
    val fmt = le16b(1) ++ le16b(channels) ++ le32b(8000) ++ le32b(byteRate) ++
      le16b(4) ++ le16b(16)
    ascii("RIFF") ++ le32b(36 + dataSize) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32b(16) ++ fmt ++
      ascii("data") ++ le32b(dataSize) ++ new Array[Byte](present)
  }

  test("WAV header: channels + duration from fmt/data chunks; truncated data tolerated") {
    // 2ch, byteRate 16000, 32000 data bytes → 2000 ms
    assert(HeaderCodec.parse(wavFixture(2, 16000, 32000, 32000))
      .contains(("wav", 0, 0, 2, 2000L)))
    // truncated tail: only 8000 of the declared 32000 bytes present → 500 ms
    assert(HeaderCodec.parse(wavFixture(2, 16000, 32000, 8000))
      .contains(("wav", 0, 0, 2, 500L)))
    // mono
    assert(HeaderCodec.parse(wavFixture(1, 8000, 8000, 8000))
      .contains(("wav", 0, 0, 1, 1000L)))
    // RIFF but not WAVE → not a wav
    val avi = ascii("RIFF") ++ le32b(4) ++ ascii("AVI ")
    assert(HeaderCodec.parse(avi).isEmpty)
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32b(8L + payload.length) ++ ascii(typ) ++ payload

  test("MP4 header: mvhd duration + first video tkhd 16.16 dims") {
    // mvhd v0: ver/flags 4 + creation/modification 8 + timescale 4 + duration 4
    // + rate/volume/reserved/matrix/predefines 76 = 96-byte payload
    val mvhd0 = box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32b(0) ++ be32b(0) ++
      be32b(1000) ++ be32b(5000) ++ new Array[Byte](76))
    // tkhd v0: ver/flags 4 + times/id/reserved/duration 20 + reserved 8 +
    // layer/alt/volume/reserved 8 + matrix 36 + width 4 + height 4 = 84
    val tkhd0 = box("tkhd", Array[Byte](0, 0, 0, 0) ++ new Array[Byte](72) ++
      be32b(640L << 16) ++ be32b(360L << 16))
    val moov = box("moov", mvhd0 ++ box("trak", tkhd0))
    val ftyp = box("ftyp", ascii("isom") ++ be32b(0))
    assert(HeaderCodec.parse(ftyp ++ moov).contains(("mp4", 640, 360, 0, 5000L)))

    // v1 mvhd (64-bit times/duration), v1 tkhd — and moov after a free box
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64b(0) ++ be64b(0) ++
      be32b(90000) ++ be64b(90000L * 7) ++ new Array[Byte](76))
    val tkhd1 = box("tkhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](84) ++
      be32b(1280L << 16) ++ be32b(720L << 16))
    val mp4v1 = ftyp ++ box("free", new Array[Byte](12)) ++
      box("moov", mvhd1 ++ box("trak", tkhd1))
    assert(HeaderCodec.parse(mp4v1).contains(("mp4", 1280, 720, 0, 7000L)))

    // audio-only mp4: no tkhd dims, duration still parsed
    val moovAudio = box("moov", mvhd0)
    assert(HeaderCodec.parse(ftyp ++ moovAudio).contains(("mp4", 0, 0, 0, 5000L)))

    // malformed: ftyp but no moov → None; truncated moov size → no crash
    assert(HeaderCodec.parse(ftyp).isEmpty)
    val lyingSize = ftyp ++ be32b(1 << 20) ++ ascii("moov")
    assert(HeaderCodec.parse(lyingSize).isEmpty)
  }

  test("BMP pixel decode: golden vectors for 24bpp bottom-up, padding excluded") {
    import graft.operators.Multimodal.SampleCodec
    // 2×2 24bpp: stride = 8 (2 pad bytes per row), pixel bytes chosen by hand
    val row0 = bytes(10, 20, 30, 40, 50, 60, 0, 0)
    val row1 = bytes(70, 80, 90, 100, 110, 120, 0, 0)
    val hdr = ascii("BM") ++ le32b(54 + 16) ++ le16b(0) ++ le16b(0) ++ le32b(54) ++
      le32b(40) ++ le32b(2) ++ le32b(2) ++ le16b(1) ++ le16b(24) ++
      le32b(0) ++ le32b(16) ++ new Array[Byte](16)
    val bmp = hdr ++ row0 ++ row1
    val s = SampleCodec.bmpPixels(bmp).get
    val vals = Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    assert(s.n == 12, "padding bytes must not count as pixels")
    assert(s.mean == vals.sum.toDouble / 12)
    assert(s.rms == math.sqrt(vals.map(v => v.toLong * v).sum.toDouble / 12))
    assert(s.peak == 120.0)
    // top-down (negative height): same statistics
    val topDown = bmp.clone()
    val neg = le32b(-2L & 0xffffffffL)
    System.arraycopy(neg, 0, topDown, 22, 4)
    assert(SampleCodec.bmpPixels(topDown).get == s)
    // truncated pixel data: only the bytes present decode
    val trunc = SampleCodec.bmpPixels(bmp.dropRight(8)).get
    assert(trunc.n == 6 && trunc.peak == 60.0)
    // compressed (BI_RLE8) refuses rather than misreads
    val rle = bmp.clone(); rle(30) = 1
    assert(SampleCodec.bmpPixels(rle).isEmpty)
  }

  test("WAV PCM decode: golden int16 sample statistics; non-PCM refused") {
    import graft.operators.Multimodal.SampleCodec
    val samples = Seq[Short](100, -200, 32767, -32768)
    val data = samples.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val wav = Multimodal.ContainerCodec.wav(data, channels = 1, sampleRate = 8000)
    val s = SampleCodec.wavSamples(wav).get
    assert(s.n == 4)
    assert(s.mean == samples.map(_.toLong).sum.toDouble / 4)
    assert(s.rms == math.sqrt(samples.map(v => v.toLong * v).sum.toDouble / 4))
    assert(s.peak == 32768.0)
    // 8-bit (bitsPerSample ≠ 16) refused — the decoder only claims int16 PCM
    val w8 = wav.clone(); w8(34) = 8
    assert(SampleCodec.wavSamples(w8).isEmpty)
  }

  test("decode pipeline carries real BMP/WAV sample stats; stubs stay zero") {
    import spark.implicits._
    val pix = bytes(1, 2, 3, 4, 5, 6) // tiles a 1×2 bmp exactly
    val media = Seq(
      Media(1L, "image", Multimodal.ContainerCodec.bmp(pix, width = 1, height = 2)),
      Media(2L, "audio", Multimodal.ContainerCodec.wav(
        bytes(0x10, 0x00, 0xf0, 0xff), channels = 1, sampleRate = 8000)), // +16, -16
      Media(3L, "video", Multimodal.ContainerCodec.mp4(2000L, 320, 240, pix))).toDS()
    val out = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out(0).container == "bmp" && out(0).n_samples == 6 &&
      out(0).sample_mean == 3.5 && out(0).sample_peak == 6.0)
    assert(out(1).container == "wav" && out(1).n_samples == 2 &&
      out(1).sample_mean == 0.0 && out(1).sample_peak == 16.0)
    assert(out(2).container == "mp4" && out(2).n_samples == 0L,
      "mp4 payload decode is the documented stub — stats must stay zero, not fake")
  }

  test("decode: parseable header over undecodable payload is ok=false, mp4 stub stays ok") {
    import spark.implicits._
    val good = Multimodal.ContainerCodec.png(Array.fill(4 * 4 * 3)(7.toByte), 4, 4)
    // chunk surgery: keep the (valid) IHDR so the header parses, but swap in
    // an IDAT whose DEFLATE stream is truncated behind a CORRECT chunk CRC —
    // pixel decode must fail while HeaderCodec still reports a png
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]) = {
      val c = new java.util.zip.CRC32()
      c.update(typ.getBytes("US-ASCII")); c.update(data)
      be32(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32(c.getValue)
    }
    val short = {
      val d = new java.util.zip.Deflater()
      d.setInput(new Array[Byte](4 * (1 + 4 * 3))); d.finish()
      val buf = new Array[Byte](256); val o = new java.io.ByteArrayOutputStream()
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray.dropRight(4)
    }
    val evil = good.slice(0, 8 + 25) ++ // signature + the original IHDR chunk
      chunk("IDAT", short) ++ chunk("IEND", Array.emptyByteArray)
    val media = Seq(
      Media(1L, "image", evil),
      Media(2L, "video", Multimodal.ContainerCodec.mp4(2000L, 320, 240, bytes(1, 2, 3)))).toDS()
    val out = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out(0).container == "png" && !out(0).ok && out(0).n_samples == 0L,
      "a failed pixel decode must not present zero stats as ok")
    assert(out(1).container == "mp4" && out(1).ok && out(1).n_samples == 0L,
      "the documented mp4 header-only stub keeps ok=true")
  }

  test("extractFeatures: non-square dim pools an exact grid over the WHOLE image") {
    import spark.implicits._
    // 4×8 top-down raster: rows 0-5 gray 100, rows 6-7 gray 200. dim=12 →
    // a 3×4 grid whose bottom pooled row must see the bright band; the old
    // ⌈√12⌉²-then-truncate pooling dropped the bottom rows entirely and
    // returned an all-≈100 vector
    val payload = Array.tabulate(4 * 8 * 3) { i =>
      (if (i / (4 * 3) < 6) 100 else 200).toByte
    }
    val img = Multimodal.ContainerCodec.png(payload, width = 4, height = 8)
    val media = Seq(Media(1L, "image", img)).toDS()
    val f = Multimodal.extractFeatures(media, dim = 12).collect().head.feature
    assert(f.length == 12)
    assert(f.take(4).forall(v => math.abs(v - 100f / 255f) < 2e-3f), f.toSeq.toString)
    assert(f.drop(8).forall(v => math.abs(v - 200f / 255f) < 2e-3f),
      s"bottom pooled row must reflect the bottom image rows: ${f.toSeq}")
  }

  test("ContainerCodec.bmp ∘ decode = identity on dims and tiled pixel stats") {
    import graft.operators.Multimodal.{ContainerCodec, SampleCodec}
    val rnd = new scala.util.Random(77)
    (0 until 20).foreach { trial =>
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(9)
      val payload = Array.fill(1 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val b = ContainerCodec.bmp(payload, w, h)
      assert(HeaderCodec.parse(b).contains(("bmp", w, h, 3, 0L)), s"trial $trial")
      val s = SampleCodec.bmpPixels(b).get
      assert(s.n == w.toLong * h * 3, s"trial $trial n")
      // reference stats straight from the tiling rule
      val vals = (0L until w.toLong * h * 3).map(i => payload((i % payload.length).toInt) & 0xff)
      assert(s.mean == vals.map(_.toLong).sum.toDouble / s.n, s"trial $trial mean")
      assert(s.peak == vals.max.toDouble, s"trial $trial peak")
    }
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

  test("ContainerCodec encode ∘ HeaderCodec parse = identity on metadata") {
    import graft.operators.Multimodal.ContainerCodec
    val payload = "pcm-ish payload bytes".getBytes("UTF-8")
    // wav: duration = payload / (sampleRate * channels * bytesPerSample)
    val w = ContainerCodec.wav(new Array[Byte](16000), channels = 2, sampleRate = 4000)
    assert(HeaderCodec.parse(w).contains(("wav", 0, 0, 2, 1000L)))
    val v = ContainerCodec.mp4(7500L, 640, 360, payload)
    assert(HeaderCodec.parse(v).contains(("mp4", 640, 360, 0, 7500L)))
    val a = ContainerCodec.mp4(3000L, 0, 0, payload)
    assert(HeaderCodec.parse(a).contains(("mp4", 0, 0, 0, 3000L)))
  }

  test("property: ContainerCodec round-trips randomized params exactly") {
    import graft.operators.Multimodal.ContainerCodec
    val rnd = new scala.util.Random(424242L)
    (0 until 50).foreach { trial =>
      val ch = 1 + rnd.nextInt(8)
      val rate = 1000 * (1 + rnd.nextInt(48))
      val bps = 1 + rnd.nextInt(3)
      val nBytes = rnd.nextInt(100000)
      val w = ContainerCodec.wav(new Array[Byte](nBytes), ch, rate, bps)
      val wantDur = nBytes.toLong * 1000 / (rate.toLong * ch * bps)
      assert(HeaderCodec.parse(w).contains(("wav", 0, 0, ch, wantDur)), s"wav trial $trial")

      val durMs = rnd.nextInt(1 << 20).toLong
      val (vw, vh) =
        if (rnd.nextBoolean()) (16 * (1 + rnd.nextInt(300)), 16 * (1 + rnd.nextInt(200)))
        else (0, 0)
      val m = ContainerCodec.mp4(durMs, vw, vh, new Array[Byte](rnd.nextInt(4096)))
      val want = if (durMs == 0 && vw == 0) None else Some(("mp4", vw, vh, 0, durMs))
      assert(HeaderCodec.parse(m) == want, s"mp4 trial $trial ($durMs, $vw, $vh)")
    }
  }

  test("asMedia: real WAV/MP4 containers; image rows cycle BMP/PNG/GIF/raw with real pixel stats") {
    import spark.implicits._
    val df = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"), (5L, "five"),
      (6L, "six pixels worth of text"), (9L, "nine"), (12L, "twelve's payload bytes"))
      .toDF("id", "payload")
    val out = Multimodal.decode(
      Multimodal.asMedia(spark, df, "id", "payload")).collect().sortBy(_.media_id)
    val byId = out.map(o => o.media_id -> o).toMap
    // kind by id % 3: 1→audio, 2→video, 0→image
    assert(byId(1L).container == "wav" && byId(1L).channels == 2 && byId(1L).ok)
    assert(byId(1L).n_samples > 0, "wav rows must carry real PCM stats")
    assert(byId(4L).container == "wav" && byId(4L).channels == 1)
    assert(byId(2L).container == "mp4" && byId(2L).width == 640
      && byId(2L).duration_ms == 1500L)
    assert(byId(5L).container == "mp4" && byId(5L).duration_ms == 2250L)
    // image variant cycles by (id/3) % 4: BMP, PNG, GIF, raw fallback —
    // all three real encoders decode back with genuine pixel statistics
    assert(byId(12L).container == "bmp" && byId(12L).width == 8 && byId(12L).height == 5)
    assert(byId(12L).n_samples == 8L * 5 * 3 && byId(12L).sample_peak > 0)
    assert(byId(3L).container == "png" && byId(3L).width == 7 && byId(3L).height == 6)
    assert(byId(3L).n_samples == 7L * 6 * 3 && byId(3L).sample_peak > 0,
      "png rows must decode through the from-scratch inflate+unfilter path")
    assert(byId(6L).container == "gif" && byId(6L).width == 10 && byId(6L).height == 4)
    assert(byId(6L).n_samples == 10L * 4 * 3 && byId(6L).sample_peak > 0,
      "gif rows must decode through the from-scratch LZW path")
    assert(byId(9L).container == "unknown" && byId(9L).ok, "every 4th image keeps the fallback path")
  }

  test("thumbnails: real decode → bilinear resize → real PNG, aspect preserved") {
    import spark.implicits._
    import graft.operators.PixelCodecs
    val const = Array.fill(3)(100.toByte) // tiles to a constant-color image
    val media = Seq(
      Media(1L, "image", Multimodal.ContainerCodec.bmp(const, width = 16, height = 8)),
      Media(2L, "image", Multimodal.ContainerCodec.png(const, width = 4, height = 4)),
      Media(3L, "image", "not an image".getBytes("UTF-8")),
      Media(4L, "audio", Multimodal.ContainerCodec.wav(const, 1, 8000))).toDS()
    val thumbs = Multimodal.thumbnails(media, maxW = 8, maxH = 8)
      .collect().sortBy(_.media_id)
    // only the two decodable images produce thumbs
    assert(thumbs.map(_.media_id).toSeq == Seq(1L, 2L))
    // 16x8 fits an 8x8 box at scale 0.5 → 8x4; 4x4 is already inside → untouched
    assert(thumbs(0).src_width == 16 && thumbs(0).src_height == 8 &&
      thumbs(0).width == 8 && thumbs(0).height == 4)
    assert(thumbs(1).width == 4 && thumbs(1).height == 4)
    // the thumb PNG is a REAL image: decodes through the from-scratch
    // decoder with the right dims and the constant color preserved exactly
    val back = PixelCodecs.Png.decode(thumbs(0).png).getOrElse(fail("thumb png undecodable"))
    assert(back.width == 8 && back.height == 4 && back.channels == 3)
    assert(back.pixels.forall(_ == 100.toByte), "constant image must thumbnail to itself")
    // determinism
    val again = Multimodal.thumbnails(media, maxW = 8, maxH = 8).collect().sortBy(_.media_id)
    assert(again(0).png.toSeq == thumbs(0).png.toSeq)
  }

  test("extractFeatures: real pooled luma for images, real PCM window-RMS for wav") {
    import spark.implicits._
    // constant 100-gray image → every pooled-luma cell is exactly 100/255
    val img = Multimodal.ContainerCodec.bmp(Array.fill(3)(100.toByte), width = 9, height = 7)
    // constant-amplitude PCM (+1000) → every window RMS is exactly 1000/32768
    val pcm = Array.fill(64)(Seq(0xe8.toByte, 0x03.toByte)).flatten.toArray
    val wav = Multimodal.ContainerCodec.wav(pcm, channels = 1, sampleRate = 8000)
    val media = Seq(
      Media(1L, "image", img),
      Media(2L, "audio", wav),
      Media(3L, "image", "no decode path".getBytes("UTF-8"))).toDS()
    val f = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
      .map(x => x.media_id -> x.feature).toMap
    assert(f(1L).forall(v => math.abs(v - 100f / 255f) < 1e-6f), f(1L).toSeq.toString)
    assert(f(2L).length == 16 && f(2L).forall(v => math.abs(v - 1000f / 32768f) < 1e-6f))
    // stub fallback stays deterministic and in [0,1)
    assert(f(3L).forall(v => v >= 0f && v < 1f))
    val again = Multimodal.extractFeatures(media, dim = 16).collect()
      .sortBy(_.media_id).map(_.feature.toSeq).toSeq
    assert(again == f.toSeq.sortBy(_._1).map(_._2.toSeq))
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
