package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PixelCodecs
import graft.operators.PixelCodecs.{Gif, Jpeg, Png, Raster}
import graft.operators.Multimodal.ContainerCodec

/** From-scratch PNG/GIF decoder verification. The independent oracle is the
  * JDK's ImageIO ENCODERS (javax.imageio — a codebase entirely disjoint
  * from ours): rasters with known pixels are encoded by ImageIO across its
  * image-type zoo (RGB, gray, RGBA, palette, 1-bit) and must decode back
  * byte-identical through [[PixelCodecs]]. Filter and interlace coverage
  * the encoders don't guarantee is pinned with hand-built spec vectors
  * (every PNG filter type, Adam7, GIF row interlacing), and the repo's own
  * write-side encoders ([[ContainerCodec.png]]/[[ContainerCodec.gif]])
  * round-trip through them.
  */
class PixelCodecsSpec extends AnyFunSuite {

  import java.awt.image.BufferedImage

  /** Deterministic test image: every pixel a distinct-ish RGB. */
  private def mkImage(w: Int, h: Int, typ: Int): BufferedImage = {
    val img = new BufferedImage(w, h, typ)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 37 + y * 11) % 256
      val g = (x * 5 + y * 83) % 256
      val b = (x * 121 + y * 29) % 256
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"ImageIO cannot write $fmt")
    out.toByteArray
  }

  /** Compare a decoded raster against the image's stored sRGB values via
    * getRGB (exact for sRGB-stored types). Gray rasters compare against the
    * raw raster samples instead — getRGB would colorspace-convert them.
    */
  private def assertMatches(r: Raster, img: BufferedImage): Unit = {
    assert(r.width == img.getWidth && r.height == img.getHeight)
    for (y <- 0 until r.height; x <- 0 until r.width) {
      val base = (y * r.width + x) * r.channels
      if (r.channels >= 3) {
        val p = img.getRGB(x, y)
        val got = ((r.pixels(base) & 0xff) << 16) |
          ((r.pixels(base + 1) & 0xff) << 8) | (r.pixels(base + 2) & 0xff)
        assert(got == (p & 0xffffff), s"RGB mismatch at ($x,$y): got ${got.toHexString} want ${(p & 0xffffff).toHexString}")
        if (r.channels == 4)
          assert((r.pixels(base + 3) & 0xff) == ((p >>> 24) & 0xff), s"alpha mismatch at ($x,$y)")
      } else {
        val want = img.getRaster.getSample(x, y, 0)
        val scale = img.getColorModel.getPixelSize match {
          case 1 => 255; case 2 => 85; case 4 => 17; case _ => 1
        }
        assert((r.pixels(base) & 0xff) == want * scale, s"gray mismatch at ($x,$y)")
      }
    }
  }

  // ---------------------------------------------------------------- PNG

  test("PNG decode matches ImageIO encoder across the image-type zoo") {
    for (typ <- Seq(BufferedImage.TYPE_3BYTE_BGR, BufferedImage.TYPE_INT_RGB,
        BufferedImage.TYPE_4BYTE_ABGR)) {
      val img = mkImage(13, 7, typ)
      val r = Png.decode(encode(img, "png")).getOrElse(fail(s"decode failed for type $typ"))
      assertMatches(r, img)
    }
    // 8-bit grayscale (PNG color type 0)
    val gray = mkImage(9, 5, BufferedImage.TYPE_BYTE_GRAY)
    val gr = Png.decode(encode(gray, "png")).get
    assert(gr.channels == 1)
    assertMatches(gr, gray)
    // 1-bit black/white (depth-1 coverage)
    val bw = mkImage(17, 4, BufferedImage.TYPE_BYTE_BINARY)
    val br = Png.decode(encode(bw, "png")).get
    for (y <- 0 until 4; x <- 0 until 17) {
      val want = bw.getRGB(x, y) & 0xff // palette is pure black/white
      val base = (y * 17 + x) * br.channels
      assert((br.pixels(base) & 0xff) == want, s"bw mismatch at ($x,$y)")
    }
    // palette (PNG color type 3): indexed image round-trips losslessly
    val pal = mkImage(11, 6, BufferedImage.TYPE_BYTE_INDEXED)
    val pr = Png.decode(encode(pal, "png")).get
    assert(pr.channels == 3)
    assertMatches(pr, pal)
  }

  /** Hand-built PNG with a specific filter type on every scanline — the
    * coverage an adaptive encoder can't guarantee.
    */
  private def pngWithFilters(w: Int, h: Int, pixels: Array[Byte], filters: Int => Int): Array[Byte] = {
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val lb = w * 3
    val raw = new java.io.ByteArrayOutputStream()
    val prev = new Array[Byte](lb)
    for (y <- 0 until h) {
      val ft = filters(y)
      raw.write(ft)
      val cur = java.util.Arrays.copyOfRange(pixels, y * lb, (y + 1) * lb)
      val filtered = new Array[Byte](lb)
      for (k <- 0 until lb) {
        val x = cur(k) & 0xff
        val a = if (k >= 3) cur(k - 3) & 0xff else 0
        val up = prev(k) & 0xff
        val c = if (k >= 3) prev(k - 3) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - up
          case 3 => x - ((a + up) >> 1)
          case 4 => x - paeth(a, up, c)
        }
        filtered(k) = (f & 0xff).toByte
      }
      raw.write(filtered)
      System.arraycopy(cur, 0, prev, 0, lb)
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val buf = new Array[Byte](raw.size() + 64)
    val z = new java.io.ByteArrayOutputStream()
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    pngFromChunks(w, h, z.toByteArray)
  }

  private def pngFromChunks(w: Int, h: Int, idat: Array[Byte], interlace: Int = 0): Array[Byte] = {
    def be32b(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      be32b(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32b(crc.getValue)
    }
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", be32b(w) ++ be32b(h) ++ Array[Byte](8, 2, 0, 0, interlace.toByte)) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.emptyByteArray)
  }

  test("PNG unfiltering: every filter type (None/Sub/Up/Average/Paeth) inverts exactly") {
    val w = 6; val h = 5
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 89 + 7) % 256).toByte)
    // rows use filters 0,1,2,3,4 in order — all five on one image
    val png = pngWithFilters(w, h, pixels, y => y % 5)
    val r = Png.decode(png).getOrElse(fail("filtered png did not decode"))
    assert(r.pixels.toSeq == pixels.toSeq)
  }

  test("PNG Adam7 interlaced image decodes to the original raster") {
    val w = 9; val h = 10 // deliberately not multiples of 8
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 31 + 5) % 256).toByte)
    // build the interlaced raw stream: 7 passes, filter 0 per scanline
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val raw = new java.io.ByteArrayOutputStream()
    for ((xs, ys, xst, yst) <- passes) {
      val pw = math.max(0, (w - xs + xst - 1) / xst)
      val ph = math.max(0, (h - ys + yst - 1) / yst)
      if (pw > 0 && ph > 0) {
        for (row <- 0 until ph) {
          raw.write(0) // filter None
          for (px <- 0 until pw; ch <- 0 until 3)
            raw.write(pixels(((ys + row * yst) * w + (xs + px * xst)) * 3 + ch) & 0xff)
        }
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val buf = new Array[Byte](raw.size() + 64)
    val z = new java.io.ByteArrayOutputStream()
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    val r = Png.decode(pngFromChunks(w, h, z.toByteArray, interlace = 1))
      .getOrElse(fail("interlaced png did not decode"))
    assert(r.width == w && r.height == h && r.channels == 3)
    assert(r.pixels.toSeq == pixels.toSeq)
  }

  test("PNG rejects corruption: CRC flip, truncated IDAT, oversized raster, bad signature") {
    val img = mkImage(8, 8, BufferedImage.TYPE_3BYTE_BGR)
    val good = encode(img, "png")
    assert(Png.decode(good).isDefined)
    // flip one byte inside the IDAT payload: CRC verification must refuse
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    assert(Png.decode(corrupt).isEmpty)
    // truncated: drop the tail (loses IEND and part of IDAT)
    assert(Png.decode(good.dropRight(24)).isEmpty)
    // output cap: a legal image whose raster exceeds maxPixelBytes is refused
    assert(Png.decode(good, maxPixelBytes = 10).isEmpty)
    assert(Png.decode("not a png at all".getBytes("UTF-8")).isEmpty)
    assert(Png.decode(null).isEmpty)
    // truncated DEFLATE stream behind valid chunk CRCs: strict refusal
    val short = {
      val d = new java.util.zip.Deflater()
      d.setInput(new Array[Byte](8 * (1 + 8 * 3))); d.finish()
      val buf = new Array[Byte](1024)
      val z = new java.io.ByteArrayOutputStream()
      while (!d.finished()) z.write(buf, 0, d.deflate(buf))
      d.end()
      z.toByteArray.dropRight(4)
    }
    assert(Png.decode(pngFromChunks(8, 8, short)).isEmpty)
  }

  test("ContainerCodec.png round-trips through the from-scratch decoder") {
    val payload = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val png = ContainerCodec.png(payload, width = 7, height = 4)
    val r = Png.decode(png).getOrElse(fail("encoder output did not decode"))
    assert(r.width == 7 && r.height == 4 && r.channels == 3)
    for (i <- r.pixels.indices)
      assert(r.pixels(i) == payload(i % payload.length), s"pixel byte $i")
    // and the header parser agrees with the decoder
    import graft.operators.Multimodal.HeaderCodec
    assert(HeaderCodec.parse(png).contains(("png", 7, 4, 3, 0L)))
  }

  // ---------------------------------------------------------------- GIF

  test("GIF decode matches ImageIO encoder on an indexed image") {
    val img = mkImage(12, 9, BufferedImage.TYPE_BYTE_INDEXED)
    val r = Gif.decode(encode(img, "gif")).getOrElse(fail("gif did not decode"))
    assertMatches(r, img)
  }

  test("ContainerCodec.gif round-trips through the from-scratch LZW decoder") {
    // payload long enough to force several CLEAR blocks (> 2*254 pixels)
    val payload = Array.tabulate(700)(i => ((i * 13 + 5) % 256).toByte)
    val gif = ContainerCodec.gif(payload, width = 25, height = 28)
    val r = Gif.decode(gif).getOrElse(fail("gif encoder output did not decode"))
    assert(r.width == 25 && r.height == 28 && r.channels == 3)
    for (i <- 0 until 25 * 28) {
      val want = payload(i % payload.length) & 0xff // grayscale palette: index == level
      assert((r.pixels(i * 3) & 0xff) == want && (r.pixels(i * 3 + 1) & 0xff) == want &&
        (r.pixels(i * 3 + 2) & 0xff) == want, s"pixel $i")
    }
    import graft.operators.Multimodal.HeaderCodec
    assert(HeaderCodec.parse(gif).contains(("gif", 25, 28, 3, 0L)))
  }

  test("GIF interlaced frame decodes with rows de-interlaced") {
    val w = 5; val h = 11 // odd height exercises all four interlace passes
    val payload = Array.tabulate(w * h)(i => ((i * 7 + 3) % 256).toByte)
    val plain = ContainerCodec.gif(payload, w, h)
    // rebuild: same stream but flagged interlaced, pixel rows in pass order
    val passOrder = (Iterator.range(0, h, 8) ++ Iterator.range(4, h, 8) ++
      Iterator.range(2, h, 4) ++ Iterator.range(1, h, 2)).toArray
    val reordered = new Array[Byte](w * h)
    for (r <- 0 until h; x <- 0 until w)
      reordered(r * w + x) = payload(passOrder(r) * w + x)
    val inter = ContainerCodec.gif(reordered, w, h)
    // set the interlace bit in the image descriptor's packed byte:
    // header 6 + LSD 7 + GCT 768, then 0x2C + 9 bytes → packed at +9
    val idesc = 6 + 7 + 768
    assert(inter(idesc) == 0x2c.toByte)
    inter(idesc + 9) = (inter(idesc + 9) | 0x40).toByte
    val r = Gif.decode(inter).getOrElse(fail("interlaced gif did not decode"))
    val rp = Gif.decode(plain).get
    assert(r.pixels.toSeq == rp.pixels.toSeq, "de-interlaced pixels must equal the plain frame")
  }

  test("GIF rejects corruption: truncated stream, code-space gap, early EOI") {
    val payload = Array.tabulate(64)(_.toByte)
    val gif = ContainerCodec.gif(payload, 8, 8)
    assert(Gif.decode(gif).isDefined)
    assert(Gif.decode(gif.dropRight(12)).isEmpty) // truncated mid-frame
    assert(Gif.decode(null).isEmpty)
    assert(Gif.decode("GIF89a but not really".getBytes("UTF-8")).isEmpty)
    // LZW-level: a gap in the code space is corrupt
    assert(Gif.lzw(Array[Byte](-1, -1, -1), minCode = 8, nPixels = 4).isEmpty)
    // early EOI: CLEAR(256) then EOI(257) before any pixel, 9-bit LSB-first
    val bits = new java.io.ByteArrayOutputStream()
    var buf = 0L; var cnt = 0
    for (code <- Seq(256, 257)) {
      buf |= (code.toLong & 0x1ff) << cnt; cnt += 9
      while (cnt >= 8) { bits.write((buf & 0xff).toInt); buf >>>= 8; cnt -= 8 }
    }
    if (cnt > 0) bits.write((buf & 0xff).toInt)
    assert(Gif.lzw(bits.toByteArray, minCode = 8, nPixels = 4).isEmpty)
  }

  // ----------------------------------------------------------- BMP raster

  test("BMP raster decode: BGR→RGB + bottom-up flip, against the ImageIO encoder") {
    val img = mkImage(10, 6, BufferedImage.TYPE_3BYTE_BGR)
    val r = PixelCodecs.Bmp.decode(encode(img, "bmp")).getOrElse(fail("bmp did not decode"))
    assertMatches(r, img)
    assert(PixelCodecs.Bmp.decode(encode(img, "bmp"), maxPixelBytes = 10).isEmpty)
    assert(PixelCodecs.Bmp.decode(null).isEmpty)
    // decodeImage dispatches all four containers by magic bytes
    assert(PixelCodecs.decodeImage(encode(img, "bmp")).isDefined)
    assert(PixelCodecs.decodeImage(encode(img, "png")).isDefined)
    assert(PixelCodecs.decodeImage(encode(img, "gif")).isDefined)
    assert(PixelCodecs.decodeImage(encode(img, "jpg")).isDefined)
    assert(PixelCodecs.decodeImage("text".getBytes("UTF-8")).isEmpty)
  }

  // --------------------------------------------------------------- resize

  test("resizeBilinear: identity, constant preservation, exact 2x2→1x1 average") {
    import PixelCodecs.{resizeBilinear, Raster}
    val r = Raster(4, 3, 3, Array.tabulate(36)(i => ((i * 53 + 9) % 256).toByte))
    assert(resizeBilinear(r, 4, 3) eq r, "identity resize is a passthrough")
    // constant image stays exactly constant at any target size
    val const = Raster(7, 5, 3, Array.fill(105)(123.toByte))
    for ((tw, th) <- Seq((3, 2), (14, 10), (1, 1)))
      assert(resizeBilinear(const, tw, th).pixels.forall(_ == 123.toByte), s"const ${tw}x$th")
    // 2x2 → 1x1 with half-pixel centers samples the exact 4-pixel average
    val quad = Raster(2, 2, 1, Array[Byte](10, 20, 30, 60))
    assert((resizeBilinear(quad, 1, 1).pixels(0) & 0xff) == 30) // (10+20+30+60)/4
    // upscale of a 2-pixel gradient interpolates monotonically
    val grad = Raster(2, 1, 1, Array[Byte](0, 100))
    val up = resizeBilinear(grad, 4, 1).pixels.map(_ & 0xff)
    assert(up.toSeq == up.toSeq.sorted && up.head <= 25 && up.last >= 75, up.toSeq.toString)
  }

  test("toRgb and toGray channel normalization") {
    import PixelCodecs.{toGray, toRgb, Raster}
    val gray = Raster(2, 1, 1, Array[Byte](7, 19))
    assert(toRgb(gray).pixels.toSeq == Seq[Byte](7, 7, 7, 19, 19, 19))
    val rgba = Raster(1, 1, 4, Array[Byte](1, 2, 3, 9))
    assert(toRgb(rgba).pixels.toSeq == Seq[Byte](1, 2, 3))
    // BT.601 integer luma on a pure-red pixel: 255*299/1000 = 76
    val red = Raster(1, 1, 3, Array[Byte](-1, 0, 0))
    assert((toGray(red).pixels(0) & 0xff) == 76)
    assert(toGray(gray) eq gray, "gray passthrough")
  }

  // --------------------------------------------------------------- JPEG

  test("JPEG decodes via the JDK codec; dims agree with the header parser") {
    val img = mkImage(24, 18, BufferedImage.TYPE_3BYTE_BGR)
    val jpg = encode(img, "jpg")
    val r = Jpeg.decode(jpg).getOrElse(fail("jpeg did not decode"))
    assert(r.width == 24 && r.height == 18 && r.channels == 3)
    import graft.operators.Multimodal.HeaderCodec
    val hdr = HeaderCodec.parse(jpg).get
    assert((hdr._1, hdr._2, hdr._3) == (("jpeg", 24, 18)))
    // lossy but close: per-channel mean within a few units of the source
    def mean(bs: Seq[Int]): Double = bs.sum.toDouble / bs.size
    val srcMean = mean(for (y <- 0 until 18; x <- 0 until 24; s <- 0 until 3)
      yield (img.getRGB(x, y) >> (16 - 8 * s)) & 0xff)
    val decMean = mean(r.pixels.toSeq.map(_ & 0xff))
    assert(math.abs(srcMean - decMean) < 4.0, s"jpeg mean drifted: $srcMean vs $decMean")
    assert(Jpeg.decode(jpg, maxPixelBytes = 10).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  // ------------------------------------------- hostile-input fail-closed

  test("PNG hostile chunk length near 2^31 returns None, never throws") {
    // a length field of 0x7FFFFFF0 used to wrap `i + 12 + len` negative,
    // pass the Int bounds check, and throw AIOOBE in the CRC update —
    // crawled media bytes are adversarial, the contract is None
    val good = pngFromChunks(2, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6, 0, 9, 9, 9, 9, 9, 9))
    val evil = good.clone()
    evil(8) = 0x7f.toByte; evil(9) = 0xff.toByte // overwrite IHDR length
    evil(10) = 0xff.toByte; evil(11) = 0xf0.toByte
    assert(Png.decode(evil).isEmpty)
  }

  test("PNG hostile IHDR dimensions near 2^31 return None (cap must not overflow)") {
    // w = h = 0x7FFFFFFF with valid CRCs: w·h·outCh wraps Long past the
    // raster cap; the two-step cap must reject before any allocation
    def be32b(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      be32b(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32b(crc.getValue)
    }
    for ((w, h) <- Seq((0x7fffffffL, 0x7fffffffL), (0x7fffffffL, 2L), (2L, 0x7fffffffL))) {
      val evil = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", be32b(w) ++ be32b(h) ++ Array[Byte](8, 6, 0, 0, 0)) ++
        chunk("IDAT", Array(0x78, 0x9c, 3, 0, 0, 0, 0, 1).map(_.toByte)) ++
        chunk("IEND", Array.emptyByteArray)
      assert(Png.decode(evil).isEmpty, s"w=$w h=$h must fail closed")
    }
  }

  test("PNG hostile FDICT zlib header returns None instead of spinning") {
    // CMF/FLG = 0x78 0x20 sets the FDICT bit with a valid FCHECK
    // (0x7820 % 31 == 0). No PNG encoder emits preset-dictionary zlib, and
    // the JDK Inflater answers such a stream with inflate() == 0 while
    // finished() and needsInput() both stay false — a loop that only bails
    // on needsInput() spins an executor task forever on a chunk-valid file
    val fdict = Array(0x78, 0x20, // zlib header, FDICT set
      0x12, 0x34, 0x56, 0x78,     // DICTID (attacker-chosen, never resolvable)
      0x03, 0x00, 0x00, 0x00, 0x00, 0x01).map(_.toByte)
    assert(Png.decode(pngFromChunks(8, 8, fdict)).isEmpty)
  }
}
