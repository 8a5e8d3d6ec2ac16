package graft.operators

import java.util.zip.{CRC32, Inflater}

/** From-scratch pixel decoders for the entropy-coded web image formats —
  * round 5, closing the L12 stub to video codecs only:
  *
  *  - [[PixelCodecs.Png]]: the PNG spec (W3C / RFC 2083) end to end — chunk
  *    walk with CRC-32 verification, zlib inflate via the JDK's
  *    `java.util.zip.Inflater` (DEFLATE is in the standard library; no
  *    external codec), all five scanline filters (None/Sub/Up/Average/
  *    Paeth), bit depths 1/2/4/8/16, color types 0/2/3/4/6 with palette
  *    expansion, and Adam7 interlacing.
  *  - [[PixelCodecs.Gif]]: GIF87a/89a — logical-screen + image descriptors,
  *    global/local color tables, the GIF variant of LZW (variable 3–12-bit
  *    codes, clear/EOI, the KwKwK case, deferred-clear at 4096), row
  *    de-interlacing; first frame.
  *  - [[PixelCodecs.Jpeg]]: the JDK's own baseline JPEG codec
  *    (`javax.imageio`, part of Java SE's java.desktop module — a
  *    standard-library dependency, not an external lib). Re-implementing
  *    Huffman+IDCT adds no engine value when every deployment JVM ships
  *    one; the from-scratch decoders above cover the formats where we also
  *    need the write side and strict bounds.
  *
  * All decoders are pure `Array[Byte]` kernels with explicit output-size
  * caps (`maxPixelBytes`) so a hostile header can never allocate an
  * unbounded raster inside an executor task — the same fail-closed
  * discipline as the container header parsers. Malformed input returns
  * `None`, never throws.
  *
  * In tests the JDK's ImageIO ENCODERS serve as the independent oracle:
  * rasters with known pixels are encoded by ImageIO and must decode back
  * byte-identical through these from-scratch decoders (PixelCodecsSpec).
  */
object PixelCodecs {

  /** Decoded image: row-major, channel-interleaved, one byte per channel
    * sample (0–255). `channels` is 1 (gray), 2 (gray+alpha), 3 (RGB) or
    * 4 (RGBA).
    */
  final case class Raster(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  // ------------------------------------------------------------------ PNG

  object Png {
    /** Adam7 pass geometry: (xStart, yStart, xStep, yStep) per pass. */
    private val Adam7 = Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
      (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Decode a PNG to an 8-bit-per-channel [[Raster]] (16-bit samples take
      * the high byte — the standard 8-bit reduction; palette images expand
      * to RGB). `None` on anything malformed: bad signature, CRC mismatch,
      * truncated IDAT, palette index out of range, or a raster larger than
      * `maxPixelBytes`.
      */
    def decode(b: Array[Byte], maxPixelBytes: Int = 1 << 26): Option[Raster] = {
      if (b == null || b.length < 57) return None // sig + IHDR + empty IDAT + IEND
      if (be32(b, 0) != 0x89504e47L || be32(b, 4) != 0x0d0a1a0aL) return None
      var i = 8
      var w = 0; var h = 0; var depth = 0; var color = -1; var interlace = 0
      var plte: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      var sawIhdr = false; var sawIend = false
      while (i + 12 <= b.length && !sawIend) {
        val len = be32(b, i).toInt
        // bound check in Long: a hostile length near 2^31 would wrap
        // `i + 12 + len` negative and pass an Int comparison, then throw
        // out-of-bounds in the CRC update instead of returning None
        if (len < 0 || i.toLong + 12L + len > b.length) return None
        val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val crc = new CRC32(); crc.update(b, i + 4, 4 + len)
        if (crc.getValue != be32(b, i + 8 + len)) return None
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = be32(b, i + 8).toInt; h = be32(b, i + 12).toInt
            depth = u8(b, i + 16); color = u8(b, i + 17)
            // compression (8+10) and filter method (8+11) must be 0
            if (u8(b, i + 18) != 0 || u8(b, i + 19) != 0) return None
            interlace = u8(b, i + 20)
            sawIhdr = true
          case "PLTE" =>
            if (len % 3 != 0 || len > 768) return None
            plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
          case "IDAT" => idat.write(b, i + 8, len)
          case "IEND" => sawIend = true
          case _ => () // ancillary chunks (tEXt, tRNS, gAMA, ...) are skipped
        }
        i += 12 + len
      }
      if (!sawIhdr || !sawIend || w <= 0 || h <= 0 || interlace > 1) return None
      // channels per pixel in the CODED stream; legal (color, depth) pairs
      val cpp = color match {
        case 0 => if (Set(1, 2, 4, 8, 16)(depth)) 1 else return None
        case 2 => if (depth == 8 || depth == 16) 3 else return None
        case 3 => if (Set(1, 2, 4, 8)(depth) && plte != null) 1 else return None
        case 4 => if (depth == 8 || depth == 16) 2 else return None
        case 6 => if (depth == 8 || depth == 16) 4 else return None
        case _ => return None
      }
      val outCh = if (color == 3) 3 else cpp
      // two-step cap so the product cannot overflow Long: w,h < 2^31 keeps
      // w*h < 2^62; only once that is ≤ maxPixelBytes (≤ 2^31) is the
      // ×outCh (≤ 4) product formed — a w=h=2^31-1 header would otherwise
      // wrap the single triple product past Long and defeat the cap
      if (w.toLong * h > maxPixelBytes) return None
      if (w.toLong * h * outCh > maxPixelBytes) return None

      // expected raw (filtered) byte count over all passes; empty passes
      // (pass width or height 0) contribute no scanlines at all, per spec
      val passes = if (interlace == 1) Adam7 else Array((0, 0, 1, 1))
      def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
        val (xs, ys, xst, yst) = p
        (math.max(0, (w - xs + xst - 1) / xst), math.max(0, (h - ys + yst - 1) / yst))
      }
      // Long arithmetic: pw·cpp·depth can exceed Int for a caller-raised
      // maxPixelBytes (pw up to 2^31 with h=1); the rawLen ≤ Int.MaxValue
      // check below then rejects before any Int narrowing
      def lineBytes(pw: Int): Long = (pw.toLong * cpp * depth + 7) / 8
      val rawLen = passes.map { p =>
        val (pw, ph) = passDims(p)
        if (pw == 0 || ph == 0) 0L else ph.toLong * (1 + lineBytes(pw))
      }.sum
      if (rawLen > Int.MaxValue) return None

      val raw = new Array[Byte](rawLen.toInt)
      val inf = new Inflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          // inflate() == 0 iff needsInput (truncated stream), needsDictionary
          // (FDICT-flagged zlib header — legal DEFLATE, never produced by PNG
          // encoders, and without a dictionary the Inflater returns 0 forever
          // while finished()/needsInput() both stay false), or finished
          // (stream ended short; the got < raw.length check below also covers
          // it). All three are fail-closed, so any stall rejects the file
          // rather than spinning an executor task.
          if (n == 0) return None
          got += n
        }
        if (got < raw.length) return None
        // drive the stream to its end: verifies the zlib adler-32 trailer
        // (a stream truncated inside the checksum would otherwise pass) and
        // refuses streams carrying MORE scanline data than the header claims
        if (!inf.finished()) {
          val probe = new Array[Byte](1)
          if (inf.inflate(probe) > 0 || !inf.finished()) return None
        }
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()

      val out = new Array[Byte](w * h * outCh)
      val bpp = math.max(1, cpp * depth / 8) // filter distance, per spec
      var pos = 0
      passes.foreach { case pass @ (xs, ys, xst, yst) =>
        val (pw, ph) = passDims(pass)
        if (pw > 0 && ph > 0) {
          val lb = lineBytes(pw).toInt // safe: 1+lb ≤ rawLen ≤ Int.MaxValue
          val prev = new Array[Byte](lb)
          val cur = new Array[Byte](lb)
          var row = 0
          while (row < ph) {
            val ft = u8(raw, pos); pos += 1
            var k = 0
            while (k < lb) {
              val x = u8(raw, pos + k)
              val a = if (k >= bpp) u8(cur, k - bpp) else 0
              val up = u8(prev, k)
              val c = if (k >= bpp) u8(prev, k - bpp) else 0
              val v = ft match {
                case 0 => x
                case 1 => x + a
                case 2 => x + up
                case 3 => x + ((a + up) >> 1)
                case 4 => x + paeth(a, up, c)
                case _ => return None
              }
              cur(k) = (v & 0xff).toByte
              k += 1
            }
            pos += lb
            // extract samples from the unfiltered scanline into the raster
            var px = 0
            while (px < pw) {
              val y = ys + row * yst; val xpix = xs + px * xst
              val outBase = (y.toLong * w + xpix).toInt * outCh
              var ch = 0
              while (ch < cpp) {
                val sampleIdx = px * cpp + ch
                val s8: Int = depth match {
                  case 8 => u8(cur, sampleIdx)
                  case 16 => u8(cur, sampleIdx * 2) // high byte
                  case d => // 1/2/4-bit: MSB-first packing, scale to 0..255
                    val bitPos = sampleIdx * d
                    val sv = (u8(cur, bitPos >> 3) >> (8 - d - (bitPos & 7))) & ((1 << d) - 1)
                    sv * 255 / ((1 << d) - 1)
                }
                if (color == 3) {
                  // palette index — NOT scaled; recompute the raw index
                  val bitPos = sampleIdx * depth
                  val idx =
                    if (depth == 8) u8(cur, sampleIdx)
                    else (u8(cur, bitPos >> 3) >> (8 - depth - (bitPos & 7))) & ((1 << depth) - 1)
                  if (idx * 3 + 2 >= plte.length) return None
                  out(outBase) = plte(idx * 3)
                  out(outBase + 1) = plte(idx * 3 + 1)
                  out(outBase + 2) = plte(idx * 3 + 2)
                } else out(outBase + ch) = (s8 & 0xff).toByte
                ch += 1
              }
              px += 1
            }
            System.arraycopy(cur, 0, prev, 0, lb)
            row += 1
          }
        }
      }
      Some(Raster(w, h, outCh, out))
    }
  }

  // ------------------------------------------------------------------ GIF

  object Gif {
    /** Decode the FIRST image block of a GIF87a/89a to an RGB [[Raster]]
      * with the frame's own dimensions (animation frames after the first,
      * transparency and disposal are out of scope — pixel statistics and
      * features read the first frame). `None` on malformed headers, a
      * missing color table, LZW stream corruption, or an oversized raster.
      */
    def decode(b: Array[Byte], maxPixelBytes: Int = 1 << 26): Option[Raster] = {
      if (b == null || b.length < 14) return None
      if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return None
      val packed = u8(b, 10)
      var i = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 3 * (1 << ((packed & 7) + 1))
        if (i + n > b.length) return None
        gct = java.util.Arrays.copyOfRange(b, i, i + n)
        i += n
      }
      // block walk to the first image descriptor
      while (i < b.length) {
        u8(b, i) match {
          case 0x3b => return None // trailer before any image
          case 0x21 => // extension: label byte then sub-blocks
            i += 2
            while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
            i += 1
          case 0x2c =>
            if (i + 10 > b.length) return None
            val fw = le16(b, i + 5); val fh = le16(b, i + 7)
            val fp = u8(b, i + 9)
            i += 10
            var pal = gct
            if ((fp & 0x80) != 0) {
              val n = 3 * (1 << ((fp & 7) + 1))
              if (i + n > b.length) return None
              pal = java.util.Arrays.copyOfRange(b, i, i + n)
              i += n
            }
            if (pal == null || fw <= 0 || fh <= 0) return None
            if (fw.toLong * fh * 3 > maxPixelBytes) return None
            if (i >= b.length) return None
            val minCode = u8(b, i); i += 1
            if (minCode < 2 || minCode > 8) return None
            // concatenate the data sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            while (i < b.length && u8(b, i) != 0) {
              val n = u8(b, i)
              if (i + 1 + n > b.length) return None
              data.write(b, i + 1, n)
              i += 1 + n
            }
            val indices = lzw(data.toByteArray, minCode, fw * fh).getOrElse(return None)
            // de-interlace: pass row order 0,8,16.. / 4,12.. / 2,6.. / 1,3..
            val rowOrder: Array[Int] =
              if ((fp & 0x40) == 0) Array.range(0, fh)
              else (Iterator.range(0, fh, 8) ++ Iterator.range(4, fh, 8) ++
                Iterator.range(2, fh, 4) ++ Iterator.range(1, fh, 2)).toArray
            val out = new Array[Byte](fw * fh * 3)
            var r = 0
            while (r < fh) {
              val destRow = rowOrder(r)
              var x = 0
              while (x < fw) {
                val idx = u8(indices, r * fw + x)
                if (idx * 3 + 2 >= pal.length) return None
                val o = (destRow * fw + x) * 3
                out(o) = pal(idx * 3); out(o + 1) = pal(idx * 3 + 1); out(o + 2) = pal(idx * 3 + 2)
                x += 1
              }
              r += 1
            }
            return Some(Raster(fw, fh, 3, out))
          case _ => return None
        }
      }
      None
    }

    /** GIF-variant LZW decode to exactly `nPixels` index bytes: LSB-first
      * variable-width codes (minCode+1 … 12 bits), clear resets the table,
      * the first-code-after-clear and KwKwK cases handled, table frozen at
      * 4096 until the next clear (deferred-clear convention).
      */
    private[graft] def lzw(data: Array[Byte], minCode: Int, nPixels: Int): Option[Array[Byte]] = {
      val clear = 1 << minCode
      val eoi = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val first = new Array[Byte](4096) // first byte of each code's expansion
      var j = 0
      while (j < clear) { prefix(j) = -1; suffix(j) = j.toByte; first(j) = j.toByte; j += 1 }
      var codeSize = minCode + 1
      var nextFree = eoi + 1
      var prev = -1
      val out = new Array[Byte](nPixels)
      var outPos = 0
      val stack = new Array[Byte](4096)
      var bitBuf = 0L; var bitCnt = 0; var bytePos = 0
      while (outPos < nPixels) {
        while (bitCnt < codeSize && bytePos < data.length) {
          bitBuf |= (data(bytePos) & 0xffL) << bitCnt; bitCnt += 8; bytePos += 1
        }
        if (bitCnt < codeSize) return None // stream ended mid-frame
        val code = (bitBuf & ((1L << codeSize) - 1)).toInt
        bitBuf >>>= codeSize; bitCnt -= codeSize
        if (code == clear) {
          codeSize = minCode + 1; nextFree = eoi + 1; prev = -1
        } else if (code == eoi) {
          return None // EOI before the frame was full
        } else if (prev == -1) {
          if (code >= clear) return None // first code must be a literal
          out(outPos) = suffix(code); outPos += 1
          prev = code
        } else {
          var cur = code
          var sp = 0
          if (code >= nextFree) {
            if (code != nextFree) return None // gap in the code space: corrupt
            stack(sp) = first(prev); sp += 1 // KwKwK
            cur = prev
          }
          var guard = 0
          while (cur >= 0 && guard < 4096) {
            stack(sp) = suffix(cur); sp += 1; cur = prefix(cur); guard += 1
          }
          if (guard >= 4096) return None
          // stack holds the expansion reversed; bound by the frame size
          if (outPos + sp > nPixels) return None
          while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
          if (nextFree < 4096) {
            prefix(nextFree) = prev
            suffix(nextFree) = first(if (code >= nextFree) prev else code)
            first(nextFree) = first(prev)
            nextFree += 1
            if (nextFree == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
      Some(out)
    }
  }

  // ------------------------------------------------------------------ BMP

  object Bmp {
    /** Shared uncompressed-BMP header parse (round 5: previously duplicated
      * verbatim between the raster decoder below and the streaming
      * statistics path, [[Multimodal.SampleCodec.bmpPixels]] — two copies
      * of identical validation drift independently). Returns
      * (width, height, topDown, bytesPerPixel, pixelOffset) for a 24/32-bpp
      * uncompressed BITMAPINFO/V4/V5 file, None otherwise. Callers impose
      * their own raster policies on top: the raster decoder requires
      * complete rows and a maxPixelBytes cap, the statistics path streams
      * and tolerates a truncated raster. The 10^6 dimension bound (same as
      * HeaderCodec.sane) keeps both callers' Int stride arithmetic
      * overflow-free for hostile headers.
      */
    private[operators] def header(b: Array[Byte]): Option[(Int, Int, Boolean, Int, Int)] = {
      if (b == null || b.length < 34 || b(0) != 'B' || b(1) != 'M') return None
      val dib = le16(b, 14) | (le16(b, 16) << 16)
      if (dib != 40 && dib != 108 && dib != 124) return None
      val w = le16(b, 18) | (le16(b, 20) << 16)
      val rawH = le16(b, 22) | (le16(b, 24) << 16)
      val h = math.abs(rawH)
      val bpp = le16(b, 28)
      val compression = le16(b, 30) | (le16(b, 32) << 16)
      if (compression != 0 || (bpp != 24 && bpp != 32) ||
        w <= 0 || h <= 0 || w > 1000000 || h > 1000000) return None
      val pxOff = le16(b, 10) | (le16(b, 12) << 16)
      if (pxOff < 54 || pxOff > b.length) return None
      Some((w, h, rawH < 0, bpp / 8, pxOff))
    }

    /** Decode an uncompressed 24/32-bpp BMP to a [[Raster]] (BGR(A) sample
      * order normalized to RGB(A); bottom-up rows flipped to top-down). The
      * streaming statistics path ([[Multimodal.SampleCodec.bmpPixels]])
      * stays separate — it never materializes the raster; this decoder
      * exists for operators that need actual pixels (resize, features).
      */
    def decode(b: Array[Byte], maxPixelBytes: Int = 1 << 26): Option[Raster] = {
      val (w, h, topDown, ch, pxOff) = header(b).getOrElse(return None)
      if (w.toLong * h * ch > maxPixelBytes) return None
      val stride = ((w * ch + 3) / 4) * 4
      if (pxOff.toLong + stride.toLong * h > b.length) return None // raster decode needs full rows
      val out = new Array[Byte](w * h * ch)
      var row = 0
      while (row < h) {
        val srcRow = if (topDown) row else h - 1 - row
        val rowStart = pxOff + srcRow * stride
        var px = 0
        while (px < w) {
          val s = rowStart + px * ch
          val o = (row * w + px) * ch
          // BMP stores BGR(A); normalize to RGB(A)
          out(o) = b(s + 2); out(o + 1) = b(s + 1); out(o + 2) = b(s)
          if (ch == 4) out(o + 3) = b(s + 3)
          px += 1
        }
        row += 1
      }
      Some(Raster(w, h, ch, out))
    }
  }

  // ---------------------------------------------------------------- resize

  /** Bilinear resample to (tw, th), channels preserved — the real `resize`
    * step of the multimodal pipeline (runs on decoded rasters inside the
    * same partition batch; never a driver-side image). Half-pixel-center
    * sampling (the standard convention), exact integer passthrough when the
    * dimensions are unchanged.
    */
  def resizeBilinear(r: Raster, tw: Int, th: Int): Raster = {
    require(tw > 0 && th > 0, s"resize dims must be positive: ${tw}x$th")
    if (tw == r.width && th == r.height) return r
    val out = new Array[Byte](tw * th * r.channels)
    val xScale = r.width.toDouble / tw
    val yScale = r.height.toDouble / th
    var y = 0
    while (y < th) {
      val sy = math.min(math.max((y + 0.5) * yScale - 0.5, 0.0), r.height - 1.0)
      val y0 = sy.toInt; val y1 = math.min(y0 + 1, r.height - 1); val fy = sy - y0
      var x = 0
      while (x < tw) {
        val sx = math.min(math.max((x + 0.5) * xScale - 0.5, 0.0), r.width - 1.0)
        val x0 = sx.toInt; val x1 = math.min(x0 + 1, r.width - 1); val fx = sx - x0
        var c = 0
        while (c < r.channels) {
          def p(px: Int, py: Int): Double =
            (r.pixels((py * r.width + px) * r.channels + c) & 0xff).toDouble
          val v = p(x0, y0) * (1 - fx) * (1 - fy) + p(x1, y0) * fx * (1 - fy) +
            p(x0, y1) * (1 - fx) * fy + p(x1, y1) * fx * fy
          out((y * tw + x) * r.channels + c) = math.round(v).toInt.min(255).max(0).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(tw, th, r.channels, out)
  }

  /** Normalize any raster to 3-channel RGB: gray replicates, alpha drops
    * (thumbnails and pooled features are defined on RGB).
    */
  def toRgb(r: Raster): Raster = r.channels match {
    case 3 => r
    case c =>
      val n = r.width * r.height
      val out = new Array[Byte](n * 3)
      var i = 0
      while (i < n) {
        val base = i * c
        if (c >= 3) { // RGBA: drop alpha
          out(i * 3) = r.pixels(base); out(i * 3 + 1) = r.pixels(base + 1)
          out(i * 3 + 2) = r.pixels(base + 2)
        } else { // gray / gray+alpha: replicate the gray sample
          val g = r.pixels(base)
          out(i * 3) = g; out(i * 3 + 1) = g; out(i * 3 + 2) = g
        }
        i += 1
      }
      Raster(r.width, r.height, 3, out)
  }

  /** Luma raster (1 channel) via the BT.601 integer weights — the pooled
    * feature extractor's input.
    */
  def toGray(r: Raster): Raster =
    if (r.channels == 1) r
    else {
      val rgb = toRgb(r)
      val n = r.width * r.height
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val rr = rgb.pixels(i * 3) & 0xff
        val gg = rgb.pixels(i * 3 + 1) & 0xff
        val bb = rgb.pixels(i * 3 + 2) & 0xff
        out(i) = ((rr * 299 + gg * 587 + bb * 114) / 1000).toByte
        i += 1
      }
      Raster(r.width, r.height, 1, out)
    }

  /** Decode any supported still-image container to a raster: from-scratch
    * BMP/PNG/GIF, JDK-ImageIO JPEG. `None` for audio/video/undecodable.
    */
  def decodeImage(b: Array[Byte], maxPixelBytes: Int = 1 << 26): Option[Raster] = {
    if (b == null || b.length < 4) return None
    if (b(0) == 'B' && b(1) == 'M') Bmp.decode(b, maxPixelBytes)
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P') Png.decode(b, maxPixelBytes)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') Gif.decode(b, maxPixelBytes)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) Jpeg.decode(b, maxPixelBytes)
    else None
  }

  // ----------------------------------------------------------------- JPEG

  object Jpeg {
    /** Decode a JPEG via the JDK's ImageIO (java.desktop — standard
      * library) to an RGB [[Raster]]. Deterministic for a fixed JVM; `None`
      * on undecodable bytes or an oversized raster.
      */
    def decode(b: Array[Byte], maxPixelBytes: Int = 1 << 26): Option[Raster] = {
      if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        catch { case _: Exception => null }
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h * 3 > maxPixelBytes) return None
      val out = new Array[Byte](w * h * 3)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val p = rowBuf(x); val o = (y * w + x) * 3
          out(o) = ((p >> 16) & 0xff).toByte
          out(o + 1) = ((p >> 8) & 0xff).toByte
          out(o + 2) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(Raster(w, h, 3, out))
    }
  }
}
