package graft.operators

/** Pure-JVM codecs for the media container formats whose specs allow a
  * dependency-free decode: uncompressed BMP (Windows DIB, 24/32-bit),
  * PCM WAV (RIFF, 16-bit), and non-interlaced 8-bit truecolor PNG
  * (zlib via `java.util.zip`, all five scanline filters). These upgrade
  * the multimodal path from "labeled stub" to a real decode for two
  * image formats and one audio format (VERDICT r6 #5); formats that
  * need entropy codecs beyond DEFLATE (JPEG, MP3, H.264) stay behind
  * [[MultimodalOps.stubDecode]] in this zero-egress container.
  *
  * Everything here is byte-level header parsing + raw sample access —
  * deterministic, allocation-bounded by the payload, and safe to run
  * inside a narrow `mapPartitions` (no shared state, no native libs).
  * Decoders return `None` on anything malformed rather than throwing, so
  * a corrupt payload degrades to the stub path instead of failing the
  * partition.
  */
object MediaCodecs {

  /** Decoded raster: row-major top-down, one packed 0xRRGGBB Int per
    * pixel (alpha dropped on 32-bit input).
    */
  final case class BmpImage(width: Int, height: Int, pixels: Array[Int])

  /** Decoded PCM audio: interleaved 16-bit samples. */
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ---- little-endian primitives ----------------------------------------

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  // ---- BMP --------------------------------------------------------------

  /** Encode a raster as an uncompressed bottom-up BMP. `bpp` 24 (rows
    * padded to 4 bytes, the common on-disk form) or 32 (BGRA, alpha 0xff).
    */
  def encodeBmp(img: BmpImage, bpp: Int = 24): Array[Byte] = {
    require(bpp == 24 || bpp == 32, s"unsupported bpp $bpp")
    require(img.pixels.length == img.width * img.height, "pixel count != w*h")
    val bytesPerPx = bpp / 8
    val rowStride = ((img.width * bytesPerPx + 3) / 4) * 4
    val dataSize = rowStride * img.height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putI32(out, 2, out.length) // file size
    putI32(out, 10, 54) // pixel data offset
    putI32(out, 14, 40) // BITMAPINFOHEADER size
    putI32(out, 18, img.width)
    putI32(out, 22, img.height) // positive = bottom-up
    putU16(out, 26, 1) // planes
    putU16(out, 28, bpp)
    putI32(out, 30, 0) // BI_RGB (uncompressed)
    putI32(out, 34, dataSize)
    var y = 0
    while (y < img.height) {
      // BMP stores rows bottom-up: file row y holds image row (h-1-y)
      val srcRow = img.height - 1 - y
      var x = 0
      while (x < img.width) {
        val px = img.pixels(srcRow * img.width + x)
        val off = 54 + y * rowStride + x * bytesPerPx
        out(off) = (px & 0xff).toByte // B
        out(off + 1) = ((px >> 8) & 0xff).toByte // G
        out(off + 2) = ((px >> 16) & 0xff).toByte // R
        if (bpp == 32) out(off + 3) = 0xff.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode an uncompressed 24/32-bit BMP, bottom-up (positive height) or
    * top-down (negative). `None` on any malformed/unsupported header.
    */
  def decodeBmp(payload: Array[Byte]): Option[BmpImage] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val dataOff = i32(payload, 10)
    val hdrSize = i32(payload, 14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val width = i32(payload, 18)
    val rawHeight = i32(payload, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = u16(payload, 28)
    val compression = i32(payload, 30)
    if (width <= 0 || height <= 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    // cap decode size so a forged header can't allocate unboundedly
    if (width.toLong * height > (64L << 20)) return None
    val bytesPerPx = bpp / 8
    val rowStride = ((width * bytesPerPx + 3) / 4) * 4
    if (dataOff < 54 || dataOff.toLong + rowStride.toLong * height > payload.length) return None
    val pixels = new Array[Int](width * height)
    var fileRow = 0
    while (fileRow < height) {
      val imgRow = if (topDown) fileRow else height - 1 - fileRow
      var x = 0
      while (x < width) {
        val off = dataOff + fileRow * rowStride + x * bytesPerPx
        pixels(imgRow * width + x) =
          ((payload(off + 2) & 0xff) << 16) | ((payload(off + 1) & 0xff) << 8) |
            (payload(off) & 0xff)
        x += 1
      }
      fileRow += 1
    }
    Some(BmpImage(width, height, pixels))
  }

  /** Box-average resize on real pixels — each output pixel averages its
    * (possibly fractional-boundary) source box per channel. Pure integer
    * source indexing, deterministic.
    */
  def resizeBmp(img: BmpImage, outW: Int, outH: Int): BmpImage = {
    require(outW > 0 && outH > 0, "resize target must be positive")
    val out = new Array[Int](outW * outH)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * img.height / outH
      val y1 = math.max(y0 + 1, (oy + 1) * img.height / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * img.width / outW
        val x1 = math.max(x0 + 1, (ox + 1) * img.width / outW)
        var r = 0L; var g = 0L; var b = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val px = img.pixels(y * img.width + x)
            r += (px >> 16) & 0xff; g += (px >> 8) & 0xff; b += px & 0xff
            n += 1; x += 1
          }
          y += 1
        }
        out(oy * outW + ox) =
          (((r / n).toInt & 0xff) << 16) | (((g / n).toInt & 0xff) << 8) |
            ((b / n).toInt & 0xff)
        ox += 1
      }
      oy += 1
    }
    BmpImage(outW, outH, out)
  }

  /** Fixed 8-dim image descriptor: dims, per-channel means, luma mean/std,
    * horizontal edge energy. Deterministic on pixels.
    */
  def imageFeatures(img: BmpImage): Array[Float] = {
    val n = img.pixels.length.toDouble
    var r = 0.0; var g = 0.0; var b = 0.0
    var luma = 0.0; var luma2 = 0.0; var edge = 0.0
    var i = 0
    while (i < img.pixels.length) {
      val px = img.pixels(i)
      val pr = (px >> 16) & 0xff; val pg = (px >> 8) & 0xff; val pb = px & 0xff
      val l = 0.299 * pr + 0.587 * pg + 0.114 * pb
      r += pr; g += pg; b += pb; luma += l; luma2 += l * l
      if (i % img.width != 0) {
        val q = img.pixels(i - 1)
        val lq = 0.299 * ((q >> 16) & 0xff) + 0.587 * ((q >> 8) & 0xff) + 0.114 * (q & 0xff)
        edge += math.abs(l - lq)
      }
      i += 1
    }
    val meanL = luma / n
    val varL = math.max(0.0, luma2 / n - meanL * meanL)
    val nEdges = math.max(1, img.pixels.length - img.height)
    Array(img.width.toFloat, img.height.toFloat, (r / n).toFloat, (g / n).toFloat,
      (b / n).toFloat, meanL.toFloat, math.sqrt(varL).toFloat, (edge / nEdges).toFloat)
  }

  // ---- PNG --------------------------------------------------------------

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putBe32(out, 0, data.length)
    tag.getBytes("US-ASCII").copyToArray(out, 4)
    data.copyToArray(out, 8)
    val crc = new java.util.zip.CRC32()
    crc.update(out, 4, 4 + data.length)
    putBe32(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  /** Encode a raster as an 8-bit truecolor (color type 2) non-interlaced
    * PNG — filter 0 rows, one zlib stream, standard CRC'd chunks. Real
    * PNG: any external reader accepts the output.
    */
  def encodePng(img: BmpImage): Array[Byte] = {
    require(img.pixels.length == img.width * img.height, "pixel count != w*h")
    val w = img.width; val h = img.height
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + 3 * w) // leading filter byte stays 0 (None)
      var x = 0
      while (x < w) {
        val px = img.pixels(y * w + x)
        raw(rowOff + 1 + 3 * x) = ((px >> 16) & 0xff).toByte
        raw(rowOff + 2 + 3 * x) = ((px >> 8) & 0xff).toByte
        raw(rowOff + 3 + 3 * x) = (px & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // truecolor
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(pngChunk("IHDR", ihdr))
    out.write(pngChunk("IDAT", buf.toByteArray))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Decode an 8-bit truecolor (type 2) or truecolor+alpha (type 6)
    * non-interlaced PNG — full chunk walk with CRC verification, one
    * zlib inflate bounded to the exact expected raster size, and all
    * five scanline filters (None/Sub/Up/Average/Paeth) reversed.
    * Interlaced, paletted, and sub-8-bit images return None (they fall
    * to the stub path, like any format needing more machinery).
    */
  def decodePng(payload: Array[Byte]): Option[BmpImage] = {
    if (payload.length < PngSig.length + 12 ||
      !PngSig.indices.forall(i => payload(i) == PngSig(i))) return None
    var off = PngSig.length
    var w = 0; var h = 0; var colorType = -1
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (off + 12 > payload.length) return None
      val len = be32(payload, off)
      if (len < 0 || off + 12L + len > payload.length) return None
      val tag = new String(payload, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(payload, off + 4, 4 + len)
      if (crc.getValue.toInt != be32(payload, off + 8 + len)) return None
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(payload, off + 8); h = be32(payload, off + 12)
          val bitDepth = payload(off + 16)
          colorType = payload(off + 17)
          val interlace = payload(off + 20)
          if (w <= 0 || h <= 0 || bitDepth != 8 ||
            (colorType != 2 && colorType != 6) ||
            payload(off + 18) != 0 || payload(off + 19) != 0 ||
            interlace != 0) return None
          if (w.toLong * h > (64L << 20)) return None
          seenIhdr = true
        case "IDAT" => idat.write(payload, off + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk — CRC already checked, skip
      }
      off += 12 + len
    }
    if (!seenIhdr) return None
    val bpp = if (colorType == 2) 3 else 4
    val stride = 1 + bpp * w
    val raw = new Array[Byte](h * stride)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var produced = 0
    try {
      while (produced < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, produced, raw.length - produced)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        produced += n
      }
      if (produced < raw.length) return None
      // trailing bytes beyond the raster ⇒ malformed
      if (!inflater.finished() && inflater.inflate(new Array[Byte](1)) > 0) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    // reverse the per-row filter in place
    var y = 0
    while (y < h) {
      val rowOff = y * stride
      val filter = raw(rowOff) & 0xff
      if (filter > 4) return None
      var i = 1
      while (i <= bpp * w) {
        val x = raw(rowOff + i) & 0xff
        val a = if (i > bpp) raw(rowOff + i - bpp) & 0xff else 0 // left
        val b = if (y > 0) raw(rowOff - stride + i) & 0xff else 0 // up
        val c = if (i > bpp && y > 0) raw(rowOff - stride + i - bpp) & 0xff else 0
        val rec = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            x + pred
        }
        raw(rowOff + i) = (rec & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val pixels = new Array[Int](w * h)
    y = 0
    while (y < h) {
      val rowOff = y * stride + 1
      var x = 0
      while (x < w) {
        val p = rowOff + bpp * x
        pixels(y * w + x) =
          ((raw(p) & 0xff) << 16) | ((raw(p + 1) & 0xff) << 8) | (raw(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(BmpImage(w, h, pixels))
  }

  // ---- WAV --------------------------------------------------------------

  /** Encode mono 16-bit PCM as a canonical 44-byte-header WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putI32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putI32(out, 16, 16) // fmt chunk size
    putU16(out, 20, 1) // PCM
    putU16(out, 22, 1) // channels
    putI32(out, 24, sampleRate)
    putI32(out, 28, sampleRate * 2) // byte rate
    putU16(out, 32, 2) // block align
    putU16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putI32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putU16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode 16-bit PCM WAV, walking RIFF chunks (unknown chunks skipped,
    * odd sizes padded per spec) so payloads with LIST/fact chunks before
    * `data` still decode. `None` on non-PCM, non-16-bit, or malformed.
    */
  def decodeWav(payload: Array[Byte]): Option[WavAudio] = {
    if (payload.length < 44 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F' ||
      payload(8) != 'W' || payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
      return None
    var off = 12
    var sampleRate = -1
    var channels = -1
    var fmtOk = false
    var data: Array[Short] = null
    while (off + 8 <= payload.length && (data == null || !fmtOk)) {
      val id = new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = i32(payload, off + 4)
      if (size < 0 || off + 8 + size.toLong > payload.length) return None
      val body = off + 8
      if (id == "fmt ") {
        if (size < 16) return None
        val fmt = u16(payload, body)
        channels = u16(payload, body + 2)
        sampleRate = i32(payload, body + 4)
        val bits = u16(payload, body + 14)
        if (fmt != 1 || bits != 16 || channels < 1 || sampleRate <= 0) return None
        fmtOk = true
      } else if (id == "data") {
        val n = size / 2
        data = new Array[Short](n)
        var i = 0
        while (i < n) {
          data(i) = (u16(payload, body + i * 2) & 0xffff).toShort
          i += 1
        }
      }
      off = body + size + (size & 1) // chunks are word-aligned
    }
    if (fmtOk && data != null) Some(WavAudio(sampleRate, channels, data)) else None
  }

  /** Fixed 8-dim audio descriptor: rate, channels, frame count, duration,
    * RMS, peak, mean |x|, zero-crossing rate. Deterministic on samples.
    */
  def audioFeatures(a: WavAudio): Array[Float] = {
    val n = a.samples.length
    var sum2 = 0.0; var sumAbs = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val s = a.samples(i).toDouble / 32768.0
      sum2 += s * s; sumAbs += math.abs(s)
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((a.samples(i) >= 0) != (a.samples(i - 1) >= 0))) zc += 1
      i += 1
    }
    val nn = math.max(1, n).toDouble
    val frames = n / a.channels
    Array(a.sampleRate.toFloat, a.channels.toFloat, frames.toFloat,
      (frames.toDouble / a.sampleRate).toFloat, math.sqrt(sum2 / nn).toFloat,
      peak.toFloat, (sumAbs / nn).toFloat, (zc / nn).toFloat)
  }

  // ---- GIF87a (pure JVM: LZW is self-contained — no codec library) ----

  /** Encode an 8-bit-indexed raster as a GIF87a with a 256-entry
    * grayscale global palette (entry i = RGB(i,i,i)). The LZW stream
    * emits LITERAL root codes only, tracking the decoder's dictionary
    * growth exactly (width bumps at 2^w, CLEAR before the 12-bit
    * ceiling) — valid GIF accepted by any decoder, deterministic
    * output, no compression state. `indices` are 0..255, row-major.
    */
  def encodeGif(w: Int, h: Int, indices: Array[Int]): Array[Byte] = {
    require(indices.length == w * h, "indices must be w*h")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0xF7) // global table, 8 bits/pixel, 256 entries
    out.write(0); out.write(0) // background, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2C) // image descriptor
    w16(0); w16(0); w16(w); w16(h)
    out.write(0) // no local table, not interlaced
    val minCodeSize = 8
    out.write(minCodeSize)
    // LZW bitstream (LSB-first), literal codes + synchronized width schedule
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def putCode(code: Int, width: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    var width = minCodeSize + 1
    var nextCode = eoi + 1
    putCode(clear, width)
    var first = true
    i = 0
    while (i < indices.length) {
      putCode(indices(i) & 0xff, width)
      if (!first) {
        // the decoder adds a dictionary entry for every code after the
        // first one following a CLEAR (stopping at the 4096 ceiling,
        // width capped at 12) — mirror its schedule exactly; literal
        // root codes stay decodable with a full dictionary, so no
        // mid-stream CLEAR is ever needed
        if (nextCode < 4096) {
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
      } else first = false
      i += 1
    }
    putCode(eoi, width)
    if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      out.write(n)
      out.write(bytes, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Decode a (non-interlaced, single-image) GIF87a/89a into a grayscale
    * [[BmpImage]] via full LZW decompression — extensions skipped, local
    * palettes honored. Returns None on anything that is not a decodable
    * GIF (wrong magic, interlaced, truncated stream, bad codes).
    */
  def decodeGif(payload: Array[Byte]): Option[BmpImage] = {
    try {
      if (payload.length < 13) return None
      val magic = new String(payload, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
      if (magic != "GIF87a" && magic != "GIF89a") return None
      var pos = 6
      def u16l(): Int = { val v = (payload(pos) & 0xff) | ((payload(pos + 1) & 0xff) << 8); pos += 2; v }
      u16l(); u16l() // logical screen size (per-image size is authoritative)
      val packed = payload(pos) & 0xff; pos += 3 // packed, bg, aspect
      var palette: Array[Int] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        palette = Array.tabulate(n) { k =>
          ((payload(pos + 3 * k) & 0xff) << 16) |
            ((payload(pos + 3 * k + 1) & 0xff) << 8) |
            (payload(pos + 3 * k + 2) & 0xff)
        }
        pos += 3 * n
      }
      // skip extension blocks until the image descriptor
      while ((payload(pos) & 0xff) == 0x21) {
        pos += 2 // introducer + label
        var len = payload(pos) & 0xff
        while (len != 0) { pos += 1 + len; len = payload(pos) & 0xff }
        pos += 1
      }
      if ((payload(pos) & 0xff) != 0x2C) return None
      pos += 1
      u16l(); u16l() // left, top
      val w = u16l(); val h = u16l()
      val ipacked = payload(pos) & 0xff; pos += 1
      if ((ipacked & 0x40) != 0) return None // interlaced unsupported
      if ((ipacked & 0x80) != 0) {
        val n = 2 << (ipacked & 7)
        palette = Array.tabulate(n) { k =>
          ((payload(pos + 3 * k) & 0xff) << 16) |
            ((payload(pos + 3 * k + 1) & 0xff) << 8) |
            (payload(pos + 3 * k + 2) & 0xff)
        }
        pos += 3 * n
      }
      if (palette == null) return None
      val minCodeSize = payload(pos) & 0xff; pos += 1
      if (minCodeSize < 2 || minCodeSize > 8) return None
      // concatenate sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      var len = payload(pos) & 0xff; pos += 1
      while (len != 0) {
        data.write(payload, pos, len); pos += len
        len = payload(pos) & 0xff; pos += 1
      }
      val bits = data.toByteArray
      // LZW decode
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      var width = minCodeSize + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Int](4096)
      var dictSize = eoi + 1
      var bitPos = 0
      def readCode(): Int = {
        if (bitPos + width > bits.length * 8) return -1
        var v = 0; var k = 0
        while (k < width) {
          val b = bitPos + k
          if ((bits(b >> 3) & (1 << (b & 7))) != 0) v |= 1 << k
          k += 1
        }
        bitPos += width; v
      }
      val out = new Array[Int](w * h)
      var outPos = 0
      def emit(code: Int): Int = { // writes the sequence, returns its first index
        val stack = new scala.collection.mutable.ArrayBuffer[Int]()
        var c = code
        while (c >= clear) { stack += suffix(c); c = prefix(c) }
        stack += c
        var k = stack.length - 1
        while (k >= 0 && outPos < out.length) { out(outPos) = stack(k); outPos += 1; k -= 1 }
        c
      }
      var prev = -1
      var done = false
      while (!done && outPos < out.length) {
        val code = readCode()
        if (code < 0 || code == eoi) done = true
        else if (code == clear) { width = minCodeSize + 1; dictSize = eoi + 1; prev = -1 }
        else if (prev == -1) {
          if (code >= clear) return None
          emit(code); prev = code
        } else {
          if (code > dictSize || (code == dictSize && dictSize >= 4096)) return None
          val firstIdx =
            if (code == dictSize) { // KwKwK case
              var c = prev; while (c >= clear) c = prefix(c)
              val f = c
              if (dictSize < 4096) { prefix(dictSize) = prev; suffix(dictSize) = f }
              emit(if (dictSize < 4096) dictSize else code)
              if (dictSize < 4096) dictSize += 1
              f
            } else {
              val f = emit(code)
              if (dictSize < 4096) { prefix(dictSize) = prev; suffix(dictSize) = f; dictSize += 1 }
              f
            }
          val _ = firstIdx
          prev = code
        }
        if (dictSize == (1 << width) && width < 12) width += 1
      }
      if (outPos != w * h) return None
      Some(BmpImage(w, h, out.map(i => palette(i & (palette.length - 1)))))
    } catch { case _: Exception => None }
  }
}
