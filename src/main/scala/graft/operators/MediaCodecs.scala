package graft.operators

/** Pure-JVM codecs for the media formats whose specs allow a
  * dependency-free implementation: uncompressed BMP (Windows DIB,
  * 24/32-bit), PCM WAV (RIFF, 16-bit), non-interlaced 8-bit truecolor
  * PNG (zlib via `java.util.zip`, all five scanline filters), GIF87a
  * LZW, and — since round 11 — baseline JPEG (ITU-T T.81 sequential
  * DCT: canonical Huffman, dequant, IDCT, chroma upsampling; encoder at
  * 4:4:4 with the Annex K tables), plus — since round 12 — an MPEG
  * audio (MP3) FRAME-HEADER walker (ISO/IEC 11172-3 / 13818-3: sync,
  * version/layer, bitrate and sample-rate tables, channel mode, frame
  * sizes → frame count, sample count, duration) so the dominant audio
  * format reports real metadata. MP3 PCM decode (the Huffman/MDCT
  * entropy path) and H.264 stay behind [[MultimodalOps.stubDecode]] in
  * this zero-egress container — honestly labeled.
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

  // ---- JPEG (baseline sequential DCT, ITU-T T.81) -----------------------
  // Pure-JVM entropy codec — the round-11 upgrade that moves JPEG off the
  // labeled stub: canonical Huffman over quantized zigzag DCT blocks.
  // Decoder: SOF0 only (baseline), 1 or 3 components, sampling factors up
  // to 2x2 (4:4:4 / 4:2:2 / 4:2:0), DRI/RSTn restarts, FF00 stuffing;
  // malformed input returns None like every other codec here. Encoder:
  // 4:4:4 single interleaved scan with the Annex K example quant tables
  // (IJG quality scaling) and the Annex K "typical" Huffman tables.

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ITU-T T.81 Annex K.1 example quantization tables (zigzag order here
  // is NOT needed — these are natural row-major order)
  private val QLumBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val QChromBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 typical Huffman tables: (bits[1..16], symbols)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Canonical Huffman DECODE structure per T.81 F.2.2.3: for each code
    * length, the smallest/largest code and the index of its first symbol.
    */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(in: JpegBitReader): Int = {
      var code = in.readBit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | in.readBit(); l += 1
      }
      if (l > 16) throw new IllegalStateException("bad Huffman code")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** Scan-section bit reader: un-stuffs FF00, stops at markers. */
  private final class JpegBitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    def readBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= data.length) throw new IllegalStateException("EOF in scan")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val next = if (pos < data.length) data(pos) & 0xff else -1
          if (next == 0x00) pos += 1 // stuffed byte
          else throw new IllegalStateException("marker in scan")
          b = 0xff
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** T.81 F.12 EXTEND: map the n received bits to the signed value. */
    def receiveExtend(n: Int): Int = {
      if (n == 0) return 0
      val v = receive(n)
      if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
    }
    def byteAlign(): Unit = bitCnt = 0
  }

  private def idct8x8(coef: Array[Double], out: Array[Int]): Unit = {
    // separable 2-D inverse DCT, double precision (decoder agreement with
    // other conformers is then limited by their IDCT approximations, not
    // ours)
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: 1-D IDCT over u for each x
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752 else 1.0
          s += cu * coef(y * 8 + u) * CosTable(u * 8 + x)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752 else 1.0
          s += cv * tmp(v * 8 + x) * CosTable(v * 8 + yy)
          v += 1
        }
        val px = math.round(s / 2.0 + 128.0).toInt
        out(yy * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
  }

  /** Decode a baseline (SOF0/SOF1) or PROGRESSIVE (SOF2) JPEG into an
    * RGB raster. Grayscale and 3-component YCbCr, sampling factors ≤ 2,
    * restart markers, multi-scan coefficient accumulation (spectral
    * selection + successive approximation per ITU-T T.81 G.2 — the
    * EOB-run and AC-refinement correction-bit protocol follow the spec's
    * flowcharts). Coefficients accumulate in zigzag space across scans;
    * dequant + IDCT + upsample + color-convert run once at EOI. None on
    * arithmetic-coded/hierarchical/malformed input.
    */
  def decodeJpeg(payload: Array[Byte]): Option[BmpImage] = try {
    if (payload.length < 4 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    var pos = 2
    def u16be(off: Int): Int = ((payload(off) & 0xff) << 8) | (payload(off + 1) & 0xff)
    val quant = Array.ofDim[Int](4, 64) // natural order
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var restartInterval = 0
    var w = 0; var h = 0
    var progressive = false
    // per component: id, hSamp, vSamp, quant id
    var comps: Array[Array[Int]] = null
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    // raw (un-dequantized) coefficients in ZIGZAG order, one padded
    // block grid per component — scans accumulate into these
    var coefs: Array[Array[Int]] = null
    var blocksPerLine: Array[Int] = null
    var sawScan = false

    def parseSof(seg: Int): Boolean = {
      if ((payload(seg) & 0xff) != 8) return false // 8-bit precision only
      h = u16be(seg + 1); w = u16be(seg + 3)
      val nc = payload(seg + 5) & 0xff
      if ((nc != 1 && nc != 3) || w == 0 || h == 0) return false
      // allocation guard placeholder — the real check runs below, after
      // sampling factors are known (footprint scales with them)
      comps = Array.tabulate(nc) { c =>
        val o = seg + 6 + 3 * c
        val hv = payload(o + 1) & 0xff
        Array(payload(o) & 0xff, (hv >> 4) & 0xf, hv & 0xf, payload(o + 2) & 0xff)
      }
      if (comps.exists(c => c(1) < 1 || c(1) > 2 || c(2) < 1 || c(2) > 2))
        return false
      hMax = comps.map(_(1)).max; vMax = comps.map(_(2)).max
      mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      blocksPerLine = comps.map(c => mcusX * c(1))
      // allocation guard: a corrupt SOF claiming huge dimensions would
      // ask for multi-GB coefficient grids and die with an uncatchable
      // OutOfMemoryError instead of degrading to None. Bound the REAL
      // footprint — coef grids + reconstruction planes (8 B per padded
      // component sample) + the output raster (4 B/px) — at 512 MB.
      val compSamples = comps.map(c =>
        mcusX.toLong * c(1) * 8 * mcusY * c(2) * 8).sum
      if (compSamples * 8L + w.toLong * h * 4L > 512L * 1024 * 1024)
        return false
      coefs = comps.map(c => new Array[Int](mcusX * c(1) * mcusY * c(2) * 64))
      true
    }

    /** One entropy-coded scan (T.81 G.2): updates the coefficient grids
      * and returns the payload offset just past the scan's data.
      */
    def decodeScan(seg: Int, segEnd: Int): Int = {
      val ns = payload(seg) & 0xff
      val scanComp = new Array[Int](ns)
      val dcSel = new Array[Int](ns)
      val acSel = new Array[Int](ns)
      var p = seg + 1
      var i = 0
      while (i < ns) {
        val cid = payload(p) & 0xff
        val c = comps.indexWhere(_(0) == cid)
        require(c >= 0, "unknown component in scan")
        scanComp(i) = c
        dcSel(i) = (payload(p + 1) & 0xf0) >> 4
        acSel(i) = payload(p + 1) & 0x0f
        p += 2; i += 1
      }
      val ss = payload(p) & 0xff
      val se = payload(p + 1) & 0xff
      val ah = (payload(p + 2) & 0xf0) >> 4
      val al = payload(p + 2) & 0x0f
      require(ss <= se && se <= 63, "bad spectral band")
      val in = new JpegBitReader(payload, segEnd)
      val preds = new Array[Int](comps.length)
      var eobrun = 0
      var units = 0
      def restartIfDue(): Unit =
        if (restartInterval > 0 && units > 0 && units % restartInterval == 0) {
          in.byteAlign()
          require((payload(in.pos) & 0xff) == 0xff &&
            ((payload(in.pos + 1) & 0xff) & 0xf8) == 0xd0, "missing restart")
          in.pos += 2
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }
      def dcTab(si: Int) = {
        val t = dcTabs(dcSel(si)); require(t != null, "missing DC table"); t
      }
      def acTab(si: Int) = {
        val t = acTabs(acSel(si)); require(t != null, "missing AC table"); t
      }
      // sequential full-band block (baseline / extended sequential)
      def blockSeq(si: Int, cf: Array[Int], off: Int): Unit = {
        val s = dcTab(si).decode(in)
        preds(scanComp(si)) += in.receiveExtend(s)
        cf(off) = preds(scanComp(si))
        var k = 1
        var open = true
        while (k < 64 && open) {
          val rs = acTab(si).decode(in)
          val r = rs >> 4; val sz = rs & 0xf
          if (sz == 0) { if (r == 15) k += 16 else open = false }
          else {
            k += r
            require(k <= 63, "AC overflow")
            cf(off + k) = in.receiveExtend(sz)
            k += 1
          }
        }
      }
      def dcFirst(si: Int, cf: Array[Int], off: Int): Unit = {
        val s = dcTab(si).decode(in)
        preds(scanComp(si)) += in.receiveExtend(s)
        cf(off) = preds(scanComp(si)) << al
      }
      def dcRefine(cf: Array[Int], off: Int): Unit =
        if (in.readBit() == 1) cf(off) |= (1 << al)
      def acFirst(si: Int, cf: Array[Int], off: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var open = true
        while (k <= se && open) {
          val rs = acTab(si).decode(in)
          val r = rs >> 4; val sz = rs & 0xf
          if (sz == 0) {
            if (r == 15) k += 16
            else { // EOBn: run of (1<<r)+bits blocks, this one included
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += in.receive(r)
              open = false
            }
          } else {
            k += r
            require(k <= se, "AC overflow")
            cf(off + k) = in.receiveExtend(sz) << al
            k += 1
          }
        }
      }
      // T.81 G.2 / correction-bit protocol: nonzero history coefficients
      // consume one refinement bit whenever the scan passes over them —
      // including inside zero runs and inside EOB runs
      def acRefine(si: Int, cf: Array[Int], off: Int): Unit = {
        val p1 = 1 << al
        var k = ss
        if (eobrun == 0) {
          var open = true
          while (k <= se && open) {
            val rs = acTab(si).decode(in)
            var r = rs >> 4; val sz = rs & 0xf
            var newval = 0
            if (sz != 0) {
              require(sz == 1, "bad refinement size")
              newval = if (in.readBit() == 1) p1 else -p1
            } else if (r != 15) {
              eobrun = (1 << r)
              if (r > 0) eobrun += in.receive(r)
              open = false // rest of band handled by the EOB logic below
            }
            if (open) {
              var placed = false
              while (k <= se && !placed) {
                val cur = cf(off + k)
                if (cur != 0) {
                  if (in.readBit() == 1 && (cur & p1) == 0)
                    cf(off + k) = if (cur >= 0) cur + p1 else cur - p1
                  k += 1
                } else if (r == 0) {
                  // the target zero slot: place the new ±1 (or, for ZRL,
                  // just step past the 16th zero) and resume the band
                  if (newval != 0) cf(off + k) = newval
                  k += 1
                  placed = true
                } else { r -= 1; k += 1 }
              }
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val cur = cf(off + k)
            if (cur != 0 && in.readBit() == 1 && (cur & p1) == 0)
              cf(off + k) = if (cur >= 0) cur + p1 else cur - p1
            k += 1
          }
          eobrun -= 1
        }
      }
      def decodeUnit(si: Int, row: Int, colBlk: Int): Unit = {
        val c = scanComp(si)
        val off = (row * blocksPerLine(c) + colBlk) * 64
        val cf = coefs(c)
        if (!progressive) blockSeq(si, cf, off)
        else if (ss == 0) { if (ah == 0) dcFirst(si, cf, off) else dcRefine(cf, off) }
        else { if (ah == 0) acFirst(si, cf, off) else acRefine(si, cf, off) }
      }
      if (ns > 1) { // interleaved: MCU traversal (DC or sequential scans)
        require(!progressive || ss == 0, "interleaved AC scan")
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            restartIfDue()
            var si = 0
            while (si < ns) {
              val c = scanComp(si)
              var by = 0
              while (by < comps(c)(2)) {
                var bx = 0
                while (bx < comps(c)(1)) {
                  decodeUnit(si, my * comps(c)(2) + by, mx * comps(c)(1) + bx)
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
            units += 1
            mx += 1
          }
          my += 1
        }
      } else { // non-interleaved: raster over the COMPONENT's own blocks
        val c = scanComp(0)
        val wB = ((w * comps(c)(1) + hMax - 1) / hMax + 7) / 8
        val hB = ((h * comps(c)(2) + vMax - 1) / vMax + 7) / 8
        var row = 0
        while (row < hB) {
          var colB = 0
          while (colB < wB) {
            restartIfDue()
            decodeUnit(0, row, colB)
            units += 1
            colB += 1
          }
          row += 1
        }
      }
      // skip trailing bits / stuffing / stray RSTs up to the next marker
      var q = in.pos
      while (q + 1 < payload.length && !((payload(q) & 0xff) == 0xff && {
        val m = payload(q + 1) & 0xff
        m != 0x00 && m != 0xff && !(m >= 0xd0 && m <= 0xd7)
      })) q += 1
      q
    }

    var done = false
    while (!done && pos + 1 < payload.length) {
      if ((payload(pos) & 0xff) != 0xff) return None
      var mp = pos + 1
      while ((payload(mp) & 0xff) == 0xff) mp += 1 // fill bytes
      val marker = payload(mp) & 0xff
      pos = mp + 1
      marker match {
        case 0xd9 => done = true // EOI
        case 0x01 => () // TEM, standalone
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST, standalone
        case _ =>
          val len = u16be(pos)
          val seg = pos + 2
          val segEnd = pos + len
          marker match {
            case 0xdb => // DQT
              var p2 = seg
              while (p2 < segEnd) {
                val pq = (payload(p2) & 0xf0) >> 4
                val tq = payload(p2) & 0x0f
                p2 += 1
                var i = 0
                while (i < 64) {
                  quant(tq)(ZigZag(i)) =
                    if (pq == 0) payload(p2) & 0xff else u16be(p2)
                  p2 += (if (pq == 0) 1 else 2)
                  i += 1
                }
              }
            case 0xc4 => // DHT
              var p2 = seg
              while (p2 < segEnd) {
                val tc = (payload(p2) & 0xf0) >> 4
                val th = payload(p2) & 0x0f
                p2 += 1
                val bits = new Array[Int](17)
                var total = 0
                var l = 1
                while (l <= 16) { bits(l) = payload(p2 + l - 1) & 0xff; total += bits(l); l += 1 }
                p2 += 16
                val vals = new Array[Int](total)
                var i = 0
                while (i < total) { vals(i) = payload(p2 + i) & 0xff; i += 1 }
                p2 += total
                val dec = new HuffDecoder(bits, vals)
                if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
              }
            case 0xc0 | 0xc1 => // baseline / extended sequential Huffman
              progressive = false
              if (!parseSof(seg)) return None
            case 0xc2 => // progressive Huffman
              progressive = true
              if (!parseSof(seg)) return None
            case 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              return None // lossless / arithmetic / differential frames
            case 0xdd => restartInterval = u16be(seg)
            case 0xda =>
              if (comps == null) return None
              pos = decodeScan(seg, segEnd)
              sawScan = true
            case _ => () // APPn / COM / DNL — skip
          }
          if (marker != 0xda) pos = segEnd
      }
    }
    if (comps == null || !sawScan) return None

    // ---- reconstruction: dequant + IDCT into full-resolution planes --
    val planeW = comps.indices.map(c => blocksPerLine(c) * 8).toArray
    val planes = comps.indices.map(c =>
      new Array[Int](blocksPerLine(c) * 8 * mcusY * comps(c)(2) * 8)).toArray
    val coefD = new Array[Double](64)
    val blk = new Array[Int](64)
    var c = 0
    while (c < comps.length) {
      val qt = quant(comps(c)(3))
      val bPerLine = blocksPerLine(c)
      val bPerCol = mcusY * comps(c)(2)
      val cf = coefs(c)
      var row = 0
      while (row < bPerCol) {
        var colB = 0
        while (colB < bPerLine) {
          val off = (row * bPerLine + colB) * 64
          java.util.Arrays.fill(coefD, 0.0)
          var k = 0
          while (k < 64) {
            if (cf(off + k) != 0)
              coefD(ZigZag(k)) = cf(off + k).toDouble * qt(ZigZag(k))
            k += 1
          }
          idct8x8(coefD, blk)
          val ox = colB * 8; val oy = row * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(c)((oy + yy) * planeW(c) + ox + xx) = blk(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          colB += 1
        }
        row += 1
      }
      c += 1
    }
    // ---- upsample + color convert ------------------------------------
    // centered (JPEG-sited) bilinear upsampling — the triangle filter
    // libjpeg's fancy upsampler uses (3·near + far)/4 at 2×), clamped to
    // the component's REAL extent so DC-padded edge blocks never bleed in
    val compW = comps.indices.map(ci => (w * comps(ci)(1) + hMax - 1) / hMax).toArray
    val compH = comps.indices.map(ci => (h * comps(ci)(2) + vMax - 1) / vMax).toArray
    val px = new Array[Int](w * h)
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        def sample(ci: Int): Double = {
          val fx = hMax / comps(ci)(1); val fy = vMax / comps(ci)(2)
          if (fx == 1 && fy == 1) {
            val sx = math.min(xx, compW(ci) - 1)
            val sy = math.min(yy, compH(ci) - 1)
            planes(ci)(sy * planeW(ci) + sx).toDouble
          } else {
            val u = (xx + 0.5) / fx - 0.5
            val v = (yy + 0.5) / fy - 0.5
            val x0 = math.max(0, math.min(compW(ci) - 1, math.floor(u).toInt))
            val y0 = math.max(0, math.min(compH(ci) - 1, math.floor(v).toInt))
            val x1 = math.min(compW(ci) - 1, x0 + 1)
            val y1 = math.min(compH(ci) - 1, y0 + 1)
            val fu = math.max(0.0, math.min(1.0, u - x0))
            val fv = math.max(0.0, math.min(1.0, v - y0))
            val p00 = planes(ci)(y0 * planeW(ci) + x0)
            val p01 = planes(ci)(y0 * planeW(ci) + x1)
            val p10 = planes(ci)(y1 * planeW(ci) + x0)
            val p11 = planes(ci)(y1 * planeW(ci) + x1)
            (p00 * (1 - fu) + p01 * fu) * (1 - fv) +
              (p10 * (1 - fu) + p11 * fu) * fv
          }
        }
        val rgb = if (comps.length == 1) {
          val yv = math.round(sample(0)).toInt
          (yv << 16) | (yv << 8) | yv
        } else {
          val yv = sample(0)
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def cl(v: Double): Int = {
            val i2 = math.round(v).toInt
            if (i2 < 0) 0 else if (i2 > 255) 255 else i2
          }
          (cl(yv + 1.402 * cr) << 16) |
            (cl(yv - 0.344136 * cb - 0.714136 * cr) << 8) |
            cl(yv + 1.772 * cb)
        }
        px(yy * w + xx) = rgb
        xx += 1
      }
      yy += 1
    }
    Some(BmpImage(w, h, px))
  } catch { case _: Exception => None }

  private def fdct8x8(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // rows
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * CosTable(u * 8 + x); x += 1 }
        val cu = if (u == 0) 0.70710678118654752 else 1.0
        tmp(y * 8 + u) = s * cu / 2.0
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) { // columns
      var u2 = 0
      while (u2 < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + u2) * CosTable(v * 8 + y); y += 1 }
        val cv = if (v == 0) 0.70710678118654752 else 1.0
        out(v * 8 + u2) = s * cv / 2.0
        u2 += 1
      }
      v += 1
    }
  }

  /** Bit writer for the entropy-coded segment with FF00 stuffing. */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00)
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { // pad with 1s per T.81
      put(0x7f, 8 - cnt)
    }
  }

  /** Encode a raster as a baseline 4:4:4 JPEG with the Annex K tables.
    * `quality` 1–100, IJG scaling. Deterministic: same pixels → same
    * bytes.
    */
  def encodeJpeg(img: BmpImage, quality: Int = 90): Array[Byte] = {
    require(quality >= 1 && quality <= 100, s"quality out of range: $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    def scaled(base: Array[Int]): Array[Int] = base.map { t =>
      val v = (t * scale + 50) / 100
      if (v < 1) 1 else if (v > 255) 255 else v
    }
    val qLum = scaled(QLumBase)
    val qChrom = scaled(QChromBase)
    // canonical ENCODE tables: symbol -> (code, length)
    def encTable(bits: Array[Int], vals: Array[Int]): Array[Int] = {
      val t = new Array[Int](256) // (len << 16) | code
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l)) {
          t(vals(k)) = (l << 16) | code
          code += 1; k += 1; i += 1
        }
        code <<= 1; l += 1
      }
      t
    }
    val dcLum = encTable(DcLumBits, DcLumVals)
    val acLum = encTable(AcLumBits, AcLumVals)
    val dcChrom = encTable(DcChromBits, DcChromVals)
    val acChrom = encTable(AcChromBits, AcChromVals)
    val out = new java.io.ByteArrayOutputStream()
    def wb(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { wb(v >> 8); wb(v) }
    def marker(m: Int): Unit = { wb(0xff); wb(m) }
    marker(0xd8) // SOI
    for ((tq, tab) <- Seq((0, qLum), (1, qChrom))) { // DQT
      marker(0xdb); w16(2 + 1 + 64); wb(tq)
      var i = 0
      while (i < 64) { wb(tab(ZigZag(i))); i += 1 }
    }
    marker(0xc0) // SOF0: 3 components, 4:4:4
    w16(8 + 3 * 3); wb(8); w16(img.height); w16(img.width); wb(3)
    wb(1); wb(0x11); wb(0) // Y
    wb(2); wb(0x11); wb(1) // Cb
    wb(3); wb(0x11); wb(1) // Cr
    for ((tc, th, bits, vals) <- Seq(
        (0, 0, DcLumBits, DcLumVals), (1, 0, AcLumBits, AcLumVals),
        (0, 1, DcChromBits, DcChromVals), (1, 1, AcChromBits, AcChromVals))) {
      marker(0xc4) // DHT
      w16(2 + 1 + 16 + vals.length); wb((tc << 4) | th)
      var l = 1
      while (l <= 16) { wb(bits(l)); l += 1 }
      vals.foreach(wb)
    }
    marker(0xda) // SOS
    w16(6 + 2 * 3); wb(3)
    wb(1); wb(0x00); wb(2); wb(0x11); wb(3); wb(0x11)
    wb(0); wb(63); wb(0) // Ss/Se/AhAl

    val bw = new JpegBitWriter(out)
    def magnitude(v: Int): Int = {
      var m = math.abs(v); var n = 0
      while (m > 0) { m >>= 1; n += 1 }
      n
    }
    def putSym(tab: Array[Int], sym: Int): Unit =
      bw.put(tab(sym) & 0xffff, tab(sym) >>> 16)
    def putVal(v: Int, n: Int): Unit =
      bw.put(if (v < 0) v + (1 << n) - 1 else v, n)
    val blocksX = (img.width + 7) / 8
    val blocksY = (img.height + 7) / 8
    val preds = new Array[Int](3)
    val samp = new Array[Double](64)
    val freq = new Array[Double](64)
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        var c = 0
        while (c < 3) {
          var i = 0
          while (i < 64) {
            val x = math.min(bx * 8 + (i % 8), img.width - 1)
            val y = math.min(by * 8 + (i / 8), img.height - 1)
            val p = img.pixels(y * img.width + x)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            samp(i) = (c match {
              case 0 => 0.299 * r + 0.587 * g + 0.114 * b
              case 1 => -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
              case _ => 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
            }) - 128.0
            i += 1
          }
          fdct8x8(samp, freq)
          val qt = if (c == 0) qLum else qChrom
          val dcT = if (c == 0) dcLum else dcChrom
          val acT = if (c == 0) acLum else acChrom
          val qz = new Array[Int](64) // zigzag-ordered quantized coefs
          i = 0
          while (i < 64) {
            val nat = ZigZag(i)
            // Clamp to the Annex K code space: AC symbols exist for size
            // categories 1..10 (|v| <= 1023) only, and a DC clamped to
            // +/-1023 keeps every diff within size 11 (|diff| <= 2046).
            // At quality >= ~97 (quant entries hit 1) a high-contrast
            // block can quantize past that and would otherwise emit a
            // zero-length code — an undecodable stream. The predictor
            // chain uses the CLAMPED value, so the decoder stays
            // consistent (the clamp is just extra quantization loss).
            val q = math.round(freq(nat) / qt(nat)).toInt
            qz(i) = if (q > 1023) 1023 else if (q < -1023) -1023 else q
            i += 1
          }
          val diff = qz(0) - preds(c); preds(c) = qz(0)
          val dn = magnitude(diff)
          putSym(dcT, dn); putVal(diff, dn)
          var run = 0
          var k = 1
          while (k < 64) {
            if (qz(k) == 0) run += 1
            else {
              while (run > 15) { putSym(acT, 0xf0); run -= 16 }
              val n = magnitude(qz(k))
              putSym(acT, (run << 4) | n); putVal(qz(k), n)
              run = 0
            }
            k += 1
          }
          if (run > 0) putSym(acT, 0x00) // EOB
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- MP3 (MPEG audio) frame-header walker ----------------------------
  // ISO/IEC 11172-3 §2.4.1.3 (MPEG-1) and 13818-3 (MPEG-2/2.5 extension).
  // Header-level only: frame boundaries, rates, channel mode, duration.
  // The entropy-coded PCM path (Huffman + IMDCT) is NOT implemented —
  // payload bytes are walked, never decoded.

  /** One parsed frame header. `frameBytes` includes the 4 header bytes. */
  final case class Mp3Frame(version: String, layer: Int, bitrateKbps: Int,
      sampleRate: Int, channels: Int, frameBytes: Int, samplesPerFrame: Int)

  /** Whole-stream metadata from walking every frame. Duration uses the
    * per-frame sample counts, so VBR streams are timed exactly.
    */
  final case class Mp3Info(version: String, layer: Int, sampleRate: Int,
      channels: Int, nFrames: Long, totalSamples: Long, durationMs: Long,
      maxBitrateKbps: Int)

  // bitrate tables in kbps, indexed 1..14 (0 = free format: rejected —
  // the frame size is then unknowable from the header; 15 = invalid)
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Parse one frame header at `off`; None unless every field is in its
    * valid domain AND the whole frame fits inside the payload.
    */
  def parseMp3FrameHeader(b: Array[Byte], off: Int): Option[Mp3Frame] = {
    if (off < 0 || off + 4 > b.length) return None
    val h0 = b(off) & 0xff; val h1 = b(off + 1) & 0xff
    val h2 = b(off + 2) & 0xff; val h3 = b(off + 3) & 0xff
    if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None // 11-bit sync
    val versionBits = (h1 >> 3) & 0x3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layerBits = (h1 >> 1) & 0x3 // 0=reserved, 1=LIII, 2=LII, 3=LI
    val brIdx = (h2 >> 4) & 0xf
    val srIdx = (h2 >> 2) & 0x3
    val padding = (h2 >> 1) & 0x1
    val channelMode = (h3 >> 6) & 0x3
    val emphasis = h3 & 0x3
    if (versionBits == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 ||
      srIdx == 3 || emphasis == 2) return None
    val layer = 4 - layerBits // 1, 2, 3
    val version = versionBits match {
      case 3 => "mpeg1"; case 2 => "mpeg2"; case _ => "mpeg2.5"
    }
    val sampleRate = (versionBits match {
      case 3 => SrV1; case 2 => SrV2; case _ => SrV25
    })(srIdx)
    val bitrateKbps = (if (versionBits == 3)
      (layer match { case 1 => BrV1L1; case 2 => BrV1L2; case _ => BrV1L3 })
    else
      (if (layer == 1) BrV2L1 else BrV2L23))(brIdx)
    val samplesPerFrame = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (versionBits == 3) 1152 else 576
    }
    // frame size from the spec: Layer I in 4-byte slots, II/III in bytes
    val frameBytes = layer match {
      case 1 => (12 * bitrateKbps * 1000 / sampleRate + padding) * 4
      case _ =>
        val coef = if (layer == 3 && versionBits != 3) 72 else 144
        coef * bitrateKbps * 1000 / sampleRate + padding
    }
    if (frameBytes < 4 || off + frameBytes > b.length) return None
    Some(Mp3Frame(version, layer, bitrateKbps, sampleRate,
      if (channelMode == 3) 1 else 2, frameBytes, samplesPerFrame))
  }

  /** Byte offset of the audio frames: past an ID3v2 tag when one leads
    * the payload (10-byte header, syncsafe 28-bit size), else 0.
    */
  private def skipId3v2(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
      (b(6) & 0x80) == 0 && (b(7) & 0x80) == 0 && (b(8) & 0x80) == 0 &&
      (b(9) & 0x80) == 0)
      10 + ((b(6) & 0x7f) << 21 | (b(7) & 0x7f) << 14 |
        (b(8) & 0x7f) << 7 | (b(9) & 0x7f))
    else 0

  /** Walk every MPEG audio frame and report stream metadata, or None
    * when the payload is not an MPEG audio stream. Acceptance is
    * deliberately strict — the first frame must sit exactly at the
    * start (after any ID3v2 tag), agree with its successor on
    * version/layer/sample-rate, OR be the only frame and end exactly at
    * the payload boundary — so random binary (or another codec's
    * bitstream) cannot false-sniff as MP3. Walking stops cleanly at an
    * ID3v1 trailer ("TAG", 128 bytes) or end of payload; a malformed
    * header mid-stream rejects the payload (None), never throws.
    */
  def mp3Metadata(b: Array[Byte]): Option[Mp3Info] = {
    val start = skipId3v2(b)
    val end =
      if (b.length - start >= 128 && b.length >= 128 &&
        b(b.length - 128) == 'T' && b(b.length - 127) == 'A' &&
        b(b.length - 126) == 'G') b.length - 128
      else b.length
    val first = parseMp3FrameHeader(b, start).getOrElse(return None)
    // anti-false-positive gate: a consistent second frame, or a
    // single-frame payload that ends exactly on the frame boundary
    val afterFirst = start + first.frameBytes
    if (afterFirst < end) {
      val second = parseMp3FrameHeader(b, afterFirst).getOrElse(return None)
      if (second.version != first.version || second.layer != first.layer ||
        second.sampleRate != first.sampleRate) return None
    } else if (afterFirst != end) return None
    var off = start
    var nFrames = 0L
    var totalSamples = 0L
    var maxBr = 0
    while (off < end) {
      parseMp3FrameHeader(b, off) match {
        case Some(f) =>
          if (f.version != first.version || f.layer != first.layer ||
            f.sampleRate != first.sampleRate) return None
          nFrames += 1
          totalSamples += f.samplesPerFrame
          if (f.bitrateKbps > maxBr) maxBr = f.bitrateKbps
          off += f.frameBytes
        case None => return None // truncated/corrupt mid-stream
      }
    }
    Some(Mp3Info(first.version, first.layer, first.sampleRate,
      first.channels, nFrames, totalSamples,
      totalSamples * 1000L / first.sampleRate, maxBr))
  }

  /** Synthesize a structurally valid MPEG-1 Layer III stream: `nFrames`
    * frames at the given rates, channel mode from `channels`, no
    * padding, deterministic filler bytes (NOT decodable audio — the
    * entropy payload is fake by design; [[mp3Metadata]] walks headers
    * only). The zero-egress stand-in for real MP3 files, with frame
    * sizes simple enough for a SQL oracle to predict
    * (`frameBytes = 144000·kbps ÷ sampleRate`, floor division).
    */
  def encodeMp3Frames(sampleRate: Int, bitrateKbps: Int, channels: Int,
      nFrames: Int): Array[Byte] = {
    val srIdx = SrV1.indexOf(sampleRate)
    val brIdx = BrV1L3.indexOf(bitrateKbps)
    require(srIdx >= 0, s"not an MPEG-1 sample rate: $sampleRate")
    require(brIdx >= 1, s"not an MPEG-1 Layer III bitrate: $bitrateKbps")
    require(channels == 1 || channels == 2, s"channels must be 1|2: $channels")
    require(nFrames >= 1, "nFrames must be positive")
    val frameBytes = 144 * bitrateKbps * 1000 / sampleRate
    val out = new Array[Byte](frameBytes * nFrames)
    var f = 0
    while (f < nFrames) {
      val o = f * frameBytes
      out(o) = 0xff.toByte
      out(o + 1) = 0xfb.toByte // MPEG1, Layer III, no CRC
      out(o + 2) = ((brIdx << 4) | (srIdx << 2)).toByte // no padding
      out(o + 3) = (if (channels == 1) 0xc0 else 0x00).toByte
      var i = 4
      while (i < frameBytes) {
        // deterministic filler that can never contain a sync byte
        out(o + i) = ((f * 31 + i * 7) % 0xfe).toByte
        i += 1
      }
      f += 1
    }
    out
  }
}
