package graft.operators

import graft.SparkSpec
import graft.operators.MediaCodecs.{BmpImage, WavAudio}

/** Tests of the multimodal binary-column plumbing: real BMP/WAV codec
  * round-trips, sniffing dispatch (real formats decode, everything else
  * takes the labeled stub), schema, batch shape, and partition
  * preservation (the decode is a narrow map — no shuffle).
  */
class MultimodalSpec extends SparkSpec {

  private def testImage(w: Int, h: Int): BmpImage = {
    val px = Array.tabulate(w * h)(i => ((i * 37) % 256 << 16) | ((i * 11) % 256 << 8) | (i % 256))
    BmpImage(w, h, px)
  }

  test("BMP codec: 24-bit round-trip, including row padding (width % 4 != 0)") {
    for (w <- Seq(3, 4, 5, 17); h <- Seq(1, 2, 7)) {
      val img = testImage(w, h)
      val back = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img))
      assert(back.isDefined, s"decode failed at ${w}x$h")
      assert(back.get.width === w && back.get.height === h)
      assert(back.get.pixels.toSeq === img.pixels.toSeq, s"pixels differ at ${w}x$h")
    }
  }

  test("BMP codec: 32-bit and top-down (negative height) payloads decode") {
    val img = testImage(5, 3)
    val b32 = MediaCodecs.encodeBmp(img, bpp = 32)
    assert(MediaCodecs.decodeBmp(b32).get.pixels.toSeq === img.pixels.toSeq)
    // flip to top-down: negate the height field and reorder rows in place
    val enc = MediaCodecs.encodeBmp(img)
    val rowStride = ((5 * 3 + 3) / 4) * 4
    val td = enc.clone()
    val negH = -3
    td(22) = (negH & 0xff).toByte; td(23) = ((negH >> 8) & 0xff).toByte
    td(24) = ((negH >> 16) & 0xff).toByte; td(25) = ((negH >> 24) & 0xff).toByte
    for (r <- 0 until 3; i <- 0 until rowStride)
      td(54 + r * rowStride + i) = enc(54 + (2 - r) * rowStride + i)
    assert(MediaCodecs.decodeBmp(td).get.pixels.toSeq === img.pixels.toSeq)
  }

  test("BMP codec: malformed payloads return None, never throw") {
    assert(MediaCodecs.decodeBmp(Array.empty[Byte]).isEmpty)
    assert(MediaCodecs.decodeBmp("not a bitmap at all, just text".getBytes).isEmpty)
    val truncated = MediaCodecs.encodeBmp(testImage(8, 8)).take(60)
    assert(MediaCodecs.decodeBmp(truncated).isEmpty)
    // forged header claiming a huge raster must not allocate
    val forged = MediaCodecs.encodeBmp(testImage(2, 2))
    forged(18) = 0xff.toByte; forged(19) = 0xff.toByte; forged(20) = 0x7f.toByte
    assert(MediaCodecs.decodeBmp(forged).isEmpty)
  }

  test("PNG codec: truecolor round-trip through a real zlib stream") {
    for (w <- Seq(1, 3, 17); h <- Seq(1, 2, 9)) {
      val img = testImage(w, h)
      val png = MediaCodecs.encodePng(img)
      assert(png.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      val back = MediaCodecs.decodePng(png)
      assert(back.isDefined, s"decode failed at ${w}x$h")
      assert(back.get.width === w && back.get.height === h)
      assert(back.get.pixels.toSeq === img.pixels.toSeq, s"pixels differ at ${w}x$h")
    }
  }

  // chunk writer mirroring the spec (length, tag, data, CRC over tag+data)
  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length).put(tag.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tag.getBytes("US-ASCII")); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
    val buf = new java.io.ByteArrayOutputStream(); val tmp = new Array[Byte](4096)
    while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
    d.end(); buf.toByteArray
  }

  test("PNG codec: all five scanline filters unfilter correctly (incl. RGBA)") {
    // 4x5 RGBA image; row y is written with filter type y (covering all
    // five), filtered by a reference implementation of the spec's equations
    val w = 4; val h = 5; val bpp = 4
    val rng = new scala.util.Random(7)
    val raster = Array.fill(h * w * bpp)((rng.nextInt(256) & 0xff).toByte)
    def px(y: Int, x: Int, c: Int): Int = raster((y * w + x) * bpp + c) & 0xff
    val stride = 1 + w * bpp
    val raw = new Array[Byte](h * stride)
    for (y <- 0 until h) {
      val filter = y
      raw(y * stride) = filter.toByte
      for (i <- 0 until w * bpp) {
        val x = px(y, i / bpp, i % bpp)
        val a = if (i >= bpp) px(y, (i - bpp) / bpp, i % bpp) else 0
        val b = if (y > 0) px(y - 1, i / bpp, i % bpp) else 0
        val c = if (i >= bpp && y > 0) px(y - 1, (i - bpp) / bpp, i % bpp) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * stride + 1 + i) = ((x - pred) & 0xff).toByte
      }
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(6.toByte) // RGBA
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(raw)) ++
      chunk("IEND", Array.emptyByteArray)
    val got = MediaCodecs.decodePng(png)
    assert(got.isDefined)
    for (y <- 0 until h; x <- 0 until w)
      assert(got.get.pixels(y * w + x) ===
        ((px(y, x, 0) << 16) | (px(y, x, 1) << 8) | px(y, x, 2)),
        s"pixel ($x,$y), filter row ${raw(y * stride)}")
  }

  test("PNG codec: malformed payloads return None, never throw") {
    val good = MediaCodecs.encodePng(testImage(5, 4))
    assert(MediaCodecs.decodePng(Array[Byte](1, 2, 3)).isEmpty)
    // flip a byte inside the IDAT payload: CRC check must reject
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    assert(MediaCodecs.decodePng(corrupt).isEmpty)
    // truncate mid-chunk
    assert(MediaCodecs.decodePng(good.take(good.length - 6)).isEmpty)
  }

  test("WAV codec: PCM-16 round-trip and RIFF chunk walking") {
    val samples = Array.tabulate(777)(i => (math.sin(i * 0.1) * 20000).toShort)
    val wav = MediaCodecs.encodeWav(16000, samples)
    val back = MediaCodecs.decodeWav(wav).get
    assert(back.sampleRate === 16000 && back.channels === 1)
    assert(back.samples.toSeq === samples.toSeq)
    // splice an unknown odd-sized chunk between fmt and data: the walker
    // must skip it (word-aligned) and still find the data chunk
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = wav.take(36) ++ extra ++ wav.drop(36)
    // patch the RIFF size field
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte; spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte; spliced(7) = ((total >> 24) & 0xff).toByte
    assert(MediaCodecs.decodeWav(spliced).get.samples.toSeq === samples.toSeq)
    assert(MediaCodecs.decodeWav("RIFFjunk".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(wav.take(40)).isEmpty)
  }

  test("decodeAny: sniffs real formats, labels everything else stub") {
    val img = testImage(6, 4)
    val (dImg, fImg) = MultimodalOps.decodeAny(MediaCodecs.encodeBmp(img))
    assert(dImg === "bmp")
    assert(fImg.toSeq === MediaCodecs.imageFeatures(img).toSeq)
    val wav = MediaCodecs.encodeWav(8000, Array[Short](1, -1, 100, -100))
    assert(MultimodalOps.decodeAny(wav)._1 === "wav")
    val (dPng, fPng) = MultimodalOps.decodeAny(MediaCodecs.encodePng(img))
    assert(dPng === "png")
    assert(fPng.toSeq === MediaCodecs.imageFeatures(img).toSeq)
    val (dStub, fStub) = MultimodalOps.decodeAny("plain text".getBytes)
    assert(dStub === "stub")
    assert(fStub.toSeq === MultimodalOps.stubDecode("plain text".getBytes).toSeq)
  }

  test("syntheticMedia: every payload decodes with a REAL codec end-to-end") {
    val media = MultimodalOps.syntheticMedia(spark, sf)
    val feats = MultimodalOps.decodeFeatures(media)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("media_id", "mime", "n_bytes", "decoder", "features"))
    val byDecoder = feats.groupBy("decoder").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDecoder.keySet === Set("bmp", "wav", "png", "gif", "jpeg"),
      s"unexpected decoders: $byDecoder")
    assert(!byDecoder.contains("stub"))
    // metadata from actual header parsing matches the generation rule
    val meta = MultimodalOps.mediaMetadata(media)
      .filter("media_id IN (0, 1, 2, 3)").orderBy("media_id").collect()
    assert(meta(0).getAs[String]("format") === "bmp")
    assert(meta(0).getAs[Long]("width") === 4L && meta(0).getAs[Long]("height") === 3L)
    assert(meta(1).getAs[String]("format") === "wav")
    assert(meta(1).getAs[Long]("sample_rate") === 8000L)
    assert(meta(2).getAs[String]("format") === "png")
    assert(meta(2).getAs[Long]("width") === 6L && meta(2).getAs[Long]("height") === 5L)
    // id 3: %6==3 → the real-entropy-codec leg (baseline JPEG)
    assert(meta(3).getAs[String]("format") === "jpeg")
    assert(meta(3).getAs[Long]("width") === 7L && meta(3).getAs[Long]("height") === 6L)
  }

  test("resizeImages: output payloads are valid BMPs at the target size") {
    val media = MultimodalOps.syntheticMedia(spark, sf)
    val resized = MultimodalOps.resizeImages(media, 4, 4)
    // %6==0 keeps the BMP class (%6==3 is the JPEG leg, passed through)
    val rows = resized.filter("media_id % 6 = 0").take(5)
    rows.foreach { r =>
      val img = MediaCodecs.decodeBmp(r.payload)
      assert(img.isDefined && img.get.width === 4 && img.get.height === 4)
    }
    // PNG rows pass through untouched (only BMP is resized in place)
    val pngRow = resized.filter("media_id = 2").head()
    assert(MediaCodecs.decodePng(pngRow.payload).isDefined)
    // uniform-color image stays that color under box-average
    val uni = BmpImage(9, 9, Array.fill(81)(0x6a2b1c))
    val rz = MediaCodecs.resizeBmp(uni, 3, 3)
    assert(rz.pixels.toSeq === Seq.fill(9)(0x6a2b1c))
    // WAV rows pass through untouched
    val wavRow = resized.filter("media_id = 1").head()
    assert(MediaCodecs.decodeWav(wavRow.payload).isDefined)
  }

  test("sampleAudioFrames: per-frame RMS over real decoded samples") {
    val media = MultimodalOps.syntheticMedia(spark, sf)
    val frames = MultimodalOps.sampleAudioFrames(media, frameLen = 32, maxFrames = 4)
    val rows = frames.collect()
    rows.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      assert(n >= 0 && n <= 4)
      r.getAs[Seq[Float]]("frame_rms").foreach(v => assert(v >= 0f && v <= 1f))
    }
    // image rows (bmp/png) are not audio → zero frames; WAV rows with text → >0
    val byId = rows.map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("n_frames")).toMap
    assert(byId.filterKeys(_ % 3 != 1).values.forall(_ === 0))
    assert(byId.filterKeys(_ % 3 == 1).values.exists(_ > 0))
  }

  test("decodeFeatures: deterministic stub features on opaque payloads") {
    val media = MultimodalOps.mediaFromDocuments(spark, sf)
    val feats = MultimodalOps.decodeFeatures(media)
    val row = feats.filter(feats("media_id") === 0).head()
    assert(row.getAs[String]("decoder") === "stub")
    val payload = media.filter(media("media_id") === 0).head().payload
    val want = MultimodalOps.stubDecode(payload)
    assert(row.getAs[Seq[Float]]("features").toArray.toSeq === want.toSeq)
    assert(row.getAs[Seq[Float]]("features").length === 8)
  }

  test("decodeFeatures: narrow map preserves partitioning (no shuffle)") {
    val media = MultimodalOps.syntheticMedia(spark, sf).repartition(3)
    val feats = MultimodalOps.decodeFeatures(media)
    assert(feats.rdd.getNumPartitions === 3)
    assert(feats.count() === media.count())
  }

  test("resize: box-downsample to the target length with byte-mean values") {
    val media = MultimodalOps.mediaFromDocuments(spark, sf)
    val out = MultimodalOps.resize(media, targetLen = 16)
    out.collect().foreach { r =>
      assert(r.getAs[Int]("resized_len") === 16)
      r.getSeq[Float](2).foreach(v => assert(v >= 0f && v <= 255f))
    }
    // deterministic: same input → same output
    val a = out.filter(out("media_id") === 1).head().getSeq[Float](2)
    val out2 = MultimodalOps.resize(media, 16)
    val b = out2.filter(out2("media_id") === 1).head().getSeq[Float](2)
    assert(a.toList === b.toList)
  }

  test("sampleFrames: stride sampling bounded by maxFrames") {
    val media = MultimodalOps.mediaFromDocuments(spark, sf)
    val frames = MultimodalOps.sampleFrames(media, stride = 10, maxFrames = 5)
    frames.collect().foreach { r =>
      val n = r.getAs[Int]("n_frames")
      assert(n <= 5 && n >= 1)
      assert(r.getAs[Seq[Int]]("frames").length === n)
      r.getAs[Seq[Int]]("frames").foreach(b => assert(b >= 0 && b <= 255))
    }
  }

  test("GIF codec: LZW roundtrip across sizes incl. 12-bit width growth; JDK ImageIO cross-check") {
    val rnd = new scala.util.Random(42)
    for ((w, h) <- Seq((1, 1), (4, 3), (16, 9), (37, 23), (100, 80))) {
      val idx = Array.fill(w * h)(rnd.nextInt(256))
      val gif = MediaCodecs.encodeGif(w, h, idx)
      val img = MediaCodecs.decodeGif(gif)
      assert(img.isDefined, s"decode failed at ${w}x$h")
      assert(img.get.width === w && img.get.height === h)
      assert(img.get.pixels.zip(idx).forall { case (p, i) =>
        p == ((i << 16) | (i << 8) | i)
      }, s"pixel mismatch at ${w}x$h")
    }
    // spec compliance: the JDK's own GIF reader (an independent
    // implementation) must decode our encoder's output pixel-exactly
    val idx = Array.tabulate(19 * 11)(i => (i * 7) % 256)
    val gif = MediaCodecs.encodeGif(19, 11, idx)
    val io = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(io != null, "ImageIO must accept the GIF")
    assert(io.getWidth === 19 && io.getHeight === 11)
    for (y <- 0 until 11; x <- 0 until 19) {
      val v = idx(y * 19 + x)
      assert((io.getRGB(x, y) & 0xffffff) === ((v << 16) | (v << 8) | v))
    }
    // non-GIF bytes degrade to None, not an exception
    assert(MediaCodecs.decodeGif("not a gif at all".getBytes).isEmpty)
    assert(MediaCodecs.decodeGif(Array[Byte]()).isEmpty)
  }

  test("syntheticMedia: GIF rows decode through the real codec path") {
    import spark.implicits._
    val meta = MultimodalOps.mediaMetadata(
      MultimodalOps.syntheticMedia(spark, sf)).filter($"format" === "gif")
    val rows = meta.collect()
    assert(rows.nonEmpty, "doc_id % 6 == 5 rows must be GIFs")
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(id % 6 === 5)
      assert(r.getAs[Long]("width") === 4 + id % 13)
      assert(r.getAs[Long]("height") === 3 + id % 7)
    }
    val feats = MultimodalOps.decodeFeatures(
      MultimodalOps.syntheticMedia(spark, sf))
    assert(feats.filter($"decoder" === "gif").count() === rows.length.toLong)
  }

  /** A smooth test raster (gradients + a soft blob) — JPEG is a lossy
    * transform codec, so error bounds are only meaningful on content
    * without hard edges.
    */
  private def smoothRaster(w: Int, h: Int): MediaCodecs.BmpImage = {
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = (x * 255) / math.max(1, w - 1)
      val g = (y * 255) / math.max(1, h - 1)
      val dx = x - w / 2.0; val dy = y - h / 2.0
      val b = (255.0 * math.exp(-(dx * dx + dy * dy) / (w * h / 4.0))).toInt
      (r << 16) | (g << 8) | b
    }
    MediaCodecs.BmpImage(w, h, px)
  }

  private def maxAndMeanChannelErr(a: MediaCodecs.BmpImage,
      b: MediaCodecs.BmpImage): (Int, Double) = {
    assert(a.width === b.width && a.height === b.height)
    var maxE = 0; var sum = 0L
    for (i <- a.pixels.indices; shift <- Seq(16, 8, 0)) {
      val e = math.abs(((a.pixels(i) >> shift) & 0xff) - ((b.pixels(i) >> shift) & 0xff))
      maxE = math.max(maxE, e); sum += e
    }
    (maxE, sum.toDouble / (a.pixels.length * 3))
  }

  test("JPEG decoder: decodes a JDK-ImageIO-encoded baseline JPEG with bounded per-pixel error") {
    // ImageIO's writer is an independent baseline encoder (4:2:0 chroma
    // by default) — decoding its output tests the full marker walk,
    // Huffman tables, dequant, IDCT, upsampling, and color convert
    // against an implementation we did not write.
    val img = smoothRaster(64, 48)
    val bi = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) bi.setRGB(x, y, img.pixels(y * 64 + x))
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.9f)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), params)
    writer.dispose()
    val payload = bos.toByteArray

    val mine = MediaCodecs.decodeJpeg(payload)
    assert(mine.isDefined, "decoder must accept the ImageIO baseline JPEG")
    assert(mine.get.width === 64 && mine.get.height === 48)
    // reference decode: ImageIO reading its own bytes
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val refImg = MediaCodecs.BmpImage(64, 48,
      Array.tabulate(64 * 48)(i => ref.getRGB(i % 64, i / 64) & 0xffffff))
    val (maxE, meanE) = maxAndMeanChannelErr(mine.get, refImg)
    // decoders of the SAME bitstream differ only by IDCT rounding and
    // upsampling phase — with the triangle chroma upsampler the
    // agreement is near-exact
    assert(meanE <= 1.0, s"mean channel error $meanE too high")
    assert(maxE <= 8, s"max channel error $maxE too high")
  }

  test("JPEG codec: own encode → own decode round-trip is close; ImageIO cross-decodes our bytes") {
    for ((w, h) <- Seq((8, 8), (13, 7), (64, 48), (33, 50))) {
      val img = smoothRaster(w, h)
      val payload = MediaCodecs.encodeJpeg(img, quality = 95)
      val back = MediaCodecs.decodeJpeg(payload)
      assert(back.isDefined, s"own round-trip failed at ${w}x$h")
      assert(back.get.width === w && back.get.height === h)
      val (maxE, meanE) = maxAndMeanChannelErr(img, back.get)
      assert(meanE <= 3.0, s"mean error $meanE at ${w}x$h")
      assert(maxE <= 32, s"max error $maxE at ${w}x$h")

      // spec compliance: the JDK's reader must accept our bitstream and
      // agree with our own decode
      val io = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      assert(io != null, s"ImageIO must accept our JPEG at ${w}x$h")
      assert(io.getWidth === w && io.getHeight === h)
      val ioImg = MediaCodecs.BmpImage(w, h,
        Array.tabulate(w * h)(i => io.getRGB(i % w, i / w) & 0xffffff))
      val (xMaxE, xMeanE) = maxAndMeanChannelErr(back.get, ioImg)
      assert(xMeanE <= 1.5 && xMaxE <= 16,
        s"our decode and ImageIO's disagree at ${w}x$h: mean=$xMeanE max=$xMaxE")
    }
    // malformed payloads degrade to None, never throw
    assert(MediaCodecs.decodeJpeg("not a jpeg".getBytes).isEmpty)
    assert(MediaCodecs.decodeJpeg(Array[Byte]()).isEmpty)
    assert(MediaCodecs.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  test("MP3 walker: synthesized frames round-trip every header field; ID3 tags skipped") {
    for {
      sr <- Seq(44100, 48000, 32000)
      kbps <- Seq(32, 128, 320)
      ch <- Seq(1, 2)
      n <- Seq(1, 7)
    } {
      val payload = MediaCodecs.encodeMp3Frames(sr, kbps, ch, n)
      val info = MediaCodecs.mp3Metadata(payload)
      assert(info.isDefined, s"walk failed at sr=$sr kbps=$kbps ch=$ch n=$n")
      val m = info.get
      assert(m.version === "mpeg1" && m.layer === 3)
      assert(m.sampleRate === sr && m.channels === ch)
      assert(m.nFrames === n.toLong && m.totalSamples === n * 1152L)
      assert(m.durationMs === n * 1152L * 1000L / sr)
      assert(m.maxBitrateKbps === kbps)
      // payload length follows the spec's frame-size formula exactly
      assert(payload.length === n * (144000 * kbps / sr))
    }

    // ID3v2 prefix (syncsafe size) and ID3v1 trailer are skipped cleanly
    val frames = MediaCodecs.encodeMp3Frames(44100, 128, 2, 3)
    val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      Array.fill[Byte](10)(0x41)
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ Array.fill[Byte](125)(0x20)
    val tagged = id3v2 ++ frames ++ id3v1
    val m = MediaCodecs.mp3Metadata(tagged)
    assert(m.isDefined && m.get.nFrames === 3L && m.get.sampleRate === 44100,
      "ID3v2 header and ID3v1 trailer must be skipped, frames walked")
  }

  test("MP3 walker: VBR streams time exactly; other layers/versions parse; corrupt input returns None") {
    // VBR: frames at different bitrates — duration counts per-frame samples
    val vbr = MediaCodecs.encodeMp3Frames(44100, 320, 2, 2) ++
      MediaCodecs.encodeMp3Frames(44100, 64, 2, 3)
    val mv = MediaCodecs.mp3Metadata(vbr)
    assert(mv.isDefined && mv.get.nFrames === 5L &&
      mv.get.totalSamples === 5 * 1152L && mv.get.maxBitrateKbps === 320)

    // an MPEG-2 Layer III header parses with the halved frame coefficient
    // (72·kbps·1000/sr) and 576 samples/frame: sr=22050 (idx 0), 64 kbps
    // (V2 L2/L3 table idx 8) -> 0xFF 0xF3 0x80 0x00
    val v2len = 72 * 64 * 1000 / 22050
    val v2 = Array[Byte](0xff.toByte, 0xf3.toByte, 0x80.toByte, 0x00) ++
      Array.fill[Byte](v2len - 4)(0x10)
    val f2 = MediaCodecs.parseMp3FrameHeader(v2, 0)
    assert(f2.isDefined && f2.get.version === "mpeg2" && f2.get.layer === 3 &&
      f2.get.sampleRate === 22050 && f2.get.bitrateKbps === 64 &&
      f2.get.samplesPerFrame === 576 && f2.get.frameBytes === v2len)

    // Layer I frame sizing is in 4-byte slots: MPEG-1 L1 (layer bits 11),
    // 32 kbps (idx 1), 44100 -> 0xFF 0xFF 0x10 0x00
    val l1len = (12 * 32 * 1000 / 44100) * 4
    val l1 = Array[Byte](0xff.toByte, 0xff.toByte, 0x10, 0x00) ++
      Array.fill[Byte](l1len - 4)(0x22)
    val f1 = MediaCodecs.parseMp3FrameHeader(l1, 0)
    assert(f1.isDefined && f1.get.layer === 1 && f1.get.frameBytes === l1len &&
      f1.get.samplesPerFrame === 384)

    // rejection: random text, truncated frames, reserved fields, and
    // single-frame payloads with trailing garbage all return None
    assert(MediaCodecs.mp3Metadata("not an mpeg stream at all".getBytes).isEmpty)
    assert(MediaCodecs.mp3Metadata(Array[Byte]()).isEmpty)
    val good = MediaCodecs.encodeMp3Frames(44100, 128, 2, 2)
    assert(MediaCodecs.mp3Metadata(good.dropRight(1)).isEmpty,
      "a truncated final frame must reject the payload")
    assert(MediaCodecs.mp3Metadata(good ++ Array[Byte](0x00)).isEmpty,
      "trailing garbage after the last frame must reject the payload")
    // free-format (bitrate idx 0) and reserved sample-rate are invalid
    val free = good.clone(); free(2) = 0x00
    assert(MediaCodecs.parseMp3FrameHeader(free, 0).isEmpty)
    val badSr = good.clone(); badSr(2) = (badSr(2) | 0x0c).toByte
    assert(MediaCodecs.parseMp3FrameHeader(badSr, 0).isEmpty)
    // deterministic byte-flip fuzz: walk must never throw
    for (seed <- 1 to 200) {
      val mut = good.clone()
      val pos = (seed * 37) % mut.length
      mut(pos) = (mut(pos) ^ (seed * 11 + 1)).toByte
      MediaCodecs.mp3Metadata(mut) // no exception = pass
    }
  }

  test("mediaMetadata and decodeAny: MP3 payloads report real header metadata, honestly labeled") {
    import spark.implicits._
    val rows = Seq(
      MultimodalOps.MediaRecord(1L, MediaCodecs.encodeMp3Frames(44100, 128, 2, 4),
        "audio/mpeg", 0L),
      MultimodalOps.MediaRecord(2L, MediaCodecs.encodeMp3Frames(32000, 64, 1, 2),
        "audio/mpeg", 0L))
    val meta = MultimodalOps.mediaMetadata(spark.createDataset(rows))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("format"), r.getAs[Long]("sample_rate"),
          r.getAs[Long]("channels"), r.getAs[Long]("n_units")))).toMap
    assert(meta(1L) === (("mp3", 44100L, 2L, 4L)))
    assert(meta(2L) === (("mp3", 32000L, 1L, 2L)))
    val (label, feats) = MultimodalOps.decodeAny(rows.head.payload)
    assert(label === "mp3_header_stub_pcm",
      "PCM decode is a stub and the label must say so")
    assert(feats.length === 8)
  }

  test("JPEG codec: quality >= 97 high-contrast blocks stay decodable (Huffman size clamp)") {
    // quant entries clamp to 1 at quality ~97+, so a max-contrast
    // checkerboard quantizes AC magnitudes past size 10 — without the
    // coefficient clamp the encoder emitted a zero-length code for the
    // missing Annex K symbol and produced an undecodable stream
    for (q <- Seq(97, 99, 100)) {
      val w = 16; val h = 16
      val img = MediaCodecs.BmpImage(w, h, Array.tabulate(w * h) { i =>
        if ((i % w + i / w) % 2 == 0) 0xffffff else 0x000000
      })
      val payload = MediaCodecs.encodeJpeg(img, quality = q)
      val back = MediaCodecs.decodeJpeg(payload)
      assert(back.isDefined, s"own decode rejected quality=$q checkerboard")
      assert(back.get.width === w && back.get.height === h)
      val io = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      assert(io != null, s"ImageIO must accept our quality=$q bitstream")
      assert(io.getWidth === w && io.getHeight === h)
    }
  }

  test("JPEG decoder: PROGRESSIVE (SOF2) scans accumulate to the same image ImageIO decodes") {
    // ImageIO's writer emits real multi-scan progressive JPEGs (spectral
    // selection + successive approximation) — the EOB-run and
    // AC-refinement protocol gets exercised for real here.
    for ((w, h) <- Seq((64, 48), (37, 29))) {
      val img = smoothRaster(w, h)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, img.pixels(y * w + x))
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.9f)
      params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), params)
      writer.dispose()
      val payload = bos.toByteArray
      // confirm it IS progressive (SOF2 marker present)
      assert(payload.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
        "ImageIO did not emit SOF2 — test setup broken")

      val mine = MediaCodecs.decodeJpeg(payload)
      assert(mine.isDefined, s"decoder must accept the progressive JPEG at ${w}x$h")
      assert(mine.get.width === w && mine.get.height === h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      val refImg = MediaCodecs.BmpImage(w, h,
        Array.tabulate(w * h)(i => ref.getRGB(i % w, i / w) & 0xffffff))
      val (maxE, meanE) = maxAndMeanChannelErr(mine.get, refImg)
      assert(meanE <= 1.0, s"progressive mean channel error $meanE at ${w}x$h")
      assert(maxE <= 8, s"progressive max channel error $maxE at ${w}x$h")
    }
  }

  test("JPEG decoder: fuzzed and truncated/mutated bitstreams return None, never throw") {
    // a 100 TB corpus's binary column contains garbage; the decoder's
    // contract is Option, not exceptions, on ANY input
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 200) {
      val junk = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(junk)
      MediaCodecs.decodeJpeg(junk) // must not throw (result irrelevant)
    }
    // random bytes behind a valid SOI marker
    for (_ <- 1 to 200) {
      val junk = new Array[Byte](2 + rnd.nextInt(400))
      rnd.nextBytes(junk)
      junk(0) = 0xff.toByte; junk(1) = 0xd8.toByte
      MediaCodecs.decodeJpeg(junk)
    }
    // truncations and single-byte mutations of a REAL baseline stream
    val valid = MediaCodecs.encodeJpeg(smoothRaster(24, 17), quality = 80)
    for (cut <- 1 until valid.length by 7)
      MediaCodecs.decodeJpeg(valid.take(cut))
    for (_ <- 1 to 300) {
      val m = valid.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      MediaCodecs.decodeJpeg(m)
    }
    // and the pristine stream still decodes after all that
    assert(MediaCodecs.decodeJpeg(valid).isDefined)
  }
}
