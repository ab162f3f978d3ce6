package graft.operators

import graft.Util._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — image/audio/video payloads as opaque
  * `binary` columns with typed metadata. Decode is REAL for uncompressed
  * BMP, PCM-16 WAV, zlib PNG and LZW GIF via the pure-JVM
  * [[MediaCodecs]] (no external codec needed); formats that need
  * entropy codecs (JPEG/MP3/H.264, whose libs aren't in this zero-egress
  * container) fall back to the deterministic [[MultimodalOps.stubDecode]],
  * labeled per-row in the `decoder` column. q44 is the oracle-checkable
  * twin of the metadata path over SQL; q120 round-trips real BMP/WAV
  * bytes (encode → decode) against an oracle that independently predicts
  * the decoded header metadata.
  *
  * Scale: decode is a narrow per-partition map over the binary column —
  * no shuffle; batch size is bounded by rows-per-partition, so partition
  * sizing (`files.maxPartitionBytes`) controls decoder memory.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata, the §1.1 "opaque byte
    * payload plus envelope" shape generalized to media.
    */
  case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Deterministic stand-in for an image/audio decoder: folds the payload
    * into a fixed-length feature vector. Replace the body with a real
    * codec when the libs exist; the Spark-side contract (narrow
    * mapPartitions, one feature array per record) stays identical.
    */
  def stubDecode(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val acc = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      acc(i % dims) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Dispatch a payload to the strongest decoder its bytes support: real
    * BMP → image features, real WAV → audio features, anything else → the
    * labeled stub. Sniffs the bytes (magic numbers) rather than trusting
    * the mime string, so a mislabeled or corrupt payload degrades to the
    * stub instead of failing the partition.
    */
  def decodeAny(payload: Array[Byte], dims: Int = 8): (String, Array[Float]) =
    MediaCodecs.decodeBmp(payload).map(i => ("bmp", MediaCodecs.imageFeatures(i)))
      .orElse(MediaCodecs.decodePng(payload).map(i => ("png", MediaCodecs.imageFeatures(i))))
      .orElse(MediaCodecs.decodeGif(payload).map(i => ("gif", MediaCodecs.imageFeatures(i))))
      .orElse(MediaCodecs.decodeJpeg(payload).map(i => ("jpeg", MediaCodecs.imageFeatures(i))))
      .orElse(MediaCodecs.decodeWav(payload).map(a => ("wav", MediaCodecs.audioFeatures(a))))
      // header walk is real; the PCM entropy decode is not — the label
      // says so, and the features stay the honest stub fold
      .orElse(MediaCodecs.mp3Metadata(payload).map(_ =>
        ("mp3_header_stub_pcm", stubDecode(payload, dims))))
      .getOrElse(("stub", stubDecode(payload, dims)))

  /** Decode a media Dataset into per-record feature vectors — narrow, no
    * shuffle, decoder instantiated once per partition (the reference's
    * client-per-lifetime pattern, Handler.java:46-57). The `decoder`
    * column records which path each row took (`bmp` / `wav` / `stub`).
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (codec contexts, etc.)
      it.map { r =>
        val (decoder, feats) = decodeAny(r.payload)
        (r.media_id, r.mime, r.n_bytes, decoder, feats)
      }
    }.toDF("media_id", "mime", "n_bytes", "decoder", "features")
  }

  /** Resize: box-downsample the payload to `targetLen` "pixels" by
    * averaging fixed-size byte blocks — the stand-in for an image resize
    * kernel; same narrow per-partition shape as a real one.
    */
  def resize(ds: Dataset[MediaRecord], targetLen: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        val out = new Array[Float](math.min(targetLen, math.max(n, 1)))
        if (n > 0) {
          val block = math.max(1, n / out.length)
          var i = 0
          while (i < out.length) {
            val from = i * block
            val until = math.min(n, from + block)
            var s = 0
            var j = from
            while (j < until) { s += r.payload(j) & 0xff; j += 1 }
            out(i) = if (until > from) s.toFloat / (until - from) else 0f
            i += 1
          }
        }
        (r.media_id, out.length, out)
      }
    }.toDF("media_id", "resized_len", "resized")
  }

  /** Frame sampling: every `stride`-th byte of the payload (stand-in for
    * every k-th video frame), keeping at most `maxFrames`.
    */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int = 100, maxFrames: Int = 16): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val frames = r.payload.indices.by(stride).take(maxFrames)
          .map(i => r.payload(i) & 0xff).toArray
        (r.media_id, frames.length, frames)
      }
    }.toDF("media_id", "n_frames", "frames")
  }

  /** Build a media table of REAL decodable payloads from `documents`:
    * doc_id % 3 == 0 become genuine 24-bit BMPs, % 3 == 1 genuine 8 kHz
    * mono PCM-16 WAVs (one sample per text byte), % 3 == 2 genuine
    * zlib-compressed truecolor PNGs (image dimensions a deterministic
    * function of doc_id, pixels cycled from the text bytes). Every
    * payload round-trips through [[MediaCodecs]] — this is the
    * zero-egress stand-in for an object-store scan of real image/audio
    * files, with the generation rule simple enough for a SQL oracle to
    * predict the decoded header metadata (q120; PNG payload length is
    * content-defined by DEFLATE, so only its geometry is predicted).
    */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    table(spark, dir, "documents").select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          def byteAt(j: Int): Int =
            if (bytes.length == 0) 0 else bytes(j % bytes.length) & 0xff
          def raster(): MediaCodecs.BmpImage = {
            val w = (4 + id % 13).toInt
            val h = (3 + id % 7).toInt
            val px = new Array[Int](w * h)
            var i = 0
            while (i < px.length) {
              px(i) = (byteAt(3 * i) << 16) | (byteAt(3 * i + 1) << 8) | byteAt(3 * i + 2)
              i += 1
            }
            MediaCodecs.BmpImage(w, h, px)
          }
          def gifIndices(): (Int, Int, Array[Int]) = {
            val w = (4 + id % 13).toInt
            val h = (3 + id % 7).toInt
            (w, h, Array.tabulate(w * h)(byteAt))
          }
          val payload =
            if (id % 6 == 5) { val (w, h, ix) = gifIndices(); MediaCodecs.encodeGif(w, h, ix) }
            else if (id % 6 == 3) MediaCodecs.encodeJpeg(raster()) // half of the %3==0 class
            else (id % 3) match {
              case 0 => MediaCodecs.encodeBmp(raster())
              case 1 =>
                val samples = new Array[Short](bytes.length)
                var i = 0
                while (i < samples.length) {
                  samples(i) = (((bytes(i) & 0xff) - 128) << 8).toShort
                  i += 1
                }
                MediaCodecs.encodeWav(8000, samples)
              case _ => MediaCodecs.encodePng(raster())
            }
          val mime =
            if (id % 6 == 5) "image/gif"
            else if (id % 6 == 3) "image/jpeg"
            else (id % 3) match {
              case 0 => "image/bmp"
              case 1 => "audio/wav"
              case _ => "image/png"
            }
          MediaRecord(id, payload, mime, payload.length.toLong)
        }
      }
  }

  /** Typed metadata extraction by REAL header parsing — width/height from
    * the BMP DIB header or the PNG IHDR, rate/channels/frame count from
    * the WAV fmt+data chunks, `opaque` with byte length only for payloads
    * no codec accepts. Narrow map, no shuffle.
    */
  def mediaMetadata(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        MediaCodecs.decodeBmp(r.payload).map { img =>
          (r.media_id, "bmp", img.width.toLong, img.height.toLong, 0L, 0L,
            img.width.toLong * img.height, r.payload.length.toLong)
        }.orElse(MediaCodecs.decodePng(r.payload).map { img =>
          (r.media_id, "png", img.width.toLong, img.height.toLong, 0L, 0L,
            img.width.toLong * img.height, r.payload.length.toLong)
        }).orElse(MediaCodecs.decodeGif(r.payload).map { img =>
          (r.media_id, "gif", img.width.toLong, img.height.toLong, 0L, 0L,
            img.width.toLong * img.height, r.payload.length.toLong)
        }).orElse(MediaCodecs.decodeJpeg(r.payload).map { img =>
          (r.media_id, "jpeg", img.width.toLong, img.height.toLong, 0L, 0L,
            img.width.toLong * img.height, r.payload.length.toLong)
        }).orElse(MediaCodecs.decodeWav(r.payload).map { a =>
          (r.media_id, "wav", 0L, 0L, a.sampleRate.toLong, a.channels.toLong,
            (a.samples.length / a.channels).toLong, r.payload.length.toLong)
        }).orElse(MediaCodecs.mp3Metadata(r.payload).map { m3 =>
          // n_units = frame count (the walker's native unit); real
          // header metadata, even though PCM decode stays stubbed
          (r.media_id, "mp3", 0L, 0L, m3.sampleRate.toLong, m3.channels.toLong,
            m3.nFrames, r.payload.length.toLong)
        }).getOrElse(
          (r.media_id, "opaque", 0L, 0L, 0L, 0L, 0L, r.payload.length.toLong))
      }
    }.toDF("media_id", "format", "width", "height", "sample_rate", "channels",
      "n_units", "payload_bytes")
  }

  /** REAL image resize: decode BMP pixels, box-average to `outW`×`outH`,
    * re-encode — the output payloads are themselves valid BMPs. Non-BMP
    * rows pass through untouched. Narrow map, no shuffle.
    */
  def resizeImages(ds: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        MediaCodecs.decodeBmp(r.payload) match {
          case Some(img) =>
            val out = MediaCodecs.encodeBmp(MediaCodecs.resizeBmp(img, outW, outH))
            MediaRecord(r.media_id, out, r.mime, out.length.toLong)
          case None => r
        }
      }
    }
  }

  /** REAL audio frame sampling: decode WAV samples, split into
    * `frameLen`-sample frames (channel-0 of interleaved audio), keep at
    * most `maxFrames`, emit per-frame RMS — the audio analogue of video
    * frame extraction. Non-WAV rows yield zero frames.
    */
  def sampleAudioFrames(ds: Dataset[MediaRecord], frameLen: Int = 256,
      maxFrames: Int = 16): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val rms = MediaCodecs.decodeWav(r.payload) match {
          case Some(a) =>
            val frames = a.samples.indices.by(a.channels).map(a.samples(_))
              .grouped(frameLen).take(maxFrames)
            frames.map { f =>
              math.sqrt(f.map(s => { val x = s.toDouble / 32768.0; x * x }).sum /
                math.max(1, f.length)).toFloat
            }.toArray
          case None => Array.empty[Float]
        }
        (r.media_id, rms.length, rms)
      }
    }.toDF("media_id", "n_frames", "frame_rms")
  }

  /** Build a media table from `documents` (text bytes as the opaque
    * payload) — exercises the stub path for payloads no real codec
    * accepts.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select($"doc_id".as("media_id"),
        encode($"text", "UTF-8").as("payload"),
        lit("text/plain").as("mime"),
        octet_length(encode($"text", "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** q44: metadata extraction over the binary column — byte length, fake
    * decode metadata (dimensions derived deterministically from size), and
    * a content hash; the SQL-expressible twin of the decode path.
    */
  def q44BinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .withColumn("payload", encode($"text", "UTF-8"))
      .withColumn("n_bytes", octet_length($"payload").cast("long"))
      .select(
        $"doc_id".as("media_id"),
        $"n_bytes",
        ($"n_bytes" % 640 + 1).as("width"),
        ($"n_bytes" % 480 + 1).as("height"),
        expr("n_bytes div 100").as("n_frames"),
        md5($"text").as("content_hash"))
      .orderBy($"media_id")
  }

  val q44Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) AS BIGINT) % 640 + 1 AS width,
      |  CAST(octet_length(encode(text)) AS BIGINT) % 480 + 1 AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) // 100 AS n_frames,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin

  /** q120: REAL codec round-trip — encode genuine BMP/WAV payloads from
    * `documents` ([[syntheticMedia]]), then recover the metadata by
    * actually parsing the bytes ([[mediaMetadata]]). The oracle predicts
    * the decoded values independently from the generation rule (doc_id
    * parity, dimension formulas, WAV byte accounting), so any header
    * encode/decode bug breaks the hash match.
    */
  def q120MediaRoundtrip(spark: SparkSession, dir: String): DataFrame =
    mediaMetadata(syntheticMedia(spark, dir))
      // PNG/JPEG payload lengths are content-defined (DEFLATE / entropy
      // coding) — the oracle can't predict them, so the roundtrip grade
      // pins the decoded geometry and masks the byte count with a
      // sentinel
      .withColumn("payload_bytes",
        when(col("format") === "png" || col("format") === "jpeg", lit(-1L))
          .otherwise(col("payload_bytes")))
      .orderBy("media_id")

  val q120Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 6 = 5 THEN 'gif'
      |       WHEN doc_id % 6 = 3 THEN 'jpeg'
      |       WHEN doc_id % 3 = 0 THEN 'bmp'
      |       WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'png' END AS format,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 4 + doc_id % 13 END AS BIGINT) AS width,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 3 + doc_id % 7 END AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 ELSE 0 END AS BIGINT) AS sample_rate,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS BIGINT) AS channels,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN octet_length(encode(text))
      |       ELSE (4 + doc_id % 13) * (3 + doc_id % 7) END AS BIGINT) AS n_units,
      |  CAST(CASE
      |       WHEN doc_id % 6 = 5 THEN
      |         -- GIF87a with literal-code LZW is byte-deterministic:
      |         -- 795 header/palette/framing + ceil(9*(w*h+2)/8) data
      |         795 + (9 * ((4 + doc_id % 13) * (3 + doc_id % 7) + 2) + 7) // 8
      |       WHEN doc_id % 6 = 3 THEN -1
      |       WHEN doc_id % 3 = 0 THEN 54 + (3 + doc_id % 7) * ((((4 + doc_id % 13) * 3 + 3) // 4) * 4)
      |       WHEN doc_id % 3 = 1 THEN 44 + 2 * octet_length(encode(text))
      |       ELSE -1 END AS BIGINT) AS payload_bytes
      |FROM documents ORDER BY media_id""".stripMargin

  /** q364: REAL MP3 header metadata — synthesize structurally valid
    * MPEG-1 Layer III streams from `documents` (rates/channels/frame
    * count deterministic functions of doc_id and text length,
    * [[MediaCodecs.encodeMp3Frames]]), then recover EVERYTHING by
    * walking the frame headers ([[MediaCodecs.mp3Metadata]]): version,
    * layer, sample rate, channel mode, frame count, sample count,
    * duration, bitrate. The oracle predicts each value independently
    * from the generation rule — including the spec's frame-size
    * formula (144000·kbps ÷ sampleRate, floor) — so any header
    * encode/walk bug breaks the hash match. PCM entropy decode stays a
    * labeled stub; this card grades the header path, which is what
    * metadata queries over an audio corpus actually run.
    */
  def q364Mp3Metadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents").select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val srs = Array(44100, 48000, 32000)
        val brs = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
        it.map { case (id, text) =>
          val nBytes = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
          val payload = MediaCodecs.encodeMp3Frames(
            srs((id % 3).toInt), brs((id % 14).toInt),
            1 + (id % 2).toInt, 1 + nBytes % 9)
          val m3 = MediaCodecs.mp3Metadata(payload).getOrElse(
            throw new IllegalStateException(
              s"own MP3 stream failed to walk (doc $id)"))
          (id, m3.version, m3.layer.toLong, m3.sampleRate.toLong,
            m3.channels.toLong, m3.nFrames, m3.totalSamples, m3.durationMs,
            m3.maxBitrateKbps.toLong, payload.length.toLong)
        }
      }.toDF("media_id", "version", "layer", "sample_rate", "channels",
        "n_frames", "total_samples", "duration_ms", "bitrate_kbps",
        "payload_bytes")
      .orderBy($"media_id")
  }

  val q364Sql: String =
    """WITH p AS (SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS sr,
      |    list_value(32,40,48,56,64,80,96,112,128,160,192,224,256,320)[
      |      CAST(doc_id % 14 AS INT) + 1] AS kbps,
      |    1 + doc_id % 2 AS channels,
      |    1 + CAST(octet_length(encode(text)) AS BIGINT) % 9 AS n_frames
      |  FROM documents)
      |SELECT doc_id AS media_id, 'mpeg1' AS version, CAST(3 AS BIGINT) AS layer,
      |  CAST(sr AS BIGINT) AS sample_rate, CAST(channels AS BIGINT) AS channels,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(n_frames * 1152 AS BIGINT) AS total_samples,
      |  CAST(n_frames * 1152 * 1000 // sr AS BIGINT) AS duration_ms,
      |  CAST(kbps AS BIGINT) AS bitrate_kbps,
      |  CAST(n_frames * ((144000 * kbps) // sr) AS BIGINT) AS payload_bytes
      |FROM p ORDER BY media_id""".stripMargin

  val queries: Seq[(String, Q)] = Seq(
    "q44_binary_meta" -> (q44BinaryMeta _),
    "q120_media_roundtrip" -> (q120MediaRoundtrip _),
    "q364_mp3_metadata" -> (q364Mp3Metadata _))

  val oracles: Seq[(String, String)] = Seq(
    "q44_binary_meta" -> q44Sql,
    "q120_media_roundtrip" -> q120Sql,
    "q364_mp3_metadata" -> q364Sql)
}
