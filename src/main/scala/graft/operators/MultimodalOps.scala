package graft.operators

import graft.Util._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — image/audio/video payloads as opaque
  * `binary` columns with typed metadata. The real pipeline (schema,
  * partition-preserving mapPartitions decode, batch shape) is
  * [[MultimodalOps.decodeFeatures]] / [[MultimodalOps.sampleFrames]] with
  * a deterministic stub decoder (the actual image/audio codecs are not in
  * this container); q44 is the oracle-checkable twin of the metadata
  * extraction path, driving the same binary columns through SQL.
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

  /** Decode a media Dataset into per-record feature vectors — narrow, no
    * shuffle, decoder instantiated once per partition (the reference's
    * client-per-lifetime pattern, Handler.java:46-57).
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (codec contexts, etc.)
      it.map(r => (r.media_id, r.mime, r.n_bytes, stubDecode(r.payload)))
    }.toDF("media_id", "mime", "n_bytes", "features")
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

  /** Build a media table from `documents` (text bytes as the opaque
    * payload) — the zero-egress stand-in for real image/audio files.
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

  val queries: Seq[(String, Q)] = Seq(
    "q44_binary_meta" -> (q44BinaryMeta _))

  val oracles: Seq[(String, String)] = Seq(
    "q44_binary_meta" -> q44Sql)
}
