package graft.operators

import graft.SparkSpec

/** Tests of the multimodal binary-column plumbing: schema, deterministic
  * stub decode, batch shape, and partition preservation (the decode is a
  * narrow map — no shuffle).
  */
class MultimodalSpec extends SparkSpec {

  test("decodeFeatures: schema + deterministic stub features") {
    val media = MultimodalOps.mediaFromDocuments(spark, sf)
    val feats = MultimodalOps.decodeFeatures(media)
    assert(feats.schema.fieldNames.toSeq === Seq("media_id", "mime", "n_bytes", "features"))
    val row = feats.filter(feats("media_id") === 0).head()
    val payload = media.filter(media("media_id") === 0).head().payload
    val want = MultimodalOps.stubDecode(payload)
    assert(row.getAs[Seq[Float]]("features").toArray.toSeq === want.toSeq)
    assert(row.getAs[Seq[Float]]("features").length === 8)
  }

  test("decodeFeatures: narrow map preserves partitioning (no shuffle)") {
    val media = MultimodalOps.mediaFromDocuments(spark, sf).repartition(3)
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
}
