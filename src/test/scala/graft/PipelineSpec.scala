package graft

import org.apache.spark.sql.functions._

/** Invariants of the composed curation pipeline. */
class PipelineSpec extends SparkSpec {

  test("curate keeps a quality-gated, exact- and near-dup-free subset") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // other suites share this session and may leave untracked caches;
    // start from a clean slate so the end-of-scope assertion is about
    // THIS scope's caches
    spark.sharedState.cacheManager.clearCache()
    graft.api.Dedup.cacheScope {
      val kept = PipelineDemo.curate(docs, minQuality = 0.4, nearDupJaccard = 0.5)

      // subset of the input, no new rows
      assert(kept.count() > 0)
      assert(kept.join(docs, Seq("doc_id"), "left_anti").count() === 0)

      // quality gate applied
      assert(kept.filter($"quality" < 0.4).count() === 0)

      // no two kept docs share a normalized fingerprint
      val dupFps = kept
        .withColumn("fp", graft.api.Text.normalizedFingerprint($"text"))
        .groupBy($"fp").count().filter($"count" > 1).count()
      assert(dupFps === 0)

      // no kept pair is still a near-duplicate at the threshold
      val residual = graft.api.Dedup.lshCandidatePairs(kept, "doc_id", "text")
        .filter($"jaccard" >= 0.5).count()
      assert(residual === 0)
    }
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("curate with a benchmark leaves zero n-gram leaks in the kept set") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sf/documents.parquet")
    spark.sharedState.cacheManager.clearCache()
    graft.api.Dedup.cacheScope {
      val bench = all.filter($"doc_id" % 25 === 0)
      val corpus = all.filter($"doc_id" % 25 =!= 0)
      // strict mode: 4-gram overlap, zero tolerance → no 4-gram leaks
      val kept4 = PipelineDemo.curate(corpus,
        minQuality = 0.4, benchmark = Some(bench), decontamNgram = 4)
      assert(kept4.count() > 0)
      val leaks = graft.api.Dedup
        .decontaminationStats(kept4, bench, "doc_id", "text").count()
      assert(leaks === 0, "kept corpus must share no 4-gram with the benchmark")
      // repetition gate applied
      assert(kept4.filter($"repetition" > 0.3).count() === 0)

      // default mode (8-gram) drops no MORE than the 4-gram mode: every
      // 8-gram leak contains 4-gram leaks, so strict-4 drops ⊇ default-8
      // drops (the ADVICE over-dropping fix)
      val kept8 = PipelineDemo.curate(corpus,
        minQuality = 0.4, benchmark = Some(bench))
      assert(kept4.join(kept8, Seq("doc_id"), "left_anti").count() === 0,
        "every doc surviving the strict 4-gram gate survives the default 8-gram gate")
      val leaks8 = graft.api.Dedup
        .decontaminationStats(kept8, bench, "doc_id", "text", 8).count()
      assert(leaks8 === 0, "kept corpus must share no 8-gram with the benchmark")
    }
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
