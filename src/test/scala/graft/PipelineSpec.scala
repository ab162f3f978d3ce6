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

  test("curate keeps the highest-quality member of a near-dup cluster and honors a source quota") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
      "to the hills where it finds a quiet place to rest for the long night"
    val docs = Seq(
      // near-dup cluster: 11 is longer (higher quality) than 10 — the
      // min-id keeper would keep 10, canonical selection must keep 11
      (10L, base, "a"),
      (11L, base + " under bright summer stars watching the moon", "a"),
      (20L, "completely different text about spark catalyst optimizer rules " +
        "and distributed shuffle exchange planning at large cluster scale", "a"),
      (30L, "a third unrelated document mentions sailing boats navigating " +
        "open water with steady wind and calm seas tonight", "b")
    ).toDF("doc_id", "text", "source")
    graft.api.Dedup.cacheScope {
      val kept = PipelineDemo.curate(docs, minQuality = 0.0, nearDupJaccard = 0.5)
        .select($"doc_id").as[Long].collect().toSet
      assert(kept.contains(11L) && !kept.contains(10L),
        s"cluster must keep its best-quality member: $kept")
      assert(kept === Set(11L, 20L, 30L))

      // quota: source a keeps only its single best survivor
      val capped = PipelineDemo.curate(docs, minQuality = 0.0,
          nearDupJaccard = 0.5, sourceQuota = Some(("source", 1)))
        .select($"doc_id").as[Long].collect().toSet
      assert(capped.size === 2 && capped.contains(30L),
        s"one survivor per source expected: $capped")
    }
  }

  test("curate's semantic stage drops embedding paraphrases the n-gram stages cannot see") {
    import spark.implicits._
    // two texts with NO shared n-grams but near-identical embeddings:
    // the text stages keep both, SemDeDup must drop the higher id
    val texts = Seq(
      (1L, "the committee approved the annual budget for the coastal research station today"),
      (2L, "funding of the seaside laboratory was signed off by the board this afternoon"),
      (3L, "completely unrelated gardening notes about tomato seedlings and compost rotation schedule")
    ).toDF("doc_id", "text")
    def vec(seed: Int, eps: Float): Array[Float] =
      Array.tabulate(16)(j => (((seed * 31 + j * 7) % 13) - 6) * 0.1f + (if (j == 0) eps else 0f))
    val emb = Seq(
      (1L, vec(5, 0f)),
      (2L, vec(5, 0.01f)),   // paraphrase of 1: cosine ≈ 1
      (3L, vec(11, 0f))
    ).toDF("vec_id", "embedding")
    spark.sharedState.cacheManager.clearCache()
    graft.api.Dedup.cacheScope {
      val noSem = PipelineDemo.curate(texts, minQuality = 0.0,
        maxRepetition = 1.0)
      assert(noSem.count() === 3, "text stages alone must keep all three")
      // one cell: the near-identical pair must share a cluster (two
      // near-identical seed centroids could otherwise split it)
      val withSem = PipelineDemo.curate(texts, minQuality = 0.0,
        maxRepetition = 1.0, embeddings = Some(emb), semanticCosine = 0.9,
        semanticCells = 1)
      val keptIds = withSem.select($"doc_id").as[Long].collect().toSet
      assert(keptIds.contains(1L) && !keptIds.contains(2L),
        s"SemDeDup must drop the higher-id paraphrase, kept: $keptIds")
      assert(keptIds.contains(3L))
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

  test("healthReport: curated corpus passes the audit; profile carries sane card numbers") {
    import spark.implicits._
    val docs = graft.Util.table(spark, sf, "documents")
    val (auditRep, profile) = PipelineDemo.healthReport(docs)
    val byName = auditRep.collect()
      .map(r => r.getAs[String]("constraint") ->
        (r.getAs[Long]("violations"), r.getAs[Boolean]("pass"))).toMap
    assert(byName.size === 5)
    // the synthetic documents table is schema-clean: every expectation holds
    byName.foreach { case (n, (v, p)) => assert(p && v === 0L, s"$n: $v") }

    val prof = profile.collect()
    assert(prof.nonEmpty)
    val srcs = docs.select("source").distinct().count()
    assert(prof.length === srcs)
    prof.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      val g = r.getAs[Double]("gini_chars")
      assert(g >= 0.0 && g < 1.0, s"gini $g")
      assert(r.getAs[Double]("zipf_slope") < 0.0, "token law must slope down")
      assert(r.getAs[Long]("vocab") > 0)
    }
  }

  test("chunk-level dedup composes: chunkFixed feeds exact and MinHash dedup (boilerplate path)") {
    import spark.implicits._
    // two docs sharing a long boilerplate footer + one clean doc — the
    // C4/RefinedWeb-style repeated-chunk (boilerplate) situation that
    // document-level dedup misses
    val footer = (1 to 40).map(i => s"footer$i").mkString(" ")
    // bodies padded to exactly one 120-char tile so the shared footer
    // starts on the same chunk boundary in both docs (in production the
    // chunker runs on normalized text where boilerplate aligns the same
    // way — identical upstream bytes chunk identically)
    def pad120(s: String) = (s + " filler" * 30).take(120)
    val docs = Seq(
      (1L, s"${pad120("alpha unique body one")}$footer"),
      (2L, s"${pad120("beta different body two")}$footer"),
      (3L, "gamma entirely clean document body")
    ).toDF("doc_id", "text")

    val chunks = graft.api.Text.chunkFixed(docs, "doc_id", "text",
        chunkChars = 120, stride = 120) // disjoint tiles for exact matching
      .withColumn("chunk_id", $"doc_id" * 1000 + $"chunk_idx")

    // exact chunk-level dedup: the identical footer tile appears in both
    // docs -> same md5, caught by the exact-dedup groupBy
    val repeated = chunks
      .groupBy(md5($"chunk")).agg(countDistinct($"doc_id").as("n_docs"))
      .filter($"n_docs" > 1)
    assert(repeated.count() >= 1, "shared boilerplate tile must repeat across docs")

    // near-dup chunk detection: MinHash-LSH over the chunk frame pairs
    // the footer-bearing tail chunks of docs 1 and 2, never doc 3's
    val pairs = graft.api.Dedup.lshCandidatePairs(chunks, "chunk_id", "chunk")
      .filter($"jaccard" >= 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "footer chunks of docs 1/2 must pair")
    val pairedDocs = pairs.flatMap(p => Seq(p._1 / 1000, p._2 / 1000)).toSet
    assert(pairedDocs === Set(1L, 2L), s"only the boilerplate docs pair: $pairedDocs")
  }
}
