package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The library API must work over caller-owned frames with arbitrary
  * column names — not just the harness tables.
  */
class ApiSpec extends SparkSpec {

  test("Dedup API finds planted near-duplicates in a custom-named corpus") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (10L, base),
      (20L, base + " ok"),                          // near-dup of 10
      (30L, "completely different words in this unrelated document body here"),
      (40L, base + " ok")                           // exact dup of 20
    ).toDF("k", "body")

    val sigs = Dedup.minhashSignatures(corpus, "k", "body")
    assert(sigs.count() === 4 * Dedup.NumSeeds)

    val pairs = Dedup.lshCandidatePairs(corpus, "k", "body")
      .filter($"jaccard" >= 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((20L, 40L))) // identical texts always pair
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists(p => p._1 == 30L || p._2 == 30L))

    val clusters = Dedup.clusterComponents(
      Dedup.lshCandidatePairs(corpus, "k", "body")
        .filter($"jaccard" >= 0.5).select($"id_a", $"id_b"))
    val keeper = clusters.filter($"is_keeper").select($"id").as[Long].collect()
    // every cluster keeps exactly its minimum id
    assert(keeper.toSet.subsetOf(Set(10L, 20L)))
    assert(clusters.filter($"id" === $"cluster").count() === keeper.length)
  }

  test("Similarity API ranks an identical vector first under custom names") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),   // identical to 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.7f, 0.7f, 0.0f))
    ).toDF("vid", "vec")

    val knn = Similarity.cosineKnn(corpus, corpus.filter($"vid" === 1L),
      "vid", "vec", k = 2)
    val top = knn.orderBy($"rn").select($"cand_id", $"sim").as[(Long, Double)].collect()
    assert(top.head._1 === 2L)
    assert(math.abs(top.head._2 - 1.0) < 1e-12)

    val assigned = Similarity.ivfAssign(corpus, corpus.filter($"vid" <= 3L), "vid", "vec")
    val clusters = assigned.select($"vid", $"cluster").as[(Long, Long)].collect().toMap
    assert(clusters(1L) === 1L) // own centroid, ties broken to lowest id
    assert(clusters(2L) === 1L)
    assert(clusters(3L) === 3L)
    assert(clusters(4L) === 1L) // equidistant from 1 and 3 → lowest id

    val dups = Similarity.nearDupPairs(corpus, "vid", "vec", 0.999)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(dups === Set((1L, 2L)))
  }
}
