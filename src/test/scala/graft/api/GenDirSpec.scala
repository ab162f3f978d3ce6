package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generation-pointer semantics ([[GenDir]]) and the concurrency
  * contract the dup-graph artifact rides on: compactions swap in with
  * no reader-visible window, and a rewrite that would race a concurrent
  * append aborts instead of dropping the appended rows.
  */
class GenDirSpec extends SparkSpec {

  test("GenDir: publish/current/retention — one old generation kept, older deleted") {
    import spark.implicits._
    val dir = tmpDir("gendir") + "/t"
    assert(GenDir.current(spark, dir).isEmpty)
    intercept[IllegalStateException] { GenDir.currentOrFail(spark, dir) }

    assert(GenDir.publish(spark, dir) { g =>
      Seq(1L, 2L).toDF("v").write.parquet(g)
    }())
    val g0 = GenDir.currentOrFail(spark, dir)
    assert(g0.endsWith("gen-0"))
    assert(spark.read.parquet(g0).count() === 2)

    assert(GenDir.publish(spark, dir) { g =>
      Seq(1L, 2L, 3L).toDF("v").write.parquet(g)
    }())
    val g1 = GenDir.currentOrFail(spark, dir)
    assert(g1.endsWith("gen-1"))
    // gen-0 retained for in-flight readers (read-stability window)
    assert(spark.read.parquet(g0).count() === 2)

    assert(GenDir.publish(spark, dir) { g =>
      Seq(4L).toDF("v").write.parquet(g)
    }())
    assert(GenDir.currentOrFail(spark, dir).endsWith("gen-2"))
    // gen-1 retained, gen-0 now gone
    assert(spark.read.parquet(g1).count() === 3)
    assert(!new java.io.File(g0).exists(), "generations older than one back must be deleted")
  }

  test("GenDir: validate-abort keeps the old generation live and never drops a racing append") {
    import spark.implicits._
    val dir = tmpDir("gendir_abort") + "/t"
    assert(GenDir.publish(spark, dir) { g =>
      Seq(1L, 2L).toDF("v").write.parquet(g)
    }())
    val cur = GenDir.currentOrFail(spark, dir)
    val before = GenDir.currentFiles(spark, dir)

    // the maintain protocol: read current, write the rewrite aside, and
    // — here — an append races in BETWEEN the read and the commit; the
    // listing-compare validate must abort the swap
    val committed = GenDir.publish(spark, dir) { g =>
      spark.read.parquet(cur).write.parquet(g) // the "compaction"
      Seq(99L).toDF("v").write.mode("append").parquet(cur) // the racing append
    } { () => GenDir.currentFiles(spark, dir) == before }

    assert(!committed, "a detected concurrent append must abort the publish")
    assert(GenDir.currentOrFail(spark, dir) === cur,
      "the old generation must stay current after an abort")
    assert(spark.read.parquet(cur).as[Long].collect().toSet === Set(1L, 2L, 99L),
      "the racing append's rows must survive the aborted compaction")
    // and a re-run (listing captured fresh) commits the appended row too
    val before2 = GenDir.currentFiles(spark, dir)
    assert(GenDir.publish(spark, dir) { g =>
      spark.read.parquet(cur).coalesce(1).write.parquet(g)
    } { () => GenDir.currentFiles(spark, dir) == before2 })
    assert(spark.read.parquet(GenDir.currentOrFail(spark, dir))
      .as[Long].collect().toSet === Set(1L, 2L, 99L))
  }

  test("GenDir: a crashed (uncommitted) build is invisible to readers and cleaned by the next publish") {
    import spark.implicits._
    val dir = tmpDir("gendir_crash") + "/t"
    assert(GenDir.publish(spark, dir) { g => Seq(1L).toDF("v").write.parquet(g) }())
    // simulate a crash: a gen dir written but never committed
    Seq(7L).toDF("v").write.parquet(s"$dir/gen-1")
    assert(GenDir.currentOrFail(spark, dir).endsWith("gen-0"),
      "an uncommitted generation must not be served")
    assert(GenDir.publish(spark, dir) { g => Seq(2L).toDF("v").write.parquet(g) }())
    val cur = GenDir.currentOrFail(spark, dir)
    assert(spark.read.parquet(cur).as[Long].collect().toSet === Set(2L))
  }

  test("IVF index: searches hammering across append/compact/rebuild cycles never miss and never mix generations") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = corpus.filter($"vec_id" < 8)
    val dir = tmpDir("ivf_hammer")
    Similarity.writeIvfIndex(corpus.filter($"vec_id" % 2 === 0), cents,
      "vec_id", "embedding", dir)
    val probes = corpus.filter($"vec_id" >= 100 && $"vec_id" < 103)
      .select($"vec_id", $"embedding").localCheckpoint()

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = (1 to 3).map { _ =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            // zero retry-on-miss, and a consistent generation every time
            val n = Similarity.searchIvfIndex(spark, dir, probes,
              "vec_id", "embedding", k = 3, nprobe = 2).count()
            assert(n > 0)
            Similarity.ivfDriftReport(spark, dir).count()
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    readers.foreach(_.start())
    try {
      // single writer: append debris, compact, then a full REBUILD —
      // the worst reader race the old rename-swap could lose
      val odd = corpus.filter($"vec_id" % 2 === 1)
        .select($"vec_id", $"embedding")
        .as[(Long, Array[Float])].collect().toSeq
      odd.grouped(math.max(1, odd.size / 3)).foreach { b =>
        Similarity.appendToIvfIndex(b.toDF("vec_id", "embedding"),
          "vec_id", "embedding", dir)
        Similarity.compactIvfCells(spark, dir)
      }
      Similarity.writeIvfIndex(corpus, cents, "vec_id", "embedding", dir)
    } finally {
      stop.set(true)
      readers.foreach(_.join(120000))
    }
    assert(failures.isEmpty,
      s"search hit an error mid-compaction/rebuild: ${Option(failures.peek()).map(_.toString)}")
  }

  test("DupGraph: readers hammering a live artifact across maintain/refreshStats cycles never miss") {
    import spark.implicits._
    val docs = graft.Util.rawTable(spark, sf, "documents")
      .select($"doc_id", $"text")
    val dir = tmpDir("dg_hammer") + "/g"
    DupGraph.write(docs.filter($"doc_id" % 3 === 0), "doc_id", "text", dir,
      0.5, "lsh", storeDocs = true)
    // seed append debris so maintain(maxFiles = 1) always compacts
    val rest = docs.filter($"doc_id" % 3 =!= 0)
      .as[(Long, String)].collect().toSeq
    val batches = rest.grouped(math.max(1, rest.size / 4)).zipWithIndex.toSeq
    batches.take(2).foreach { case (b, i) =>
      DupGraph.ingestBatch(b.toDF("doc_id", "text"), i.toLong, dir, "doc_id", "text")
    }

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = (1 to 3).map { _ =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            // zero retry-on-miss: every read must succeed mid-compaction
            DupGraph.readEdges(spark, dir, 0.5).count()
            DupGraph.readDegrees(spark, dir, 0.7).count()
            DupGraph.readMeta(spark, dir)
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    readers.foreach(_.start())
    try {
      // the single writer: ingest → maintain → refresh, repeatedly
      batches.drop(2).foreach { case (b, i) =>
        DupGraph.ingestBatch(b.toDF("doc_id", "text"), i.toLong, dir, "doc_id", "text")
        DupGraph.maintain(spark, dir, maxFiles = 1)
      }
      DupGraph.maintain(spark, dir, maxFiles = 1)
      DupGraph.refreshStats(spark, dir)
    } finally {
      stop.set(true)
      readers.foreach(_.join(120000))
    }
    assert(failures.isEmpty,
      s"reader hit an error during compaction: ${Option(failures.peek()).map(_.toString)}")

    // and the hammered artifact still equals the batch build
    val batchDir = tmpDir("dg_hammer_ref") + "/g"
    DupGraph.write(docs, "doc_id", "text", batchDir, 0.5, "lsh")
    def edgeSet(p: String) = DupGraph.readEdges(spark, p, 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(edgeSet(dir) === edgeSet(batchDir))
  }
}
