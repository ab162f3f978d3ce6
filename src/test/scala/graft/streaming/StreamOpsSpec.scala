package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Top-level so Spark can derive its encoder without an outer-scope
  * reference (inner case classes fail `toDF` resolution).
  */
case class EmbRow(id: Long, emb: Array[Float])

/** Keyed value row for the drift-monitor tests (top-level for encoders). */
case class KV(k: String, v: Double)
case class CdcEv(user_id: Long, event_type: String, ts: Long,
    event_id: Long, value: Double)

/** Behavioral tests of the streaming window/watermark/dedup operators
  * with MemoryStream, forcing micro-batch boundaries so the watermark
  * actually advances between batches.
  */
class StreamOpsSpec extends SparkSpec {

  case class Evt(ts: Timestamp, event_type: String, user_id: Long, value: Double, id: Long)

  private def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("tumblingAgg + watermark: late event beyond lateness is dropped") {
    import spark.implicits._
    val mem = MemoryStream[Evt](spark)
    val q = StreamOps.tumblingAgg(mem.toDF(), "ts", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_out").outputMode("append").start()

    mem.addData(Evt(t(1), "click", 1, 1.0, 1), Evt(t(4), "click", 1, 2.0, 2))
    q.processAllAvailable()
    // advance event time far past window end + lateness → closes [10:00,10:10)
    mem.addData(Evt(t(31), "click", 1, 9.0, 3))
    q.processAllAvailable()
    // this event targets the closed window → must be dropped
    mem.addData(Evt(t(2), "click", 1, 100.0, 4))
    q.processAllAvailable()
    mem.addData(Evt(t(59), "click", 1, 0.0, 5))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tumbling_out")
      .collect().map(r => (r.getAs[Timestamp]("win_start"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    val first = rows.find(_._1 == t(0)).get
    assert(first._2 === 2L && first._3 === 3.0) // late id=4 (value 100) not included
  }

  test("sessionAgg: events within the gap merge into one session, a distant one opens another") {
    import spark.implicits._
    val mem = MemoryStream[Evt](spark)
    val q = StreamOps.sessionAgg(mem.toDF(), "ts", "1 minute", "5 minutes")
      .writeStream.format("memory").queryName("session_out").outputMode("append").start()

    mem.addData(
      Evt(t(0), "x", 7, 0, 1), Evt(t(2), "x", 7, 0, 2), Evt(t(4), "x", 7, 0, 3), // one session
      Evt(t(20), "x", 7, 0, 4)) // separate session
    q.processAllAvailable()
    mem.addData(Evt(t(59), "x", 7, 0, 5)) // advance watermark to finalize
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("session_out")
      .collect().map(r => (r.getAs[Timestamp]("sess_start"), r.getAs[Long]("n_events"))).sortBy(_._1.getTime)
    assert(sessions.take(2).map(_._2).toSeq === Seq(3L, 1L))
    assert(sessions.head._1 === t(0))
  }

  test("dedupWithinWatermark: duplicate ids within the watermark are dropped once") {
    import spark.implicits._
    val mem = MemoryStream[Evt](spark)
    val q = StreamOps.dedupWithinWatermark(mem.toDF(), "ts", "10 minutes", Seq("id"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()

    mem.addData(Evt(t(1), "a", 1, 1.0, 100), Evt(t(2), "a", 1, 1.0, 100)) // dup in same batch
    q.processAllAvailable()
    mem.addData(Evt(t(3), "a", 1, 1.0, 100), Evt(t(4), "b", 2, 2.0, 200)) // dup across batches
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("id")).sorted
    assert(ids.toSeq === Seq(100L, 200L))
  }

  test("ObservedMetricsListener captures observe() metrics per micro-batch") {
    import spark.implicits._
    val listener = new ObservedMetricsListener("streamops_test")
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Evt](spark)
      val q = mem.toDF()
        .observe("streamops_test",
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("records"),
          org.apache.spark.sql.functions.max($"ts").as("lastArrival"))
        .writeStream.format("memory").queryName("obs_out").outputMode("append").start()
      mem.addData(Evt(t(1), "a", 1, 1.0, 1), Evt(t(2), "a", 1, 1.0, 2), Evt(t(3), "a", 1, 1.0, 3))
      q.processAllAvailable()
      q.stop()
      // listener events are async — wait for delivery
      val deadline = System.currentTimeMillis() + 30000
      while (listener.batches.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val batch = listener.batches.peek()
      assert(batch != null, "listener never saw the observation")
      assert(batch.records === 3L)
      assert(batch.lastArrivalMs === t(3).getTime)
    } finally spark.streams.removeListener(listener)
  }

  test("JsonLinesRecordWriter: per-record foreach sink with open/process/close lifecycle") {
    import spark.implicits._
    val mem = MemoryStream[Evt](spark)
    val dir = tmpDir("recsink")
    val q = mem.toDF()
      .selectExpr("event_type AS streamName", "CAST(user_id AS STRING) AS partitionKey",
        "CAST(id AS STRING) AS sequenceNumber")
      .writeStream.foreach(new JsonLinesRecordWriter(dir)).outputMode("append").start()
    mem.addData(Evt(t(1), "click", 1, 0, 11), Evt(t(2), "error", 2, 0, 12))
    q.processAllAvailable()
    q.stop()
    val lines = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".jsonl"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    assert(lines.length === 2)
    assert(lines.exists(_.contains("\"sequenceNumber\": \"11\"")))
    assert(lines.exists(_.contains("\"streamName\": \"error\"")))
  }

  case class Doc(ts: Timestamp, doc_id: Long, text: String)

  test("decontaminationFilter drops stream docs leaking benchmark n-grams") {
    import spark.implicits._
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val mem = MemoryStream[Doc](spark)
    val q = StreamOps.decontaminationFilter(mem.toDF(), benchmark, "doc_id", "text")
      .writeStream.format("memory").queryName("decon_out").outputMode("append").start()
    mem.addData(
      Doc(t(1), 1, "alpha beta gamma delta epsilon unrelated tail words here"), // leaks
      Doc(t(2), 2, "totally clean document with no benchmark overlap present"),
      Doc(t(3), 3, benchText),                                                  // full leak
      Doc(t(4), 4, "a b"))                                                      // no shingles → kept
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("decon_out").select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
  }

  test("decontaminationFilterRefreshing picks up benchmark updates without a stream restart") {
    import spark.implicits._
    val benchDir = java.nio.file.Files.createTempDirectory("bench").toString
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((100L, benchText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(benchDir)
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[Doc](spark)
    val q = StreamOps.decontaminationFilterRefreshing(
        mem.toDF(), s => s.read.parquet(benchDir), "doc_id", "text") {
      (batch, _) => kept.synchronized {
        kept ++= batch.select($"doc_id").as[Long].collect()
      }
    }.start()
    val lateBench = "future benchmark question about seventeen green elephants dancing"
    mem.addData(
      Doc(t(1), 1, "alpha beta gamma delta epsilon unrelated tail words here"), // leaks v1
      Doc(t(2), 2, s"$lateBench plus trailing context"))                        // v2 not published yet → kept
    q.processAllAvailable()
    assert(kept.synchronized(kept.toSet) === Set(2L))
    // publish a NEW benchmark doc mid-stream — no restart
    Seq((100L, benchText), (101L, lateBench)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(benchDir)
    mem.addData(
      Doc(t(3), 3, s"$lateBench plus other trailing context"), // leaks v2 now
      Doc(t(4), 4, "totally clean document with no benchmark overlap present"))
    q.processAllAvailable()
    q.stop()
    assert(kept.synchronized(kept.toSet) === Set(2L, 4L),
      "the updated benchmark must filter batches after publication")
  }

  test("decontaminationFilterBloom: Bloom false positives never drop clean docs; true leaks drop") {
    import spark.implicits._
    val benchDir = java.nio.file.Files.createTempDirectory("bench-bloom").toString
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((100L, benchText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(benchDir)
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[Doc](spark)
    // bloomBits=2: a 2-bit filter over 5 benchmark shingles saturates —
    // essentially EVERY probe is a Bloom hit (forced false positives),
    // so the exact verify join is doing all the work; a clean doc
    // surviving proves a false positive can never drop a document
    val q = StreamOps.decontaminationFilterBloom(
        mem.toDF(), s => s.read.parquet(benchDir), "doc_id", "text",
        bloomItems = 5L, bloomBits = 2L, broadcastCutover = 0L) {
      (batch, _) => kept.synchronized {
        kept ++= batch.select($"doc_id").as[Long].collect()
      }
    }.start()
    mem.addData(
      Doc(t(1), 1, "alpha beta gamma delta epsilon unrelated tail words here"), // true leak
      Doc(t(2), 2, "totally clean document with no benchmark overlap present"), // bloom-hit FP, exact-clean
      Doc(t(3), 3, benchText),                                                  // full leak
      Doc(t(4), 4, "a b"))                                                      // no shingles → kept
    q.processAllAvailable()
    q.stop()
    assert(kept.synchronized(kept.toSet) === Set(2L, 4L),
      "exact verify must rescue Bloom false positives and drop only true leaks")
    // same stream through the DEFAULT adaptive gate (a 5-shingle suite
    // sits under the broadcast cutover, so no Bloom): identical verdicts
    val kept2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem2 = MemoryStream[Doc](spark)
    val q2 = StreamOps.decontaminationFilterBloom(
        mem2.toDF(), s => s.read.parquet(benchDir), "doc_id", "text") {
      (batch, _) => kept2.synchronized {
        kept2 ++= batch.select($"doc_id").as[Long].collect()
      }
    }.start()
    mem2.addData(
      Doc(t(1), 1, "alpha beta gamma delta epsilon unrelated tail words here"),
      Doc(t(2), 2, "totally clean document with no benchmark overlap present"),
      Doc(t(3), 3, benchText),
      Doc(t(4), 4, "a b"))
    q2.processAllAvailable()
    q2.stop()
    assert(kept2.synchronized(kept2.toSet) === Set(2L, 4L))
  }

  test("ivfSearchStream: live probes over a maintained index; rewrite and append land without restart") {
    import spark.implicits._
    val centers = Seq(
      Array(1.0f, 0f, 0f, 0.1f),
      Array(0f, 1.0f, 0f, 0.1f),
      Array(0f, 0f, 1.0f, 0.1f))
    def blob(ids: Range): Seq[EmbRow] = ids.map { i =>
      val c = centers(i % 3)
      EmbRow(i.toLong, c.map(_ + 0.02f * ((i * 37 % 11) - 5)))
    }
    val dir = java.nio.file.Files.createTempDirectory("ivf_stream").toString
    val cents = centers.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "emb")
    graft.api.Similarity.writeQuantizedIvfIndex(
      blob(0 until 90).toDF("id", "emb"), cents, "id", "emb", dir)

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val mem = MemoryStream[EmbRow](spark)
    val q = StreamOps.ivfSearchStream(mem.toDF(), dir, "id", "emb",
        k = 3, nprobe = 3) {
      (res, batchId) => results.synchronized {
        results ++= res.select(
          org.apache.spark.sql.functions.lit(batchId),
          $"probe_id".cast("long"),
          $"cand_id".cast("long")).as[(Long, Long, Long)].collect()
      }
    }.start()

    // batch 0: a probe at center 0 — neighbors are blob-0 members (÷3)
    mem.addData(EmbRow(9000L, centers(0)))
    q.processAllAvailable()
    // REBUILD the index mid-stream over a brand-new id range
    graft.api.Similarity.writeQuantizedIvfIndex(
      blob(0 until 90).map(r => r.copy(id = r.id + 10000L)).toDF("id", "emb"),
      cents, "id", "emb", dir)
    mem.addData(EmbRow(9001L, centers(0)))
    q.processAllAvailable()
    // APPEND rows in a direction the corpus does NOT contain (the 45°
    // mix of centers 0 and 1 — every existing member scores ≤ ~0.72
    // against it, the appended rows ~1.0, so ties can't hide them),
    // then probe exactly that direction: the appended rows must win
    val mixDir = Array(0.7f, 0.7f, 0f, 0.14f)
    graft.api.Similarity.appendToQuantizedIvfIndex(
      Seq(EmbRow(20000L, mixDir), EmbRow(20001L, mixDir.map(_ * 0.999f)))
        .toDF("id", "emb"), "id", "emb", dir)
    mem.addData(EmbRow(9002L, mixDir))
    q.processAllAvailable()
    // COMPACT the appended small files mid-stream: the rename swap must
    // be invisible to the next batch beyond fewer files on disk
    val (filesBefore, filesAfter) =
      graft.api.Similarity.compactIvfCells(spark, dir)
    assert(filesAfter < filesBefore,
      s"append left files to compact: $filesBefore -> $filesAfter")
    mem.addData(EmbRow(9003L, mixDir))
    q.processAllAvailable()
    // DRIFT-TRIGGERED RETRAIN mid-stream: the 2 off-manifold appended
    // rows collapsed the appended coherence, so the maintenance policy
    // rebuilds from the current full corpus; the stream must pick the
    // retrained index up on its next batch, still finding the mix rows
    val fullCorpus = blob(0 until 90).map(r => r.copy(id = r.id + 10000L))
      .toDF("id", "emb")
      .union(Seq(EmbRow(20000L, mixDir), EmbRow(20001L, mixDir.map(_ * 0.999f)))
        .toDF("id", "emb"))
    assert(graft.api.Similarity.maintainIvfIndex(spark, fullCorpus, "id", "emb",
        dir, driftThreshold = 0.1, k = 3, iters = 2),
      "the off-manifold append history must trip the drift threshold")
    mem.addData(EmbRow(9004L, mixDir))
    q.processAllAvailable()
    q.stop()

    val byBatch = results.synchronized(results.toVector).groupBy(_._1)
    assert(byBatch(0L).forall { case (_, _, cand) => cand < 10000L && cand % 3 == 0 },
      s"batch 0 must search the original index: ${byBatch(0L)}")
    assert(byBatch(1L).nonEmpty &&
      byBatch(1L).forall { case (_, _, cand) => cand >= 10000L },
      s"batch 1 must see the REBUILT index without restart: ${byBatch(1L)}")
    assert(byBatch(2L).exists { case (_, _, cand) => cand >= 20000L },
      s"batch 2 must see the appended rows: ${byBatch(2L)}")
    assert(byBatch(3L).exists { case (_, _, cand) => cand >= 20000L },
      s"batch 3 must read the COMPACTED layout and still find the appends: ${byBatch(3L)}")
    assert(byBatch(4L).exists { case (_, _, cand) => cand >= 20000L },
      s"batch 4 must search the drift-retrained index: ${byBatch(4L)}")
  }

  test("semanticDedupIngestStream: later batches dedupe against earlier admissions; replay appends once") {
    import spark.implicits._
    val centers = Seq(
      Array(1.0f, 0f, 0f, 0.1f),
      Array(0f, 1.0f, 0f, 0.1f),
      Array(0f, 0f, 1.0f, 0.1f))
    def blob(ids: Range): Seq[EmbRow] = ids.map { i =>
      val c = centers(i % 3)
      EmbRow(i.toLong, c.map(_ + 0.02f * ((i * 37 % 11) - 5)))
    }
    val dir = java.nio.file.Files.createTempDirectory("ivf_ingest").toString
    val cents = centers.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "emb")
    graft.api.Similarity.writeIvfIndex(
      blob(0 until 90).toDF("id", "emb"), cents, "id", "emb", dir)

    val mixA = Array(0.7f, 0.7f, 0f, 0.14f)   // ≤ ~0.72 vs every corpus member
    val mixB = Array(0f, 0.7f, 0.7f, 0.14f)
    val admittedByBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val mem = MemoryStream[EmbRow](spark)
    val q = StreamOps.semanticDedupIngestStream(mem.toDF(), dir, "id", "emb",
        threshold = 0.9) { (admitted, batchId) =>
      admittedByBatch.synchronized {
        admittedByBatch(batchId) =
          admitted.select($"id".cast("long")).as[Long].collect().toSet
      }
    }.start()

    // batch 0: one novel direction (admitted), its near-copy (dropped by
    // the batch-internal lower-id rule), and a corpus look-alike
    // (dropped by the corpus veto)
    mem.addData(EmbRow(9000L, mixA), EmbRow(9001L, mixA.map(_ * 0.999f)),
      EmbRow(9002L, centers(0)))
    q.processAllAvailable()
    // batch 1: a copy of batch 0's ADMISSION (must be dropped — 9000 is
    // in the index now) plus a second novel direction (admitted)
    mem.addData(EmbRow(9100L, mixA.map(_ * 1.001f)), EmbRow(9101L, mixB))
    q.processAllAvailable()
    q.stop()

    assert(admittedByBatch(0L) === Set(9000L))
    assert(admittedByBatch(1L) === Set(9101L),
      "batch 1's mixA copy must be dominated by batch 0's admission")

    // REPLAY batch 1 through the public batch function: same admitted
    // set, no second append (cells and ingest_log unchanged)
    def cellsGen() = graft.api.GenDir.currentOrFail(spark, dir)
    val cellsBefore = spark.read.parquet(s"${cellsGen()}/cells").count()
    val logBefore = spark.read.parquet(s"$dir/ingest_log").count()
    val replayed = StreamOps.semanticDedupIngestBatch(
      Seq(EmbRow(9100L, mixA.map(_ * 1.001f)), EmbRow(9101L, mixB))
        .toDF("id", "emb"),
      1L, dir, "id", "emb", threshold = 0.9)
      .select($"id".cast("long")).as[Long].collect().toSet
    assert(replayed === Set(9101L), "replay must re-derive the same admissions")
    assert(spark.read.parquet(s"${cellsGen()}/cells").count() === cellsBefore,
      "a replayed batchId must not append again")
    assert(spark.read.parquet(s"$dir/ingest_log").count() === logBefore)
  }

  test("dupGraphIngestStream: streamed edges equal the batch-built graph; replay appends once") {
    import spark.implicits._
    val docs = graft.Util.rawTable(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    // reference: one batch build over the full corpus
    val batchDir = java.nio.file.Files.createTempDirectory("dg_batch").toString + "/g"
    graft.api.DupGraph.write(docs, "doc_id", "text", batchDir, 0.5, "lsh")
    def edgeSet(path: String) =
      graft.api.DupGraph.readEdges(spark, path, 0.5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    // streamed: base third at build time, two thirds arriving live
    val streamDir = java.nio.file.Files.createTempDirectory("dg_stream").toString + "/g"
    graft.api.DupGraph.write(docs.filter($"doc_id" % 3 === 0),
      "doc_id", "text", streamDir, 0.5, "lsh", storeDocs = true)
    def third(r: Long): Seq[Doc] = docs.filter($"doc_id" % 3 === r)
      .as[(Long, String)].collect().toSeq.map { case (id, tx) => Doc(t(1), id, tx) }
    val edgesByBatch = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val mem = MemoryStream[Doc](spark)
    val q = StreamOps.dupGraphIngestStream(mem.toDF(), streamDir,
        "doc_id", "text") { (newEdges, batchId) =>
      edgesByBatch.synchronized {
        edgesByBatch(batchId) = newEdges.select($"id_a", $"id_b")
          .as[(Long, Long)].collect().toSet
      }
    }.start()
    mem.addData(third(1): _*)
    q.processAllAvailable()
    mem.addData(third(2): _*)
    q.processAllAvailable()
    q.stop()

    // stream == batch: each pair examined exactly once, when its later
    // member arrives
    assert(edgeSet(streamDir) === edgeSet(batchDir))
    assert((edgesByBatch(0L) ++ edgesByBatch(1L)).subsetOf(edgeSet(batchDir)))

    // replay batch 1 via the public batch function: every id is already
    // stored, so the replay admits nothing new and appends nothing —
    // the same contract covers cross-batch redelivery (same docs under
    // a NEW batchId)
    // subtables live in GenDir generations now — resolve like a reader
    def subGen(s: String): String =
      graft.api.GenDir.currentOrFail(spark, s"$streamDir/$s")
    val before = spark.read.parquet(subGen("edges")).count()
    for (bid <- Seq(1L, 99L)) {
      val readmitted = graft.api.DupGraph.ingestBatch(
        third(2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        bid, streamDir, "doc_id", "text")
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(readmitted.isEmpty,
        s"redelivered known docs (batchId $bid) must admit nothing new")
      assert(spark.read.parquet(subGen("edges")).count() === before,
        s"redelivery under batchId $bid must not append edges")
      assert(spark.read.parquet(subGen("docs"))
        .groupBy($"id").count().filter($"count" > 1).isEmpty,
        "docs store must stay unique under redelivery")
    }

    // refreshStats brings degrees/meta to the batch build's truth
    val fresh = graft.api.DupGraph.refreshStats(spark, streamDir)
    val want = graft.api.DupGraph.readMeta(spark, batchDir)
    assert(fresh.nEdges === want.nEdges && fresh.nNodes === want.nNodes)
    assert(graft.api.DupGraph.readDegrees(spark, streamDir, 0.5)
      .as[(Long, Long)].collect().toSet ===
      graft.api.DupGraph.readDegrees(spark, batchDir, 0.5)
        .as[(Long, Long)].collect().toSet)

    // maintenance: a fresh graph stands; append-debris past the
    // threshold compacts with a bit-identical edge set and the batch_id
    // history intact (the replay guard still skips batch 1)
    assert(!graft.api.DupGraph.maintain(spark, batchDir, maxFiles = 64),
      "a fresh build must not trigger compaction")
    def nFiles(sub: String): Int =
      graft.api.GenDir.currentFiles(spark, s"$streamDir/$sub").size
    val filesBefore = nFiles("edges")
    assert(graft.api.DupGraph.maintain(spark, streamDir, maxFiles = 1),
      "ingest debris past the threshold must compact")
    assert(nFiles("edges") < filesBefore || filesBefore == 1)
    assert(edgeSet(streamDir) === edgeSet(batchDir),
      "compaction must not change the edge set")
    // the Bloom sidecar merges to a single row under compaction
    assert(nFiles("idbloom") === 1,
      "idbloom must compact to one merged row")
    val afterCompact = spark.read.parquet(subGen("edges")).count()
    graft.api.DupGraph.ingestBatch(
      third(2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
      1L, streamDir, "doc_id", "text")
    assert(spark.read.parquet(subGen("edges")).count() === afterCompact,
      "replay after compaction must still be detected")
  }

  test("dupGraphIngestStream auto-maintenance: compaction + stats refresh fire MID-STREAM; replay stays idempotent") {
    import spark.implicits._
    val docs = graft.Util.rawTable(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("dg_auto").toString + "/g"
    graft.api.DupGraph.write(docs.filter($"doc_id" % 4 === 0),
      "doc_id", "text", dir, 0.5, "lsh", storeDocs = true)
    def quarter(r: Long): Seq[Doc] = docs.filter($"doc_id" % 4 === r)
      .as[(Long, String)].collect().toSeq.map { case (id, tx) => Doc(t(1), id, tx) }
    // record the edges GENERATION seen after each batch: with
    // maintainMaxFiles = 1 the in-loop maintenance must compact between
    // batches, so the generation advances mid-stream
    val genByBatch = scala.collection.mutable.Map.empty[Long, String]
    val mem = MemoryStream[Doc](spark)
    val q = StreamOps.dupGraphIngestStream(mem.toDF(), dir,
        "doc_id", "text", maintainMaxFiles = 1) { (newEdges, batchId) =>
      newEdges.count() // materialize the sink's view
      ()
    }.start()
    for (r <- 1L to 3L) {
      mem.addData(quarter(r): _*)
      q.processAllAvailable()
      genByBatch.synchronized {
        genByBatch(r) = graft.api.GenDir.currentOrFail(spark, s"$dir/edges")
      }
    }
    q.stop()
    assert(genByBatch.values.toSet.size > 1,
      s"auto-maintenance must compact between batches (generations seen: $genByBatch)")
    // degrees/meta were refreshed by the in-loop maintain — NO explicit
    // refreshStats call here
    val m = graft.api.DupGraph.readMeta(spark, dir)
    val liveEdges = graft.api.DupGraph.readEdges(spark, dir, 0.5).count()
    assert(m.nEdges === liveEdges,
      "meta must reflect the ingested edges without an operator refresh")
    // parity with the batch build over the union corpus
    val refDir = java.nio.file.Files.createTempDirectory("dg_auto_ref").toString + "/g"
    graft.api.DupGraph.write(docs, "doc_id", "text", refDir, 0.5, "lsh")
    def edgeSet(p: String) = graft.api.DupGraph.readEdges(spark, p, 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(edgeSet(dir) === edgeSet(refDir))
    // replay ACROSS the compaction boundary: batch_id history survived
    // the rewrites, so a replayed batch appends nothing
    val before = liveEdges
    graft.api.DupGraph.ingestBatch(
      quarter(2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
      1L, dir, "doc_id", "text")
    assert(graft.api.DupGraph.readEdges(spark, dir, 0.5).count() === before,
      "replay after auto-compaction must still be detected")
  }

  test("streamingKmeans refines a persistent centroid table across micro-batches") {
    import spark.implicits._
    val centroidDir = java.nio.file.Files.createTempDirectory("cents").toString + "/table"
    val centers = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.1f),
      Array(0.0f, 1.0f, 0.0f, 0.1f),
      Array(0.0f, 0.0f, 1.0f, 0.1f))
    def blob(ids: Range): Seq[EmbRow] = ids.map { i =>
      val c = centers(i % 3)
      val eps = 0.02f * ((i * 37 % 11) - 5)
      EmbRow(i.toLong, c.map(_ + eps))
    }
    val mem = MemoryStream[EmbRow](spark)
    val q = StreamOps.streamingKmeans(mem.toDF(), "id", "emb", k = 3, centroidDir).start()
    mem.addData(blob(0 until 90): _*)
    q.processAllAvailable()
    mem.addData(blob(90 until 150): _*)
    q.processAllAvailable()
    q.stop()
    val cents = spark.read.parquet(centroidDir)
      .select($"cluster", $"cent_emb", $"n").as[(Long, Seq[Double], Long)].collect()
    assert(cents.length === 3)
    assert(cents.map(_._3).sum === 150L, "counts accumulate across batches")
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    centers.foreach { c =>
      val best = cents.map(o => cos(o._2, c.map(_.toDouble))).max
      assert(best > 0.99, s"planted direction not tracked: best cos $best")
    }
  }

  test("streamingKmeans replays are idempotent: re-delivered batchId merges once") {
    import spark.implicits._
    val centroidDir = java.nio.file.Files.createTempDirectory("cents-replay").toString + "/table"
    val batch = (0L until 30L).map(i => EmbRow(i, Array(1.0f + 0.01f * (i % 3), 0.5f, 0.1f, 0.1f)))
      .toDF("id", "emb")
    StreamOps.streamingKmeansBatch(batch, batchId = 0L, "id", "emb", k = 2, centroidDir)
    val after1 = spark.read.parquet(centroidDir)
      .select($"cluster", $"cent_emb", $"n").as[(Long, Seq[Double], Long)].collect().sortBy(_._1)
    // at-least-once re-delivery of the SAME batchId must be a no-op
    StreamOps.streamingKmeansBatch(batch, batchId = 0L, "id", "emb", k = 2, centroidDir)
    val after2 = spark.read.parquet(centroidDir)
      .select($"cluster", $"cent_emb", $"n").as[(Long, Seq[Double], Long)].collect().sortBy(_._1)
    assert(after2 === after1, "replay must not double-count the batch")
    // the NEXT batchId merges normally
    StreamOps.streamingKmeansBatch(batch, batchId = 1L, "id", "emb", k = 2, centroidDir)
    val after3 = spark.read.parquet(centroidDir)
      .select(org.apache.spark.sql.functions.sum($"n")).as[Long].head()
    assert(after3 === after1.map(_._3).sum + 30L)
  }

  test("nearDupFilterWithinWatermark drops band-colliding successors, keeps firsts") {
    import spark.implicits._
    val mem = MemoryStream[Doc](spark)
    val filtered = StreamOps.nearDupFilterWithinWatermark(
      mem.toDF(), "ts", "10 minutes", "doc_id", "text")
    val q = filtered.writeStream.format("memory").queryName("ndf_out")
      .outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog again today"
    mem.addData(
      Doc(t(1), 1, base),
      Doc(t(2), 2, base),              // exact dup of 1 → same bands → dropped
      Doc(t(3), 3, "totally different words forming another document body here"),
      Doc(t(4), 4, "x y"))             // no shingles → keyed by id, kept
    mem.addData(
      Doc(t(5), 5, base),              // still within watermark → dropped
      Doc(t(6), 6, "x y"))             // no shingles, own id → kept
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("ndf_out").select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 6L))
  }

  /** Deterministically grow `base` with filler words that leave the
    * first-band signature (first 4 minhashes) UNCHANGED — producing a
    * text whose band signature collides with base's while its shingle
    * set barely overlaps (a genuine LSH false positive).
    */
  private def buildBandCollision(base: String, extraShingles: Int): String = {
    def band(text: String): Seq[String] = {
      val sh = graft.functions.ShingleOps.shingles(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), 4)
      val sigs = graft.functions.ShingleOps.minhashSigs(sh)
      (0 until 4).map(sigs.getUTF8String(_).toString)
    }
    val want = band(base)
    var text = base
    var added = 0
    var i = 0
    while (added < extraShingles && i < 10000) {
      val cand = text + s" filler$i"
      if (band(cand) == want) { text = cand; added += 1 }
      i += 1
    }
    assert(added == extraShingles, s"could not build collision ($added/$extraShingles)")
    text
  }

  test("verified near-dup filter rejects a false-positive band collision the band-only filter drops") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again today"
    // same first-band signature as base, but mostly-disjoint shingles:
    // 8 shingles from base + 24 filler shingles → jaccard ≈ 8/32 < 0.5
    val collider = buildBandCollision(base, 24)
    val baseSh = base.split(" ").sliding(4).map(_.mkString(" ")).toSet
    val collSh = collider.split(" ").sliding(4).map(_.mkString(" ")).toSet
    val j = graft.functions.Parsing.jaccard(baseSh, collSh)
    assert(j < 0.5, s"collider must be dissimilar, jaccard=$j")

    // band-only filter: the collision is dropped (the documented asymmetry)
    val mem1 = MemoryStream[Doc](spark)
    val q1 = StreamOps.nearDupFilterWithinWatermark(
        mem1.toDF(), "ts", "10 minutes", "doc_id", "text")
      .writeStream.format("memory").queryName("ndfv_bandonly").outputMode("append").start()
    mem1.addData(Doc(t(1), 1, base), Doc(t(2), 2, collider))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.table("ndfv_bandonly").select($"doc_id").as[Long].collect().toSet
      === Set(1L), "band-only filter drops the false positive")

    // verified filter: the collision survives; true near-dups still drop
    val mem2 = MemoryStream[Doc](spark)
    val q2 = StreamOps.nearDupFilterVerifiedWithinWatermark(
        mem2.toDF(), "ts", "10 minutes", "doc_id", "text", jaccardThreshold = 0.5)
      .writeStream.format("memory").queryName("ndfv_verified").outputMode("append").start()
    mem2.addData(
      Doc(t(1), 1, base),
      Doc(t(2), 2, collider),          // band collision, jaccard < 0.5 → KEPT
      Doc(t(3), 3, base),              // exact dup of 1 → dropped
      Doc(t(4), 4, "x y"))             // no shingles → keyed by id, kept
    mem2.addData(
      Doc(t(5), 5, base),              // cross-batch dup within watermark → dropped
      Doc(t(6), 4, "x y"))             // same-id no-shingle redelivery → dropped
    q2.processAllAvailable()
    q2.stop()
    // sorted multiset, not a set: the id-4 redelivery dedup would be
    // invisible if duplicates collapsed into a Set
    assert(spark.table("ndfv_verified").select($"doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 4L))
  }

  test("JsonLinesRecordWriter: atomic rename, orphan-tmp cleanup, failure leaves no output") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = tmpDir("recsink-atomic")
    val schema = StructType(Seq(
      StructField("streamName", StringType), StructField("partitionKey", StringType),
      StructField("sequenceNumber", StringType)))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any]("s", "p", "1"), schema).asInstanceOf[Row]
    // a stale tmp from a dead prior attempt of the same (partition, epoch)
    val stale = new java.io.File(dir, ".part-00003-00007-99.jsonl.tmp")
    java.nio.file.Files.writeString(stale.toPath, "half-written garbage")
    val w = new JsonLinesRecordWriter(dir)
    assert(w.open(3, 7))
    assert(!stale.exists(), "stale tmp of a prior attempt must be garbage-collected")
    w.process(row)
    w.close(null)
    val dst = new java.io.File(dir, "part-00003-00007.jsonl")
    assert(dst.exists())
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tmp")) === 0,
      "successful close leaves no tmp files")
    // a failing attempt deletes its tmp and does not touch the output
    val w2 = new JsonLinesRecordWriter(dir)
    w2.open(3, 7)
    w2.process(row)
    w2.close(new RuntimeException("boom"))
    assert(dst.exists(), "failed attempt must not clobber the committed file")
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tmp")) === 0)
  }

  case class L(k: Long, lts: Timestamp, what: String)
  case class R(k: Long, rts: Timestamp, tag: String)

  test("intervalJoin: stream-stream join pairs right events within the lookback interval") {
    import spark.implicits._
    val lm = MemoryStream[L](spark)
    val rm = MemoryStream[R](spark)
    val joined = StreamOps.intervalJoin(lm.toDF(), rm.toDF(), "k", "lts", "rts",
      lateness = "1 minute", before = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ij_out").outputMode("append").start()
    rm.addData(R(1, t(0), "in-window"), R(1, t(20), "too-late-for-left"), R(2, t(3), "other-key"))
    lm.addData(L(1, t(4), "purchase"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ij_out").collect().map(_.getAs[String]("tag"))
    assert(rows.toSeq === Seq("in-window")) // t(20) after left ts; key 2 doesn't match
  }

  test("intervalJoin left_outer: unmatched left emits null row only after the watermark closes it") {
    import spark.implicits._
    val lm = MemoryStream[L](spark)
    val rm = MemoryStream[R](spark)
    val joined = StreamOps.intervalJoin(lm.toDF(), rm.toDF(), "k", "lts", "rts",
      lateness = "1 minute", before = "5 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ijo_out").outputMode("append").start()
    rm.addData(R(1, t(0), "match"))
    lm.addData(L(1, t(4), "matched-left"), L(2, t(4), "lonely-left"))
    q.processAllAvailable()
    // watermark far ahead on BOTH sides closes the join window for t(4)
    rm.addData(R(9, t(59), "wm"))
    lm.addData(L(9, t(59), "wm"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ijo_out").collect()
      .map(r => (r.getAs[String]("what"), Option(r.getAs[String]("tag")))).toSet
    assert(rows.contains(("matched-left", Some("match"))))
    assert(rows.contains(("lonely-left", None)), s"got $rows") // null-extended after watermark
  }

  test("Maintenance.compact: bounded files per partition, data preserved") {
    import spark.implicits._
    val dir = tmpDir("compact")
    // simulate many micro-batch appends → many small files
    (1 to 6).foreach { i =>
      Seq((s"s${i % 2}", i.toLong)).toDF("streamName", "seq")
        .write.mode("append").partitionBy("streamName").parquet(dir)
    }
    val before = Maintenance.dataFileCount(dir)
    val data = spark.read.parquet(dir).collect().map(_.toString).sorted
    Maintenance.compact(spark, dir, "streamName", filesPerPartition = 1)
    val after = Maintenance.dataFileCount(dir)
    assert(before === 6 && after <= 2, s"before=$before after=$after")
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq === data.toSeq)
  }

  test("Maintenance: crash between swap renames is auto-recovered on the next compact") {
    import spark.implicits._
    val dir = tmpDir("compact_crash") + "/table"
    Seq(("s0", 1L), ("s1", 2L)).toDF("streamName", "seq")
      .write.partitionBy("streamName").parquet(dir)
    val data = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    // simulate a crash after rename(dst -> old) but before rename(src -> dst):
    // the live table sits at .compact-old, dir is absent
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".compact-old")))
    // next compact run restores the table first, then compacts it
    Maintenance.compact(spark, dir, "streamName", filesPerPartition = 1)
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq === data)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact-old")))
  }

  test("streaming tumblingAgg equals the batch tumbling aggregation over the same events") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = graft.Util.events(spark, sf)
      .select(timestamp_micros(expr("ts div 1000")).as("ts"), $"event_type", $"value")
    val srcDir = tmpDir("parity_src")
    ev.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(ev.schema).parquet(srcDir)
    val q = StreamOps.tumblingAgg(stream, "ts", "1 minute", "1 hour")
      .writeStream.format("memory").queryName("parity_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streaming = spark.table("parity_out")
      .select($"win_start", $"event_type", $"n_events").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = ev.groupBy(window($"ts", "1 hour").as("win"), $"event_type")
      .agg(count(lit(1)).as("n")).select($"win.start", $"event_type", $"n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streaming === batch)
  }

  test("streaming nextEventPairsStream equals the batch q146 pairs over the same events") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"event_id", expr("ts div 1000").as("ts_us"),
        $"event_type")
    val srcDir = tmpDir("nextpair_src")
    ev.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(ev.schema).parquet(srcDir)
    val q = StreamOps.nextEventPairsStream(spark, stream)
      .writeStream.format("memory").queryName("nextpair_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streaming = spark.table("nextpair_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3))).toMap
    val batch = graft.operators.EventOps.q146NextEventPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3))).toMap
    assert(streaming === batch)
    assert(streaming.nonEmpty)
  }

  test("streaming attributionStream: per-conversion rows roll up to the batch q152 report") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", $"ts_ms", $"value")
    val srcDir = tmpDir("attr_src")
    ev.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(ev.schema).parquet(srcDir)
    val q = StreamOps.attributionStream(spark, stream)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    // roll the per-conversion stream rows up to q152's report shape
    val streaming = spark.table("attr_out")
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"),
        graft.Util.dsum($"value").as("revenue"),
        round(sum($"gap_ms").cast("double") / count($"gap_ms"), 4).as("avg_gap_ms"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        Option(r.getAs[java.lang.Double]("avg_gap_ms")))).toMap
    val batch = graft.operators.EventOps.q152Attribution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        Option(r.getAs[java.lang.Double]("avg_gap_ms")))).toMap
    assert(streaming === batch)
    assert(streaming.nonEmpty)
    // state carries ACROSS batches: split delivery, touch in batch 1,
    // conversion in batch 2
    val mem = MemoryStream[StreamOps.AttrEvent](spark)
    val q2 = StreamOps.attributionStream(spark, mem.toDF())
      .writeStream.format("memory").queryName("attr_out2")
      .outputMode("append").start()
    mem.addData(StreamOps.AttrEvent(1L, 1L, "click", 1000L, 0.0))
    q2.processAllAvailable()
    mem.addData(StreamOps.AttrEvent(1L, 2L, "purchase", 2000L, 5.0))
    q2.processAllAvailable()
    // outside the window → organic
    mem.addData(StreamOps.AttrEvent(1L, 3L, "purchase",
      2000L + 8L * 24 * 3600 * 1000, 7.0))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.table("attr_out2").orderBy("event_id").collect()
    assert(rows.map(r => (r.getLong(1), r.getString(2))).toSeq ===
      Seq((2L, "click"), (3L, "organic")))
  }

  test("streaming slidingAgg equals the batch q109 sliding aggregation over the same events") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = graft.Util.events(spark, sf)
      .select(timestamp_micros(expr("ts div 1000")).as("ts"), $"event_type", $"value")
    val srcDir = tmpDir("slide_parity_src")
    ev.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(ev.schema).parquet(srcDir)
    val q = StreamOps.slidingAgg(stream, "ts", "1 minute", "2 hours", "1 hour")
      .writeStream.format("memory").queryName("slide_parity_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streaming = spark.table("slide_parity_out")
      .select($"win_start", $"event_type", $"n_events").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = ev.groupBy(window($"ts", "2 hours", "1 hour").as("win"), $"event_type")
      .agg(count(lit(1)).as("n")).select($"win.start", $"event_type", $"n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streaming === batch)
    // every event contributes to exactly len/slide = 2 windows
    assert(streaming.values.sum === 2L * ev.count())
  }

  test("micro-batch replay: checkpoint upsert is idempotent, target accepts duplicates (SURVEY §7.4)") {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val recs = Seq(
      ("s1", "7", "T07", "pk"), ("s1", "10", "T10", "pk"), ("s2", "3", "T03", "pk"))
      .toDF("streamName", "sequenceNumber", "commitTimestamp", "partitionKey")
    val cpDir = tmpDir("replay_cp")
    // deliver the same micro-batch twice (at-least-once re-delivery)
    (1 to 2).foreach { _ =>
      Replicator.checkpointRows(recs)
        .write.mode("overwrite").partitionBy("streamName").parquet(cpDir)
    }
    val cp = spark.read.parquet(cpDir).collect()
      .map(r => r.getAs[String]("streamName") -> r.getAs[String]("lastReplicatedCommitTimestamp")).toMap
    assert(cp === Map("s1" -> "T10", "s2" -> "T03"))
  }

  case class Rec(streamName: String, sequenceNumber: String, commitTimestamp: String)

  test("runningCheckpoint: custom state advances only on higher sequence, across batches") {
    import spark.implicits._
    val mem = MemoryStream[Rec](spark)
    val q = StreamOps.runningCheckpoint(spark, mem.toDF())
      .writeStream.format("memory").queryName("ckpt_out").outputMode("append").start()

    mem.addData(Rec("s1", "9", "T09"), Rec("s1", "10", "T10"), Rec("s2", "5", "T05"))
    q.processAllAvailable()
    // batch 2: s1 regresses (seq 8 < 10, no emit); s2 advances
    mem.addData(Rec("s1", "8", "T08"), Rec("s2", "7", "T07"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ckpt_out").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // s1: one emit ("10" beats "9" numerically despite lex order); no T08 regression
    assert(rows.filter(_._1 == "s1").toSeq === Seq(("s1", "T10")))
    assert(rows.filter(_._1 == "s2").toSeq === Seq(("s2", "T05"), ("s2", "T07")))
  }

  case class FEvt(user_id: Long, event_type: String, ts_ms: Long)

  test("funnelStages: strict ordered advance per user, state carries across batches") {
    import spark.implicits._
    val mem = MemoryStream[FEvt](spark)
    val q = StreamOps.funnelStages(spark, mem.toDF())
      .writeStream.format("memory").queryName("funnel_out").outputMode("append").start()

    // u1 completes in one batch, delivered OUT of arrival order (sorted
    // by event time inside the batch); u2 clicks before any view — no
    // advance past stage gating; u3 views only
    mem.addData(
      FEvt(1, "purchase", 300), FEvt(1, "view", 100), FEvt(1, "click", 200),
      FEvt(2, "click", 100), FEvt(3, "view", 50))
    q.processAllAvailable()
    // batch 2: u2 now views (t=150) then clicks (t=250) — the earlier
    // batch-1 click at t=100 must NOT count (strictly-after gating is
    // against the view frontier); u3's click equal to its view timestamp
    // must NOT advance (strict >)
    mem.addData(FEvt(2, "view", 150), FEvt(2, "click", 250), FEvt(3, "click", 50))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_out").as[(Long, Int, String, Long)].collect().toSeq
    assert(rows.filter(_._1 == 1).sortBy(_._2) ===
      Seq((1L, 1, "view", 100L), (1L, 2, "click", 200L), (1L, 3, "purchase", 300L)))
    assert(rows.filter(_._1 == 2).sortBy(_._2) ===
      Seq((2L, 1, "view", 150L), (2L, 2, "click", 250L)))
    assert(rows.filter(_._1 == 3) === Seq((3L, 1, "view", 50L)))
  }

  case class SEvt(user_id: Long, event_type: String, ts_ms: Long, event_id: Long)

  test("scd2Track: change closes the open version and opens the next, across batches; ties break by event_id") {
    import spark.implicits._
    val mem = MemoryStream[SEvt](spark)
    val q = StreamOps.scd2Track(spark, mem.toDF())
      .writeStream.format("memory").queryName("scd2_out").outputMode("append").start()

    // batch 1: open v1 at 100; same-attr event at 150 is a no-op.
    // The two t=100 events tie — event_id order (10 < 11) must decide,
    // exactly like the batch twin's (ts_ms, event_id) window: 'view'
    // (id 10) opens v1, then 'click' (id 11) at the same ts does NOT
    // close it (change gate is ts >= validFrom, so it opens v2)
    mem.addData(SEvt(1, "view", 100, 10), SEvt(1, "click", 100, 11),
      SEvt(1, "click", 150, 12))
    q.processAllAvailable()
    // batch 2: change at 200 closes v2 and opens v3; a LATE event older
    // than the open version (t=50) is ignored
    mem.addData(SEvt(1, "error", 200, 13), SEvt(1, "signup", 50, 14))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("scd2_out")
      .as[(Long, Long, String, Long, Option[Long])].collect().toSeq
    // open versions re-emit when closed — downstream upserts on
    // (user_id, version); the LAST emit per version is final
    val finalRows = rows.groupBy(r => (r._1, r._2)).map(_._2.last).toSeq.sortBy(_._2)
    assert(finalRows === Seq(
      (1L, 1L, "view", 100L, Some(100L)),
      (1L, 2L, "click", 100L, Some(200L)),
      (1L, 3L, "error", 200L, None)))
  }

  test("funnelStages TTL: an idle user's state expires and a post-expiry event re-opens cleanly") {
    import spark.implicits._
    val mem = MemoryStream[FEvt](spark)
    // 10-second TTL in event time
    val q = StreamOps.funnelStages(spark, mem.toDF(), ttl = Some("10 seconds"))
      .writeStream.format("memory").queryName("funnel_ttl_out").outputMode("append").start()

    // u1 views+clicks at t≈0; u2 stays continuously active on a gated
    // event (click with no view) — activity must keep u2's state alive
    mem.addData(FEvt(1, "view", 1000), FEvt(1, "click", 2000), FEvt(2, "click", 1500))
    q.processAllAvailable()
    // advance the watermark far past u1's horizon (t=60s - 10s lateness
    // = 50s watermark > 2s + 10s TTL); u2 keeps emitting activity
    mem.addData(FEvt(2, "click", 60000))
    q.processAllAvailable()
    // one more batch so the expired key's timeout actually fires
    mem.addData(FEvt(3, "view", 61000))
    q.processAllAvailable()
    // u1 returns AFTER expiry: a fresh funnel — view re-emits (stage 1
    // again), and the old click frontier is gone so this view does not
    // auto-advance anything
    mem.addData(FEvt(1, "view", 70000))
    q.processAllAvailable()
    // u2 finally views at 71s: its state must have SURVIVED (continuous
    // activity) — but the funnel frontier for u2 starts only now
    mem.addData(FEvt(2, "view", 71000), FEvt(2, "click", 72000))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_ttl_out").as[(Long, Int, String, Long)].collect().toSeq
    // u1: original view+click, then the clean re-open view at 70s
    assert(rows.filter(_._1 == 1).sortBy(_._4) ===
      Seq((1L, 1, "view", 1000L), (1L, 2, "click", 2000L), (1L, 1, "view", 70000L)),
      s"u1 must expire then re-open from stage 1: $rows")
    // u2: the view at 71s and click at 72s — the state carrying the
    // (gated, never-advanced) history survived the whole run
    assert(rows.filter(_._1 == 2).sortBy(_._4) ===
      Seq((2L, 1, "view", 71000L), (2L, 2, "click", 72000L)),
      s"active u2 must not expire: $rows")
  }

  test("funnelStages TTL: a late older in-watermark event cannot drag the horizon back (live key survives)") {
    import spark.implicits._
    val mem = MemoryStream[FEvt](spark)
    val q = StreamOps.funnelStages(spark, mem.toDF(), ttl = Some("10 seconds"))
      .writeStream.format("memory").queryName("funnel_drag_out").outputMode("append").start()
    mem.addData(FEvt(2, "view", 1000))      // stage-1 frontier at t=1s
    q.processAllAvailable()
    mem.addData(FEvt(2, "purchase", 60000)) // gated (click pending) — pure activity at t=60s
    q.processAllAvailable()
    // LATE but in-watermark (wm=50s) older gated event: horizon must stay
    // 60s+ttl=70s, not regress to 55s+ttl=65s
    mem.addData(FEvt(2, "purchase", 55000))
    q.processAllAvailable()
    // push the watermark to 66s — past the (buggy) 65s horizon, below the
    // (correct) 70s one — and give the timeout a batch to fire in
    mem.addData(FEvt(3, "view", 76000))
    q.processAllAvailable()
    mem.addData(FEvt(3, "click", 76500))
    q.processAllAvailable()
    // u2 clicks: the 1s view frontier must have SURVIVED, so this advances
    mem.addData(FEvt(2, "click", 69000))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_drag_out").as[(Long, Int, String, Long)].collect().toSeq
    assert(rows.filter(_._1 == 2).sortBy(_._2) ===
      Seq((2L, 1, "view", 1000L), (2L, 2, "click", 69000L)),
      s"activity at 60s must keep the key alive past wm=66s: $rows")
  }

  test("scd2Track TTL: a late older in-watermark event cannot drag the horizon back (lifecycle continues)") {
    import spark.implicits._
    val mem = MemoryStream[SEvt](spark)
    val q = StreamOps.scd2Track(spark, mem.toDF(), ttl = Some("10 seconds"))
      .writeStream.format("memory").queryName("scd2_drag_out").outputMode("append").start()
    mem.addData(SEvt(1, "view", 1000, 1))   // v1 opens at 1s
    q.processAllAvailable()
    mem.addData(SEvt(1, "view", 60000, 2))  // same-attr — pure activity at 60s
    q.processAllAvailable()
    mem.addData(SEvt(1, "view", 55000, 3))  // late older same-attr: horizon must stay 70s
    q.processAllAvailable()
    mem.addData(SEvt(2, "view", 76000, 4))  // wm -> 66s
    q.processAllAvailable()
    mem.addData(SEvt(2, "view", 76500, 5))  // timeout batch
    q.processAllAvailable()
    mem.addData(SEvt(1, "click", 69000, 6)) // alive -> closes v1, opens v2
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("scd2_drag_out")
      .as[(Long, Long, String, Long, Option[Long])].collect().toSeq
    val e1 = rows.filter(_._1 == 1).groupBy(r => (r._2, r._4)).map(_._2.last).toSeq
      .sortBy(r => (r._4, r._2))
    assert(e1 === Seq(
      (1L, 1L, "view", 1000L, Some(69000L)),
      (1L, 2L, "click", 69000L, None)),
      s"the lifecycle must continue as v2, not restart at v1: $rows")
  }

  test("scd2Track TTL: idle entity expires (open version stays current), re-open starts a new lifecycle") {
    import spark.implicits._
    val mem = MemoryStream[SEvt](spark)
    val q = StreamOps.scd2Track(spark, mem.toDF(), ttl = Some("10 seconds"))
      .writeStream.format("memory").queryName("scd2_ttl_out").outputMode("append").start()

    // entity 1 opens v1 then changes to v2; then goes idle
    mem.addData(SEvt(1, "view", 1000, 1), SEvt(1, "click", 2000, 2))
    q.processAllAvailable()
    // entity 2 pushes the watermark far past entity 1's horizon
    mem.addData(SEvt(2, "view", 60000, 3))
    q.processAllAvailable()
    mem.addData(SEvt(2, "view", 61000, 4))
    q.processAllAvailable()
    // entity 1 returns: NEW lifecycle — version restarts at 1 with the
    // new valid_from (the documented TTL contract: downstream upserts
    // on (user_id, valid_from_ms) when TTL is on)
    mem.addData(SEvt(1, "purchase", 70000, 5))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("scd2_ttl_out")
      .as[(Long, Long, String, Long, Option[Long])].collect().toSeq
    val e1 = rows.filter(_._1 == 1).groupBy(r => (r._2, r._4)).map(_._2.last).toSeq
      .sortBy(r => (r._4, r._2))
    assert(e1 === Seq(
      (1L, 1L, "view", 1000L, Some(2000L)),   // closed by the change
      (1L, 2L, "click", 2000L, None),          // still current at expiry
      (1L, 1L, "purchase", 70000L, None)),     // new lifecycle, v1 again
      s"entity 1 must expire quietly and re-open a new lifecycle: $rows")
    // no fabricated close: the click version's only emit has a null bound
    assert(!rows.exists(r => r._1 == 1 && r._3 == "click" && r._5.isDefined),
      s"expiry must not invent a valid_to: $rows")
  }

  test("funnelStages: a late earlier mid-stage event lowers the gate for the pending next stage") {
    import spark.implicits._
    val mem = MemoryStream[FEvt](spark)
    val q = StreamOps.funnelStages(spark, mem.toDF())
      .writeStream.format("memory").queryName("funnel_repair_out").outputMode("append").start()

    mem.addData(FEvt(1, "view", 100))
    q.processAllAvailable()
    mem.addData(FEvt(1, "click", 500)) // click frontier 500
    q.processAllAvailable()
    // late earlier click at 200 lowers the stage-2 gate (purchase still
    // pending); purchase at 300 must now convert — the batch twin q104
    // counts this user as purchased (min click after view = 200 < 300)
    mem.addData(FEvt(1, "click", 200), FEvt(1, "purchase", 300))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_repair_out").as[(Long, Int, String, Long)].collect().toSeq
    assert(rows.map(r => (r._2, r._4)).sorted === Seq((1, 100L), (2, 500L), (3, 300L)),
      s"purchase must gate against the repaired click minimum: $rows")
  }

  test("cmsIngestStream: merged sketch equals one build over all batches; replay appends once") {
    import spark.implicits._
    val sketchDir = java.nio.file.Files.createTempDirectory("cms-stream").toString + "/table"
    val mem = MemoryStream[Doc](spark)
    val q = StreamOps.cmsIngestStream(mem.toDF(), sketchDir, "text",
      depth = 3, width = 64).start()
    def doc(id: Long, text: String) = Doc(new Timestamp(id * 1000), id, text)
    mem.addData(doc(0, "alpha"), doc(1, "beta"), doc(2, "alpha"))
    q.processAllAvailable()
    mem.addData(doc(3, "alpha"), doc(4, "gamma"))
    q.processAllAvailable()
    q.stop()

    val merged = graft.api.Stats.mergedCms(spark, sketchDir)
      .as[(Int, Long, Long)].collect().toSet
    val whole = graft.api.Stats.cmsBuild(
        Seq("alpha", "beta", "alpha", "alpha", "gamma").toDF("text"),
        "text", depth = 3, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
    val est = graft.api.Stats.cmsLookup(
        graft.api.Stats.mergedCms(spark, sketchDir),
        Seq("alpha", "gamma").toDF("text"), "text", depth = 3, width = 64)
      .as[(String, Long)].collect().toMap
    assert(est("alpha") >= 3L && est("gamma") >= 1L)

    val rowsBefore = spark.read.parquet(sketchDir).count()
    graft.api.Stats.appendCmsBatchIdempotent(
      Seq("zeta").toDF("text"), sketchDir, "text", batchId = 0L,
      depth = 3, width = 64)
    assert(spark.read.parquet(sketchDir).count() === rowsBefore,
      "replayed batchId must not append")
  }

  test("incrementalStats: micro-batches append mergeable stats; summary covers all batches; replay appends once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, length, lit}
    val statsDir = java.nio.file.Files.createTempDirectory("stats-stream").toString + "/table"
    val mem = MemoryStream[Doc](spark)
    val q = StreamOps.incrementalStats(mem.toDF()
        .withColumn("n_chars", length($"text").cast("long"))
        .withColumn("source", concat(lit("s"), $"doc_id" % 2)),
      statsDir, Seq("source"), "n_chars", "doc_id").start()
    def doc(id: Long, text: String) = Doc(new Timestamp(id * 1000), id, text)
    mem.addData(doc(0, "alpha"), doc(1, "beta ray"), doc(2, "gamma!"))
    q.processAllAvailable()
    mem.addData(doc(3, "delta function"), doc(4, "ep"))
    q.processAllAvailable()
    q.stop()

    val summary = graft.api.Stats.mergedSummary(spark, statsDir, Seq("source"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(summary.keySet === Set("s0", "s1"))
    // s0: docs 0,2,4 → lens 5,6,2; s1: docs 1,3 → lens 8,14
    assert(summary("s0").getAs[Long]("n_rows") === 3L)
    assert(summary("s0").getAs[Long]("v_sum") === 13L)
    assert(summary("s0").getAs[Long]("v_min") === 2L)
    assert(summary("s0").getAs[Long]("v_max") === 6L)
    assert(summary("s0").getAs[Long]("distinct_est") === 3L) // HLL exact at n=3
    assert(summary("s1").getAs[Long]("n_rows") === 2L)
    assert(summary("s1").getAs[Long]("v_sum") === 22L)

    // at-least-once replay: re-delivering an already-appended batchId is
    // a no-op, a NEW batchId appends
    val rowsBefore = spark.read.parquet(statsDir).count()
    val replay = Seq(("s0", 99L)).toDF("source", "n_chars")
      .withColumn("doc_id", lit(99L))
    graft.api.Stats.appendBatchStatsIdempotent(replay, statsDir,
      Seq("source"), "n_chars", "doc_id", batchId = 0L)
    assert(spark.read.parquet(statsDir).count() === rowsBefore, "replayed batchId must not append")
    graft.api.Stats.appendBatchStatsIdempotent(replay, statsDir,
      Seq("source"), "n_chars", "doc_id", batchId = 7L)
    assert(spark.read.parquet(statsDir).count() === rowsBefore + 1)
  }

  test("ewmaIngestStream: merged daily counts reproduce the batch EWMA recursion; replay appends once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ewma-stream").toString
    val countsPath = s"$base/counts"

    // day series per key; batch 2 splits day 2 across the batch boundary
    // (counts must merge) and appends days 3-4
    val mem = MemoryStream[KV](spark)
    val q = StreamOps.ewmaIngestStream(mem.toDF(), countsPath, "k", "v")
      .start()
    mem.addData(Seq.fill(10)(KV("a", 1.0)) ++ Seq.fill(4)(KV("a", 2.0)) ++
      Seq.fill(6)(KV("b", 1.0)): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(2)(KV("a", 2.0)) ++ Seq.fill(8)(KV("a", 3.0)) ++
      Seq.fill(3)(KV("a", 4.0)) ++ Seq.fill(9)(KV("b", 2.0)): _*)
    q.processAllAvailable()
    q.stop()

    val got = graft.api.Stats.ewmaReport(spark, countsPath).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("c"), r.getAs[Double]("ewma"))).toMap
    // merged counts: day-2 halves sum across the batch cut
    assert(got(("a", 1L))._1 === 10L)
    assert(got(("a", 2L))._1 === 6L)
    val series = Map(
      "a" -> Seq(1L -> 10L, 2L -> 6L, 3L -> 8L, 4L -> 3L),
      "b" -> Seq(1L -> 6L, 2L -> 9L))
    series.foreach { case (k, days) =>
      var e = 0.0
      days.foreach { case (d, c) =>
        e = 0.3 * c + 0.7 * e
        assert(math.abs(got((k, d))._2 - e) < 1e-3, s"key $k day $d")
      }
    }

    // at-least-once replay: re-delivered batchId appends nothing
    val before = spark.read.parquet(countsPath).count()
    graft.api.Stats.appendDailyCountsIdempotent(
      Seq(KV("a", 9.0)).toDF("k", "v"), countsPath, "k", "v", batchId = 0L)
    assert(spark.read.parquet(countsPath).count() === before)
  }

  test("growthIngestStream: min-merged first sightings reproduce the batch growth curve; replay appends once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("growth-stream").toString
    val path = s"$base/first_seen"

    // key "a" reappears in batch 2 with an EARLIER day (out-of-order
    // delivery) — the min merge must move its first sighting back
    val mem = MemoryStream[KV](spark)
    val q = StreamOps.growthIngestStream(mem.toDF(), path, "k", "v").start()
    mem.addData(KV("a", 5.0), KV("a", 7.0), KV("b", 5.0))
    q.processAllAvailable()
    mem.addData(KV("a", 3.0), KV("c", 6.0), KV("b", 9.0))
    q.processAllAvailable()
    q.stop()

    val got = graft.api.Stats.growthReport(spark, path).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_total"))).toMap
    // first sightings: a→3, b→5, c→6
    assert(got === Map(3L -> (1L, 1L), 5L -> (1L, 2L), 6L -> (1L, 3L)))

    val before = spark.read.parquet(path).count()
    graft.api.Stats.appendFirstSeenIdempotent(
      Seq(KV("z", 1.0)).toDF("k", "v"), path, "k", "v", batchId = 0L)
    assert(spark.read.parquet(path).count() === before,
      "replayed batchId must not append")
  }

  test("extremesIngestStream: max-merged daily maxima reproduce the batch Gumbel fit; replay appends once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("extremes").toString
    val path = s"$base/daily_max"

    // day 10 is delivered across BOTH batches with the larger max
    // arriving late — the merge must keep 900, not the first-seen 500
    val b1 = Seq(("view", 10L, 500L), ("view", 11L, 300L),
      ("buy", 10L, 100L), ("view", 12L, 250L))
    val b2 = Seq(("view", 10L, 900L), ("buy", 11L, 150L),
      ("view", 13L, 400L), ("buy", 12L, 120L))
    case class Ev(event_type: String, day: Long, v_e2: Long)

    val mem = MemoryStream[KV](spark)
    // smuggle (type, day, v) through KV: k = "type:day", v = value
    import org.apache.spark.sql.functions.{split => fsplit}
    def asEv(df: org.apache.spark.sql.DataFrame) =
      df.select(fsplit($"k", ":").getItem(0).as("event_type"),
        fsplit($"k", ":").getItem(1).cast("long").as("day"),
        $"v".cast("long").as("v_e2"))
    val q = StreamOps.extremesIngestStream(asEv(mem.toDF()), path).start()
    mem.addData(b1.map(e => KV(s"${e._1}:${e._2}", e._3.toDouble)): _*)
    q.processAllAvailable()
    mem.addData(b2.map(e => KV(s"${e._1}:${e._2}", e._3.toDouble)): _*)
    q.processAllAvailable()
    q.stop()

    val got = graft.operators.EventOps.gumbelReport(spark, path).collect()
    val batch = graft.operators.EventOps.gumbelFit(
      (b1 ++ b2).toDF("event_type", "day", "v_e2")
        .groupBy($"event_type", $"day")
        .agg(org.apache.spark.sql.functions.max($"v_e2").as("mx")))
      .collect()
    assert(got.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    val view = got.find(_.getString(0) == "view").get
    assert(view.getAs[Long]("n_days") === 4L)
    // return levels widen with horizon
    assert(view.getAs[Double]("rl_7d") <= view.getAs[Double]("rl_90d"))

    val before = spark.read.parquet(path).count()
    graft.operators.EventOps.appendDailyMaxIdempotent(
      Seq(("view", 10L, 9999L)).toDF("event_type", "day", "v_e2"), path,
      batchId = 0L)
    assert(spark.read.parquet(path).count() === before,
      "replayed batchId must not append")
  }

  test("calibrationIngestStream: sum-merged bins reproduce the batch Brier decomposition; replay appends once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("calib-stream").toString
    val path = s"$base/bins"

    // p on the 1e-6 grid, y in {0,1}; batches cut mid-bin so the merge
    // has to reconstruct bin sums across batch boundaries
    val b1 = Seq(KV("1", 0.12), KV("0", 0.17), KV("1", 0.88), KV("0", 0.35))
    val b2 = Seq(KV("1", 0.91), KV("0", 0.13), KV("1", 0.42), KV("1", 0.95),
      KV("0", 0.88))
    def asPy(df: org.apache.spark.sql.DataFrame) =
      df.select($"v".as("p"), $"k".cast("long").as("y"))

    val mem = MemoryStream[KV](spark)
    val q = StreamOps.calibrationIngestStream(asPy(mem.toDF()), path).start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val got = graft.operators.ModelOps.brierReport(spark, path).collect()
    val batch = graft.operators.ModelOps.brierFromBins(
      graft.operators.ModelOps.calibrationBins(asPy((b1 ++ b2).toDF())))
      .collect()
    assert(got.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    val r = got.head
    assert(r.getAs[Long]("n") === 9L)
    // decomposition identity holds on the merged state too
    // each reported term is display-rounded to 6 decimals, so the
    // identity holds to a few 1e-6, not machine precision
    assert(math.abs(r.getAs[Double]("brier") -
      (r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
        r.getAs[Double]("uncertainty") + r.getAs[Double]("within_bin_var")))
      < 5e-6)

    val before = spark.read.parquet(path).count()
    graft.operators.ModelOps.appendCalibrationBatchIdempotent(
      asPy(Seq(KV("1", 0.5)).toDF()), path, batchId = 0L)
    assert(spark.read.parquet(path).count() === before,
      "replayed batchId must not append")
  }

  test("srmIngestStream: min-merged enrollment reproduces the batch SRM card; replay appends once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("srm-stream").toString
    val path = s"$base/first_seen"

    // user 1 reappears in batch 2 with an EARLIER day (out-of-order
    // delivery) — its enrollment week must move back, not double-count
    val mem = MemoryStream[KV](spark)
    val q = StreamOps.srmIngestStream(mem.toDF()
      .select($"k".cast("long").as("user_id"), $"v".cast("long").as("day")),
      path, "user_id", "day").start()
    mem.addData(KV("1", 9.0), KV("2", 8.0), KV("3", 15.0))
    q.processAllAvailable()
    mem.addData(KV("1", 2.0), KV("4", 16.0), KV("2", 20.0))
    q.processAllAvailable()
    q.stop()

    val got = StreamOps.srmReport(spark, path).collect()
    // batch twin over the union of all delivered events
    val batch = graft.operators.EventOps.srmFromFirstDays(
      Seq((1L, 9L), (2L, 8L), (3L, 15L), (1L, 2L), (4L, 16L), (2L, 20L))
        .toDF("user_id", "day")
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.min($"day").as("first_day")))
      .collect()
    assert(got.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    // weeks present: user1→day2→week0, user2→day8→week1, user3/4→week2
    assert(got.map(_.getAs[Long]("week")).toSet === Set(0L, 1L, 2L))
    assert(got.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum === 4L)

    val before = spark.read.parquet(path).count()
    graft.api.Stats.appendFirstSeenIdempotent(
      Seq((9L, 1L)).toDF("user_id", "day"), path, "user_id", "day",
      batchId = 0L)
    assert(spark.read.parquet(path).count() === before,
      "replayed batchId must not append")
  }

  test("cdcDiffIngestStream: argmax-merged state reproduces the batch snapshot diff; replay appends once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cdc-diff").toString
    val path = s"$base/state"
    val t1 = 5_000_000_000L // epoch-nanos cut

    import org.apache.spark.sql.functions.{concat, expr, lpad, max_by, round, sum, when}
    // key (1,'a'): pre write then post write  -> updated
    // key (1,'b'): pre writes only            -> unchanged
    // key (2,'a'): born after T1              -> inserted
    // the LATER batch delivers an OLDER pre event for (1,'a') — the
    // argmax merge must keep the newer pre-cut candidate
    val b1 = Seq(CdcEv(1L, "a", 3_000_000_000L, 10L, 1.00),
      CdcEv(1L, "b", 2_000_000_000L, 11L, 2.00),
      CdcEv(2L, "a", 7_000_000_000L, 12L, 5.00))
    val b2 = Seq(CdcEv(1L, "a", 6_000_000_000L, 13L, 9.00),
      CdcEv(1L, "a", 1_000_000_000L, 14L, 7.00),
      CdcEv(1L, "b", 4_000_000_000L, 15L, 3.00))
    StreamOps.cdcDiffIngestBatch(b1.toDF(), 0L, path, t1)
    StreamOps.cdcDiffIngestBatch(b2.toDF(), 1L, path, t1)

    val got = StreamOps.cdcDiffReport(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // (1,'a'): c1 = 1.00 (ts 3e9 beats the late 1e9), c2 = 9.00 -> +8.00
    // (1,'b'): c1 = c2 = 3.00, no post writes -> unchanged, churn 0
    // (2,'a'): inserted, churn +5.00
    assert(got === Map(
      "inserted" -> (1L, 5.00),
      "unchanged" -> (1L, 0.00),
      "updated" -> (1L, 8.00)))

    // identity against the batch fold over the union of all events
    val all = (b1 ++ b2).toDF()
    val key = concat(lpad(expr("ts div 1000").cast("string"), 20, "0"),
      lpad($"event_id".cast("string"), 20, "0"))
    val batchCard = graft.operators.EventOps.snapshotDiffCard(
      all.withColumn("cents", round($"value" * 100.0).cast("long"))
        .groupBy($"user_id", $"event_type")
        .agg(max_by($"cents", when($"ts" < t1, key)).as("c1"),
          max_by($"cents", key).as("c2"),
          sum(when($"ts" < t1, 1L).otherwise(0L)).as("n_pre"),
          sum(when($"ts" >= t1, 1L).otherwise(0L)).as("n_post")))
      .collect().map(_.toSeq).toSeq
    assert(StreamOps.cdcDiffReport(spark, path).collect()
      .map(_.toSeq).toSeq === batchCard)

    val before = spark.read.parquet(path).count()
    StreamOps.cdcDiffIngestBatch(b1.toDF(), 0L, path, t1)
    assert(spark.read.parquet(path).count() === before,
      "replayed batchId must not append")
  }

  test("psiIngestStream: frozen-edge bin counts merge across batches; report matches brute force; replay appends once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("psi-stream").toString
    val (refPath, binsPath) = (s"$base/ref", s"$base/bins")

    // reference: both keys uniform over [0, 99]
    val refVals = (0 until 100).map(_.toDouble)
    val ref = refVals.flatMap(v => Seq(KV("a", v), KV("b", v))).toDF("k", "v")
    graft.api.Stats.psiReference(ref, "k", "v").write.parquet(refPath)

    // stream: key a stays uniform (split across two batches); key b
    // shifts entirely ABOVE the reference range (clamps into bin 9)
    val mem = MemoryStream[KV](spark)
    val q = StreamOps.psiIngestStream(mem.toDF(), refPath, binsPath, "k", "v")
      .start()
    mem.addData((0 until 50).map(i => KV("a", i.toDouble)) ++
      (0 until 20).map(i => KV("b", 200.0 + i)): _*)
    q.processAllAvailable()
    mem.addData((50 until 100).map(i => KV("a", i.toDouble)) ++
      (20 until 40).map(i => KV("b", 200.0 + i)): _*)
    q.processAllAvailable()
    q.stop()

    // frozen edges: every appended bin index is inside [0, 10)
    val binIdx = spark.read.parquet(binsPath).select("bin")
      .as[Long].collect()
    assert(binIdx.forall(b => b >= 0 && b <= 9))

    def psiOf(refXs: Seq[Double], curXs: Seq[Double]): Double = {
      val (lo, hi) = (refXs.min, refXs.max)
      def bin(v: Double): Long =
        math.max(math.min(math.floor((v - lo) * 10 / (hi - lo)).toLong, 9L), 0L)
      (0L to 9L).map { b =>
        val pr = (refXs.count(bin(_) == b) + 0.5) / (refXs.size + 5.0)
        val pc = (curXs.count(bin(_) == b) + 0.5) / (curXs.size + 5.0)
        (pc - pr) * math.log(pc / pr)
      }.sum
    }
    val report = graft.api.Stats.psiReport(spark, refPath, binsPath, "k")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(report.keySet === Set("a", "b"))
    assert(report("a").getAs[Long]("n_cur") === 100L)
    assert(report("b").getAs[Long]("n_cur") === 40L)
    val psiA = report("a").getAs[Double]("psi")
    val psiB = report("b").getAs[Double]("psi")
    assert(math.abs(psiA - psiOf(refVals, refVals)) < 1e-9,
      "uniform stream over a uniform reference must score ~0")
    assert(math.abs(psiB - psiOf(refVals, (0 until 40).map(200.0 + _))) < 1e-9)
    assert(psiB > 1.0 && psiA < 0.01, s"shifted key must dominate: $psiA vs $psiB")

    // at-least-once replay: re-delivered batchId appends nothing
    val before = spark.read.parquet(binsPath).count()
    graft.api.Stats.appendPsiBatchIdempotent(
      Seq(KV("a", 3.0)).toDF("k", "v"), refPath, binsPath, "k", "v",
      batchId = 0L)
    assert(spark.read.parquet(binsPath).count() === before,
      "replayed batchId must not append")

    // keys with no reference baseline are dropped, not scored
    graft.api.Stats.appendPsiBatchIdempotent(
      Seq(KV("ghost", 1.0)).toDF("k", "v"), refPath, binsPath, "k", "v",
      batchId = 5L)
    assert(!graft.api.Stats.psiReport(spark, refPath, binsPath, "k")
      .collect().map(_.getAs[String]("k")).contains("ghost"))
  }

  test("binQuantileEstimate: merged-bin quantiles land within one bin width of truth") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("binq").toString
    val (refPath, binsPath) = (s"$base/ref", s"$base/bins")
    val vals = (0 until 100).map(_.toDouble)
    graft.api.Stats.psiReference(vals.map(KV("m", _)).toDF("k", "v"), "k", "v")
      .write.parquet(refPath)
    // current = the same uniform distribution, split over two batches
    graft.api.Stats.appendPsiBatchIdempotent(
      vals.take(50).map(KV("m", _)).toDF("k", "v"), refPath, binsPath,
      "k", "v", batchId = 0L)
    graft.api.Stats.appendPsiBatchIdempotent(
      vals.drop(50).map(KV("m", _)).toDF("k", "v"), refPath, binsPath,
      "k", "v", batchId = 1L)
    val est = graft.api.Stats.binQuantileEstimate(spark, refPath, binsPath,
      "k", Seq(0.5, 0.9)).collect()
    assert(est.length === 1)
    val r = est.head
    assert(r.getAs[Long]("n") === 100L)
    val binWidth = 99.0 / 10
    assert(math.abs(r.getAs[Double]("q50") - 49.5) <= binWidth,
      s"q50=${r.getAs[Double]("q50")}")
    assert(math.abs(r.getAs[Double]("q90") - 89.1) <= binWidth,
      s"q90=${r.getAs[Double]("q90")}")
  }

  test("catDriftIngestStream: JSD report matches brute force; unseen categories surfaced; replay appends once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val base = java.nio.file.Files.createTempDirectory("cat-stream").toString
    val (refPath, countsPath) = (s"$base/ref", s"$base/counts")

    // reference mix for one key: x:60, y:40
    val ref = (Seq.fill(60)("x") ++ Seq.fill(40)("y")).map(KV(_, 0.0)).toDF("k", "v")
      .select(lit("m").as("key"), $"k".as("cat_v"))
    graft.api.Stats.catReference(ref, "key", "cat_v").write.parquet(refPath)

    // stream: x:30, y:30 in batch 1; z (unseen): 40 in batch 2
    val mem = MemoryStream[KV](spark)
    val q = StreamOps.catDriftIngestStream(
      mem.toDF().select(lit("m").as("key"), $"k".as("cat_v")),
      countsPath, "key", "cat_v").start()
    mem.addData(Seq.fill(30)(KV("x", 0.0)) ++ Seq.fill(30)(KV("y", 0.0)): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(40)(KV("z", 0.0)): _*)
    q.processAllAvailable()
    q.stop()

    val rep = graft.api.Stats.jsdReport(spark, refPath, countsPath, "key")
      .collect()
    assert(rep.length === 1)
    val r = rep.head
    assert(r.getAs[Long]("n_ref") === 100L)
    assert(r.getAs[Long]("n_cur") === 100L)
    assert(r.getAs[Long]("unseen_cats") === 1L)
    // brute force over the union {x, y, z} with +0.5 smoothing
    val refC = Map("x" -> 60L, "y" -> 40L, "z" -> 0L)
    val curC = Map("x" -> 30L, "y" -> 30L, "z" -> 40L)
    val want = refC.keySet.toSeq.map { c =>
      val pr = (refC(c) + 0.5) / (100 + 0.5 * 3)
      val pc = (curC(c) + 0.5) / (100 + 0.5 * 3)
      val m = (pr + pc) / 2
      pc * math.log(pc / m) / 2 + pr * math.log(pr / m) / 2
    }.sum
    val jsd = r.getAs[Double]("jsd")
    assert(math.abs(jsd - want) < 1e-12)
    assert(jsd > 0.0 && jsd <= math.log(2.0))

    val before = spark.read.parquet(countsPath).count()
    graft.api.Stats.appendCatBatchIdempotent(
      Seq(KV("x", 0.0)).toDF("k", "v").select(lit("m").as("key"), $"k".as("cat_v")),
      countsPath, "key", "cat_v", batchId = 0L)
    assert(spark.read.parquet(countsPath).count() === before,
      "replayed batchId must not append")
  }

  test("dsirGateStream: stream admissions equal batch scoring; gate is stateless across batches") {
    import spark.implicits._
    // train on a corpus whose target rows speak "good"-flavored tokens
    val corpus = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "good clean prose with useful words", true)
      else (i, "zz spam zz junk zz noise zz", false)
    }.toDF("doc_id", "text", "tgt")
    val lr = graft.api.Sampling.dsirBucketTable(corpus, "text", $"tgt")

    val incoming = Seq(
      (100L, "good clean prose with useful words"),
      (101L, "zz spam zz junk zz noise zz"),
      (102L, "good useful words"),
      (103L, "zz junk noise zz"))
    // threshold 0: positive-LLR (target-like) docs pass
    val admittedByBatch = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
    val mem = MemoryStream[(Long, String)](spark)
    val q = StreamOps.dsirGateStream(mem.toDF().toDF("doc_id", "text"), lr,
        "doc_id", "text", minWeightMicros = 0L) { (admitted, batchId) =>
      admittedByBatch.synchronized {
        admittedByBatch(batchId) = admitted.select($"doc_id", $"w_micros")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
    }.start()
    mem.addData(incoming.take(2): _*)
    q.processAllAvailable()
    mem.addData(incoming.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    // batch parity: the same docs scored in one batch, same threshold
    val batchScores = graft.api.Sampling.dsirScoreAgainst(
        incoming.toDF("doc_id", "text"), "doc_id", "text", lr)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("w_micros")).toMap
    val want = batchScores.filter(_._2 >= 0L)
    assert((admittedByBatch(0L) ++ admittedByBatch(1L)) === want)
    // the gate actually separates: target-like docs in, spam out
    assert(want.keySet === Set(100L, 102L))
  }

  test("stratified-sample ingest: 3-batch bottom-k merge + replay == one-shot sample") {
    import spark.implicits._
    val dir = tmpDir("bksample")
    val docs = graft.Util.rawTable(spark, sf, "documents")
      .select($"source", $"doc_id")
    (0 until 3).foreach { i =>
      StreamOps.stratifiedSampleIngestBatch(
        docs.filter($"doc_id" % 3 === i), i.toLong, s"$dir/cand", "source", "doc_id", 5)
    }
    // at-least-once replay of batch 2 must be a no-op
    StreamOps.stratifiedSampleIngestBatch(
      docs.filter($"doc_id" % 3 === 2), 2L, s"$dir/cand", "source", "doc_id", 5)
    val live = StreamOps.stratifiedSampleReport(spark, s"$dir/cand", "source", "doc_id", 5)
      .select($"source", $"sample_rank", $"doc_id")
      .orderBy($"source", $"sample_rank").collect()
    val batch = graft.api.Sampling.stratifiedSample(docs, "source", "doc_id", 5)
      .select($"source", $"sample_rank", $"doc_id")
      .orderBy($"source", $"sample_rank").collect()
    assert(live.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    // candidate table stays bottom-k-bounded: <= k per stratum per batch
    val cand = spark.read.parquet(s"$dir/cand")
    val worst = cand.groupBy($"source", $"batch_id")
      .count().agg(org.apache.spark.sql.functions.max($"count")).collect().head.getLong(0)
    assert(worst <= 5L)
  }

  test("conformal ingest: 3-batch calibration reservoir + replay == one-shot; quantile matches brute force") {
    import spark.implicits._
    val dir = tmpDir("conformal")
    // scored rows: residual = deterministic function of the id so every
    // slicing sees the same population
    val scored = graft.Util.rawTable(spark, sf, "orders")
      .select($"o_orderpriority".as("grp"), $"o_orderkey".as("id"),
        (org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.hash($"o_orderkey")) % 1000L)
          .cast("double").as("r"))
    (0 until 3).foreach { i =>
      StreamOps.conformalIngestBatch(
        scored.filter($"id" % 3 === i), i.toLong, s"$dir/cand", "grp", "id", "r", 50)
    }
    // at-least-once replay of batch 1 must be a no-op
    StreamOps.conformalIngestBatch(
      scored.filter($"id" % 3 === 1), 1L, s"$dir/cand", "grp", "id", "r", 50)
    val live = StreamOps.conformalReport(spark, s"$dir/cand", "grp", "id", "r", 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // one-shot: ingest everything as a single batch into a fresh table
    StreamOps.conformalIngestBatch(scored, 0L, s"$dir/one", "grp", "id", "r", 50)
    val oneShot = StreamOps.conformalReport(spark, s"$dir/one", "grp", "id", "r", 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(live === oneShot, "micro-batch slicing must not change the report")
    // brute force: the same bottom-50-by-knuth-priority sample, 0.9
    // quantile_cont by hand
    val sample = graft.api.Sampling.stratifiedSample(scored, "grp", "id", 50)
    live.foreach { case (g, n, qhat) =>
      val vs = sample.filter($"grp" === g).select($"r")
        .collect().map(_.getDouble(0)).sorted
      assert(n === vs.length.toLong)
      val h = 0.9 * (vs.length - 1)
      val lo = h.toInt
      val want =
        if (lo + 1 >= vs.length) vs(lo)
        else vs(lo) + (h - lo) * (vs(lo + 1) - vs(lo))
      assert(math.abs(qhat - want) < 1e-9, s"group $g: $qhat vs $want")
    }
    assert(live.map(_._2).forall(_ <= 50L), "calibration state stays k-bounded")
  }

  test("minhashSearchStream: appends to the text index land for the next batch") {
    import spark.implicits._
    val dir = tmpDir("mhstream")
    val docs = graft.Util.rawTable(spark, sf, "documents").select($"doc_id", $"text")
    val (h1, h2) = (docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1))
    graft.api.TextIndex.writeMinhashIndex(h1, "doc_id", "text", dir)
    // one probe duplicating an h1 doc, one duplicating an h2 doc
    val p1 = docs.filter($"doc_id" % 2 === 0).limit(1)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val p2 = docs.filter($"doc_id" % 2 === 1).limit(1)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val hits = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val mem = MemoryStream[(Long, String)](spark)
    val q = StreamOps.minhashSearchStream(mem.toDF().toDF("doc_id", "text"),
        dir, "doc_id", "text", minEstJaccard = 1.0) { (res, batchId) =>
      hits.synchronized {
        hits(batchId) = res.select($"doc_id").collect().map(_.getLong(0)).toSet
      }
    }.start()
    mem.addData(p2.toSeq: _*)
    q.processAllAvailable()
    assert(hits(0L).isEmpty, "h2 duplicate must miss before the append")
    graft.api.TextIndex.appendToMinhashIndex(h2, "doc_id", "text", dir)
    mem.addData(p2.toSeq: _*)
    mem.addData(p1.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val post = hits.filterKeys(_ > 0L).values.flatten.toSet
    assert(post.contains(p2.head._1 - 1000000L),
      "the appended half must be searchable without a restart")
    assert(post.contains(p1.head._1 - 1000000L))
  }

  test("late-data ingest: ordered 3-batch fold + replay == batch q243 audit") {
    import spark.implicits._
    val dir = tmpDir("latedata")
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"event_id", $"ts_ms")
    val ids = ev.select($"event_id").collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    StreamOps.lateDataIngestBatch(ev.filter($"event_id" <= c1), 0L, dir)
    StreamOps.lateDataIngestBatch(
      ev.filter($"event_id" > c1 && $"event_id" <= c2), 1L, dir)
    // at-least-once replay of batch 1 must be a no-op
    StreamOps.lateDataIngestBatch(
      ev.filter($"event_id" > c1 && $"event_id" <= c2), 1L, dir)
    StreamOps.lateDataIngestBatch(ev.filter($"event_id" > c2), 2L, dir)
    val live = StreamOps.lateDataReport(spark, dir).collect().map(_.toSeq).toSeq
    val batch = graft.operators.EventOps.q243LateDataAudit(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(live === batch)
  }

  test("reconcileIngestStream: sum-merged partials == batch q312 ledger; replay appends once") {
    import spark.implicits._
    val dir = s"${tmpDir("reconcile")}/partials"
    val ev = graft.Util.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    // two arbitrary delivery slices — the commutative checksum means the
    // split (and order) must not change the report
    StreamOps.reconcileIngestBatch(ev.filter($"event_id" % 2 === 0), 0L, dir)
    StreamOps.reconcileIngestBatch(ev.filter($"event_id" % 2 === 1), 1L, dir)
    // at-least-once replay of batch 0 must be a no-op
    val before = spark.read.parquet(dir).count()
    StreamOps.reconcileIngestBatch(ev.filter($"event_id" % 2 === 0), 0L, dir)
    assert(spark.read.parquet(dir).count() === before,
      "replayed batchId must not append")
    val live = StreamOps.reconcileReport(spark, dir).collect()
      .map(_.toSeq).toSeq
    val batch = graft.operators.EventOps.q312Reconciliation(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(live === batch)
    // the crafted transport must actually exercise a non-ok verdict
    // somewhere at this SF, or the card is vacuous
    assert(batch.nonEmpty)
  }
}
