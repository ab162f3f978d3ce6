package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH text index — the text-dedup analog of the
  * persisted IVF embedding index ([[Similarity.writeIvfIndex]]): shingle
  * and sign the corpus ONCE, then serve near-dup candidate lookups
  * against the stored signatures without ever re-reading corpus text.
  *
  * The index is a [[GenDir]] at `path` — one generation directory holds
  * both subtables, compactions publish a new generation with one atomic
  * marker (readers never observe a missing directory; the previous
  * generation stays readable through one more publish). Inside a
  * generation:
  *   - `bands/band=<b>/…parquet` — one row per (doc, band):
  *     (id, n_sh, sigs[8], band_sig), partition-pruned by band and
  *     SORTED by band_sig within files so a probe's `band_sig IN (…)`
  *     predicate pushes to the scan and row-group min/max stats skip
  *     everything outside the probed buckets (the text-side equivalent
  *     of the IVF index's DPP cell pruning).
  *   - `meta/` — 1 row: shingle width n, seed count, band count. Reads
  *     fail loudly on a mismatched layout rather than silently
  *     mis-signing probes.
  *
  * Search returns CANDIDATES with the signature-estimated Jaccard
  * (agreeing seeds / 8 — granularity 1/8, calibrated against exact
  * Jaccard by the q118 suite); callers holding the corpus text verify
  * exactly via [[Dedup.exactJaccardOn]] when the estimate isn't enough.
  * The index stores ~(8 longs + 1 string) × 2 bands per document —
  * O(corpus docs), independent of text bytes.
  */
object TextIndex {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val Bands = 2

  private def gen(spark: SparkSession, path: String): String =
    GenDir.currentOrFail(spark, path)

  private def bandFrame(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val wide = Dedup.minhashWide(Dedup.shingleSets(docs, idCol, textCol, n), idCol)
    wide
      .withColumn("sigs", array((0 until Dedup.NumSeeds).map(s => col(s"m$s")): _*))
      .select(col(idCol).as("id"), col("n_sh"), col("sigs"),
        expr("stack(2, 0L, concat_ws(',', m0, m1, m2, m3), " +
          "1L, concat_ws(',', m4, m5, m6, m7)) AS (band, band_sig)"))
  }

  /** Build the index at `path` (a new generation — concurrent readers
    * of a previous build keep resolving it until the new one commits).
    * One shingle+minhash pass over the corpus; the only shuffle is the
    * band repartition.
    */
  def writeMinhashIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, n: Int = 4): Unit = {
    val spark = docs.sparkSession
    GenDir.publish(spark, path) { g =>
      bandFrame(docs, idCol, textCol, n)
        .repartition(col("band"))
        .sortWithinPartitions(col("band_sig"))
        .write.mode("overwrite").partitionBy("band").parquet(s"$g/bands")
      import spark.implicits._
      Seq((n, Dedup.NumSeeds, Bands)).toDF("shingle_n", "n_seeds", "n_bands")
        .coalesce(1).write.mode("overwrite").parquet(s"$g/meta")
    }()
    ()
  }

  /** Append new documents under the existing band partitions — the
    * frozen-parameter incremental ingest path (shingle width comes from
    * the stored meta, so appended signatures are comparable with the
    * base). New files inside the CURRENT generation; no rewrite of
    * existing files.
    */
  def appendToMinhashIndex(newDocs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    val n = readMeta(spark, path)
    bandFrame(newDocs, idCol, textCol, n)
      .write.mode("append").partitionBy("band").parquet(s"${gen(spark, path)}/bands")
  }

  /** Rewrite each band partition's accumulated append files into
    * target-sized, band_sig-SORTED files — continuous
    * [[appendToMinhashIndex]] ingest otherwise grows one unsorted file
    * per append per band, degrading both file listing and the sorted
    * row-group pruning [[searchMinhashIndex]] relies on. The rewrite
    * publishes a new [[GenDir]] generation (meta copied forward), so
    * the swap is one atomic marker — no reader-visible window — and
    * signatures are untouched (search results are bit-identical
    * before/after). An append racing the rewrite is detected by a
    * listing compare and ABORTS the swap (the appended rows win) —
    * run compaction from the same single-threaded loop as the appends.
    */
  def compactMinhashBands(spark: SparkSession, path: String,
      targetRowsPerFile: Long = 4000000L): Unit = {
    readMeta(spark, path) // layout check
    val g0 = gen(spark, path)
    val listingBefore = GenDir.currentFiles(spark, path)
    val rows = spark.read.parquet(s"$g0/bands")
    val nFiles = math.max(1L,
      math.ceil(rows.count().toDouble / targetRowsPerFile).toLong).toInt
    GenDir.publish(spark, path) { g =>
      rows.repartition(nFiles, col("band"))
        .sortWithinPartitions(col("band_sig"))
        .write.mode("overwrite").partitionBy("band").parquet(s"$g/bands")
      spark.read.parquet(s"$g0/meta")
        .coalesce(1).write.mode("overwrite").parquet(s"$g/meta")
    } { () =>
      val ok = GenDir.currentFiles(spark, path) == listingBefore
      if (!ok) log.warn(s"compactMinhashBands: concurrent append under $path " +
        "during compaction — aborting this swap (the appended rows win)")
      ok
    }
    ()
  }

  /** Maintenance policy: compact when append debris crosses the
    * threshold (files per band), otherwise do nothing — the
    * [[Similarity.maintainIvfIndex]] pattern for the text side, so an
    * ingest loop can call this after every append batch and pay the
    * rewrite only when it buys something. Returns true when a
    * compaction ran.
    */
  def maintainMinhashIndex(spark: SparkSession, path: String,
      maxFilesPerBand: Int = 16,
      targetRowsPerFile: Long = 4000000L): Boolean = {
    val bandsDir = new org.apache.hadoop.fs.Path(s"${gen(spark, path)}/bands")
    val fs = bandsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(bandsDir, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    val run = n > maxFilesPerBand.toLong * Bands
    if (run) compactMinhashBands(spark, path, targetRowsPerFile)
    run
  }

  private def readMeta(spark: SparkSession, path: String): Int = {
    val meta = spark.read.parquet(s"${gen(spark, path)}/meta").collect()
    require(meta.length == 1, s"minhash index meta corrupt at $path")
    val m = meta.head
    require(m.getAs[Int]("n_seeds") == Dedup.NumSeeds &&
      m.getAs[Int]("n_bands") == Bands,
      s"minhash index at $path was written with an incompatible layout")
    m.getAs[Int]("shingle_n")
  }

  /** Candidate lookup: probes are shingled/signed with the STORED
    * parameters, their (band, band_sig) keys broadcast against the
    * index scan, and — because the probe bucket list is bounded by
    * 2·|probes| — the bucket signatures are ALSO pushed down as an
    * `IN` scan filter, so the sorted band files prune to the probed
    * row groups. Returns (probe_id, doc_id, n_agree, est_jaccard) with
    * est_jaccard = agreeing seeds / 8 ≥ `minEstJaccard`.
    */
  def searchMinhashIndex(spark: SparkSession, path: String, probes: DataFrame,
      idCol: String, textCol: String,
      minEstJaccard: Double = 0.0): DataFrame = {
    val n = readMeta(spark, path)
    val probeBands = bandFrame(probes, idCol, textCol, n)
      .select(col("id").as("probe_id"), col("sigs").as("probe_sigs"),
        col("band"), col("band_sig"))
      .localCheckpoint()
    // bounded by 2 rows per probe — the contract that makes the scan
    // filter (and the broadcast) safe; mirrors the IVF search's
    // "probes broadcast, corpus never shuffles" shape
    val sigList = probeBands.select(col("band_sig")).distinct()
      .collect().map(_.getString(0))
    val idx = spark.read.parquet(s"${gen(spark, path)}/bands")
      .filter(col("band_sig").isin(sigList.toSeq: _*))
    val agree = (0 until Dedup.NumSeeds)
      .map(s => when(col("sigs").getItem(s) === col("probe_sigs").getItem(s), 1)
        .otherwise(0))
      .reduce(_ + _)
    idx.join(broadcast(probeBands), Seq("band", "band_sig"))
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id").as("doc_id"), col("sigs"),
        col("probe_sigs"))
      .distinct()
      .withColumn("n_agree", agree.cast("long"))
      .select(col("probe_id"), col("doc_id"), col("n_agree"),
        (col("n_agree") / lit(Dedup.NumSeeds.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }
}
