package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming window/watermark/dedup operators (SURVEY §2.B streaming
  * row): the live Structured Streaming counterparts of the batch twins
  * q29 (sessionize) / q30 (tumbling) / q24 (keyed dedup). Each takes a
  * streaming DataFrame with an event-time Timestamp column and returns a
  * transformed streaming DataFrame ready for writeStream.
  *
  * Scale: all three are the built-in stateful operators — state is
  * partitioned by group key across executors, bounded by the watermark
  * (late state is evicted), which is exactly the behavior that survives
  * an unbounded 100 TB/day stream.
  */
object StreamOps {

  /** Tumbling-window counts/sums with a watermark: late events beyond
    * `lateness` are dropped; in append mode a window emits once final.
    */
  def tumblingAgg(events: DataFrame, tsCol: String, lateness: String,
      windowLen: String): DataFrame =
    // tumbling IS sliding with slide == length (window(c, len) is
    // defined as window(c, len, len)) — one body to maintain
    slidingAgg(events, tsCol, lateness, windowLen, windowLen)

  /** SLIDING windows with a watermark — the streaming form of q109:
    * each event lands in len/slide overlapping windows (the built-in
    * windowing plans the bounded explode), late events beyond
    * `lateness` drop, and a window emits once final in append mode.
    * State per open window is one partial aggregate.
    */
  def slidingAgg(events: DataFrame, tsCol: String, lateness: String,
      windowLen: String, slide: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen, slide).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows: events of one user within `gap` of each other merge
    * into one session (the streaming form of q29's gaps-and-islands).
    */
  def sessionAgg(events: DataFrame, tsCol: String, lateness: String,
      gap: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sess.start").as("sess_start"), col("sess.end").as("sess_end"),
        col("user_id"), col("n_events"))

  /** Stateful dedup bounded by the watermark: duplicates of `idCols`
    * arriving within the lateness window are dropped; state for old ids
    * is evicted as the watermark advances (at-least-once upstream →
    * effectively-once downstream, the §2.A op-9 duplicate-acceptance
    * semantics tightened).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, lateness: String,
      idCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming NEAR-duplicate filter (the streaming set-similarity-join
    * shape): each document's MinHash band signature is computed inline
    * by the native codegen kernels, and a document is dropped when its
    * band signature was already seen within the watermark — band
    * collision is the batch LSH candidate criterion
    * ([[graft.api.Dedup.lshCandidatePairs]], here the first 4-row
    * band), so this is the streaming analogue with state bounded by the
    * lateness window. Texts with no shingles key on their own id (never
    * near-dups of anything).
    *
    * Asymmetry vs batch: this variant drops collision successors WITHOUT
    * the exact-Jaccard verify — cheapest state (one seen-marker per band
    * signature), but a false-positive band collision is dropped too.
    * [[nearDupFilterVerifiedWithinWatermark]] adds the in-stream verify
    * stage (watermark-bounded shingle-set state) where precision
    * matters.
    */
  def nearDupFilterWithinWatermark(docs: DataFrame, tsCol: String,
      lateness: String, idCol: String, textCol: String): DataFrame = {
    require(!docs.columns.contains("__sigs") && !docs.columns.contains("__band_key"),
      "nearDupFilterWithinWatermark reserves the __sigs/__band_key column names")
    graft.functions.ShingleFunctions.register(docs.sparkSession)
    val sigs = graft.functions.ShingleFunctions.minhashSigs(
      graft.functions.ShingleFunctions.textShingles(col(textCol), 4))
    docs
      .withColumn("__sigs", sigs)
      // no-shingle rows must never be deduped against each other: key on
      // the id, or a per-row uuid when the id itself is null (null keys
      // compare equal in dropDuplicates)
      .withColumn("__band_key", when(col("__sigs").isNotNull,
          concat_ws(",", expr("slice(__sigs, 1, 4)")))
        .otherwise(concat(lit("id:"),
          coalesce(col(idCol).cast("string"), expr("uuid()")))))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(Seq("__band_key"))
      .drop("__sigs", "__band_key")
  }

  /** Streaming benchmark decontamination — the ingest-time twin of
    * [[graft.api.Dedup.decontaminationStats]]: documents whose n-word
    * shingle set overlaps the STATIC `benchmark` frame are dropped
    * before they ever land in the corpus. The benchmark's distinct
    * shingles collapse into ONE array row on the static side and
    * broadcast into the stream (stream-static inner join with a
    * single-row build side — no watermark needed, no state), so the
    * per-document check is a narrow codegen'd `arrays_overlap` probe.
    *
    * Contract: sized for EVAL-SET benchmarks (≤ ~10⁵ distinct shingles
    * — one in-cache array per executor; the probe cost is one hash
    * lookup per benchmark shingle per doc). Decontaminating against a
    * corpus-sized reference is the batch operator's job. Docs with no
    * shingles (< n tokens) cannot leak an n-gram and are kept.
    */
  def decontaminationFilter(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 4): DataFrame = {
    require(!docs.columns.contains("__bench_sh"),
      "decontaminationFilter reserves the __bench_sh column name")
    graft.functions.ShingleFunctions.register(docs.sparkSession)
    val benchArr = graft.api.Dedup
      .shingleSets(benchmark, idCol, textCol, n)
      .select(explode(col("sh_arr")).as("sh"))
      .agg(collect_set(col("sh")).as("__bench_sh"))
    docs
      .crossJoin(broadcast(benchArr))
      // coalesce: a null text has no shingles to leak (the kernel yields
      // null, which would otherwise null-propagate into a silent drop)
      .filter(coalesce(!arrays_overlap(
        graft.functions.ShingleFunctions.textShingles(col(textCol), n),
        col("__bench_sh")), lit(true)))
      .drop("__bench_sh")
  }

  /** REFRESHABLE decontamination: [[decontaminationFilter]]'s benchmark
    * probe is resolved once at query start (a static broadcast), so a
    * benchmark update mid-stream needs a restart. This variant runs the
    * filter INSIDE foreachBatch and calls `loadBenchmark` per
    * micro-batch, so the benchmark frame's plan re-resolves against its
    * source every batch — point it at a reloadable table (parquet dir,
    * catalog table) and newly published eval shingles start filtering
    * from the NEXT micro-batch, no restart.
    *
    * Cost model: one benchmark re-read + one broadcast build per
    * micro-batch (the benchmark is eval-set sized per the
    * [[decontaminationFilter]] contract, so both are trivial next to the
    * batch itself). `sink` receives the filtered batch + batchId —
    * exactly the foreachBatch signature, so composing with an upsert
    * sink is direct. Returns the CONFIGURED writer (not a running
    * query): the caller sets checkpoint/trigger options and calls
    * `.start()`.
    */
  def decontaminationFilterRefreshing(docs: DataFrame,
      loadBenchmark: SparkSession => DataFrame,
      idCol: String, textCol: String, n: Int = 4)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      val bench = loadBenchmark(batch.sparkSession)
      sink(decontaminationFilter(batch, bench, idCol, textCol, n), batchId)
    }

  /** SIZE-BOUNDED streaming decontamination — the scale path when the
    * contamination suite outgrows [[decontaminationFilter]]'s broadcast
    * shingle array (many benchmarks × 8-grams). Each micro-batch runs
    * [[graft.api.Dedup.decontaminationDrop]]: above the measured
    * suite-size cutover a broadcast BLOOM filter (~10 bits per benchmark
    * shingle instead of the strings themselves) pre-gates the batch's
    * shingles, only Bloom hits reach the exact shingle join
    * (planner-chosen strategy — broadcast when small, shuffle when not),
    * and the confirmed-contaminated doc ids anti-join the batch; at or
    * below the cutover the suite's shingle strings broadcast straight
    * into the exact join (no gate to pay for). Bloom false positives cost a verify-join row, never a
    * dropped clean document. Runs inside foreachBatch (where the
    * relational anti-join is legal on the batch frame) and re-loads the
    * benchmark per batch — the [[decontaminationFilterRefreshing]]
    * contract, so a republished suite starts filtering from the next
    * micro-batch with no restart.
    */
  def decontaminationFilterBloom(docs: DataFrame,
      loadBenchmark: SparkSession => DataFrame,
      idCol: String, textCol: String, n: Int = 4,
      bloomItems: Long = 1000000L, bloomBits: Long = 0L,
      broadcastCutover: Long = graft.api.Dedup.BroadcastSuiteCutover)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      val bench = loadBenchmark(batch.sparkSession)
      sink(graft.api.Dedup.decontaminationDrop(
        batch, bench, idCol, textCol, n, bloomItems, bloomBits,
        broadcastCutover), batchId)
    }

  /** Streaming twin of [[graft.api.Stats]]: each micro-batch appends its
    * mergeable stats rows (count/sum/min/max/moments + HLL sketch per
    * key) to the persisted stats table — the live ingest path of the
    * never-rescan pattern. [[graft.api.Stats.mergedSummary]] over the
    * same directory serves corpus-wide answers that include every batch
    * seen so far; at-least-once re-delivery is skipped by stored
    * batch_id ([[graft.api.Stats.appendBatchStatsIdempotent]]), so a
    * replay never double-counts. Returns the configured writer; the
    * caller sets checkpoint/trigger options and calls `.start()`.
    */
  def incrementalStats(docs: DataFrame, statsDir: String,
      keyCols: Seq[String], valueCol: String, distinctCol: String,
      lgK: Int = 12): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.api.Stats.appendBatchStatsIdempotent(batch.toDF(), statsDir,
        keyCols, valueCol, distinctCol, batchId, lgK)
    }

  /** Live frequency-sketch ingest: each micro-batch appends its
    * count-min rows ([[graft.api.Stats.cmsBuild]], tagged batch_id,
    * replay-idempotent) to a persisted sketch table;
    * [[graft.api.Stats.mergedCms]] over that table is bit-identical to
    * one build over everything ingested — heavy-key monitoring over an
    * unbounded stream in depth × width rows per batch.
    */
  def cmsIngestStream(keys: DataFrame, sketchDir: String, keyCol: String,
      depth: Int = 4, width: Int = 2048): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    keys.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.api.Stats.appendCmsBatchIdempotent(batch.toDF(), sketchDir,
        keyCol, batchId, depth, width)
    }

  /** Live distribution-drift monitor — the streaming twin of the batch
    * PSI query (q168): bin edges are FROZEN from a reference
    * distribution ([[graft.api.Stats.psiReference]]), each micro-batch
    * appends its bin counts against those edges (replay-idempotent,
    * batch_id-tagged), and [[graft.api.Stats.psiReport]] over the two
    * small tables scores drift for everything ingested so far. Because
    * the edges never move, bin counts are mergeable across any number
    * of batches — the property the batch query's per-run min/max edges
    * don't have — and the report's cost is |keys| × bins rows per
    * batch, independent of stream volume. Returns the configured
    * writer; the caller sets checkpoint/trigger options and `.start()`.
    */
  def psiIngestStream(values: DataFrame, refPath: String, binsPath: String,
      keyCol: String, valueCol: String,
      bins: Int = 10): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    values.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.api.Stats.appendPsiBatchIdempotent(batch.toDF(), refPath,
        binsPath, keyCol, valueCol, batchId, bins)
    }

  /** Live EWMA trend maintenance — each micro-batch appends its
    * per-(key, day) counts (replay-idempotent);
    * [[graft.api.Stats.ewmaReport]] folds the merged daily series with
    * the same scaled-cumsum the batch q183 uses, so the live trend line
    * equals the batch one on identical data regardless of micro-batch
    * boundaries. State: |keys| × |days| × |batches| count rows — never
    * the events. Returns the configured writer; the caller sets
    * checkpoint/trigger options and `.start()`.
    */
  def ewmaIngestStream(values: DataFrame, countsPath: String,
      keyCol: String,
      dayCol: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    values.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.api.Stats.appendDailyCountsIdempotent(batch.toDF(), countsPath,
        keyCol, dayCol, batchId)
    }

  /** Live user-growth maintenance — each micro-batch appends its
    * per-key min first-day candidates (replay-idempotent);
    * [[graft.api.Stats.growthReport]] folds candidates with a MIN merge
    * so the growth curve equals the batch q198 on identical data
    * regardless of micro-batch boundaries or out-of-order key
    * reappearances. State: |keys seen| × |batches| rows — never the
    * events. Returns the configured writer; the caller sets
    * checkpoint/trigger options and `.start()`.
    */
  def growthIngestStream(values: DataFrame, path: String,
      keyCol: String,
      dayCol: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    values.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.api.Stats.appendFirstSeenIdempotent(batch.toDF(), path,
        keyCol, dayCol, batchId)
    }

  /** Live extreme-value monitor — the streaming twin of the q341
    * Gumbel/return-level card: each micro-batch reduces to per-
    * (type, day) MAX candidates (max-mergeable, so replays and
    * out-of-order days just merge) appended replay-idempotently;
    * [[graft.operators.EventOps.gumbelReport]] max-merges and runs the
    * identical fit, so stream == batch on any micro-batch cut. State:
    * |types|×|days|×|batches| rows — never the events. Rows need
    * event_type, day, v_e2. Returns the configured writer; the caller
    * sets checkpoint/trigger options and `.start()`.
    */
  def extremesIngestStream(values: DataFrame,
      path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    values.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.operators.EventOps.appendDailyMaxIdempotent(
        batch.toDF(), path, batchId)
    }

  /** Live probability-calibration monitor — the streaming twin of the
    * q335 Brier/Murphy decomposition: each micro-batch reduces its
    * (p, y) rows to decile-bin sufficient statistics (n, Σp, Σy,
    * Σ(p−y)² — exact counts/decimals, sum-mergeable) and appends them
    * replay-idempotently; [[graft.operators.ModelOps.brierReport]]
    * sum-merges the bins and runs the SAME decomposition as the batch
    * card, so stream == batch on identical data whatever the
    * micro-batch boundaries. State: 10 bins × batches rows — never the
    * scored events. Rows need `p` (double) and `y` (0/1 long) columns.
    * Returns the configured writer; the caller sets checkpoint/trigger
    * options and `.start()`.
    */
  def calibrationIngestStream(values: DataFrame,
      path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    values.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.operators.ModelOps.appendCalibrationBatchIdempotent(
        batch.toDF(), path, batchId)
    }

  /** Live sample-ratio-mismatch monitor, ingest side — the streaming
    * twin of the q275 SRM audit, the alarm every experimentation
    * platform wants DURING the ramp, not after: each micro-batch
    * appends its per-user min first-day candidates (the same mergeable
    * first-seen table as [[growthIngestStream]], replay-idempotent), so
    * enrollment dedup across batches is a MIN merge, never user-level
    * operator state. State: |users| × |batches| rows — never the
    * events. Returns the configured writer; the caller sets
    * checkpoint/trigger options and `.start()`.
    */
  def srmIngestStream(events: DataFrame, path: String, userCol: String,
      dayCol: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.api.Stats.appendFirstSeenIdempotent(batch.toDF(), path,
        userCol, dayCol, batchId)
    }

  /** Read side of the live SRM monitor: MIN-merge the first-seen
    * candidates back to true per-user enrollment days and run the SAME
    * [[graft.operators.EventOps.srmFromFirstDays]] readout as the batch
    * q275 card — stream == batch is the min-merge identity. Reads only
    * the candidate table.
    */
  def srmReport(spark: SparkSession, path: String): DataFrame =
    graft.operators.EventOps.srmFromFirstDays(
      spark.read.parquet(path)
        .groupBy(col("k").as("user_id"))
        .agg(min(col("first_day")).as("first_day")))

  /** Live snapshot-diff monitor, ingest side — the streaming twin of
    * the q282 change-data-feed card: each micro-batch appends its
    * per-(user, event_type) CDC state CANDIDATES — last-writer cents at
    * the T1 cut and at head (each tagged with its zero-padded ordering
    * key, so candidates are argmax-mergeable) plus pre/post write
    * counts (sum-mergeable) — replay-idempotent via the batch_id tag.
    * The classification never needs the events again: state grows with
    * |keys| × |batches|. `t1Nanos` is the snapshot cut in epoch nanos;
    * rows need user_id, event_type, ts (epoch-nanos long), event_id,
    * value.
    */
  def cdcDiffIngestStream(events: DataFrame, path: String,
      t1Nanos: Long): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      cdcDiffIngestBatch(batch.toDF(), batchId, path, t1Nanos)
    }

  /** One [[cdcDiffIngestStream]] micro-batch append — public so the
    * replay-idempotence spec can drive it directly.
    */
  def cdcDiffIngestBatch(batch: DataFrame, batchId: Long, path: String,
      t1Nanos: Long): Unit = {
    val spark = batch.sparkSession
    val alreadyAppended = graft.Util.batchAlreadyApplied(spark, path, batchId)
    if (!alreadyAppended) {
      val key = concat(
        lpad(expr("ts div 1000").cast("string"), 20, "0"),
        lpad(col("event_id").cast("string"), 20, "0"))
      batch
        .withColumn("cents", round(col("value") * 100.0).cast("long"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(
          max(when(col("ts") < t1Nanos, key)).as("k1"),
          max_by(col("cents"), when(col("ts") < t1Nanos, key)).as("c1"),
          max(key).as("k2"),
          max_by(col("cents"), key).as("c2"),
          sum(when(col("ts") < t1Nanos, 1L).otherwise(0L)).as("n_pre"),
          sum(when(col("ts") >= t1Nanos, 1L).otherwise(0L)).as("n_post"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(path)
    }
  }

  /** Read side of the live snapshot diff: argmax-merge the per-batch
    * state candidates (last writer wins by the ordering key, counts
    * add) and run the SAME
    * [[graft.operators.EventOps.snapshotDiffCard]] fold as the batch
    * q282 — stream == batch is the argmax-merge identity. Reads only
    * the state table.
    */
  def cdcDiffReport(spark: SparkSession, path: String): DataFrame =
    graft.operators.EventOps.snapshotDiffCard(
      spark.read.parquet(path)
        .groupBy(col("user_id"), col("event_type"))
        .agg(
          max_by(col("c1"), col("k1")).as("c1"),
          max_by(col("c2"), col("k2")).as("c2"),
          sum(col("n_pre")).as("n_pre"),
          sum(col("n_post")).as("n_post")))

  /** Live source↔replica reconciliation monitor, ingest side — the
    * streaming twin of the q312 ledger: each micro-batch appends its
    * per-(stream, day) [[graft.operators.EventOps.reconcilePartials]]
    * (counts and DECIMAL content checksums — all SUM-mergeable), tagged
    * and replay-idempotent via batch_id. The verdict never re-reads
    * events: state grows with |streams × days| × |batches|, and the
    * commutative checksum means arrival ORDER cannot change the report —
    * the property a cross-region monitor needs under out-of-order
    * delivery. Rows need event_id, ts (epoch-nanos long), user_id,
    * event_type, value.
    */
  def reconcileIngestStream(events: DataFrame,
      path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      reconcileIngestBatch(batch.toDF(), batchId, path)
    }

  /** One [[reconcileIngestStream]] micro-batch append — public so the
    * replay-idempotence spec can drive it directly.
    */
  def reconcileIngestBatch(batch: DataFrame, batchId: Long,
      path: String): Unit = {
    val spark = batch.sparkSession
    val alreadyAppended = graft.Util.batchAlreadyApplied(spark, path, batchId)
    if (!alreadyAppended) {
      graft.operators.EventOps.reconcilePartials(batch)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(path)
    }
  }

  /** Read side of the live reconciliation monitor: SUM-merge the
    * per-batch partials and run the SAME
    * [[graft.operators.EventOps.reconcileVerdict]] as the batch q312 —
    * stream == batch is the sum-merge identity. Reads only the partials
    * table.
    */
  def reconcileReport(spark: SparkSession, path: String): DataFrame =
    graft.operators.EventOps.reconcileVerdict(
      spark.read.parquet(path)
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("n_src")).as("n_src"), sum(col("n_dst")).as("n_dst"),
          sum(col("s_src")).as("s_src"), sum(col("s_dst")).as("s_dst"),
          sum(col("n_lost")).as("n_lost"), sum(col("n_dup")).as("n_dup"),
          sum(col("n_corrupt")).as("n_corrupt")))

  /** Live categorical drift monitor — [[psiIngestStream]]'s counterpart
    * for discrete columns: each micro-batch appends its per-category
    * counts (replay-idempotent) against a frozen
    * [[graft.api.Stats.catReference]];
    * [[graft.api.Stats.jsdReport]] scores the merged mix vs. the
    * reference (Jensen–Shannon, smoothed, unseen categories surfaced).
    * Counts are trivially mergeable, so the report covers everything
    * ingested at |keys| × |categories| cost. Returns the configured
    * writer; the caller sets checkpoint/trigger options and `.start()`.
    */
  def catDriftIngestStream(values: DataFrame, countsPath: String,
      keyCol: String,
      catCol: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    values.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.api.Stats.appendCatBatchIdempotent(batch.toDF(), countsPath,
        keyCol, catCol, batchId)
    }

  /** Live k-anonymity monitor, ingest side — the streaming twin of
    * [[graft.operators.GovernanceOps.q221KAnonymity]]. Each micro-batch
    * appends ONE row per quasi-identifier combination it saw (its
    * partial count, batch_id-tagged and replay-idempotent, the
    * [[graft.api.Stats]] counts-table pattern), so re-identification
    * risk is monitorable DURING ingest without rescanning the corpus:
    * the table grows with |batches| × |QI domain|, never with rows.
    */
  def kAnonymityIngestStream(rows: DataFrame, countsPath: String,
      qiCols: Seq[String]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      kAnonymityIngestBatch(batch.toDF(), batchId, countsPath, qiCols)
    }

  /** One [[kAnonymityIngestStream]] micro-batch append — public so the
    * replay-idempotence spec can drive it directly.
    */
  def kAnonymityIngestBatch(batch: DataFrame, batchId: Long,
      countsPath: String, qiCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val alreadyAppended = graft.Util.batchAlreadyApplied(spark, countsPath, batchId)
    if (!alreadyAppended)
      batch.groupBy(qiCols.map(col): _*)
        .agg(count(lit(1)).as("cur_n"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(countsPath)
  }

  /** Read side of the live k-anonymity monitor: merge the per-batch
    * partial counts back to per-QI-group sizes (exact — counts add)
    * and band them with the SAME
    * [[graft.operators.GovernanceOps.kAnonymityBands]] the batch audit
    * uses, so stream == batch is an identity, not a convention. Reads
    * only the counts table.
    */
  def kAnonymityReport(spark: SparkSession, countsPath: String,
      qiCols: Seq[String]): DataFrame = {
    val merged = spark.read.parquet(countsPath)
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("cur_n")).as("k"))
    graft.operators.GovernanceOps.kAnonymityBands(merged)
      .orderBy(col("k_lo"))
  }

  /** Live deterministic stratified sample, ingest side — the streaming
    * twin of [[graft.api.Sampling.stratifiedSample]]. The md5-order
    * sample is a BOTTOM-K SKETCH (k smallest hash values per stratum),
    * and bottom-k is mergeable: min-k(min-k(A) ∪ min-k(B)) =
    * min-k(A ∪ B). So each micro-batch appends only its own per-stratum
    * bottom-k candidates (≤ k·|strata| rows per batch, batch_id-tagged
    * and replay-idempotent) and the maintained table stays a valid
    * basis for the corpus-so-far sample at any moment — a uniform
    * reservoir over an unbounded stream with NO RNG state to
    * checkpoint, and bit-identical to re-sampling the full corpus.
    */
  def stratifiedSampleIngestStream(rows: DataFrame, path: String,
      strataCol: String, idCol: String,
      k: Int): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      stratifiedSampleIngestBatch(batch.toDF(), batchId, path, strataCol, idCol, k)
    }

  /** One [[stratifiedSampleIngestStream]] micro-batch append — public
    * so the replay-idempotence spec can drive it directly.
    */
  def stratifiedSampleIngestBatch(batch: DataFrame, batchId: Long,
      path: String, strataCol: String, idCol: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val alreadyAppended = graft.Util.batchAlreadyApplied(spark, path, batchId)
    if (!alreadyAppended)
      graft.api.Sampling.stratifiedSample(batch, strataCol, idCol, k)
        .drop("sample_rank")
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(path)
  }

  /** Read side of the live sample: merge the per-batch bottom-k
    * candidates back through the SAME ranking
    * ([[graft.api.Sampling.stratifiedSample]] over the candidate
    * table), so stream == batch is the bottom-k merge identity, not a
    * convention. Reads ≤ k·|strata|·|batches| candidate rows — never
    * the corpus.
    */
  def stratifiedSampleReport(spark: SparkSession, path: String,
      strataCol: String, idCol: String, k: Int): DataFrame =
    graft.api.Sampling.stratifiedSample(
      spark.read.parquet(path).drop("batch_id"), strataCol, idCol, k)

  /** Live conformal-calibration maintenance, ingest side — the
    * streaming twin of the batch split-conformal card
    * ([[graft.operators.ModelOps.q265ConformalInterval]]'s calibration
    * stage): each micro-batch's scored rows (group, id, residual)
    * contribute their k smallest Knuth-hash priorities per group
    * (replay-idempotent, batch_id-tagged) to a persisted candidate
    * table. Because the deterministic bottom-k is a mergeable uniform
    * sample ([[graft.api.Sampling.stratifiedSample]]'s merge identity),
    * the union of per-batch candidates re-ranked once IS the bottom-k
    * of everything ever scored — a true streaming calibration
    * reservoir with |groups|·k·|batches| stored rows and never the
    * stream. Returns the configured writer; the caller sets
    * checkpoint/trigger options and `.start()`.
    */
  def conformalIngestStream(scored: DataFrame, path: String,
      groupCol: String, idCol: String, residualCol: String,
      k: Int): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    scored.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      conformalIngestBatch(batch.toDF(), batchId, path, groupCol, idCol, residualCol, k)
    }

  /** One [[conformalIngestStream]] micro-batch append — public so the
    * replay-idempotence spec can drive it directly.
    */
  def conformalIngestBatch(batch: DataFrame, batchId: Long, path: String,
      groupCol: String, idCol: String, residualCol: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val alreadyAppended = graft.Util.batchAlreadyApplied(spark, path, batchId)
    if (!alreadyAppended)
      graft.api.Sampling.stratifiedSample(
          batch.select(col(groupCol), col(idCol), col(residualCol)),
          groupCol, idCol, k)
        .drop("sample_rank", "u", "priority")
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(path)
  }

  /** Read side of the live calibration: merge the candidates back
    * through the SAME bottom-k ranking, then emit per group the
    * calibration size, the (1−alpha) linearly-interpolated residual
    * quantile q̂ (quantile_cont semantics over the ≤k retained values —
    * bounded, so an in-group sorted array is legal state), and the
    * ± interval width a point prediction wears. Stream == batch holds
    * by the bottom-k merge identity: any micro-batch slicing of the
    * same scored rows yields the identical report.
    */
  def conformalReport(spark: SparkSession, path: String,
      groupCol: String, idCol: String, residualCol: String, k: Int,
      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    val merged = graft.api.Sampling.stratifiedSample(
        spark.read.parquet(path).drop("batch_id"), groupCol, idCol, k)
      .drop("sample_rank", "u", "priority")
    val q = lit(1.0 - alpha)
    merged.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_calib"),
        sort_array(collect_list(col(residualCol))).as("vs"))
      .withColumn("h", q * (col("n_calib") - lit(1)).cast("double"))
      .withColumn("lo", floor(col("h")).cast("int"))
      .withColumn("qhat",
        when(col("n_calib") === 1, element_at(col("vs"), 1))
          .otherwise(element_at(col("vs"), col("lo") + 1) +
            (col("h") - col("lo").cast("double")) *
              (element_at(col("vs"),
                least(col("lo") + 2, col("n_calib").cast("int"))) -
                element_at(col("vs"), col("lo") + 1))))
      .select(col(groupCol), col("n_calib"), col("qhat"),
        (col("qhat") * 2.0).as("interval_width"))
      .orderBy(col(groupCol))
  }

  /** Live late-data audit, ingest side — the streaming twin of
    * [[graft.operators.EventOps.q243LateDataAudit]]. Lateness composes
    * across ordered micro-batches because the running max does: each
    * batch computes per-stream lateness against max(within-batch
    * running max, carried high-water mark), folds its bucket counts
    * into the persisted audit table, and advances the per-stream mark.
    * State is |streams|×5 audit rows + |streams| marks — broadcast
    * scale by construction (the streamingKmeans state-table contract) —
    * and the batch_id in the marks table makes at-least-once replay a
    * no-op. Feed batches in commit (event_id) order, which is exactly
    * the order the replicator checkpoints by.
    */
  def lateDataIngestStream(events: DataFrame,
      path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      lateDataIngestBatch(batch.toDF(), batchId, path)
    }

  /** One [[lateDataIngestStream]] micro-batch fold — public so the
    * parity/replay spec can drive it directly. Expects columns
    * (event_type, event_id, ts_ms).
    */
  def lateDataIngestBatch(batch: DataFrame, batchId: Long, path: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marksPath = s"$path/marks"
    val aggPath = s"$path/agg"
    val hasState = fs.exists(new org.apache.hadoop.fs.Path(marksPath))
    if (hasState && !spark.read.parquet(marksPath)
        .filter(col("batch_id") === batchId).isEmpty) return
    val marks =
      if (hasState) spark.read.parquet(marksPath)
        .select($"event_type", $"max_ts")
      else spark.emptyDataset[(String, Long)].toDF("event_type", "max_ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val late = batch.select($"event_type", $"event_id", $"ts_ms")
      .join(marks.withColumnRenamed("max_ts", "carried"), Seq("event_type"), "left")
      .withColumn("late_ms",
        greatest(max($"ts_ms").over(w), coalesce($"carried", lit(Long.MinValue)))
          - $"ts_ms")
    val bucket = when($"late_ms" === 0, "a_in_order")
      .when($"late_ms" <= 60000L, "b_1min")
      .when($"late_ms" <= 300000L, "c_5min")
      .when($"late_ms" <= 1800000L, "d_30min")
      .otherwise("e_beyond")
    val batchAgg = late.groupBy($"event_type", bucket.as("bucket"))
      .agg(count(lit(1)).as("n_events"), max($"late_ms").as("max_late_ms"))
    val prevAgg =
      if (hasState && fs.exists(new org.apache.hadoop.fs.Path(aggPath)))
        spark.read.parquet(aggPath)
      else spark.emptyDataset[(String, String, Long, Long)]
        .toDF("event_type", "bucket", "n_events", "max_late_ms")
    // state is |streams|-bounded — materialize on the driver before the
    // overwrite (cannot overwrite a path mid-read)
    val mergedAgg = prevAgg.unionByName(batchAgg)
      .groupBy($"event_type", $"bucket")
      .agg(sum($"n_events").as("n_events"), max($"max_late_ms").as("max_late_ms"))
      .collect().toSeq
    val newMarks = marks
      .unionByName(batch.groupBy($"event_type").agg(max($"ts_ms").as("max_ts")))
      .groupBy($"event_type").agg(max($"max_ts").as("max_ts"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    spark.createDataFrame(spark.sparkContext.parallelize(mergedAgg, 1),
        prevAgg.schema)
      .write.mode("overwrite").parquet(aggPath)
    newMarks.toDF("event_type", "max_ts").withColumn("batch_id", lit(batchId))
      .coalesce(1).write.mode("overwrite").parquet(marksPath)
  }

  /** Read side of the live late-data audit: the persisted bucket table
    * plus per-stream shares — the same shape (and, under ordered
    * ingest, the same values) as the batch q243 audit. Reads only the
    * |streams|×5-row state.
    */
  def lateDataReport(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$path/agg")
      .withColumn("share", round($"n_events".cast("double") /
        sum($"n_events").over(org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type")), 6))
      .orderBy($"event_type", $"bucket")
  }

  /** Streaming mini-batch k-means: maintains a centroid table at
    * `centroidDir` that every micro-batch refines — the batch
    * cosine-assigns to the current centroids (the shared
    * [[graft.api.Similarity.kmeansStep]] kernel: one broadcast centroid
    * row, narrow argmax, k·dim-bounded update agg) and the batch means
    * merge into the running centroids weighted by accumulated counts,
    * `new = (n_old·old + n_batch·mean_batch) / (n_old + n_batch)` — the
    * standard streaming k-means update (no decay). The first batch
    * seeds from its own k lowest-id rows; clusters absent from a batch
    * persist unchanged.
    *
    * The centroid frame is k rows — it materializes on the driver
    * before the overwrite (you cannot overwrite a path mid-read), which
    * is exactly the broadcast-scale contract centroids already satisfy
    * everywhere else in this API. Replay-idempotent: the table carries
    * the last merged batchId, and foreachBatch's at-least-once
    * re-delivery of that batch is skipped instead of double-counted.
    * A missing table seeds from the first batch; an EXISTING but
    * unreadable table fails loudly (a half-written overwrite must not
    * silently reset the accumulated state). Returns the configured
    * writer; the caller sets checkpoint/trigger options and calls
    * `.start()`.
    */
  def streamingKmeans(docs: DataFrame, idCol: String, embCol: String,
      k: Int, centroidDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      streamingKmeansBatch(batch, batchId, idCol, embCol, k, centroidDir)
    }

  /** One [[streamingKmeans]] micro-batch merge — public so the replay
    * contract is directly testable.
    */
  def streamingKmeansBatch(rawBatch: DataFrame, batchId: Long, idCol: String,
      embCol: String, k: Int, centroidDir: String): Unit = {
    val spark = rawBatch.sparkSession
    val path = new org.apache.hadoop.fs.Path(centroidDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // existence checked explicitly: only a genuinely absent table may
    // seed; a present-but-corrupt one (crash mid-overwrite) must throw
    val old: Option[DataFrame] =
      if (fs.exists(path)) Some(spark.read.parquet(centroidDir)) else None
    // foreachBatch is at-least-once: a crash between the table overwrite
    // and the stream-checkpoint commit re-delivers the same batchId —
    // merging it again would double-count n and re-weight the means
    val alreadyMerged = old.exists(df =>
      df.schema.fieldNames.contains("last_batch_id") &&
        !df.filter(col("last_batch_id") >= batchId).isEmpty)
    val batch = rawBatch.persist()
    try {
      if (!alreadyMerged && !batch.isEmpty) {
        val cents0 = old.map(_.drop("last_batch_id")).getOrElse(
          graft.api.Similarity.kmeansSeed(batch, idCol, embCol, k)
            .withColumn("n", lit(0L)))
        val stepped = graft.api.Similarity.kmeansStep(batch,
          cents0.select(col("cluster"), col("cent_emb")), idCol, embCol)
        val merged = cents0
          .select(col("cluster"), col("cent_emb").as("o_emb"), col("n").as("o_n"))
          .join(stepped.select(col("cluster"), col("cent_emb").as("b_emb"),
            col("n").as("b_n")), Seq("cluster"), "full_outer")
          .select(col("cluster"),
            expr("""CASE WHEN o_emb IS NULL THEN b_emb
                   |     WHEN b_emb IS NULL THEN o_emb
                   |     ELSE zip_with(o_emb, b_emb,
                   |            (x, y) -> (x * o_n + y * b_n) / (o_n + b_n)) END""".stripMargin)
              .as("cent_emb"),
            (coalesce(col("o_n"), lit(0L)) + coalesce(col("b_n"), lit(0L))).as("n"),
            lit(batchId).as("last_batch_id"))
        // k rows: collect BEFORE overwriting the directory being read
        val rows = merged.collect().toSeq
        spark.createDataFrame(
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, merged.schema)
          .coalesce(1).write.mode("overwrite").parquet(centroidDir)
      }
    } finally batch.unpersist()
  }

  /** One document on the verified near-dup path (`id` boxed: null ids
    * are legal input — they key on a per-row uuid — and a primitive
    * field's encoder null-assertion would kill the query on the exact
    * rows the uuid fallback exists for).
    */
  case class NearDupIn(bandKey: String, id: java.lang.Long,
    ts: java.sql.Timestamp, text: String, sh: Seq[String])

  /** A kept document's verification state: its shingle set and arrival
    * time (evicted once the watermark passes ts + lateness).
    */
  case class KeptDoc(sh: Seq[String], tsMs: Long)

  /** An emitted (kept) document. */
  case class NearDupOut(id: java.lang.Long, ts: java.sql.Timestamp, text: String)

  private def latenessToMs(lateness: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(lateness))
    require(iv.months == 0, s"month-valued lateness unsupported: $lateness")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** [[nearDupFilterWithinWatermark]] with the exact-verify stage the
    * band-only filter lacks: a band collision makes a document a
    * CANDIDATE, and it is dropped only when its exact shingle-set
    * Jaccard against a kept document of the same band bucket (within
    * the watermark) reaches `jaccardThreshold` — a false-positive band
    * collision (same 4-minhash signature, dissimilar sets) now survives.
    * This closes the documented precision asymmetry vs the batch path
    * at the price of holding each kept document's shingle set in keyed
    * state; state stays bounded because entries evict once the
    * watermark passes ts + lateness (and whole keys time out via
    * EventTimeTimeout).
    *
    * Narrowed contract vs the band-only filter: the output carries
    * exactly (idCol: long, tsCol, textCol), and rows with a NULL event
    * time are dropped explicitly (a watermarked stateful operator has
    * no ordering or eviction point for them). Null ids stay legal —
    * they key on a per-row uuid, like the band-only filter. Docs with
    * no shingles key on their own id (jaccard(∅,∅) = 1, so same-id
    * re-deliveries still dedup; distinct ids never meet). Within a
    * micro-batch, documents are processed in (ts, id) order for
    * determinism (null ids order first).
    */
  def nearDupFilterVerifiedWithinWatermark(docs: DataFrame, tsCol: String,
      lateness: String, idCol: String, textCol: String,
      jaccardThreshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.ShingleFunctions.register(spark)
    val latenessMs = latenessToMs(lateness)
    val sigs = graft.functions.ShingleFunctions.minhashSigs(col("__sh"))
    val keyed = docs
      .withColumn("__sh", graft.functions.ShingleFunctions.textShingles(col(textCol), 4))
      .withColumn("__sigs", sigs)
      .withColumn("__band_key", when(col("__sigs").isNotNull,
          concat_ws(",", expr("slice(__sigs, 1, 4)")))
        .otherwise(concat(lit("id:"),
          coalesce(col(idCol).cast("string"), expr("uuid()")))))
      .withWatermark(tsCol, lateness)
      .filter(col(tsCol).isNotNull)
      .select(col("__band_key").as("bandKey"), col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"), col(textCol).as("text"), col("__sh").as("sh"))
      .as[NearDupIn]
    keyed
      .groupByKey(_.bandKey)
      .flatMapGroupsWithState[List[KeptDoc], NearDupOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[NearDupIn], state: GroupState[List[KeptDoc]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            var kept = state.getOption.getOrElse(Nil)
              .filter(_.tsMs + latenessMs >= wm)
            val out = rows.toSeq
              .sortBy(r => (r.ts.getTime,
                Option(r.id).map(_.toLong).getOrElse(Long.MinValue)))
              .flatMap { r =>
              // null text → null shingle array (the kernels are
              // null-intolerant); treat as the empty set
              val shingles = Option(r.sh).getOrElse(Seq.empty)
              val shSet = shingles.toSet
              val isDup = kept.exists(k =>
                graft.functions.Parsing.jaccard(k.sh.toSet, shSet) >= jaccardThreshold)
              if (isDup) None
              else {
                kept = KeptDoc(shingles, r.ts.getTime) :: kept
                Some(NearDupOut(r.id, r.ts, r.text))
              }
            }
            if (kept.nonEmpty) {
              state.update(kept)
              state.setTimeoutTimestamp(kept.map(_.tsMs).max + latenessMs)
            } else state.remove()
            out.iterator
          }
      }
      .toDF("id", "ts", "text")
      .select(col("id").as(idCol), col("ts").as(tsCol), col("text").as(textCol))
  }

  /** Stream-stream interval join: each left event pairs with right-stream
    * events of the same key whose event time lies in [leftTs - before,
    * leftTs]. Both sides carry watermarks so Spark can bound the join
    * state (right rows older than the watermark minus the interval are
    * evicted) — the streaming form of the q27/q28 batch as-of/interval
    * joins, and the state-bounding discipline that survives an unbounded
    * stream.
    *
    * Column requirements: left has (key, ts: Timestamp, ...), right has
    * (key, rts: Timestamp, ...); pass distinct column names.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lateness: String, before: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) <= l(leftTs) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before"),
      joinType) // left_outer: unmatched left rows emit null-extended once
                // the watermark proves no matching right row can arrive
      .drop(r(key))
  }

  /** One event on the streaming-funnel path (epoch-millis event time). */
  case class FunnelEvent(user_id: Long, event_type: String, ts_ms: Long)

  /** Funnel event plus the Timestamp twin of ts_ms that carries the
    * watermark for the TTL variant (the watermark column must survive
    * into the stateful operator's input).
    */
  case class FunnelEventTs(user_id: Long, event_type: String, ts_ms: Long,
      event_ts: java.sql.Timestamp)

  /** Funnel state per user: the event-time frontier of each reached
    * stage (None = not reached) plus the highest event time EVER seen for
    * the user (`lastSeenMs` — gated and repeat events count as activity
    * even though they never enter a stage frontier; the TTL horizon keys
    * off it so a late-delivered older event can never drag the timeout
    * backwards). One `Option[Long]` per stage + one long — constant
    * state per user regardless of event volume.
    */
  case class FunnelState(tStage: Seq[Option[Long]], lastSeenMs: Long = 0L)

  /** Emitted once per user per newly-reached stage. */
  case class FunnelAdvance(user_id: Long, stage: Int, stage_name: String, t_ms: Long)

  /** Streaming ordered-conversion funnel — the live twin of the batch
    * q104 ([[graft.operators.EventOps.q104Funnel]]): per user, advance
    * through `stages` strictly in event time (stage k+1 counts only
    * STRICTLY after the stage-k frontier) and emit a [[FunnelAdvance]]
    * the moment a stage is first reached. State is one timestamp per
    * (user, stage) — bounded by users × stages, never by event volume —
    * partitioned across executors by the group key.
    *
    * Within a micro-batch, events are processed in event-time order, so
    * arrival order inside a batch never changes the outcome; ACROSS
    * batches the frontier only advances (monotone). A late-arriving
    * EARLIER occurrence of an already-reached stage lowers that stage's
    * frontier (matching q104's min semantics) as long as the next stage
    * is still pending — so a subsequent next-stage event gates against
    * the corrected minimum. The residual divergence from the batch twin:
    * once stage k+1 has fired, a late earlier stage-k event can no
    * longer revise history (emits are append-only), where q104's batch
    * recomputation would — replay the batch twin when exact late-data
    * semantics matter.
    *
    * State TTL (`ttl = Some("30 days")`): without it, NoTimeout state
    * lives forever — constant per user, but a 100 TB event stream's
    * user-id space is unbounded, so the store grows monotonically with
    * key churn. With a TTL the operator runs under an event-time
    * watermark and expires any user idle past
    * `latest event seen + ttl` (the near-dup filters' eviction
    * pattern). A post-expiry event re-opens the user from a clean
    * funnel, so stage-1 advances can re-emit for churned-and-returned
    * users — downstream consumers that need once-ever semantics at
    * infinite horizon should keep `ttl = None` or dedup on
    * (user, stage). With a TTL the events also drop late rows beyond
    * the watermark, which is what makes the expiry sound.
    *
    * Checkpoint compatibility: adding the activity frontier
    * (`FunnelState.lastSeenMs`) changed the state encoder schema, so
    * streaming checkpoints written before the TTL variant existed do not
    * restore into this operator — restart such a query from a fresh
    * checkpoint and let the batch twin (q104) backfill history.
    */
  def funnelStages(spark: SparkSession, events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      ttl: Option[String] = None): Dataset[FunnelAdvance] = {
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    def advance(uid: Long, evs: Iterator[FunnelEvent],
        state: GroupState[FunnelState]): Iterator[FunnelAdvance] = {
      var t = state.getOption.map(_.tStage.toVector)
        .getOrElse(Vector.fill(stages.size)(Option.empty[Long]))
      val batch = evs.toVector
      // lastSeen is MONOTONE across batches: a late-delivered older event
      // must never drag the activity frontier (and so the TTL horizon)
      // backwards
      val lastSeen = (state.getOption.map(_.lastSeenMs).getOrElse(0L) +:
        batch.map(_.ts_ms)).max
      val out = Vector.newBuilder[FunnelAdvance]
      batch.sortBy(e => (e.ts_ms, e.event_type)).foreach { e =>
        stageIdx.get(e.event_type).foreach { k =>
          val prevReached = k == 0 || t(k - 1).exists(_ < e.ts_ms)
          val nextPending = k == stages.size - 1 || t(k + 1).isEmpty
          if (t(k).isEmpty && prevReached) {
            t = t.updated(k, Some(e.ts_ms))
            out += FunnelAdvance(uid, k + 1, stages(k), e.ts_ms)
          } else if (prevReached && nextPending && t(k).exists(_ > e.ts_ms)) {
            // late-arriving earlier occurrence of a reached stage:
            // lower the frontier (q104's min semantics) so the
            // still-pending NEXT stage gates against the corrected
            // minimum; no re-emit (append-only)
            t = t.updated(k, Some(e.ts_ms))
          }
        }
      }
      state.update(FunnelState(t, lastSeen))
      out.result().iterator
    }
    ttl match {
      case None =>
        events
          .select(col("user_id").cast("long").as("user_id"), col("event_type"),
            col("ts_ms").cast("long").as("ts_ms"))
          .as[FunnelEvent]
          .groupByKey(_.user_id)
          .flatMapGroupsWithState[FunnelState, FunnelAdvance](
            OutputMode.Append(), GroupStateTimeout.NoTimeout())(advance)
      case Some(horizon) =>
        val ttlMs = latenessToMs(horizon)
        events
          .select(col("user_id").cast("long").as("user_id"), col("event_type"),
            col("ts_ms").cast("long").as("ts_ms"),
            timestamp_millis(col("ts_ms").cast("long")).as("event_ts"))
          .withWatermark("event_ts", horizon)
          .as[FunnelEventTs]
          .groupByKey(_.user_id)
          .flatMapGroupsWithState[FunnelState, FunnelAdvance](
            OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
            (uid: Long, evs: Iterator[FunnelEventTs], state: GroupState[FunnelState]) =>
              if (state.hasTimedOut) {
                state.remove()
                Iterator.empty
              } else {
                val out = advance(uid,
                  evs.map(e => FunnelEvent(e.user_id, e.event_type, e.ts_ms)),
                  state)
                // idle = no events at all, not "no frontier advance" — a
                // user sending gated/repeat events is still active; the
                // horizon keys off the PERSISTED monotone activity
                // frontier (advance just folded this batch in), so an
                // older late event can never expire a live key; the clamp
                // keeps the timeout legal (strictly beyond the watermark)
                state.setTimeoutTimestamp(math.max(
                  state.get.lastSeenMs + ttlMs,
                  state.getCurrentWatermarkMs() + 1L))
                out
              }
          }
    }
  }

  /** One event on the SCD2 tracker path — carries `event_id` so
    * same-timestamp ties break exactly as the batch twin's
    * (ts_ms, event_id) ordering does.
    */
  case class Scd2Event(user_id: Long, event_type: String, ts_ms: Long,
      event_id: Long)

  /** SCD2 event plus the Timestamp twin of ts_ms that carries the
    * watermark for the TTL variant.
    */
  case class Scd2EventTs(user_id: Long, event_type: String, ts_ms: Long,
      event_id: Long, event_ts: java.sql.Timestamp)

  /** SCD2 tracker state: the current open version per entity, plus the
    * highest event time ever seen (`lastSeenMs` — same-attr events never
    * move valid_from but do prove the entity alive; the TTL horizon keys
    * off this monotone frontier so a late older event can't expire a
    * live entity).
    */
  case class Scd2State(version: Long, attr: String, validFromMs: Long,
      lastSeenMs: Long = 0L)

  /** Emitted when a version CLOSES (validTo set) and once more when a new
    * one opens (validToMs null = current).
    */
  case class Scd2Row(user_id: Long, version: Long, event_type: String,
      valid_from_ms: Long, valid_to_ms: Option[Long])

  /** Streaming SCD type-2 tracker — the live twin of the batch q113
    * ([[graft.operators.EventOps.q113Scd2History]]): per entity, each
    * attribute CHANGE closes the open version (emitting it with its
    * valid_to bound) and opens a new one (emitted with a null bound).
    * State is ONE open version per entity — constant regardless of
    * event volume. Within a micro-batch events process in event-time
    * order; across batches the frontier only advances (a late event
    * older than the open version's start is ignored, the documented
    * at-least-once trade — the batch twin is the replayable source of
    * truth, this operator is the low-latency view).
    *
    * Append-mode caveat: a closed version is emitted exactly once; the
    * OPEN version row re-emits each time it changes, so downstream
    * should upsert on (user_id, version) — the same idempotent-sink
    * contract as the reference's checkpoint upsert (§2.A op 7).
    *
    * State TTL (`ttl = Some("90 days")`): without it, NoTimeout state is
    * one open version per entity forever — a monotonically growing store
    * over an unbounded entity space. With a TTL the operator runs under
    * an event-time watermark and expires entities idle past
    * `last activity + ttl`. The expired entity's open version stays
    * "current" downstream (it was already emitted with a null bound —
    * expiry emits nothing, because fabricating a valid_to for an entity
    * that merely went quiet would be wrong). A post-expiry event starts
    * a NEW lifecycle: version numbering restarts at 1 with a fresh
    * valid_from, so with a TTL enabled downstream tables must upsert on
    * (user_id, valid_from_ms) — version numbers are only unique within
    * a lifecycle.
    *
    * Checkpoint compatibility: adding the activity frontier
    * (`Scd2State.lastSeenMs`) changed the state encoder schema, so
    * streaming checkpoints written before the TTL variant existed do not
    * restore into this operator — restart from a fresh checkpoint; the
    * batch twin (q113) rebuilds the full history on replay.
    */
  def scd2Track(spark: SparkSession, events: DataFrame,
      ttl: Option[String] = None): Dataset[Scd2Row] = {
    import spark.implicits._
    def advance(uid: Long, evs: Iterator[Scd2Event],
        state: GroupState[Scd2State]): Iterator[Scd2Row] = {
      var cur = state.getOption
      val batch = evs.toVector
      // monotone activity frontier (see Scd2State.lastSeenMs)
      val lastSeen = (cur.map(_.lastSeenMs).getOrElse(0L) +:
        batch.map(_.ts_ms)).max
      val out = Vector.newBuilder[Scd2Row]
      // (ts_ms, event_id): the batch twin's exact tie-break (q113)
      batch.sortBy(e => (e.ts_ms, e.event_id)).foreach { e =>
        cur match {
          case None =>
            cur = Some(Scd2State(1L, e.event_type, e.ts_ms))
            out += Scd2Row(uid, 1L, e.event_type, e.ts_ms, None)
          case Some(s) if e.ts_ms >= s.validFromMs && e.event_type != s.attr =>
            out += Scd2Row(uid, s.version, s.attr, s.validFromMs, Some(e.ts_ms))
            cur = Some(Scd2State(s.version + 1, e.event_type, e.ts_ms))
            out += Scd2Row(uid, s.version + 1, e.event_type, e.ts_ms, None)
          case _ => () // same attribute, or older than the open version
        }
      }
      cur.foreach(s => state.update(s.copy(lastSeenMs = lastSeen)))
      out.result().iterator
    }
    ttl match {
      case None =>
        events
          .select(col("user_id").cast("long").as("user_id"), col("event_type"),
            col("ts_ms").cast("long").as("ts_ms"),
            col("event_id").cast("long").as("event_id"))
          .as[Scd2Event]
          .groupByKey(_.user_id)
          .flatMapGroupsWithState[Scd2State, Scd2Row](
            OutputMode.Append(), GroupStateTimeout.NoTimeout())(advance)
      case Some(horizon) =>
        val ttlMs = latenessToMs(horizon)
        events
          .select(col("user_id").cast("long").as("user_id"), col("event_type"),
            col("ts_ms").cast("long").as("ts_ms"),
            col("event_id").cast("long").as("event_id"),
            timestamp_millis(col("ts_ms").cast("long")).as("event_ts"))
          .withWatermark("event_ts", horizon)
          .as[Scd2EventTs]
          .groupByKey(_.user_id)
          .flatMapGroupsWithState[Scd2State, Scd2Row](
            OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
            (uid: Long, evs: Iterator[Scd2EventTs], state: GroupState[Scd2State]) =>
              if (state.hasTimedOut) {
                // the open version was already emitted with a null bound;
                // inventing a close time for a quiet entity would be wrong
                state.remove()
                Iterator.empty
              } else {
                val out = advance(uid,
                  evs.map(e =>
                    Scd2Event(e.user_id, e.event_type, e.ts_ms, e.event_id)),
                  state)
                state.getOption.foreach { s =>
                  // idle keys off the PERSISTED monotone activity
                  // frontier — same-attr events don't move valid_from but
                  // do prove the entity alive, and a late older event
                  // can't drag the horizon backwards
                  state.setTimeoutTimestamp(math.max(
                    math.max(s.lastSeenMs, s.validFromMs) + ttlMs,
                    state.getCurrentWatermarkMs() + 1L))
                }
                out
              }
          }
    }
  }

  case class AttrEvent(user_id: Long, event_id: Long, event_type: String,
    ts_ms: Long, value: Double)
  /** Most recent touch per live user — O(1): one (ts, type) pair. */
  case class TouchState(t: Long, ty: String)
  case class Attribution(user_id: Long, event_id: Long, channel: String,
    gap_ms: Option[Long], value: Double)

  /** Live twin of q152: stateful last-touch attribution — every
    * conversion event emits its channel (the most recent prior touch
    * type within `windowMs`, else "organic"), gap, and value, as it
    * arrives. State per user is exactly ONE (ts, type) pair, so a
    * billion-user stream holds one tuple per live key — compare the
    * batch twin's window sort, which this replaces with an O(1) running
    * carry.
    *
    * Ordering contract (same as [[nextEventPairsStream]]): each
    * micro-batch's group folds in (ts_ms, event_id) order, so an
    * in-order-per-user stream reproduces the batch twin exactly (the
    * parity spec replays the events table); a touch arriving AFTER its
    * conversion was already emitted cannot retro-attribute — append-only
    * output, backfill exactness from q152.
    */
  def attributionStream(spark: SparkSession, events: DataFrame,
      touches: Set[String] = Set("click", "view"),
      conversion: String = "purchase",
      windowMs: Long = 7L * 24 * 3600 * 1000): Dataset[Attribution] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"), col("event_type"),
        col("ts_ms").cast("long").as("ts_ms"),
        col("value").cast("double").as("value"))
      .as[AttrEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[AttrEvent], state: GroupState[TouchState]) =>
          var touch = state.getOption
          val out = Vector.newBuilder[Attribution]
          evs.toVector.sortBy(e => (e.ts_ms, e.event_id)).foreach { e =>
            if (e.event_type == conversion) {
              val hit = touch.filter(t => e.ts_ms - t.t <= windowMs)
              out += Attribution(uid, e.event_id,
                hit.map(_.ty).getOrElse("organic"),
                hit.map(t => e.ts_ms - t.t), e.value)
            }
            if (touches.contains(e.event_type))
              touch = Some(TouchState(e.ts_ms, e.event_type))
          }
          touch.foreach(state.update)
          out.result().iterator
      }
  }

  case class NextEventIn(user_id: Long, event_id: Long, ts_us: Long,
    event_type: String)
  /** Last-3 event types, oldest first — O(1) per live user. */
  case class Ctx3State(types: Seq[String])
  case class NextEventPair(user_id: Long, event_id: Long, context: String,
    label: String)

  /** Live twin of q146: stateful next-event training-pair extraction —
    * for every event whose user already has three seen events, emit
    * (context = previous three event types oldest-first, label = this
    * event's type). State per user is exactly the last three types
    * (O(1), no timeline retained), so a billion-user stream holds three
    * strings per live key.
    *
    * Ordering contract: each micro-batch's group is sorted by
    * (ts_us, event_id) before folding, so a stream delivered in event
    * order per user (any batch boundaries) produces EXACTLY the batch
    * twin's pairs — the parity spec replays the events table and
    * compares. An event arriving out of order ACROSS batches is folded
    * at delivery time (its pairs reflect the context as of arrival);
    * a pipeline needing late-event exactness should bound lateness
    * upstream with a watermark + dedup and backfill from the batch twin.
    */
  def nextEventPairsStream(spark: SparkSession,
      events: DataFrame): Dataset[NextEventPair] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts_us").cast("long").as("ts_us"), col("event_type"))
      .as[NextEventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Ctx3State, NextEventPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[NextEventIn], state: GroupState[Ctx3State]) =>
          var ctx = state.getOption.map(_.types).getOrElse(Seq.empty)
          val out = Vector.newBuilder[NextEventPair]
          evs.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (ctx.size == 3)
              out += NextEventPair(uid, e.event_id, ctx.mkString(">"),
                e.event_type)
            ctx = (ctx :+ e.event_type).takeRight(3)
          }
          state.update(Ctx3State(ctx))
          out.result().iterator
      }
  }

  /** Streaming ANN over a MAINTAINED persisted IVF index: each
    * micro-batch of probe embeddings searches the on-disk index
    * ([[graft.api.Similarity.searchQuantizedIvfIndex]] by default — int8
    * payload, dynamic-partition-pruned cell reads; `quantized = false`
    * for the float layout) inside foreachBatch, so the index PATH is
    * re-resolved per batch — the [[decontaminationFilterRefreshing]]
    * pattern. A rebuild ([[graft.api.Similarity.writeQuantizedIvfIndex]]
    * after a [[graft.api.Similarity.kmeansIterate]] re-train) or an
    * append ([[graft.api.Similarity.appendToQuantizedIvfIndex]]) is
    * picked up by the NEXT micro-batch with no restart — which closes
    * the loop: live probes over an index that is itself continuously
    * ingested and periodically re-trained.
    *
    * `sink` receives (results, batchId) with the search schema
    * (probe_id, rn, cand_id, sim). Returns the configured writer — the
    * caller sets checkpoint/trigger options and calls `.start()`.
    */
  def ivfSearchStream(probes: DataFrame, indexPath: String, idCol: String,
      embCol: String, k: Int, nprobe: Int, quantized: Boolean = true)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    probes.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      val res =
        if (quantized) graft.api.Similarity.searchQuantizedIvfIndex(
          batch.sparkSession, indexPath, batch, idCol, embCol, k, nprobe)
        else graft.api.Similarity.searchIvfIndex(
          batch.sparkSession, indexPath, batch, idCol, embCol, k, nprobe)
      sink(res, batchId)
    }

  /** Live near-dup candidate lookups over the persisted MinHash text
    * index ([[graft.api.TextIndex]]) — the text-side twin of
    * [[ivfSearchStream]]: each micro-batch of probe documents is
    * signed with the index's stored parameters and searched against
    * the band files as they stand, so
    * [[graft.api.TextIndex.appendToMinhashIndex]] ingest lands for the
    * NEXT batch's probes without a restart.
    */
  def minhashSearchStream(probes: DataFrame, indexPath: String, idCol: String,
      textCol: String, minEstJaccard: Double = 0.0)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    probes.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      sink(graft.api.TextIndex.searchMinhashIndex(
        batch.sparkSession, indexPath, batch.toDF(), idCol, textCol,
        minEstJaccard), batchId)
    }

  /** One micro-batch of the semantic-dedup ingest loop, REPLAY-SAFE:
    * judge the batch against the index as it stands
    * ([[graft.api.Similarity.semanticDedupAgainstIvfIndex]],
    * materialized BEFORE any write so the append below cannot feed the
    * plan that computes it), append the admitted rows
    * ([[graft.api.Similarity.appendToIvfIndex]]) unless this batchId is
    * already in the index's `ingest_log`, and return the admitted
    * frame. A replayed batch recomputes the SAME admitted set against
    * the post-append index: its own rows are excluded by id from
    * dominating themselves, every original dropper is still present,
    * and an originally-admitted row's siblings were admitted precisely
    * because nothing at ≥ threshold separates them — so re-judging is
    * deterministic and the skipped append keeps the index
    * exactly-once.
    */
  def semanticDedupIngestBatch(batch: DataFrame, batchId: Long,
      indexPath: String, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val admitted = graft.api.Similarity.semanticDedupAgainstIvfIndex(
      spark, indexPath, batch, idCol, embCol, threshold).localCheckpoint()
    val logPath = s"$indexPath/ingest_log"
    val replayed =
      try spark.read.parquet(logPath)
        .filter(col("batch_id") === batchId).limit(1).count() > 0
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (!replayed && !admitted.isEmpty) {
      graft.api.Similarity.appendToIvfIndex(
        admitted.drop("cluster", "norm"), idCol, embCol, indexPath)
      import spark.implicits._
      Seq(batchId).toDF("batch_id").write.mode("append").parquet(logPath)
    }
    admitted
  }

  /** Continuous semantic-dedup INGEST over a maintained persisted IVF
    * index — the admission gate in front of [[ivfSearchStream]]'s
    * serving loop: every micro-batch is deduplicated against the whole
    * corpus-so-far (index cells, dynamic-partition-pruned to the cells
    * the batch touches) AND against itself, and only the admitted rows
    * are appended — so batch N+1 dedupes against batch N's admissions
    * with no restart and no state store (the index IS the state,
    * shared with every other reader). `sink` receives (admitted,
    * batchId); replay safety and exactly-once appends are
    * [[semanticDedupIngestBatch]]'s contract.
    */
  def semanticDedupIngestStream(batches: DataFrame, indexPath: String,
      idCol: String, embCol: String, threshold: Double)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    batches.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(semanticDedupIngestBatch(batch, batchId, indexPath, idCol,
          embCol, threshold), batchId)
    }

  /** Continuous incremental maintenance of a persisted near-dup graph
    * ([[graft.api.DupGraph]], built with `storeDocs = true`) — the
    * live twin of the q362 batch build: every micro-batch of arriving
    * documents is LSH-signed, paired batch×batch and batch×corpus-so-far
    * (the artifact's own docs store — the graph IS the state, no state
    * store), verified to exact Jaccard ≥ the artifact's tau, and the
    * new edges + the batch's docs appended batch_id-idempotently
    * ([[graft.api.DupGraph.ingestBatch]]'s replay contract). Graph
    * analytics sessions keep reading the same artifact and see each
    * batch's edges as soon as its append commits — compactions and
    * stats refreshes land as [[graft.api.GenDir]] generations, so no
    * reader ever observes a missing subtable.
    *
    * AUTO-MAINTENANCE: after every batch the loop runs
    * [[graft.api.DupGraph.maintain]] with `maintainMaxFiles` — a cheap
    * file-count listing that compacts every subtable AND refreshes
    * `degrees/`/`meta/` only when append debris crossed the threshold —
    * so a long ingest session can never degrade into a small-files scan
    * without operator action. Running it inside the same foreachBatch
    * loop as the appends is precisely the single-writer discipline the
    * compaction's listing-compare assumes: maintenance can never race
    * its own ingest. Pass `maintainMaxFiles = Int.MaxValue` to disable
    * and manage maintenance externally. `sink` receives
    * (newEdges, batchId) — materialized before any compaction runs.
    */
  def dupGraphIngestStream(batches: DataFrame, graphPath: String,
      idCol: String, textCol: String, maintainMaxFiles: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    batches.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(graft.api.DupGraph.ingestBatch(batch.toDF(), batchId, graphPath,
          idCol, textCol), batchId)
        if (maintainMaxFiles != Int.MaxValue)
          graft.api.DupGraph.maintain(batch.sparkSession, graphPath,
            maintainMaxFiles)
        ()
    }

  /** Continuous DSIR admission gate — the quality counterpart of
    * [[semanticDedupIngestStream]]'s dedup gate: every micro-batch of
    * incoming documents is scored against a bucket table trained ONCE
    * on a reference corpus ([[graft.api.Sampling.dsirBucketTable]],
    * localCheckpoint'd at stream start so no batch re-derives the
    * training plan), and only rows whose integer log-likelihood-ratio
    * weight clears `minWeightMicros` reach the sink (with their
    * `w_micros` attached). Scoring is STATELESS per batch — a
    * broadcast join against the ≤ 4096-row table plus one doc-keyed
    * aggregate — so replays are trivially deterministic and the gate
    * needs no state store. `sink` receives (admitted, batchId).
    */
  def dsirGateStream(batches: DataFrame, bucketTable: DataFrame,
      idCol: String, textCol: String, minWeightMicros: Long)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lr = bucketTable.localCheckpoint()
    batches.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val scored = graft.api.Sampling.dsirScoreAgainst(batch, idCol, textCol, lr)
        val admitted = batch.join(
          scored.filter(col("w_micros") >= minWeightMicros)
            .select(col(idCol), col("w_micros")), Seq(idCol))
        sink(admitted, batchId)
    }
  }

  /** One parsed record on the checkpoint-tracker path. */
  case class SeqRecord(streamName: String, sequenceNumber: String, commitTimestamp: String)

  /** Tracker state: the highest sequence seen and its commit timestamp. */
  case class CheckpointState(maxSeqLen: Int, maxSeq: String, commitTimestamp: String)

  /** Emitted on every state change. */
  case class CheckpointUpdate(streamName: String, lastReplicatedCommitTimestamp: String)

  /** Custom keyed state via flatMapGroupsWithState: maintains the
    * max-sequence commit timestamp per stream ACROSS micro-batches (the
    * reference's checkpoint item, Handler.java:129-137, as long-lived
    * operator state instead of a per-batch aggregate) and emits an update
    * only when the frontier advances — the op-7 semantics with
    * write-on-change instead of write-per-record. Sequence order is the
    * numeric-string order ((length, lex) — Parsing.sequenceOrderKey).
    */
  def runningCheckpoint(spark: SparkSession, records: DataFrame): Dataset[CheckpointUpdate] = {
    import spark.implicits._
    records
      .select($"streamName", $"sequenceNumber", $"commitTimestamp")
      .as[SeqRecord]
      .groupByKey(_.streamName)
      .flatMapGroupsWithState[CheckpointState, CheckpointUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (stream: String, recs: Iterator[SeqRecord], state: GroupState[CheckpointState]) =>
          val incoming = recs.maxByOption(r => (r.sequenceNumber.length, r.sequenceNumber))
          incoming match {
            case None => Iterator.empty
            case Some(top) =>
              val ord = Ordering.Tuple2[Int, String]
              val advanced = state.getOption.forall(s =>
                ord.gt((top.sequenceNumber.length, top.sequenceNumber), (s.maxSeqLen, s.maxSeq)))
              if (advanced) {
                state.update(CheckpointState(
                  top.sequenceNumber.length, top.sequenceNumber, top.commitTimestamp))
                Iterator.single(CheckpointUpdate(stream, top.commitTimestamp))
              } else Iterator.empty
          }
      }
  }
}
