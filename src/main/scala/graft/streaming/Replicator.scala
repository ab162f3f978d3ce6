package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The reference pipeline (SURVEY.md §2.A ops 1–10) re-expressed as one
  * Structured Streaming job: Kinesis-shaped source → active-region gate
  * (broadcast semi-join, op 3) → decode + JSON extraction (ops 4–5) →
  * per-micro-batch forward to the target-region table (op 6) + checkpoint
  * upsert (op 7) + metrics (ops 8/10). One micro-batch ≡ one Lambda
  * invocation (SURVEY §3.1).
  *
  * Designed-in improvements over the reference (SURVEY §4):
  *   - the per-record `putRecord`/`PutItem` loop (Handler.java:84-85)
  *     becomes batched writes + ONE checkpoint row per (stream, batch) via
  *     `max_by` — O(streams) instead of O(records) writes;
  *   - offset recovery comes from Structured Streaming's
  *     `checkpointLocation`. The CHECKPOINT TABLE is idempotent under
  *     batch replay (last-writer-wins partition overwrite); the record
  *     TARGET is append-mode and therefore at-least-once — a replayed
  *     micro-batch duplicates its records there, exactly the duplicate-
  *     acceptance semantics the reference documents (README.md:72-75;
  *     SURVEY §7.4 covers the coarser-than-per-record resume granularity).
  *
  * Scale: gate + checkpoint shuffle only O(#streams) rows; the record path
  * is narrow (decode/parse fused into one codegen stage) and writes
  * partitioned by streamName so per-shard ordering can be restored via
  * sortWithinPartitions on the numeric sequence order.
  */
object Replicator {

  val payloadSchema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("commitTimestamp", StringType)))

  /** Numeric-string ordering for sequence numbers ((length, lex) — see
    * [[graft.functions.Parsing.sequenceOrderKey]]).
    */
  private def seqOrder = struct(length(col("sequenceNumber")), col("sequenceNumber"))

  /** Op 2: stream name from the event-source ARN (Handler.java:169-171). */
  def streamNameCol(arn: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(split(arn, ":").getItem(5), "/").getItem(1)

  /** Ops 3's config validation: a stream is active iff it has exactly one
    * config row whose region case-insensitively equals `currentRegion`
    * (Handler.java:152-166: missing → inactive, duplicate → inactive,
    * mismatch → inactive).
    */
  def activeStreams(config: DataFrame, currentRegion: String): DataFrame = {
    config.groupBy(col("streamName"))
      .agg(count(lit(1)).as("n_cfg"), max(col("activeRegion")).as("region"))
      .filter(col("n_cfg") === 1 && lower(col("region")) === lower(lit(currentRegion)))
      .select(col("streamName"))
  }

  /** Op 3: the gate as a broadcast left-semi join. */
  def gate(records: DataFrame, config: DataFrame, currentRegion: String): DataFrame =
    records.join(broadcast(activeStreams(config, currentRegion)), Seq("streamName"), "left_semi")

  /** Ops 4+5: decode payload bytes to UTF-8 and extract the CDC fields
    * (schema-on-read, commitTimestamp kept as string — Handler.java:74,86).
    */
  def parse(records: DataFrame): DataFrame = {
    val json = from_json(col("data").cast("string"), payloadSchema)
    records
      .withColumn("payload_text", col("data").cast("string"))
      .withColumn("cdc_key", json.getField("key"))
      .withColumn("commitTimestamp", json.getField("commitTimestamp"))
  }

  /** Op 7 as a batch aggregate: latest (by sequence order) commit
    * timestamp per stream — one row per (stream, batch).
    */
  def checkpointRows(batch: DataFrame): DataFrame =
    batch.groupBy(col("streamName"))
      .agg(max_by(col("commitTimestamp"), seqOrder).as("lastReplicatedCommitTimestamp"))

  /** Op 8: the per-batch metrics the reference logs (Handler.java:94-98):
    * batch size, successes, replication lag vs the latest arrival.
    */
  def metricsRows(batch: DataFrame, batchId: Long, nowMs: Long): DataFrame =
    batch.groupBy(col("streamName"))
      .agg(
        count(lit(1)).as("batchSize"),
        count(lit(1)).as("successful"),
        ((lit(nowMs) - unix_millis(max(col("approximateArrivalTimestamp")))) / 1000.0)
          .as("replicationLagSeconds"))
      .withColumn("batchId", lit(batchId))

  /** The full pipeline: returns a started streaming query writing
    *   - forwarded records → `targetDir` (partitioned by streamName,
    *     in-partition ordered by sequence number — op 6),
    *   - checkpoint upserts → `checkpointTableDir` (dynamic partition
    *     overwrite = last-writer-wins per stream — op 7),
    *   - metrics → `metricsDir` (append, best-effort — ops 8/10).
    *
    * The gate re-reads `configDir` every micro-batch, so a failover (flip
    * of the activeRegion row, SURVEY §3.2) takes effect on the next batch
    * without a restart.
    */
  def run(
      spark: SparkSession,
      records: DataFrame,
      configDir: String,
      currentRegion: String,
      targetDir: String,
      checkpointTableDir: String,
      metricsDir: String,
      streamCheckpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    parse(records)
      .observe("replicator", count(lit(1)).as("records"),
        max(col("approximateArrivalTimestamp")).as("lastArrival"))
      .writeStream
      .option("checkpointLocation", streamCheckpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        runBatch(spark, batch, batchId, configDir, currentRegion, targetDir,
          checkpointTableDir, metricsDir)
        ()
      }
      .start()
  }

  private def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      configDir: String, currentRegion: String, targetDir: String,
      checkpointTableDir: String, metricsDir: String): Unit = {
    val config = spark.read.parquet(configDir)
    val gated = gate(batch, config, currentRegion).cache()
    try {
      // Op 6: batched forward, shard order restored per partition.
      gated
        .repartition(col("streamName"))
        .sortWithinPartitions(length(col("sequenceNumber")), col("sequenceNumber"))
        .select("streamName", "partitionKey", "sequenceNumber", "data",
          "approximateArrivalTimestamp", "cdc_key", "commitTimestamp")
        .write.mode("append").partitionBy("streamName").parquet(targetDir)
      // Op 7: one checkpoint row per stream, last-writer-wins. The
      // dynamic overwrite is scoped to THIS write (not session conf)
      // so unrelated overwrite writes keep their default semantics.
      checkpointRows(gated)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("streamName").parquet(checkpointTableDir)
      // Ops 8/10: metrics off the data path, failures swallowed
      // (Handler.java:120-122).
      try metricsRows(gated, batchId, System.currentTimeMillis())
        .write.mode("append").parquet(metricsDir)
      catch { case e: Exception => System.err.println(s"[replicator] metrics write failed: $e") }
    } finally gated.unpersist()
  }

  /** Post-run maintenance for the op-6 target table: streaming appends
    * leave one file per stream partition per micro-batch, which at
    * production batch cadence degrades every later scan
    * (footer-per-file overhead, no row-group locality).
    * [[Maintenance.compact]] rewrites the table to ≤ `filesPerPartition`
    * files per streamName; `bucketTable = Some((name, buckets))`
    * additionally re-publishes it as a catalog table bucketed+sorted on
    * streamName, so repeated downstream per-stream joins/aggregations
    * run shuffle-free ([[graft.api.Layout]]). Run between streaming
    * restarts (the compaction swap must not race a live appender).
    */
  def maintainTarget(spark: SparkSession, targetDir: String,
      filesPerPartition: Int = 1,
      bucketTable: Option[(String, Int)] = None): Unit = {
    Maintenance.compact(spark, targetDir, "streamName", filesPerPartition)
    bucketTable.foreach { case (name, buckets) =>
      graft.api.Layout.writeBucketed(spark.read.parquet(targetDir), name,
        buckets, Seq("streamName"), Seq("streamName"))
    }
  }
}
