package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Offline stand-ins for the Kinesis source (SURVEY §1.4): the zero-egress
  * harness simulates the connector with file/rate sources producing the
  * exact envelope schema a Kinesis connector would
  * ([[graft.streaming.KinesisRecord]]); swapping in a real connector is a
  * one-line change at the `readStream` call site.
  */
object KinesisShapedSource {

  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType),
    StructField("streamName", StringType)))

  /** Streaming source over a directory of envelope-schema parquet files
    * (new files ≈ new shard batches; `maxFilesPerTrigger` ≈ the
    * reference's ESM BatchSize cap, template.yaml:110).
    */
  def fromParquetDir(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Synthetic CDC record stream from the rate source: `rowsPerSecond`
    * records of `{"key": n, "commitTimestamp": iso}` round-robined over
    * `numStreams` stream names — for load/soak testing the pipeline
    * without any stored data.
    */
  def synthetic(spark: SparkSession, rowsPerSecond: Int = 1000,
      numStreams: Int = 4): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        to_json(struct(
          col("value").as("key"),
          date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("commitTimestamp")))
          .cast("binary").as("data"),
        pmod(col("value"), lit(97)).cast("string").as("partitionKey"),
        col("value").cast("string").as("sequenceNumber"),
        col("timestamp").as("approximateArrivalTimestamp"),
        concat(lit("kds-stream-"), pmod(col("value"), lit(numStreams))).as("streamName"))

  /** Batch envelope table derived from the `events` testdata table
    * (FIXTURES.md role mapping) — the input ReplicatorDemo materializes.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    graft.Util.events(spark, sfDir)
      .select(
        to_json(struct(
          col("event_id").as("key"),
          date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .as("commitTimestamp"))).cast("binary").as("data"),
        col("user_id").cast("string").as("partitionKey"),
        col("event_id").cast("string").as("sequenceNumber"),
        timestamp_micros(expr("ts div 1000")).as("approximateArrivalTimestamp"),
        col("event_type").as("streamName"))
}
