package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the graft query suite.
  *
  * Conventions that keep every query hash-identical to the DuckDB oracle:
  *   - Float aggregates go through exact DECIMAL sums and are cast back to
  *     DOUBLE at the end (summation-order independent, engine independent).
  *   - `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as a bigint
  *     (spark.sql.legacy.parquet.nanosAsLong=true) and we expose epoch
  *     milliseconds via integer division (floor), matching DuckDB
  *     `epoch_ms(ts)`.
  *   - Computed integer columns are cast to LongType (DuckDB aggregates and
  *     date parts produce BIGINT).
  *   - Every query ends in a total `orderBy` so row order matches the ORDER
  *     BY of the oracle SQL.
  */
object Util {
  /** A named query over one scale-factor directory — the SparkEntry shape. */
  type Q = (SparkSession, String) => DataFrame

  /** The testdata files are single-row-group parquet — unsplittable, so a
    * bare scan is ONE task no matter the cluster size and every narrow
    * compute stage (JSON parse, hashing, percentile partials) runs
    * serially. Big tables are therefore spread by their primary key right
    * after the scan: hash partitioning on the PK parallelizes narrow
    * work AND satisfies the distribution requirement of PK equi-joins
    * and PK aggregations, so those reuse it instead of shuffling again.
    * (On a real multi-file/multi-row-group layout the scan splits
    * naturally and this map would be empty.)
    */
  private val spreadKey = Map(
    "lineitem" -> "l_orderkey",
    "orders" -> "o_orderkey",
    "customer" -> "c_custkey",
    "part" -> "p_partkey",
    "events" -> "event_id",
    "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df = if (name == "events") normalizeEventTs(raw) else raw
    spreadKey.get(name).fold(df)(k => df.repartition(col(k)))
  }

  /** The suite computes event time in a single convention: `ts` = bigint
    * epoch NANOS. Historic testdata wrote parquet TIMESTAMP(NANOS) (read as
    * that long directly via nanosAsLong); current testdata writes
    * TIMESTAMP(MICROS), which Spark surfaces as TIMESTAMP_NTZ. Normalize at
    * the scan: the session is UTC, so the NTZ wall clock IS the epoch and
    * `unix_micros` × 1000 reproduces the nanos column exactly (micros
    * precision ⇒ the low 3 digits are zero on both engines).
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }

  /** The raw single-partition scan (for broadcast-only dims or tests). */
  def rawTable(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts_ms`: epoch millis as long (floor of the nanos column). */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").withColumn("ts_ms", expr("ts div 1000000"))

  /** Exact sum of a 2-decimal monetary/quantity double, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a derived value on a 1e-6 grid (e.g. price*(1-disc)). */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Replay guard for batch_id-tagged idempotent append state: true iff
    * `path` already holds a COMMITTED row for `batchId`. A path that
    * exists but holds no readable parquet data (the debris of a write
    * that died before its first commit) reads as "not applied" instead
    * of throwing — the bare `spark.read.parquet` would otherwise fail
    * on every retry and permanently wedge the foreachBatch stream that
    * owns the state. ONLY that schema-inference/empty-dir
    * AnalysisException is swallowed: any other read failure (transient
    * IO, a corrupt file alongside committed data) rethrows and fails
    * the batch, because answering "not applied" there would re-append
    * rows that may already be committed and double-count every
    * sum-merged table downstream.
    */
  def batchAlreadyApplied(spark: SparkSession, path: String,
      batchId: Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && (try {
      !spark.read.parquet(path).filter(col("batch_id") === batchId).isEmpty
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getErrorClass != null &&
            (e.getErrorClass.contains("UNABLE_TO_INFER_SCHEMA") ||
              e.getErrorClass.contains("PATH_NOT_FOUND")) => false
    })
  }

  /** TIMESTAMP_NTZ literal (the testdata date columns are NTZ). */
  def ldt(s: String): Column = lit(java.time.LocalDateTime.parse(s))
}
