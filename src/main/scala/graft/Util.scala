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

  /** Eagerly build a Bloom filter over a LONG hash expression of `df`,
    * returning the serialized filter bytes (null when `df` is empty).
    * Eager — not an inline aggregate subquery — for the reason
    * [[graft.api.Dedup]]'s gate documents: Spark re-validates the
    * bloom-aggregate size clamps (`runtime.bloomFilter.maxNumItems/
    * maxNumBits`) in CheckAnalysis on EVERY later Dataset composition,
    * so an embedded `bloom_filter_agg` would pin raised confs for the
    * frame's whole lifetime. Here the clamps are raised only around the
    * one-job build and restored before returning.
    */
  def bloomBytes(df: DataFrame, hashExpr: String, items: Long,
      bits: Long): Array[Byte] = {
    val sess = df.sparkSession
    graft.functions.BloomFunctions.register(sess)
    val ItemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val BitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    def raise(key: String, v: Long): Option[String] = {
      val cur = try sess.conf.getOption(key) catch { case _: Throwable => None }
      if (v > cur.map(_.toLong).getOrElse(0L)) { sess.conf.set(key, v.toString); cur }
      else None
    }
    val priorItems = raise(ItemsKey, items)
    val priorBits = raise(BitsKey, bits)
    try df.select(expr(s"bloom_filter_agg($hashExpr, ${items}L, ${bits}L)"))
      .head().getAs[Array[Byte]](0)
    finally {
      priorItems.foreach(sess.conf.set(ItemsKey, _))
      priorBits.foreach(sess.conf.set(BitsKey, _))
    }
  }

  /** Bounded driver-side fan-out pools for overlapping independent Spark
    * jobs (guide §2.6: 2-3 jobs in flight fills the scheduler tail;
    * unbounded fan-out just fights for executors). Two levels so that a
    * parent task awaiting its children can never starve them of threads:
    *
    *   - [[jobPool]] (4 threads) runs LEAF tasks only — each submits
    *     Spark jobs and returns; a jobPool task must never await another
    *     pool task.
    *   - [[queryPool]] (2 threads) runs query-level tasks that MAY await
    *     jobPool tasks (e.g. an artifact rebuild whose write fans its
    *     subtable publishes onto jobPool).
    *
    * The pool graph is a DAG (queryPool → jobPool → nothing), so no
    * interleaving can deadlock — the discipline the previous
    * ExecutionContext.global + `blocking` arrangement enforced only by
    * call-site convention. Threads are daemons; an abandoned task can
    * never pin JVM shutdown.
    */
  private def daemonPool(name: String, n: Int) =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(n,
        new java.util.concurrent.ThreadFactory {
          private val i = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"$name-${i.getAndIncrement()}")
            t.setDaemon(true); t
          }
        }))

  lazy val jobPool: scala.concurrent.ExecutionContextExecutorService =
    daemonPool("graft-job", 4)
  lazy val queryPool: scala.concurrent.ExecutionContextExecutorService =
    daemonPool("graft-query", 2)
}
