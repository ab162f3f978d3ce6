package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator category from SURVEY.md §2 contributes named queries
  * here; each query paired with DuckDB oracle SQL in [[oracleSql]] is
  * hash-compared by the driver at sf0.01. Queries without an oracle entry
  * (engine-specific sketches) get a rows-only check and are covered by
  * ScalaTest instead.
  */
object SparkEntry {

  /** Session settings every entry point needs: UTC, nanos-as-long for the
    * events table (parquet TIMESTAMP(NANOS)), AQE on.
    */
  def configure(builder: SparkSession.Builder): SparkSession.Builder = builder
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    // the suite generates far more codegen fragments than the default
    // 100-entry class cache; evictions trigger janino recompile storms
    // that slow late-suite queries 10-30x (static conf — must be set
    // before the session exists). 5000 sufficed at 55 queries; at 266
    // queries the Bench's two temporally-separated passes churned even
    // that (pass 2 re-paid multi-second compiles for wide-aggregate
    // plans like q188's 64-slot fold), so size it to hold the whole
    // suite's fragments: ~25k entries of compiled-class bytecode is a
    // few hundred MB against the 128 GiB heap.
    .config("spark.sql.codegen.cache.maxEntries", "25000")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04JoinMultiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    (Relational.queries ++ EventOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      Extended.queries ++ SamplingOps.queries ++ graft.api.Stats.queries ++
      GovernanceOps.queries ++ ModelOps.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q09_agg_approx: HLL sketch values are engine-specific, so it gets
    * the driver's rows-only check; its QUANTITATIVE grade is the
    * tolerance check in tools/check_oracle.py — Spark's and DuckDB's
    * approx_count_distinct each within 5% relative error of the exact
    * twin — plus the ±5%-of-exact bound in OperatorSpec).
    */
  val oracleSql: Map[String, String] =
    (Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ MultimodalOps.oracles ++
      Extended.oracles ++ SamplingOps.oracles ++ graft.api.Stats.oracles ++
      GovernanceOps.oracles ++ ModelOps.oracles).toMap
}
