package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout utilities for repeated large-scale joins/aggregations:
  * bucketing co-locates both sides of an equi-join at WRITE time, so
  * every subsequent join/aggregation on the bucket keys runs with ZERO
  * shuffle — the decisive optimization when a 100 TB fact table is
  * joined on the same key by many queries.
  *
  * Spark persists bucket metadata in the session catalog
  * (`saveAsTable`), and the scan reports one InputPartition per bucket;
  * `spark.sql.sources.bucketing.enabled` (default true) lets the planner
  * drop the Exchange on matching bucket specs.
  */
object Layout {

  /** Write `df` as a bucketed+sorted catalog table. `numBuckets` should
    * be sized so one bucket of the LARGER table fits an executor's
    * memory comfortably (e.g. 100 TB / 8192 buckets ≈ 12 GB per bucket
    * pre-compression).
    */
  def writeBucketed(df: DataFrame, tableName: String, numBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    var w = df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(tableName)
  }

  /** Read back a bucketed table (bucket metadata comes from the catalog,
    * so the optimizer can elide exchanges on bucket-key joins/aggs).
    */
  def readBucketed(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketing is meant to buy for bucket-key joins.
    * Counts actual [[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]]
    * nodes (descending into adaptive plans and materialized query
    * stages) rather than string-matching the plan text, so range
    * partitioning, single-partition exchanges, and AQE's re-printed
    * shuffles all count.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(shuffles).sum
    }
    shuffles(df.queryExecution.executedPlan) == 0
  }
}
