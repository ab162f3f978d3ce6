package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spot-checks of the relational suite against independently computed
  * expectations (collect + plain Scala), complementing the DuckDB
  * differential the driver runs.
  */
class OperatorSpec extends SparkSpec {

  test("q09: approx_count_distinct within 5% of exact") {
    val rows = Relational.q09AggApprox(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders"))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact off by >5%")
    }
  }

  test("q15: global top-k equals collect-and-sort") {
    import spark.implicits._
    val got = Relational.q15TopkGlobal(spark, sf).select($"o_orderkey").collect().map(_.getLong(0))
    val want = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (k, p) => (-p, k) }.take(25).map(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("q12: row_number is a total order within each partition") {
    val rows = Relational.q12WindowRank(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      assert(grp.map(_.getAs[Long]("rn")).sorted.toSeq === (1L to grp.length).toSeq)
    }
  }

  test("q26: gate admits exactly the uniquely-configured active streams") {
    val types = EventOps.q26GateSemijoin(spark, sf).collect().map(_.getString(0)).toSet
    assert(types === Set("click", "error"))
  }

  test("q24: CDC latest-per-key picks the max event_id per user") {
    import spark.implicits._
    val got = EventOps.q24CdcLatest(spark, sf)
      .select($"user_id", $"last_event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"user_id").agg(max($"event_id").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
