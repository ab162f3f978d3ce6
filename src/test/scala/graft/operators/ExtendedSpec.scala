package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtendedSpec extends SparkSpec {

  test("q68 hash sample is deterministic and a strict subset") {
    val a = Extended.q68HashSample(spark, sf).collect().toSeq
    val b = Extended.q68HashSample(spark, sf).collect().toSeq
    assert(a === b)
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    val sampled = a.map(_.getLong(1)).sum
    assert(sampled > 0 && sampled < total)
  }

  test("q71 range frame equals the self-join formulation of a 30-day trailing sum") {
    import spark.implicits._
    val framed = Extended.q71RangeFrames(spark, sf)
      .select($"o_orderkey", $"trail30_n")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_custkey" < 100)
      .withColumn("day", datediff($"o_orderdate", graft.Util.ldt("1992-01-01T00:00:00")).cast("long"))
      .select($"o_orderkey", $"o_custkey", $"day")
    val joined = orders.as("a").join(orders.as("b"),
        $"a.o_custkey" === $"b.o_custkey" &&
          $"b.day" >= $"a.day" - 30 && $"b.day" <= $"a.day")
      .groupBy($"a.o_orderkey".as("o_orderkey"))
      .agg(count(lit(1)).as("trail30_n"))
    assert(framed.join(joined, "o_orderkey")
      .filter(framed("trail30_n") =!= joined("trail30_n")).count() === 0)
    assert(framed.count() > 0)
  }

  test("q67 calendar scaffold emits every month exactly once") {
    val rows = Extended.q67CalendarJoin(spark, sf).collect()
    assert(rows.length === 24)
    assert(rows.map(_.getDate(0).toString).distinct.length === 24)
    assert(rows.forall(_.getLong(1) >= 0))
  }

  test("q66 subquery result agrees with the join formulation") {
    import spark.implicits._
    val viaSql = Extended.q66Subqueries(spark, sf)
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val avgBal = cust.agg(
      (sum($"c_acctbal".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("a"))
      .collect()(0).getDouble(0)
    val viaJoin = cust.filter($"c_acctbal" > avgBal)
      .join(orders.select($"o_custkey").distinct(), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_cust"))
    assert(viaSql.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      viaJoin.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }
}
