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

  test("exactQuantiles is bit-identical to Spark's percentile builtin (global, lineitem)") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val mine = Extended.exactQuantiles(li, "l_extendedprice", ps)
    val builtin = li.agg(expr(
      s"percentile(l_extendedprice, array(${ps.mkString(",")}))").as("v"))
      .head().getSeq[Double](0)
    // bitwise, not approximate: the search pins order statistics to exact
    // doubles and interpolates with Spark's own association order
    assert(mine.map(java.lang.Double.doubleToLongBits) ===
      builtin.map(java.lang.Double.doubleToLongBits))
  }

  test("exactQuantilesBy matches the builtin per group and handles skewed/duplicate data") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ps = Seq(0.05, 0.5, 0.95)
    val mine = Extended.exactQuantilesBy(li, "l_returnflag", "l_quantity", ps)
    val builtin = li.groupBy($"l_returnflag")
      .agg(expr(s"percentile(l_quantity, array(${ps.mkString(",")}))").as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(mine.keySet.map(_.asInstanceOf[String]) === builtin.keySet)
    for ((g, vs) <- mine)
      assert(vs.map(java.lang.Double.doubleToLongBits) ===
        builtin(g.asInstanceOf[String]).map(java.lang.Double.doubleToLongBits),
        s"group $g")
    // adversarial local data: negatives, heavy duplicates, a null, n=1 group
    val odd = Seq(
      ("a", -5.5), ("a", -5.5), ("a", -5.5), ("a", 0.0), ("a", 1e300),
      ("b", 2.0), ("b", 2.0),
      ("c", -0.0)).toDF("g", "v")
      .union(Seq(("a", Option.empty[Double])).toDF("g", "v"))
    val oddMine = Extended.exactQuantilesBy(odd, "g", "v", Seq(0.0, 0.3, 0.5, 1.0))
    val oddRef = odd.groupBy($"g")
      .agg(expr("percentile(v, array(0.0, 0.3, 0.5, 1.0))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for ((g, vs) <- oddMine)
      assert(vs.map(java.lang.Double.doubleToLongBits) ===
        oddRef(g.asInstanceOf[String]).map(java.lang.Double.doubleToLongBits),
        s"group $g")
  }

  test("exactQuantiles fallback: maxCollect=0 forces the O(1)-state bisection, still bit-identical") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ps = Seq(0.25, 0.5, 0.9)
    val viaBisection = Extended.exactQuantilesMulti(
      li, Some("l_returnflag"), Seq("l_extendedprice" -> ps), maxCollect = 0L)
    val builtin = li.groupBy($"l_returnflag")
      .agg(expr(s"percentile(l_extendedprice, array(${ps.mkString(",")}))").as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for ((g, m) <- viaBisection; (p, i) <- ps.zipWithIndex)
      assert(java.lang.Double.doubleToLongBits(m(("l_extendedprice", p))) ===
        java.lang.Double.doubleToLongBits(builtin(g.asInstanceOf[String])(i)),
        s"group $g p=$p")
  }

  test("exactQuantilesMulti: several columns share one pass and match the builtins") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val m = Extended.exactQuantilesMulti(li, Some("l_returnflag"), Seq(
      "l_extendedprice" -> Seq(0.5),
      "l_discount" -> Seq(0.25, 0.9)))
    val ref = li.groupBy($"l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.5)").as("m"),
      expr("percentile(l_discount, 0.25)").as("d25"),
      expr("percentile(l_discount, 0.9)").as("d90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for ((g, vals) <- m) {
      val (rm, rd25, rd90) = ref(g.asInstanceOf[String])
      assert(vals(("l_extendedprice", 0.5)) === rm)
      assert(vals(("l_discount", 0.25)) === rd25)
      assert(vals(("l_discount", 0.9)) === rd90)
    }
  }

  test("bracketEpsFor: the polish path survives synthetic large-n corpora (r6 verdict #6)") {
    val cap = 1L << 20
    // small corpus: the widest (safest) rung
    assert(Extended.bracketEpsFor(1000000L, cap) === Extended.EpsLadder.head)
    // past n ≈ 2.6e8 the old fixed 0.002 margin overflows the cap
    // (2·0.002·n > 2^20); the ladder steps down and the expected mass
    // STILL fits the collect cap
    for (n <- Seq(300000000L, 1000000000L, 2000000000L)) {
      val eps = Extended.bracketEpsFor(n, cap)
      assert(eps < Extended.EpsLadder.head, s"n=$n must step down the ladder")
      assert(2.0 * eps * n <= cap,
        s"n=$n: chosen width $eps must keep the bracket collectable")
    }
    // beyond the floor's reach the choice pins to the floor (never
    // below sketch resolution); pass 2's measured mass then diverts to
    // bisection instead of collecting
    assert(Extended.bracketEpsFor(100000000000L, cap) === Extended.EpsLadder.last)
    // degenerate cap: floor again (nothing will collect; bisection path)
    assert(Extended.bracketEpsFor(1000L, 0L) === Extended.EpsLadder.last)
  }

  test("pass-3 global budget: a tiny maxCollect chunks the polish and stays bit-identical") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    // l_quantity is 50 distinct integer values — every bracket carries
    // heavy duplicate mass, so a 150-value budget forces brackets that
    // individually fit to SHARE jobs in chunks (the advice scenario: the
    // old single pass-3 job summed every bracket into one agg row)
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val mine = Extended.exactQuantilesMulti(
      li, Some("l_returnflag"), Seq("l_quantity" -> ps), maxCollect = 150L)
    val builtin = li.groupBy($"l_returnflag")
      .agg(expr(s"percentile(l_quantity, array(${ps.mkString(",")}))").as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for ((g, m) <- mine; (p, i) <- ps.zipWithIndex)
      assert(java.lang.Double.doubleToLongBits(m(("l_quantity", p))) ===
        java.lang.Double.doubleToLongBits(builtin(g.asInstanceOf[String])(i)),
        s"group $g p=$p")
  }

  test("q317 bucketed two-phase rank is bit-identical to the global-window formulation") {
    // r13 optimization: q317's per-layout file assignment runs as
    // bucket-offset + within-bucket row_number instead of one global
    // row_number window per layout (a single-task sort at scale). This
    // pins the bit-identity claim: fid boundaries — hence every file's
    // count and min/max stats — must match the single-window reference.
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val got = Extended.q317ZorderLayout(spark, sf).collect().toSeq
    // reference: the pre-r13 shape — same normalization/morton/stack,
    // one global row_number per layout
    def morton(shift: (String, Int) => String): String =
      (0 until 16).flatMap { i =>
        Seq(s"(${shift("pm", i)} & 1) * ${1L << (2 * i + 1)}",
          s"(${shift("sm", i)} & 1) * ${1L << (2 * i)}")
      }.mkString(" + ")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val keyBounds = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(count(lit(1)).as("n_rows"),
        min($"l_partkey").as("p_min"), max($"l_partkey").as("p_max"),
        min($"l_suppkey").as("s_min"), max($"l_suppkey").as("s_max"))
      .localCheckpoint()
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey".as("p"), $"l_suppkey".as("s"),
        $"l_orderkey".as("ok"), $"l_linenumber".as("ln"))
      .crossJoin(broadcast(keyBounds.drop("n_rows")))
      .withColumn("pm", expr("((p - p_min) * 65536) div (p_max - p_min + 1)"))
      .withColumn("sm", expr("((s - s_min) * 65536) div (s_max - s_min + 1)"))
      .withColumn("z", expr(morton((c, i) => s"shiftright($c, $i)")))
      .select($"p", $"s", $"ok", $"ln",
        expr("stack(3, 'partkey', p, 'suppkey', s, 'zorder', z)")
          .as(Seq("layout", "k")))
    val w = Window.partitionBy($"layout").orderBy($"k", $"ok", $"ln")
    val files = rows
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("fid", expr("rn div 4096"))
      .groupBy($"layout", $"fid")
      .agg(count(lit(1)).as("n"), min($"p").as("pmin"), max($"p").as("pmax"),
        min($"s").as("smin"), max($"s").as("smax"))
    val bounds = keyBounds.select($"n_rows",
      ($"p_max" - $"p_min").as("p_range"),
      ($"s_max" - $"s_min").as("s_range"))
    val want = files.crossJoin(broadcast(bounds))
      .groupBy($"layout")
      .agg(count(lit(1)).as("n_files"),
        sum($"n".cast(dec) * ($"pmax" - $"pmin").cast(dec)).as("p_mass"),
        sum($"n".cast(dec) * ($"smax" - $"smin").cast(dec)).as("s_mass"),
        max($"n_rows").as("n_rows"), max($"p_range").as("p_range"),
        max($"s_range").as("s_range"))
      .select($"layout", $"n_files",
        round($"p_mass".cast("double") /
          ($"n_rows".cast("double") * $"p_range"), 6)
          .as("part_scan_fraction"),
        round($"s_mass".cast("double") /
          ($"n_rows".cast("double") * $"s_range"), 6)
          .as("supp_scan_fraction"))
      .orderBy($"layout")
      .collect().toSeq
    assert(got === want)
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
