package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Brute-force recomputation checks for the governance (q221-q223),
  * model-evaluation (q224-q226), TPC-H-shape (q227-q230), decomposition
  * (q231) and graph-card (q232) queries, plus the live k-anonymity
  * ingest twin.
  */
class GovernanceModelSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def customers(): Array[(Int, String, Double)] = {
    import spark.implicits._
    graft.Util.rawTable(spark, sf, "customer")
      .select($"c_nationkey", $"c_mktsegment", $"c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
  }

  test("q221: k-anonymity bands match brute-force group sizes") {
    val ks = customers()
      .groupBy(c => (c._1, c._2, math.floor(c._3 / 1000.0).toLong))
      .values.map(_.size.toLong).toSeq
    def band(k: Long): Long =
      if (k == 1) 1L else if (k <= 4) 2L else if (k <= 9) 5L
      else if (k <= 19) 10L else 20L
    val want = ks.groupBy(band).map { case (b, g) =>
      b -> (g.size.toLong, g.sum)
    }
    val total = ks.sum.toDouble
    val rows = GovernanceOps.q221KAnonymity(spark, sf).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (ng, nr) = want(r.getAs[Long]("k_lo"))
      assert(r.getAs[Long]("n_groups") === ng)
      assert(r.getAs[Long]("n_rows") === nr)
      assert(math.abs(r.getAs[Double]("row_share") - nr / total) < 1e-6)
    }
    assert(math.abs(rows.map(_.getAs[Double]("row_share")).sum - 1.0) < 1e-5)
  }

  test("q222: l-diversity counts match brute-force distinct-sensitive sizes") {
    val gs = customers()
      .groupBy(c => (c._1, math.floor(c._3 / 2000.0).toLong)).values
      .map(g => (g.map(_._2).toSet.size.toLong, g.size.toLong)).toSeq
    val want = gs.groupBy(_._1).map { case (l, g) =>
      l -> (g.size.toLong, g.map(_._2).sum)
    }
    val rows = GovernanceOps.q222LDiversity(spark, sf).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (ng, nr) = want(r.getAs[Long]("l"))
      assert(r.getAs[Long]("n_groups") === ng)
      assert(r.getAs[Long]("n_rows") === nr)
    }
  }

  test("q223: generalization ladder matches per-width brute force; risk shrinks as buckets widen") {
    val cs = customers()
    val rows = GovernanceOps.q223GeneralizationLadder(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("width")).toSeq === Seq(500L, 1000L, 2000L, 4000L))
    rows.foreach { r =>
      val w = r.getAs[Long]("width")
      val ks = cs.groupBy(c => (c._1, c._2, math.floor(c._3 / w).toLong))
        .values.map(_.size.toLong).toSeq
      assert(r.getAs[Long]("n_groups") === ks.size.toLong)
      assert(r.getAs[Long]("n_violating_groups") === ks.count(_ < 5).toLong)
      assert(r.getAs[Long]("n_rows_at_risk") === ks.filter(_ < 5).sum)
      assert(r.getAs[Long]("k_min") === ks.min)
      assert(r.getAs[Boolean]("anonymous_k5") === ks.forall(_ >= 5))
    }
    val risk = rows.map(_.getAs[Long]("n_rows_at_risk")).toSeq
    assert(risk.zip(risk.tail).forall { case (a, b) => b <= a },
      s"coarser buckets must not increase risk: $risk")
  }

  test("live k-anonymity twin: 3-batch ingest + replay == batch audit") {
    import spark.implicits._
    val dir = tmpDir("kanon")
    val cust = graft.Util.rawTable(spark, sf, "customer")
      .select($"c_nationkey", $"c_mktsegment",
        org.apache.spark.sql.functions.expr(
          "CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").as("bal_kb"),
        $"c_custkey")
    val qi = Seq("c_nationkey", "c_mktsegment", "bal_kb")
    (0 until 3).foreach { i =>
      graft.streaming.StreamOps.kAnonymityIngestBatch(
        cust.filter($"c_custkey" % 3 === i).drop("c_custkey"),
        i.toLong, s"$dir/counts", qi)
    }
    // at-least-once replay of batch 1 must be a no-op
    graft.streaming.StreamOps.kAnonymityIngestBatch(
      cust.filter($"c_custkey" % 3 === 1).drop("c_custkey"),
      1L, s"$dir/counts", qi)
    val live = graft.streaming.StreamOps
      .kAnonymityReport(spark, s"$dir/counts", qi).collect()
    val batch = GovernanceOps.q221KAnonymity(spark, sf).collect()
    assert(live.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  private def scoredRows(): Array[(Double, Long)] = {
    import spark.implicits._
    graft.Util.rawTable(spark, sf, "lineitem")
      .select($"l_discount", $"l_quantity", $"l_returnflag").collect()
      .map { r =>
        val z = r.getDouble(0) * 10 + r.getDouble(1) / 10.0
        (round6(z / (z + 1.0)), if (r.getString(2) == "R") 1L else 0L)
      }
  }

  test("q224: AUC matches the brute-force pairwise concordance probability") {
    val s = scoredRows()
    val pos = s.filter(_._2 == 1L).map(_._1)
    val neg = s.filter(_._2 == 0L).map(_._1)
    var u = 0.0
    for (p <- pos; n <- neg)
      u += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val aucWant = u / (pos.length.toDouble * neg.length)
    val r = ModelOps.q224AucCard(spark, sf).collect().head
    assert(r.getAs[Long]("n_pos") === pos.length.toLong)
    assert(r.getAs[Long]("n_neg") === neg.length.toLong)
    assert(math.abs(r.getAs[Double]("auc") - aucWant) < 1e-6)
    assert(math.abs(r.getAs[Double]("gini") - (2 * aucWant - 1)) < 1e-6)
    // the synthetic return flag is independent of the scorer's features,
    // so the exact AUC machinery is verified at a near-chance operating
    // point (ties and all) rather than a lucky separable one
    assert(r.getAs[Double]("auc") > 0.0 && r.getAs[Double]("auc") < 1.0)
  }

  test("q225: calibration bins match brute-force rates; bins cover all rows") {
    val s = scoredRows()
    val want = s.groupBy(x => math.min(9L, math.floor(x._1 * 10).toLong))
    val rows = ModelOps.q225CalibrationCard(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === s.length.toLong)
    rows.foreach { r =>
      val g = want(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n") === g.size.toLong)
      assert(math.abs(r.getAs[Double]("avg_p") - g.map(_._1).sum / g.size) < 1e-6)
      assert(math.abs(r.getAs[Double]("pos_rate") -
        g.count(_._2 == 1L).toDouble / g.size) < 1e-6)
      val brier = g.map(x => (x._1 - x._2) * (x._1 - x._2)).sum / g.size
      assert(math.abs(r.getAs[Double]("brier") - brier) < 1e-6)
    }
  }

  test("q226: confusion counts at every threshold match brute force; F1 consistent") {
    val s = scoredRows()
    val rows = ModelOps.q226ThresholdSweep(spark, sf).collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      val thr = r.getAs[Long]("t") / 10.0
      val tp = s.count(x => x._1 >= thr && x._2 == 1L).toLong
      val fp = s.count(x => x._1 >= thr && x._2 == 0L).toLong
      val fn = s.count(x => x._1 < thr && x._2 == 1L).toLong
      assert(r.getAs[Long]("tp") === tp)
      assert(r.getAs[Long]("fp") === fp)
      assert(r.getAs[Long]("fn") === fn)
      assert(r.getAs[Long]("tn") === s.length - tp - fp - fn)
      if (tp + fp > 0)
        assert(math.abs(r.getAs[Double]("precision") - tp.toDouble / (tp + fp)) < 1e-6)
      assert(math.abs(r.getAs[Double]("f1") -
        2.0 * tp / (2 * tp + fp + fn)) < 1e-6)
    }
  }

  private def lineitems(): Array[Row] =
    graft.Util.rawTable(spark, sf, "lineitem").collect()

  test("q227: small-quantity revenue matches brute-force correlated threshold") {
    import spark.implicits._
    val brand = graft.Util.rawTable(spark, sf, "part")
      .filter($"p_brand" === "Brand#4").select($"p_partkey").collect()
      .map(_.getLong(0)).toSet
    val li = lineitems().filter(r => brand(r.getAs[Long]("l_partkey")))
    val thr = li.groupBy(_.getAs[Long]("l_partkey")).map { case (k, g) =>
      k -> g.map(r => BigDecimal(r.getAs[Double]("l_quantity")).setScale(2))
        .sum.toDouble / (g.length * 5.0)
    }
    val want = li.filter(r =>
        r.getAs[Double]("l_quantity") < thr(r.getAs[Long]("l_partkey")))
      .map(r => BigDecimal(r.getAs[Double]("l_extendedprice")).setScale(2))
      .sum.toDouble / 7.0
    val got = Relational.q227SmallQtyRevenue(spark, sf).collect().head
      .getAs[Double]("avg_yearly")
    assert(math.abs(got - want) < 1e-2)
  }

  test("q228: big orders match brute-force quantity sums") {
    val sums = lineitems().groupBy(_.getAs[Long]("l_orderkey"))
      .map { case (k, g) =>
        k -> g.map(r => BigDecimal(r.getAs[Double]("l_quantity")).setScale(2))
          .sum.toDouble
      }
    val bigWant = sums.filter(_._2 > 250.0)
    val rows = Relational.q228BigOrders(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.length === math.min(20, bigWant.size))
    rows.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      assert(bigWant.contains(k))
      assert(math.abs(r.getAs[Double]("sum_qty") - bigWant(k)) < 1e-9)
    }
  }

  test("q229: dormant balances match brute-force threshold + anti set") {
    import spark.implicits._
    val cs = graft.Util.rawTable(spark, sf, "customer")
      .select($"c_custkey", $"c_nationkey", $"c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val pos = cs.filter(_._3 > 0.0)
    val thr = pos.map(c => BigDecimal(c._3).setScale(2)).sum.toDouble / pos.length
    val urgent = graft.Util.rawTable(spark, sf, "orders")
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
      .collect().map(_.getLong(0)).toSet
    val kept = cs.filter(c => c._3 > thr && !urgent(c._1))
    val want = kept.groupBy(_._2).map { case (n, g) =>
      n -> (g.length.toLong,
        g.map(c => BigDecimal(c._3).setScale(2)).sum.toDouble)
    }
    val rows = Relational.q229DormantBalances(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (n, bal) = want(r.getAs[Int]("c_nationkey"))
      assert(r.getAs[Long]("n_custs") === n)
      assert(math.abs(r.getAs[Double]("total_bal") - bal) < 1e-2)
    }
  }

  test("q230: cheapest supplier per part matches brute-force argmin with tie-break") {
    import spark.implicits._
    val sized = graft.Util.rawTable(spark, sf, "part")
      .filter($"p_size" === 10).select($"p_partkey").collect()
      .map(_.getLong(0)).toSet
    val uc = lineitems().filter(r => sized(r.getAs[Long]("l_partkey")))
      .groupBy(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .map { case (k, g) =>
        (k._1, k._2,
          g.map(r => r.getAs[Double]("l_extendedprice") / r.getAs[Double]("l_quantity")).min)
      }
    val best = uc.groupBy(_._1).map { case (p, g) =>
      p -> g.minBy(x => (x._3, x._2))
    }
    val rows = Relational.q230CheapestSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.length === best.size)
    rows.foreach { r =>
      val (_, _, cost) = best(r.getAs[Long]("p_partkey"))
      assert(math.abs(r.getAs[Double]("unit_cost") - cost) < 1e-6)
      assert(r.getAs[String]("s_name") != null)
    }
  }

  test("q231: MA-detrended weekday seasonality matches brute-force integer cents") {
    import spark.implicits._
    val daily = graft.Util.events(spark, sf)
      .select(org.apache.spark.sql.functions.expr("ts_ms div 86400000").as("d"), $"value")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (d, g) =>
        d -> g.map(x => BigDecimal(x._2).setScale(2)).sum
          .*(BigDecimal(100)).toLongExact
      }.toSeq.sortBy(_._1)
    // the MA frame is ROW-based (7 ordered day rows), so the brute force
    // mirrors that, not calendar contiguity
    val full = daily.indices.filter(i => i >= 3 && i + 3 < daily.length)
    val rows = EventOps.q231SeasonalDecomposition(spark, sf).collect()
    val want = full.groupBy(i => daily(i)._1 % 7).map { case (wd, is) =>
      val detr7 = is.map(i => 7 * daily(i)._2 -
        (i - 3 to i + 3).map(daily(_)._2).sum).sum
      val yc = is.map(daily(_)._2).sum
      wd -> (is.length.toLong, detr7 / (is.length * 700.0),
        yc / (is.length * 100.0))
    }
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (n, seas, avg) = want(r.getAs[Long]("weekday"))
      assert(r.getAs[Long]("n_days") === n)
      assert(math.abs(r.getAs[Double]("seasonal") - seas) < 1e-6)
      assert(math.abs(r.getAs[Double]("avg_revenue") - avg) < 1e-6)
    }
    // seasonal components of a (near-)full-cycle decomposition mostly cancel
    val mass = rows.map(r => r.getAs[Long]("n_days") * r.getAs[Double]("seasonal")).sum
    val scale = rows.map(r => r.getAs[Long]("n_days") * math.abs(r.getAs[Double]("avg_revenue"))).sum
    assert(math.abs(mass) < 0.1 * scale)
  }

  test("q233: Kneser-Ney per-source log-prob matches brute-force smoothing") {
    import spark.implicits._
    val docs = graft.Util.rawTable(spark, sf, "documents")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val occ = docs.flatMap { case (src, tk) =>
      tk.sliding(2).filter(_.length == 2).map(p => (src, (p(0), p(1))))
    }
    val c12 = occ.groupBy(_._2).map { case (bg, g) => bg -> g.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, g) => w -> g.values.sum }
    val n1p = c12.groupBy(_._1._1).map { case (w, g) => w -> g.size.toLong }
    val n1m = c12.groupBy(_._1._2).map { case (w, g) => w -> g.size.toLong }
    val t = c12.size.toDouble
    val lnpQ = c12.map { case (bg @ (w1, w2), c) =>
      val p = (c - 0.75) / c1(w1) + (n1p(w1) * 0.75) / c1(w1) * (n1m(w2) / t)
      bg -> math.round(math.log(p) * 1e6)
    }
    val want = occ.groupBy(_._1).map { case (src, g) =>
      src -> (g.size.toLong, g.map(x => lnpQ(x._2)).sum.toDouble / (g.size * 1e6))
    }
    val rows = TextOps.q233KneserNey(spark, sf).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (n, avg) = want(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_bigrams") === n)
      assert(math.abs(r.getAs[Double]("avg_ln_p") - avg) < 1e-6)
      assert(r.getAs[Double]("avg_ln_p") < 0.0, "log-probs must be negative")
      assert(r.getAs[Double]("perplexity") > 1.0)
    }
  }

  test("q234: onion layers match a brute-force peel; counts are monotone non-increasing") {
    import spark.implicits._
    // edge construction is the (spec-covered) LSH-verified pipeline; the
    // peel itself is what this test brute-forces
    var edges = graft.api.Dedup.lshCandidatePairs(
        graft.Util.rawTable(spark, sf, "documents").select($"doc_id", $"text"),
        "doc_id", "text")
      .filter($"jaccard" >= 0.8)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map(p => if (p._1 < p._2) p else p.swap).toSeq
    def nodes(es: Seq[(Long, Long)]) = es.flatMap(e => Seq(e._1, e._2)).distinct
    val want = scala.collection.mutable.Buffer((0L, nodes(edges).size.toLong, edges.size.toLong))
    for (i <- 1 to 4) {
      val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (k, g) => k -> g.size }
      val keep = deg.filter(_._2 >= 2).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      want += ((i.toLong, nodes(edges).size.toLong, edges.size.toLong))
    }
    val rows = DedupOps.q234OnionLayers(spark, sf).collect()
      .map(r => (r.getAs[Long]("iteration"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges")))
    assert(rows.toSeq === want.toSeq)
    assert(rows.map(_._3).sliding(2).forall(p => p.last <= p.head))
  }

  test("q235: join-blowup audit matches brute-force per-key squares") {
    val perKey = lineitems().groupBy(_.getAs[Long]("l_partkey"))
      .map { case (k, g) => k -> g.length.toLong }
    val totalPairs = perKey.values.map(n => n * n).sum
    val top = perKey.toSeq.sortBy { case (k, n) => (-n, k) }.take(5)
    val rows = Relational.q235JoinBlowup(spark, sf).collect()
    assert(rows.length === math.min(5, perKey.size))
    rows.zip(top).foreach { case (r, (k, n)) =>
      assert(r.getAs[Long]("l_partkey") === k)
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("pair_contrib") === n * n)
      assert(r.getAs[Long]("total_pairs") === totalPairs)
      assert(math.abs(r.getAs[Double]("share") - n * n / totalPairs.toDouble) < 1e-6)
    }
  }

  test("q236/q237/q238: TPC-H Q11/Q15/Q20 shapes match brute force") {
    import spark.implicits._
    val li = lineitems()
    val suppNation = graft.Util.rawTable(spark, sf, "supplier")
      .select($"s_suppkey", $"s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // q236
    val region = suppNation.filter(_._2 < 5).keySet
    val v = li.filter(r => region(r.getAs[Long]("l_suppkey")))
      .groupBy(_.getAs[Long]("l_partkey"))
      .map { case (k, g) =>
        k -> g.map(r => BigDecimal(r.getAs[Double]("l_extendedprice")).setScale(2)).sum.toDouble
      }
    val tot = v.values.map(x => BigDecimal(x).setScale(6)).sum.toDouble
    val wantImportant = v.filter(_._2 > tot * 0.0011)
    val r236 = Relational.q236ImportantParts(spark, sf).collect()
    assert(r236.length === wantImportant.size)
    r236.foreach(r => assert(wantImportant.contains(r.getAs[Long]("l_partkey"))))
    // q237
    val t0 = java.time.Instant.parse("1997-01-01T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("1997-04-01T00:00:00Z").toEpochMilli
    def shipMs(r: Row): Long = r.getAs[Any]("l_shipdate") match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case i: java.time.Instant => i.toEpochMilli
    }
    val rev = li.filter { r =>
        val ms = shipMs(r); ms >= t0 && ms < t1
      }.groupBy(_.getAs[Long]("l_suppkey"))
      .map { case (k, g) =>
        k -> g.map(r => BigDecimal(
          r.getAs[Double]("l_extendedprice") * (1.0 - r.getAs[Double]("l_discount")))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      }
    val mx = rev.values.max
    val r237 = Relational.q237TopSupplier(spark, sf).collect()
    assert(r237.map(_.getAs[Long]("s_suppkey")).toSet ===
      rev.filter(_._2 == mx).keySet)
    // q238
    val red = graft.Util.rawTable(spark, sf, "part")
      .filter($"p_name".startsWith("red ")).select($"p_partkey").collect()
      .map(_.getLong(0)).toSet
    val qual = li.filter(r => red(r.getAs[Long]("l_partkey")))
      .groupBy(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("l_partkey")))
      .map { case (k, g) =>
        k -> g.map(r => BigDecimal(r.getAs[Double]("l_quantity")).setScale(2)).sum.toDouble
      }.filter(_._2 > 40.0)
    val heavy = qual.keys.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
      .filter(_._2 >= 2).filter { case (s, _) => suppNation(s) < 10 }
    val r238 = Relational.q238HeavyShippers(spark, sf).collect()
    assert(r238.map(_.getAs[Long]("s_suppkey")).toSet === heavy.keySet)
    r238.foreach(r =>
      assert(r.getAs[Long]("n_heavy_parts") === heavy(r.getAs[Long]("s_suppkey"))))
  }

  test("q239: JW linkage histogram buckets cover all blocked pairs; means consistent") {
    val rows = DedupOps.q239JwLinkage(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("jw_bucket")
      assert(b >= 0 && b <= 9)
      val avg = r.getAs[Double]("avg_jw")
      assert(avg >= b / 10.0 - 1e-9)
      assert(b == 9 || avg < (b + 1) / 10.0 + 1e-9)
      assert(r.getAs[Double]("avg_lev") >= 0.0)
    }
    // JW and Levenshtein must anti-correlate across buckets: the mean
    // edit distance in the top JW bucket is below the bottom bucket's
    val byB = rows.map(r => r.getAs[Long]("jw_bucket") -> r.getAs[Double]("avg_lev")).toMap
    if (byB.size >= 2)
      assert(byB(byB.keys.max) < byB(byB.keys.min))
  }

  test("q240: DP release — suppression tier exact, noise matches brute-force inverse CDF") {
    val truth = customers().groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
    val rows = GovernanceOps.q240DpRelease(spark, sf).collect()
    assert(rows.length === truth.size)
    rows.foreach { r =>
      val nk = r.getAs[Int]("c_nationkey")
      val n = truth(nk)
      assert(r.getAs[Long]("n_true") === n)
      assert(r.getAs[Boolean]("suppressed") === (n < 5))
      if (n < 5) assert(r.isNullAt(r.fieldIndex("released_n")))
      else {
        val x = (nk.toLong * 31L + 1000003L) % 4294967296L
        val lo = x % 65536L
        val hi = (x - lo) / 65536L
        val h = ((hi * 2654435761L) % 65536L * 65536L + lo * 2654435761L) % 4294967296L
        val u = (h.toDouble + 0.5) / 4294967296.0
        val s = u - 0.5
        val noise = -2.0 * math.signum(s) * math.log(1.0 - 2.0 * math.abs(s))
        assert(math.abs(r.getAs[Double]("released_n") - round6(n + noise)) < 1e-3)
      }
    }
  }

  private def eventRows(): Array[(Long, Long, String, Double, Long)] = {
    import spark.implicits._
    graft.Util.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value", $"ts_ms")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4)))
  }

  test("q241: lead-lag correlations match brute-force integer-cents Pearson") {
    val ev = eventRows()
    def daily(t: String) = ev.filter(_._3 == t).groupBy(_._5 / 86400000L)
      .map { case (d, g) =>
        d -> g.map(x => BigDecimal(x._4).setScale(2)).sum
          .*(BigDecimal(100)).toLongExact
      }
    val x = daily("view"); val y = daily("purchase")
    val rows = EventOps.q241LeadLagXcorr(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq === (-3L to 3L))
    rows.foreach { r =>
      val l = r.getAs[Long]("lag")
      val pts = x.toSeq.flatMap { case (d, xv) => y.get(d + l).map(yv => (xv, yv)) }
      assert(r.getAs[Long]("n_days") === pts.size.toLong)
      val n = pts.size.toDouble
      val sx = pts.map(_._1.toDouble).sum; val sy = pts.map(_._2.toDouble).sum
      val sxy = pts.map(p => p._1.toDouble * p._2).sum
      val sxx = pts.map(p => p._1.toDouble * p._1).sum
      val syy = pts.map(p => p._2.toDouble * p._2).sum
      val want = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getAs[Double]("pearson_r") - want) < 1e-6)
      assert(math.abs(r.getAs[Double]("pearson_r")) <= 1.0 + 1e-9)
    }
  }

  test("q242: trigram paths match brute-force sequence counts") {
    val ev = eventRows()
    val tri = ev.groupBy(_._2).values.flatMap { g =>
      g.toSeq.sortBy(e => (e._5, e._1)).map(_._3).sliding(3)
        .filter(_.length == 3).map(_.mkString(">"))
    }.toSeq
    // NOTE: the query orders by (ts, event_id); ts_ms is the floor of ts
    // nanos so sorting by (ts_ms, event_id) can disagree within a
    // millisecond — rebuild with nanos below if this ever flakes. The
    // testdata's event times are ms-granular, so ts_ms order == ts order.
    val counts = tri.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val top = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val total = counts.values.sum.toDouble
    val rows = EventOps.q242TrigramPaths(spark, sf).collect()
    assert(rows.length === math.min(10, counts.size))
    rows.zip(top).foreach { case (r, (p, n)) =>
      assert(r.getAs[String]("path") === p)
      assert(r.getAs[Long]("n") === n)
      assert(math.abs(r.getAs[Double]("share") - n / total) < 1e-6)
    }
  }

  test("q243: late-data buckets match a brute-force running-max walk") {
    val ev = eventRows()
    val want = ev.groupBy(_._3).flatMap { case (t, g) =>
      var runMax = Long.MinValue
      val lates = g.toSeq.sortBy(_._1).map { e =>
        runMax = math.max(runMax, e._5); runMax - e._5
      }
      def bucket(l: Long) = if (l == 0) "a_in_order" else if (l <= 60000) "b_1min"
        else if (l <= 300000) "c_5min" else if (l <= 1800000) "d_30min"
        else "e_beyond"
      lates.groupBy(bucket).map { case (b, ls) =>
        (t, b) -> (ls.size.toLong, ls.max, ls.size.toDouble / g.size)
      }
    }
    val rows = EventOps.q243LateDataAudit(spark, sf).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (n, mx, share) = want((r.getAs[String]("event_type"), r.getAs[String]("bucket")))
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("max_late_ms") === mx)
      assert(math.abs(r.getAs[Double]("share") - share) < 1e-6)
    }
  }

  test("q244: session card matches brute-force sessionization + interpolated quantiles") {
    val ev = eventRows()
    val sessions = ev.groupBy(_._2).values.flatMap { g =>
      val sorted = g.toSeq.sortBy(e => (e._5, e._1))
      val buf = scala.collection.mutable.Buffer.empty[Seq[Long]]
      var cur = scala.collection.mutable.Buffer.empty[Long]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (cur.nonEmpty && e._5 - prev > 1800000L) { buf += cur.toSeq; cur = scala.collection.mutable.Buffer.empty[Long] }
        cur += e._5; prev = e._5
      }
      if (cur.nonEmpty) buf += cur.toSeq
      buf
    }.toSeq
    def q(vals: Seq[Double], p: Double): Double = {
      val s = vals.sorted; val r = p * (s.length - 1)
      val lo = s(r.toInt)
      val hi = s(math.min(s.length - 1, r.toInt + 1))
      lo + (r - r.toInt) * (hi - lo)
    }
    val depths = sessions.map(_.length.toDouble)
    val durs = sessions.map(s => (s.max - s.min).toDouble)
    val r = EventOps.q244SessionCard(spark, sf).collect().head
    assert(r.getAs[Long]("n_sessions") === sessions.size.toLong)
    assert(math.abs(r.getAs[Double]("depth_p50") - q(depths, 0.5)) < 1e-4)
    assert(math.abs(r.getAs[Double]("depth_p90") - q(depths, 0.9)) < 1e-4)
    assert(math.abs(r.getAs[Double]("depth_p99") - q(depths, 0.99)) < 1e-4)
    assert(math.abs(r.getAs[Double]("duration_p50_ms") - q(durs, 0.5)) < 1e-4)
    assert(math.abs(r.getAs[Double]("duration_p90_ms") - q(durs, 0.9)) < 1e-4)
    assert(math.abs(r.getAs[Double]("duration_p99_ms") - q(durs, 0.99)) < 1e-4)
  }

  test("q245: storage planner matches brute-force byte model") {
    import spark.implicits._
    val rows = Extended.q245StoragePlanner(spark, sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).toSeq ===
      Seq("documents", "events", "lineitem", "orders"))
    val docs = graft.Util.rawTable(spark, sf, "documents")
      .select($"text", $"lang", $"source").collect()
    val wantBytes = docs.map(r => 16L + r.getString(0).length +
      r.getString(1).length + r.getString(2).length).sum
    val d = rows.find(_.getAs[String]("table_name") == "documents").get
    assert(d.getAs[Long]("n_rows") === docs.length.toLong)
    assert(d.getAs[Long]("est_bytes") === wantBytes)
    val parts = math.max(1L, math.ceil(wantBytes / 134217728.0).toLong)
    assert(d.getAs[Long]("target_partitions") === parts)
    assert(d.getAs[Long]("rows_per_partition") === docs.length / parts)
    rows.foreach(r => assert(r.getAs[Long]("target_partitions") >= 1L))
  }

  test("q246: silhouette card matches brute-force per-probe computation") {
    import spark.implicits._
    val e = graft.Util.rawTable(spark, sf, "embeddings")
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val probes = e.groupBy(_._3).values.flatMap { g =>
      g.sortBy(v => (md5(v._1.toString), v._1)).take(10)
    }.toSeq
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      BigDecimal(1.0 - dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val sil = probes.map { p =>
      val byLabel = e.filter(_._1 != p._1).groupBy(_._3)
        .map { case (l, g) => l -> g.map(v => cosDist(p._2, v._2)).sum / g.count(_._1 != p._1) }
      val a = byLabel(p._3)
      val b = byLabel.filter(_._1 != p._3).values.min
      p._3 -> (b - a) / math.max(a, b)
    }
    val want = sil.groupBy(_._1).map { case (l, g) =>
      l -> (g.size.toLong, g.map(_._2).sum / g.size)
    }
    val rows = SimilarityOps.q246SilhouetteCard(spark, sf).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (n, avg) = want(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_probes") === n)
      assert(math.abs(r.getAs[Double]("avg_silhouette") - avg) < 1e-4)
      assert(r.getAs[Double]("min_silhouette") <= r.getAs[Double]("max_silhouette"))
    }
  }

  test("q247: source modularity matches brute-force Newman Q over LSH edges") {
    import spark.implicits._
    val srcOf = graft.Util.rawTable(spark, sf, "documents")
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = graft.api.Dedup.lshCandidatePairs(
        graft.Util.rawTable(spark, sf, "documents").select($"doc_id", $"text"),
        "doc_id", "text")
      .filter($"jaccard" >= 0.8)
      .select($"id_a", $"id_b").collect()
      .map(r => (srcOf(r.getLong(0)), srcOf(r.getLong(1))))
    val m = edges.length.toDouble
    val intra = edges.count { case (a, b) => a == b }
    val deg = edges.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (k, g) => k -> g.size.toDouble }
    val wantQ = intra / m - deg.values.map(d => (d / (2 * m)) * (d / (2 * m))).sum
    val r = DedupOps.q247SourceModularity(spark, sf).collect().head
    assert(r.getAs[Long]("n_edges") === edges.length.toLong)
    assert(r.getAs[Long]("n_intra_edges") === intra.toLong)
    assert(r.getAs[Long]("n_sources") === deg.size.toLong)
    assert(math.abs(r.getAs[Double]("modularity") - wantQ) < 1e-6)
    assert(math.abs(r.getAs[Double]("intra_share") - intra / m) < 1e-6)
  }

  test("q248/q250: attribution models match brute-force window walks") {
    val ev = eventRows()
    val isTouch = (t: String) => t == "click" || t == "view"
    val byUser = ev.groupBy(_._2)
    // q248: first/last touch in a STRICT 7-day value range before the conversion
    val conv = byUser.values.flatMap { g =>
      val sorted = g.toSeq.sortBy(e => (e._5, e._1))
      sorted.filter(_._3 == "purchase").map { p =>
        val inWin = sorted.filter(e => isTouch(e._3) &&
          e._5 >= p._5 - 7L * 86400000L && e._5 <= p._5 - 1)
        val first = inWin.sortBy(e => (e._5, e._1)).headOption.map(_._3)
        val last = inWin.sortBy(e => (e._5, e._1)).lastOption.map(_._3)
        (first.getOrElse("organic"), last.getOrElse("organic"))
      }
    }.toSeq
    val rows248 = EventOps.q248AttributionCompare(spark, sf).collect()
    val wantF = conv.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val wantL = conv.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(rows248.map(_.getAs[String]("channel")).toSet === (wantF.keySet ++ wantL.keySet))
    rows248.foreach { r =>
      val ch = r.getAs[String]("channel")
      assert(r.getAs[Long]("n_first") === wantF.getOrElse(ch, 0L))
      assert(r.getAs[Long]("n_last") === wantL.getOrElse(ch, 0L))
    }
    assert(rows248.map(_.getAs[Long]("n_first")).sum === conv.size.toLong)
    assert(rows248.map(_.getAs[Long]("n_last")).sum === conv.size.toLong)
    // q250: last touch strictly before in ROW order, swept lookbacks
    val rows250 = EventOps.q250LookbackSweep(spark, sf).collect()
    assert(rows250.map(_.getAs[Long]("lookback_days")).toSeq === Seq(1L, 3L, 7L, 14L))
    rows250.foreach { r =>
      val lb = r.getAs[Long]("lookback_days") * 86400000L
      val n = byUser.values.map { g =>
        val sorted = g.toSeq.sortBy(e => (e._5, e._1))
        sorted.zipWithIndex.count { case (p, i) =>
          p._3 == "purchase" && sorted.take(i).reverse.find(e => isTouch(e._3))
            .exists(t => p._5 - t._5 <= lb)
        }
      }.sum
      assert(r.getAs[Long]("n_attributed") === n.toLong)
    }
    val shares = rows250.map(_.getAs[Double]("attributed_share")).toSeq
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a },
      "longer lookbacks cannot attribute fewer conversions")
  }

  test("q249: Good-Turing spectrum matches brute-force bigram frequency-of-frequencies") {
    import spark.implicits._
    val bigrams = graft.Util.rawTable(spark, sf, "documents")
      .select($"text").collect().map(_.getString(0))
      .flatMap(_.split(" ").filter(_.nonEmpty).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")))
    val tf = bigrams.groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val nr = tf.values.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val nTokens = tf.values.sum.toDouble
    val spectrum = nr.keys.toSeq.sorted.take(10)
    val rows = TextOps.q249GoodTuring(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("r")).toSeq === spectrum)
    rows.foreach { r =>
      val rr = r.getAs[Long]("r")
      assert(r.getAs[Long]("n_r") === nr(rr))
      if (nr.contains(rr + 1))
        assert(math.abs(r.getAs[Double]("r_star") -
          (rr + 1) * nr(rr + 1).toDouble / nr(rr)) < 1e-6)
      else assert(r.isNullAt(r.fieldIndex("r_star")))
      assert(math.abs(r.getAs[Double]("mass_share") - nr(rr) * rr / nTokens) < 1e-6)
    }
  }

  test("q251: dup-quality tiers match brute-force degree bucketing") {
    import spark.implicits._
    val deg = graft.api.Dedup.lshCandidatePairs(
        graft.Util.rawTable(spark, sf, "documents").select($"doc_id", $"text"),
        "doc_id", "text")
      .filter($"jaccard" >= 0.8)
      .select($"id_a", $"id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val docsN = graft.Util.rawTable(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    def tier(d: Long) = if (d == 0) "a_unique" else if (d == 1) "b_1"
      else if (d <= 4) "c_2_4" else "d_5plus"
    val want = docsN.groupBy(x => tier(deg.getOrElse(x._1, 0L)))
      .map { case (t, g) =>
        t -> (g.length.toLong, g.map(_._2).sum.toDouble / g.length)
      }
    val rows = DedupOps.q251DupQualityCard(spark, sf).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (n, avgTok) = want(r.getAs[String]("dup_tier"))
      assert(r.getAs[Long]("n_docs") === n)
      assert(math.abs(r.getAs[Double]("avg_tokens") - avgTok) < 1e-6)
      val q = r.getAs[Double]("avg_quality")
      assert(q > 0.0 && q <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docsN.length.toLong)
  }

  test("q252: activity heatmap matches brute-force epoch arithmetic; shares sum to 1") {
    val ev = eventRows()
    val want = ev.groupBy(e => ((e._5 / 86400000L) % 7, (e._5 / 3600000L) % 24))
      .map { case (k, g) => k -> g.size.toLong }
    val rows = EventOps.q252ActivityHeatmap(spark, sf).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") ===
        want((r.getAs[Long]("weekday"), r.getAs[Long]("hour"))))
    }
    assert(rows.map(_.getAs[Long]("n_events")).sum === ev.length.toLong)
    assert(math.abs(rows.map(_.getAs[Double]("event_share")).sum - 1.0) < 1e-4)
  }

  test("q232: dup-graph card matches brute-force topology over exact Jaccard edges") {
    import spark.implicits._
    val docs = graft.Util.rawTable(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSet)
    val pairs = for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (ida, sa) = docs(i); (idb, sb) = docs(j)
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= 0.95
    } yield if (ida < idb) (ida, idb) else (idb, ida)
    val deg = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (k, g) => k -> g.size.toLong }
    val pairSet = pairs.toSet
    val tri = (for {
      (a, b) <- pairs; (b2, c) <- pairs if b2 == b && pairSet((a, c))
    } yield 1).size.toLong
    val r = DedupOps.q232DupGraphCard(spark, sf).collect().head
    assert(r.getAs[Long]("n_nodes") === deg.size.toLong)
    assert(r.getAs[Long]("n_edges") === pairs.size.toLong)
    assert(r.getAs[Long]("max_degree") === (if (deg.isEmpty) null else deg.values.max))
    assert(r.getAs[Long]("n_wedges") === deg.values.map(d => d * (d - 1) / 2).sum)
    assert(r.getAs[Long]("n_triangles") === tri)
    val cl = Option(r.getAs[java.lang.Double]("clustering")).map(_.toDouble)
    cl.foreach(c => assert(c >= 0.0 && c <= 1.0 + 1e-9))
    // Newman degree assortativity over the directed-both-ways edge list:
    // all moments are endpoint sums (each node counted deg times)
    val directed = pairs ++ pairs.map(p => (p._2, p._1))
    val m2 = directed.size.toDouble
    val sxy = directed.map { case (a, b) => deg(a).toDouble * deg(b) }.sum
    val s1e = directed.map { case (a, _) => deg(a).toDouble }.sum
    val sx2e = directed.map { case (a, _) => deg(a).toDouble * deg(a) }.sum
    val den = m2 * sx2e - s1e * s1e
    val as = Option(r.getAs[java.lang.Double]("assortativity")).map(_.toDouble)
    if (den != 0.0) {
      val want = (m2 * sxy - s1e * s1e) / den
      assert(math.abs(as.get - want) < 1e-6)
      assert(as.get >= -1.0 - 1e-9 && as.get <= 1.0 + 1e-9)
    } else assert(as.isEmpty)
  }
}
