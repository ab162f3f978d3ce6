package graft.operators

import graft.SparkSpec

/** Brute-force recomputation and invariant checks for the economics /
  * concentration cards (q326–q330, q339), the inference cards
  * (q336 Theil, q337 EB shrinkage, q335 Brier decomposition) and the
  * vocabulary-richness family (q331–q334).
  */
class EconStatsSpec extends SparkSpec {

  test("q326: skyline matches the O(n²) dominance definition") {
    import spark.implicits._
    val parts = graft.Util.rawTable(spark, sf, "part")
      .select($"p_partkey", $"p_retailprice", $"p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val want = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, qr, qz) =>
        qr <= pr && qz <= sz && (qr < pr || qz < sz)
      }
    }.map(_._1).toSet
    val got = Relational.q326SkylineParts(spark, sf).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(got === want)
  }

  test("q327: Gini matches the brute-force rank formula; Lorenz is monotone to 1") {
    import spark.implicits._
    val rev = graft.Util.rawTable(spark, sf, "lineitem")
      .select($"l_suppkey", $"l_extendedprice", $"l_discount").collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(2) *
          (BigDecimal(1) - BigDecimal(r.getDouble(2)).setScale(2))))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }.toSeq
    val ranked = rev.sortBy { case (k, v) => (v, k) }.zipWithIndex
      .map { case ((_, v), i) => (i + 1L, v) }
    val n = ranked.size
    val s = ranked.map(_._2).sum
    val s1 = ranked.map { case (r, v) => BigDecimal(r) * v }.sum
    val gini = (2.0 * s1.toDouble - (n + 1) * s.toDouble) / (n * s.toDouble)
    val rows = Relational.q327LorenzGini(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-5)
    }
    val shares = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-9)
  }

  test("q329: ABC classes partition all parts and respect the 80/95 cut order") {
    val rows = Relational.q329AbcClasses(spark, sf).collect()
      .map(r => r.getAs[String]("abc_class") ->
        (r.getAs[Long]("n_parts"), r.getAs[Double]("revenue_share"))).toMap
    val nParts = graft.Util.rawTable(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum === nParts)
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-5)
    // A carries at least as much revenue per class as B, which beats C
    if (rows.contains("A") && rows.contains("B"))
      assert(rows("A")._2 >= rows("B")._2)
  }

  test("q335: Brier decomposition is internally consistent and matches brute force") {
    import spark.implicits._
    val r = ModelOps.q335BrierDecomposition(spark, sf).collect().head
    val scored = graft.Util.rawTable(spark, sf, "lineitem")
      .select($"l_discount", $"l_quantity", $"l_returnflag").collect()
      .map { row =>
        val z = row.getDouble(0) * 10 + row.getDouble(1) / 10.0
        val p = BigDecimal(z / (z + 1.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val y = if (row.getString(2) == "R") 1.0 else 0.0
        (p, y)
      }
    val brier = scored.map { case (p, y) => (p - y) * (p - y) }.sum / scored.length
    assert(math.abs(r.getAs[Double]("brier") - brier) < 1e-5)
    val identity = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty") + r.getAs[Double]("within_bin_var")
    assert(math.abs(r.getAs[Double]("brier") - identity) < 1e-5)
    assert(r.getAs[Double]("reliability") >= 0)
    assert(r.getAs[Double]("resolution") >= 0)
    assert(r.getAs[Double]("uncertainty") >= 0 &&
      r.getAs[Double]("uncertainty") <= 0.25)
  }

  test("q336: Theil total decomposes into between + share-weighted within") {
    val rows = Relational.q336TheilIndex(spark, sf).collect()
    val total = rows.head.getAs[Double]("theil_total")
    val between = rows.head.getAs[Double]("theil_between")
    val within = rows.map(r =>
      r.getAs[Double]("income_share") * r.getAs[Double]("theil_within")).sum
    assert(total >= 0 && between >= 0)
    assert(math.abs(total - (between + within)) < 1e-3,
      s"decomposition gap: $total vs ${between + within}")
  }

  test("q337: EB shrinkage pulls toward the prior mean, weights grow with n") {
    val rows = Relational.q337EbReturnRates(spark, sf).collect()
    // prior mean = unweighted mean of the raw rates (MoM construction)
    val m = rows.map(_.getAs[Double]("rate_raw")).sum / rows.length
    rows.foreach { r =>
      val raw = r.getAs[Double]("rate_raw")
      val shr = r.getAs[Double]("rate_shrunk")
      val w = r.getAs[Double]("self_weight")
      assert(w > 0 && w <= 1)
      // shrunk lies between raw and the prior mean (within rounding)
      assert(shr >= math.min(raw, m) - 1e-4 && shr <= math.max(raw, m) + 1e-4)
    }
    val byN = rows.sortBy(_.getAs[Long]("n_items"))
    assert(byN.last.getAs[Double]("self_weight") >=
      byN.head.getAs[Double]("self_weight"))
  }

  test("q331-q333: richness stats respect their analytic bounds") {
    val simpson = TextOps.q331SimpsonDiversity(spark, sf).collect()
    simpson.foreach { r =>
      val d = r.getAs[Double]("simpson")
      assert(d > 0 && d < 1)
      assert(r.getAs[Double]("effective_types") >= 1)
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens"))
    }
    val yule = TextOps.q332YuleK(spark, sf).collect()
    yule.foreach(r => assert(r.getAs[Double]("yule_k") >= 0))
    val mattr = TextOps.q333Mattr(spark, sf).collect()
    mattr.foreach { r =>
      val m = r.getAs[Double]("mattr")
      assert(m > 0 && m <= 1)
      assert(r.getAs[Long]("n_segments") > 0)
    }
  }

  test("q334: Burrows Delta is a nonnegative distance over source pairs") {
    val rows = TextOps.q334BurrowsDelta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("delta") >= 0)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  test("q339: price index is positive and Fisher is the geometric mean") {
    val r = Relational.q339PriceIndex(spark, sf).collect().head
    val l = r.getAs[Double]("laspeyres")
    val p = r.getAs[Double]("paasche")
    val f = r.getAs[Double]("fisher")
    assert(l > 0 && p > 0)
    assert(math.abs(f - math.sqrt(l * p)) < 1e-5)
    assert(r.getAs[Long]("n_common_parts") > 0)
  }

  test("q340-q342: mixing matrix, Gumbel and migration invariants") {
    val mix = DedupOps.q340LangAssortativity(spark, sf).collect()
    if (mix.nonEmpty) {
      assert(math.abs(mix.map(_.getAs[Double]("edge_share")).sum - 1.0) < 1e-4)
      val r = mix.head.getAs[java.lang.Double]("assortativity")
      if (r != null) assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    }
    val gum = EventOps.q341GumbelExtremes(spark, sf).collect()
    gum.foreach { g =>
      assert(g.getAs[Double]("beta") >= 0)
      assert(g.getAs[Double]("rl_7d") <= g.getAs[Double]("rl_30d") + 1e-9)
      assert(g.getAs[Double]("rl_30d") <= g.getAs[Double]("rl_90d") + 1e-9)
    }
    val mig = Relational.q342RfmMigration(spark, sf).collect()
    assert(math.abs(mig.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    mig.foreach { m =>
      assert(m.getAs[Long]("m_score_t0") >= 1 && m.getAs[Long]("m_score_t0") <= 5)
      assert(m.getAs[Long]("m_score_t1") >= 1 && m.getAs[Long]("m_score_t1") <= 5)
    }
  }

  test("q343-q345: tail, spectrum and shape invariants") {
    EventOps.q343HillTail(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("hill") > 0)
      assert(r.getAs[Double]("alpha") > 0)
    }
    EventOps.q344WeeklySpectrum(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("weekly_power") >= 0)
      assert(r.getAs[Double]("variance") >= 0)
      assert(r.getAs[Double]("weekly_share") >= 0)
    }
    EventOps.q345MomentShape(spark, sf).collect().foreach { r =>
      val sk = r.getAs[Double]("skewness")
      val ek = r.getAs[Double]("excess_kurtosis")
      // Pearson's inequality: kurtosis ≥ 1 + skew² ⇒ excess ≥ skew² − 2
      assert(ek >= sk * sk - 2.0 - 1e-6)
      assert(r.getAs[Double]("sd_value") >= 0)
    }
  }

  test("q347-q349: decay, contamination reach and Hurst invariants") {
    EventOps.q347EngagementDecay(spark, sf).collect().foreach { r =>
      val hl = r.getAs[java.lang.Double]("half_life_days")
      if (hl != null) assert(hl > 0)
    }
    val reach = DedupOps.q348ContaminationReach(spark, sf).collect()
    assert(reach.map(_.getAs[Long]("round")).toSet === Set(0L, 1L, 2L))
    val cums = reach.sortBy(_.getAs[Long]("round")).map(_.getAs[Long]("cum_docs"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    reach.foreach(r => assert(r.getAs[Double]("cum_share") <= 1.0 + 1e-9))
    val hurst = EventOps.q349HurstRs(spark, sf).collect()
    assert(hurst.map(_.getAs[Long]("block_size")).toSet === Set(3L, 5L, 10L))
    hurst.foreach { h =>
      assert(h.getAs[Long]("n_blocks") > 0)
      assert(h.getAs[Double]("avg_rs") > 0)
    }
  }

  test("q350-q360: dependence, validity, alignment and design invariants") {
    val tau = Extended.q350KendallTau(spark, sf).collect().head
    assert(math.abs(tau.getAs[Double]("tau_b")) <= 1.0 + 1e-9)
    assert(math.abs(tau.getAs[Double]("gamma")) <= 1.0 + 1e-9)
    assert(tau.getAs[Long]("concordant") >= 0 &&
      tau.getAs[Long]("discordant") >= 0)

    val db = SimilarityOps.q352DaviesBouldin(spark, sf).collect()
    assert(db.nonEmpty)
    db.foreach { r =>
      assert(r.getAs[Double]("scatter") >= 0)
      assert(r.getAs[Double]("worst_ratio") >= 0)
      assert(r.getAs[Double]("db_index") > 0)
    }

    val rec = SimilarityOps.q351ReciprocalAlign(spark, sf).collect()
    // mutual best-match is one-to-one: no id repeats on either side
    assert(rec.map(_.getAs[Long]("id_a")).distinct.length === rec.length)
    assert(rec.map(_.getAs[Long]("id_b")).distinct.length === rec.length)

    val rbo = SimilarityOps.q358RboAgreement(spark, sf).collect()
    rbo.foreach { r =>
      val v = r.getAs[Double]("rbo")
      assert(v >= 0 && v <= 1.0 + 1e-9)
      assert(r.getAs[Long]("overlap20") >= 0 &&
        r.getAs[Long]("overlap20") <= 20)
    }

    val ney = TextOps.q360NeymanAllocation(spark, sf).collect()
    assert(math.abs(ney.map(_.getAs[Double]("share_neyman")).sum - 1.0) < 1e-4)
    val eff = ney.head.getAs[Double]("neyman_efficiency")
    // Cauchy-Schwarz: (ΣWS)² ≤ ΣWS² (the whole point of the card)
    assert(eff > 0 && eff <= 1.0 + 1e-9)

    val mk = EventOps.q357MannKendall(spark, sf).collect().head
    assert(mk.getAs[Double]("var_s") > 0)

    val sb = EventOps.q359ForecastScoreboard(spark, sf).collect()
    assert(sb.map(_.getAs[String]("method")).toSet ===
      Set("seasonal_naive", "holt", "holt_winters"))
    sb.foreach { r =>
      assert(r.getAs[Double]("rmse") >= r.getAs[Double]("mae") - 1e-9,
        "RMSE dominates MAE for any residual set")
    }
  }

  test("q356/q361: Holt-Winters residual coverage and runs-test bounds") {
    val hw = EventOps.q356HoltWinters(spark, sf).collect()
    val resids = hw.filter(!_.isNullAt(hw.head.fieldIndex("resid")))
    val horizon = hw.filter(_.isNullAt(hw.head.fieldIndex("cents")))
    assert(horizon.length === 7, "always a 7-day projection")
    assert(resids.nonEmpty, "in-sample residuals from day 8 onward")
    val rt = EventOps.q361RunsTest(spark, sf).collect().head
    val n = rt.getAs[Long]("n_days")
    assert(rt.getAs[Long]("n_above") + rt.getAs[Long]("n_below") === n)
    val runs = rt.getAs[Long]("runs")
    assert(runs >= 1 && runs <= n)
    assert(rt.getAs[Double]("expected_runs") >= 1.0)
  }

  test("q338: key audit agrees with direct distinct counts") {
    import spark.implicits._
    val li = graft.Util.rawTable(spark, sf, "lineitem")
    val n = li.count()
    val pairKey = li.select($"l_orderkey", $"l_linenumber").distinct().count()
    val rows = GovernanceOps.q338KeyAudit(spark, sf).collect()
      .map(r => r.getAs[String]("candidate") -> r).toMap
    assert(rows("l_orderkey,l_linenumber").getAs[Long]("n_distinct") === pairKey)
    assert(rows("l_orderkey,l_linenumber").getAs[Boolean]("holds") === (pairKey == n))
    // the FD (orderkey,linenumber)->shipdate must hold iff the pair is
    // at least as fine as the grain carrying shipdate
    val fd = rows("l_orderkey,l_linenumber->l_shipdate")
    assert(fd.getAs[Boolean]("holds") ===
      (fd.getAs[Long]("n_distinct") == fd.getAs[Long]("n_rows")))
  }
}
