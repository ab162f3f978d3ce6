package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lower, md5, substring, year}

/** Brute-force ground-truth checks for the statistical-analytics wave
  * (q159–q168): regression, Zipf/Gini corpus shape, vocabulary overlap,
  * KS/PSI drift, k-NN classification, readability, inter-arrival
  * percentiles. Each test recomputes the answer from collected rows with
  * plain Scala and compares against the distributed result.
  */
class AnalyticsSpec extends SparkSpec {

  private def medianInterp(xs: Array[Double], p: Double): Double = {
    val s = xs.sorted
    val idx = p * (s.length - 1)
    val lo = idx.toInt
    if (lo == s.length - 1) s(lo)
    else s(lo) + (idx - lo) * (s(lo + 1) - s(lo))
  }

  test("q159: regr_slope/intercept match the closed-form least-squares fit") {
    import spark.implicits._
    val rows = Extended.q159OlsRegression(spark, sf).collect()
    assert(rows.length === 3)
    val li = graft.Util.table(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = li(r.getAs[String]("l_returnflag"))
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxy = xs.map(t => t._2 * t._3).sum
      val sxx = xs.map(t => t._2 * t._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = sy / n - slope * sx / n
      assert(r.getAs[Long]("n_pairs") === xs.length)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-3)
      assert(math.abs(r.getAs[Double]("intercept") - icept) < 1e-2)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("q160: Zipf slope is negative and matches a hand regression on one source") {
    import spark.implicits._
    val rows = TextOps.q160ZipfSlope(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("zipf_slope") < 0.0))
    val src = rows.head.getAs[String]("source")
    val freqs = graft.Util.table(spark, sf, "documents")
      .filter($"source" === src).collect()
      .flatMap(_.getAs[String]("text").split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, a) => (t, a.length.toLong) }.toSeq
      .sortBy { case (t, f) => (-f, t) }
    assert(rows.head.getAs[Long]("vocab") === freqs.length)
    val pts = freqs.take(100).zipWithIndex
      .map { case ((_, f), i) => (math.log(i + 1.0), math.log(f.toDouble)) }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val slope = (n * pts.map(p => p._1 * p._2).sum - sx * sy) /
      (n * pts.map(p => p._1 * p._1).sum - sx * sx)
    assert(math.abs(rows.head.getAs[Double]("zipf_slope") - slope) < 1e-3)
  }

  test("q161: Gini matches the brute-force rank formula and sits in [0, 1)") {
    import spark.implicits._
    val rows = TextOps.q161GiniChars(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = graft.Util.table(spark, sf, "documents")
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0)
      val xs = bySrc(r.getAs[String]("source")).map(_._2).sorted
      val n = xs.length.toDouble
      val ix = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val want = 2.0 * ix / (n * xs.sum) - (n + 1) / n
      assert(math.abs(g - want) < 1e-6)
    }
  }

  test("q162: one pair per source combination; Jaccard matches brute-force sets") {
    import spark.implicits._
    val rows = TextOps.q162SourceVocabJaccard(spark, sf).collect()
    val nSrc = graft.Util.table(spark, sf, "documents")
      .select("source").distinct().count().toInt
    assert(rows.length === nSrc * (nSrc - 1) / 2)
    val vocab = graft.Util.table(spark, sf, "documents").collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[String]("text").split(" ").filter(_.nonEmpty).toSet))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).reduce(_ ++ _) }
    val r0 = rows.head
    val (a, b) = (vocab(r0.getAs[String]("src_a")), vocab(r0.getAs[String]("src_b")))
    val inter = (a & b).size
    assert(r0.getAs[Long]("inter") === inter)
    val want = inter.toDouble / (a.size + b.size - inter)
    assert(math.abs(r0.getAs[Double]("jaccard") - want) < 1e-6)
  }

  test("q163: KS statistic matches a brute-force two-sample ECDF walk") {
    import spark.implicits._
    val rows = EventOps.q163KsDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"value", $"user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = ev(r.getAs[String]("event_type"))
      val as = xs.filter(_._3 % 2 == 0).map(_._2).sorted
      val bs = xs.filter(_._3 % 2 != 0).map(_._2).sorted
      assert(r.getAs[Long]("n_a") === as.length)
      assert(r.getAs[Long]("n_b") === bs.length)
      val pts = (as ++ bs).distinct
      val want = pts.map { v =>
        math.abs(as.count(_ <= v).toDouble / as.length -
          bs.count(_ <= v).toDouble / bs.length)
      }.max
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0)
      assert(math.abs(ks - want) < 1e-6)
    }
  }

  test("q164: every probe classified; votes sum to k; majority recomputed") {
    import spark.implicits._
    val rows = SimilarityOps.q164KnnLabelVote(spark, sf).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Long]("probe_id")).toSet === (0L until 20L).toSet)
    val emb = graft.Util.table(spark, sf, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray,
        r.getAs[Int]("label")))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val corpus = emb.filter(_._1 >= 20)
    rows.take(3).foreach { r =>
      val p = emb.find(_._1 == r.getAs[Long]("probe_id")).get
      val top = corpus.map(c => (c._1, c._3, cos(p._2, c._2)))
        .sortBy(t => (-t._3, t._1)).take(10)
      val want = top.groupBy(_._2).map { case (l, xs) => (l, xs.length) }
        .toSeq.sortBy(t => (-t._2, t._1)).head
      assert(r.getAs[Long]("pred_label") === want._1.toLong)
      assert(r.getAs[Long]("votes") === want._2.toLong)
      assert(r.getAs[Int]("true_label") === p._3)
      assert(r.getAs[Boolean]("correct") === (want._1 == p._3))
    }
  }

  test("q165: intra/inter means recomputed from the consecutive pairing") {
    import spark.implicits._
    val rows = SimilarityOps.q165LabelCosineGap(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = graft.Util.table(spark, sf, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray,
        r.getAs[Int]("label"))).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val pairs = emb.zip(emb.tail)
      .map { case (a, b) => (a._3, b._3, cos(a._2, b._2)) }
    val nPairs = rows.map(r =>
      r.getAs[Long]("n_intra") + r.getAs[Long]("n_inter")).sum
    assert(nPairs === pairs.length)
    val r0 = rows.head
    val mine = pairs.filter(_._1 == r0.getAs[Long]("label").toInt)
    val intra = mine.filter(p => p._1 == p._2).map(_._3)
    if (intra.nonEmpty)
      assert(math.abs(r0.getAs[Double]("intra_cos") - intra.sum / intra.length) < 1e-5)
  }

  test("q166: inter-arrival percentiles are ordered and p50 matches brute force") {
    import spark.implicits._
    val rows = EventOps.q166InterarrivalQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(x => (x._1, x._2))
    val gapsByType = ev.toSeq.flatMap { case ((t, _), xs) =>
      val sorted = xs.sortBy(x => (x._3, x._4))
      sorted.zip(sorted.tail).map { case (a, b) => (t, (b._3 - a._3).toDouble / 1e6) }
    }.groupBy(_._1)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Double]("p50_ms"),
        r.getAs[Double]("p90_ms"), r.getAs[Double]("p99_ms"))
      assert(p50 <= p90 && p90 <= p99)
      val gaps = gapsByType(r.getAs[String]("event_type")).map(_._2).toArray
      assert(math.abs(p50 - medianInterp(gaps, 0.5)) < 1e-3)
    }
  }

  test("q167: readability identities hold (ratios derive from the integer sums)") {
    val rows = TextOps.q167Readability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, w, s) = (r.getAs[Long]("n_docs"), r.getAs[Long]("words"),
        r.getAs[Long]("syllables"))
      assert(n > 0 && w > 0 && s > 0)
      assert(math.abs(r.getAs[Double]("words_per_doc") - w.toDouble / n) < 1e-3)
      assert(math.abs(r.getAs[Double]("syl_per_word") - s.toDouble / w) < 1e-3)
      val flesch = 206.835 - 1.015 * (w.toDouble / n) - 84.6 * (s.toDouble / w)
      assert(math.abs(r.getAs[Double]("flesch") - flesch) < 1e-3)
    }
  }

  test("q169: two-feature OLS matches a brute-force normal-equation solve") {
    import spark.implicits._
    val rows = Extended.q169Ols2(spark, sf).collect()
    assert(rows.length === 3)
    val li = graft.Util.table(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_discount", $"l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = li(r.getAs[String]("l_returnflag"))
      val n = xs.length.toDouble
      val (s1, s2, sy) = (xs.map(_._2).sum, xs.map(_._3).sum, xs.map(_._4).sum)
      val s11 = xs.map(t => t._2 * t._2).sum
      val s22 = xs.map(t => t._3 * t._3).sum
      val s12 = xs.map(t => t._2 * t._3).sum
      val s1y = xs.map(t => t._2 * t._4).sum
      val s2y = xs.map(t => t._3 * t._4).sum
      val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
        s2 * (s1 * s12 - s11 * s2)
      val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
        s2 * (s1y * s12 - s11 * s2y)) / det
      val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
        s2 * (s1 * s2y - s1y * s2)) / det
      val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
        sy * (s1 * s12 - s11 * s2)) / det
      assert(r.getAs[Long]("n_rows") === xs.length)
      assert(math.abs(r.getAs[Double]("intercept") - b0) < 1e-2)
      assert(math.abs(r.getAs[Double]("beta_qty") - b1) < 1e-3)
      assert(math.abs(r.getAs[Double]("beta_disc") - b2) < 1e-1)
      // residuals through the fit must beat the mean-only model
      val sse = xs.map(t => math.pow(t._4 - (b0 + b1 * t._2 + b2 * t._3), 2)).sum
      val sst = xs.map(t => math.pow(t._4 - sy / n, 2)).sum
      assert(sse < sst)
    }
  }

  test("q170: Welch t and dof match brute force; dof between min(n)-1 and n_a+n_b-2") {
    import spark.implicits._
    val rows = EventOps.q170WelchTtest(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"value", $"user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = ev(r.getAs[String]("event_type"))
      val as = xs.filter(_._3 % 2 == 0).map(_._2)
      val bs = xs.filter(_._3 % 2 != 0).map(_._2)
      def meanVar(v: Array[Double]): (Double, Double) = {
        val m = v.sum / v.length
        (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
      }
      val ((ma, va), (mb, vb)) = (meanVar(as), meanVar(bs))
      val sem = va / as.length + vb / bs.length
      val t = (ma - mb) / math.sqrt(sem)
      val dof = sem * sem /
        (math.pow(va / as.length, 2) / (as.length - 1) +
          math.pow(vb / bs.length, 2) / (bs.length - 1))
      assert(r.getAs[Long]("n_a") === as.length)
      assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-3)
      assert(math.abs(r.getAs[Double]("dof") - dof) < 1.0)
      assert(dof >= math.min(as.length, bs.length) - 1 &&
        dof <= as.length + bs.length - 2)
    }
  }

  test("q171: JSD in [0, ln 2]; matches brute force over the type mix") {
    import spark.implicits._
    val rows = EventOps.q171JsDivergence(spark, sf).collect()
    assert(rows.length === 1)
    val xs = graft.Util.events(spark, sf)
      .select($"event_type", $"user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val aCnt = xs.filter(_._2 % 2 == 0).groupBy(_._1).map { case (k, v) => k -> v.length }
    val bCnt = xs.filter(_._2 % 2 != 0).groupBy(_._1).map { case (k, v) => k -> v.length }
    val (na, nb) = (aCnt.values.sum.toDouble, bCnt.values.sum.toDouble)
    val want = aCnt.keySet.map { k =>
      val (pa, pb) = (aCnt(k) / na, bCnt(k) / nb)
      val m = (pa + pb) / 2
      pa * math.log(pa / m) / 2 + pb * math.log(pb / m) / 2
    }.sum
    val jsd = rows.head.getAs[Double]("jsd")
    assert(jsd >= 0.0 && jsd <= math.log(2.0))
    assert(math.abs(jsd - want) < 1e-6)
    assert(rows.head.getAs[Long]("n_a") === na.toLong)
  }

  test("q172: lag-1 autocorrelation bounded by 1 and matches brute force") {
    import spark.implicits._
    val rows = EventOps.q172DailyAutocorr(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(identity).map { case ((t, d), v) => ((t, d), v.length.toLong) }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val mine = daily.collect { case ((tt, d), c) if tt == t => (d, c) }.toMap
      val pairs = mine.toSeq.flatMap { case (d, c) =>
        mine.get(d + 1).map(c2 => (c.toDouble, c2.toDouble))
      }
      assert(r.getAs[Long]("n_pairs") === pairs.length)
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val want = (n * pairs.map(p => p._1 * p._2).sum - sx * sy) /
        (math.sqrt(n * pairs.map(p => p._1 * p._1).sum - sx * sx) *
          math.sqrt(n * pairs.map(p => p._2 * p._2).sum - sy * sy))
      val got = r.getAs[Double]("lag1_autocorr")
      assert(got >= -1.0 && got <= 1.0)
      assert(math.abs(got - want) < 1e-6)
    }
  }

  test("q173: flagged set equals brute-force best-benchmark-cosine thresholding") {
    import spark.implicits._
    val rows = SimilarityOps.q173EmbedDecon(spark, sf).collect()
    val emb = graft.Util.table(spark, sf, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val bench = emb.filter(_._1 < 50)
    val want = emb.filter(_._1 >= 50).flatMap { case (id, e) =>
      val (bid, s) = bench.map(b => (b._1, cos(e, b._2)))
        .maxBy(t => (t._2, -t._1))
      if (s >= 0.4) Some((id, bid, s)) else None
    }.sortBy(_._1)
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq === want.map(_._1).toSeq)
    rows.zip(want).foreach { case (r, (_, bid, s)) =>
      assert(r.getAs[Long]("bench_id") === bid)
      assert(math.abs(r.getAs[Double]("sim") - s) < 1e-5)
      assert(r.getAs[Double]("sim") >= 0.4)
    }
  }

  test("q174: changepoint peak matches the brute-force cumulative-deviation argmax") {
    import spark.implicits._
    val rows = EventOps.q174Changepoint(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .groupBy(_._1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val days = daily(t).map(x => (x._2, x._3)).toSeq.sortBy(_._1)
      val total = days.map(_._2).sum.toDouble
      val n = days.length.toDouble
      var cum = 0L
      val scored = days.zipWithIndex.map { case ((d, c), i) =>
        cum += c
        (d, cum, math.abs(cum - (i + 1) * total / n))
      }
      val best = scored.maxBy(s => (s._3, -s._1))
      assert(r.getAs[Long]("peak_day") === best._1)
      assert(r.getAs[Long]("cum_at_peak") === best._2)
      assert(math.abs(r.getAs[Double]("score") - best._3) < 1e-3)
    }
  }

  test("drift family torture: seeded random corpora — bounds hold, planted shift dominates") {
    import spark.implicits._
    for (seed <- Seq(11, 42, 77)) {
      val rng = new scala.util.Random(seed)
      def v2(x: Double): Double = math.max(0.01, math.round(x * 100).toDouble / 100)
      // "stable": both cohorts ~N(50,10); "shifted": odd users ~N(80,10)
      val rows = (0 until 4000).map { i =>
        val uid = rng.nextInt(100).toLong
        val typ = if (i % 2 == 0) "stable" else "shifted"
        val base = 50.0 + 10.0 * rng.nextGaussian()
        val value =
          if (typ == "shifted" && uid % 2 != 0) v2(base + 30.0) else v2(base)
        val day = rng.nextInt(10).toLong
        (i.toLong, day * 86400000000000L + i.toLong * 1000000L, uid, typ, value, "{}")
      }
      val dir = tmpDir(s"drift-$seed")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")

      val ks = EventOps.q163KsDrift(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("ks")).toMap
      val psi = EventOps.q168PsiDrift(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("psi")).toMap
      val t = EventOps.q170WelchTtest(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("t_stat")).toMap
      ks.values.foreach(k => assert(k >= 0.0 && k <= 1.0, s"seed=$seed ks=$k"))
      psi.values.foreach(p => assert(p >= 0.0, s"seed=$seed psi=$p"))
      assert(ks("shifted") > ks("stable") + 0.2,
        s"seed=$seed: planted shift must dominate KS: $ks")
      assert(psi("shifted") > psi("stable") + 0.5,
        s"seed=$seed: planted shift must dominate PSI: $psi")
      assert(math.abs(t("shifted")) > 10 * math.abs(t("stable")).max(0.1),
        s"seed=$seed: planted shift must dominate t: $t")

      val jsd = EventOps.q171JsDivergence(spark, dir).collect().head.getAs[Double]("jsd")
      assert(jsd >= 0.0 && jsd < 0.01,
        s"seed=$seed: the TYPE mix is cohort-balanced by construction, jsd=$jsd")
      EventOps.q172DailyAutocorr(spark, dir).collect().foreach { r =>
        val a = r.getAs[Double]("lag1_autocorr")
        assert(a >= -1.0 && a <= 1.0, s"seed=$seed autocorr=$a")
      }
      val cp = EventOps.q174Changepoint(spark, dir).collect()
      assert(cp.map(_.getAs[String]("event_type")).toSet === Set("stable", "shifted"))
      cp.foreach(r => assert(r.getAs[Double]("score") >= 0.0))
    }
  }

  test("q178: novelty bounded; earliest doc fully novel; brute-force check on a sample") {
    import spark.implicits._
    val rows = DedupOps.q178NgramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
    assert(rows.head.getAs[Double]("novelty") === 1.0,
      "the earliest shingled doc can only contain first occurrences")
    // brute force: distinct 4-gram sets per doc, min-doc first occurrence
    val sh = graft.Util.table(spark, sf, "documents").collect()
      .map { r =>
        val toks = r.getAs[String]("text").split(" ")
        r.getAs[Long]("doc_id") ->
          toks.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    val firstDoc = sh.toSeq.flatMap { case (d, ss) => ss.map(_ -> d) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).min }
    rows.take(5).foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val mine = sh(d)
      assert(r.getAs[Long]("n_shingles") === mine.size)
      assert(r.getAs[Long]("n_novel") === mine.count(s => firstDoc(s) == d))
    }
  }

  test("q180: threshold curve is monotone non-increasing; doc counts consistent with pair counts") {
    import spark.implicits._
    val rows = DedupOps.q180DedupThresholdCurve(spark, sf).collect()
    assert(rows.length === 5)
    val byTau = rows.sortBy(_.getAs[Double]("tau"))
    byTau.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("n_pairs") >= w(1).getAs[Long]("n_pairs"))
      assert(w(0).getAs[Long]("n_docs") >= w(1).getAs[Long]("n_docs"))
    }
    byTau.foreach { r =>
      val (p, d) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"))
      assert(d <= 2 * p, "a pair involves at most two docs")
      assert(p == 0 || d >= 2, "any surviving pair involves at least two docs")
    }
  }

  test("q179: dispersion matches brute-force variance/mean of daily counts") {
    import spark.implicits._
    val rows = EventOps.q179DailyDispersion(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .groupBy(_._1)
    rows.foreach { r =>
      val cs = daily(r.getAs[String]("event_type")).map(_._3.toDouble).toSeq
      val mean = cs.sum / cs.length
      val varS = cs.map(c => (c - mean) * (c - mean)).sum / (cs.length - 1)
      assert(r.getAs[Long]("n_days") === cs.length)
      assert(math.abs(r.getAs[Double]("mean_daily") - mean) < 1e-3)
      assert(math.abs(r.getAs[Double]("vmr") - varS / mean) < 1e-4)
      assert(r.getAs[Double]("vmr") >= 0.0)
    }
  }

  test("q168: PSI is non-negative and matches the brute-force binned formula") {
    import spark.implicits._
    val rows = EventOps.q168PsiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"value", $"user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= 0.0)
      val xs = ev(r.getAs[String]("event_type"))
      val (lo, hi) = (xs.map(_._2).min, xs.map(_._2).max)
      def bin(v: Double): Long =
        if (hi > lo) math.min(math.floor((v - lo) * 10 / (hi - lo)).toLong, 9L) else 0L
      val as = xs.filter(_._3 % 2 == 0)
      val bs = xs.filter(_._3 % 2 != 0)
      val want = (0L to 9L).map { b =>
        val pa = (as.count(x => bin(x._2) == b) + 0.5) / (as.length + 5.0)
        val pb = (bs.count(x => bin(x._2) == b) + 0.5) / (bs.length + 5.0)
        (pa - pb) * math.log(pa / pb)
      }.sum
      assert(math.abs(psi - want) < 1e-6)
    }
  }

  test("q181: Mann-Whitney U matches the brute-force tie-averaged rank sum") {
    import spark.implicits._
    val rows = EventOps.q181MannWhitney(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"value", $"user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = ev(r.getAs[String]("event_type"))
      val sorted = xs.sortBy(_._2)
      // average rank per value (1-based)
      val ranks = scala.collection.mutable.Map[Double, Double]()
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
        ranks(sorted(i)._2) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
        i = j
      }
      val as = xs.filter(_._3 % 2 == 0)
      val na = as.length.toDouble
      val nb = xs.length - na
      val ra = as.map(x => ranks(x._2)).sum
      val u = ra - na * (na + 1) / 2
      assert(r.getAs[Long]("n_a") === as.length)
      assert(math.abs(r.getAs[Double]("u_stat") - u) < 1e-6)
      val n = na + nb
      val tie3 = xs.groupBy(_._2).values.map { g =>
        val c = g.size.toDouble; c * c * c - c
      }.sum
      val varU = na * nb / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
      val z = (u - na * nb / 2) / math.sqrt(varU)
      assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-3)
    }
  }

  test("q182: chi-squared statistic matches the brute-force contingency table") {
    import spark.implicits._
    val rows = EventOps.q182Chi2Drift(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), (r.getLong(1) / 86400000000000L) % 2 == 0))
    val byType = ev.groupBy(_._1)
    val (ta, tb) = (ev.count(_._2).toDouble, ev.count(!_._2).toDouble)
    var total = 0.0
    rows.foreach { r =>
      val xs = byType(r.getAs[String]("event_type"))
      val (oa, ob) = (xs.count(_._2).toDouble, xs.count(!_._2).toDouble)
      assert(r.getAs[Long]("n_a") === oa.toLong)
      val ea = (oa + ob) * ta / (ta + tb)
      val eb = (oa + ob) * tb / (ta + tb)
      val part = (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb
      assert(math.abs(r.getAs[Double]("chi2_part") - part) < 1e-5)
      total += part
      assert(r.getAs[Long]("dof") === rows.length - 1L)
    }
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("chi2_total") - total) < 1e-3)
    }
  }

  test("q183: EWMA matches the sequential zero-init recursion") {
    import spark.implicits._
    val rows = EventOps.q183EwmaDaily(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .groupBy(_._1).map { case (t, v) => (t, v.toSeq.sortBy(_._2)) }
    val got = rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
      r.getAs[Double]("ewma")).toMap
    daily.foreach { case (t, series) =>
      var e = 0.0
      series.foreach { case (_, d, c) =>
        e = 0.3 * c + 0.7 * e
        assert(math.abs(got((t, d)) - e) < 1e-3, s"type $t day $d")
      }
    }
  }

  test("q187: rolling 7-day distinct users matches brute-force trailing sets") {
    import spark.implicits._
    val rows = EventOps.q187RollingDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000000L))
    val days = ev.map(_._2).distinct.sorted
    assert(rows.length === days.length)
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      val win = ev.filter(x => x._2 >= d - 6 && x._2 <= d)
      assert(r.getAs[Long]("n7_users") === win.map(_._1).distinct.length.toLong)
      assert(r.getAs[Long]("n7_events") === win.length.toLong)
    }
  }

  test("q188: bootstrap CI brackets the mean and matches brute-force replicate weights") {
    import spark.implicits._
    val rows = EventOps.q188BootstrapCi(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"event_id", $"value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    rows.foreach { r =>
      val xs = ev(r.getAs[String]("event_type"))
      val mean = xs.map(_._3).sum / xs.length
      assert(math.abs(r.getAs[Double]("mean_val") - mean) < 1e-2)
      val reps = (0 until 32).map { b =>
        var (sw, swv) = (0L, BigDecimal(0))
        xs.foreach { case (_, id, v) =>
          val h = md5hex(s"$id:0") + md5hex(s"$id:1")
          val w = (if (h(2 * b) <= '7') 1 else 0) +
            (if (h(2 * b + 1) <= '7') 1 else 0)
          sw += w; swv += BigDecimal(v) * w
        }
        (swv / sw).toDouble
      }
      val rm = reps.sum / reps.length
      val sd = math.sqrt(reps.map(m => (m - rm) * (m - rm)).sum / (reps.length - 1))
      assert(math.abs(r.getAs[Double]("sd_boot") - sd) < 1e-3)
      assert(r.getAs[Double]("ci_lo") < mean && mean < r.getAs[Double]("ci_hi"))
    }
  }

  test("q189: weekday profile means and seasonality ratio match brute force") {
    import spark.implicits._
    val rows = EventOps.q189WeekdayProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .toSeq.groupBy(_._1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val slots = daily(t).groupBy(_._2 % 7)
        .map { case (dow, g) => (dow, g.map(_._3).sum.toDouble / g.size) }
      val m = slots(r.getAs[Long]("dow"))
      assert(math.abs(r.getAs[Double]("mean_daily") - m) < 1e-3)
      val ratio = slots.values.max / slots.values.min
      assert(math.abs(r.getAs[Double]("season_ratio") - ratio) < 1e-3)
    }
  }

  test("q185: per-doc top term matches the brute-force tf/df argmax census") {
    import spark.implicits._
    val rows = TextOps.q185DocTopTerm(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Util.table(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tf = docs.flatMap { case (id, lang, text) =>
      text.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (t, g) => (id, lang, t, g.length) }
    }
    val df = tf.groupBy(_._3).map { case (t, g) => (t, g.map(_._1).distinct.size) }
    val top = tf.groupBy(_._1).toSeq.map { case (_, cand) =>
      val best = cand.minBy(c => (-c._4.toDouble / df(c._3), c._3))
      (best._2, best._3)
    }
    val census = top.groupBy(identity).map { case ((lang, tok), g) =>
      (lang, tok, g.size.toLong) }
    val byLang = census.groupBy(_._1).map { case (l, g) =>
      (l, g.toSeq.sortBy(c => (-c._3, c._2)).take(5)) }
    rows.foreach { r =>
      val want = byLang(r.getAs[String]("lang"))(r.getAs[Long]("rk").toInt - 1)
      assert(r.getAs[String]("token") === want._2)
      assert(r.getAs[Long]("n_docs") === want._3)
    }
  }

  test("q186: centroid shift cosine matches brute-force cohort centroids") {
    import spark.implicits._
    val rows = SimilarityOps.q186CentroidShift(spark, sf).collect()
    assert(rows.nonEmpty)
    val em = graft.Util.table(spark, sf, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._2)
    rows.foreach { r =>
      val xs = em(r.getAs[Int]("label"))
      val as = xs.filter(_._1 % 2 == 0).map(_._3)
      val bs = xs.filter(_._1 % 2 != 0).map(_._3)
      assert(r.getAs[Long]("n_a") === as.length.toLong)
      val dims = xs.head._3.length
      def cent(vs: Array[Array[Float]]) = Array.tabulate(dims) { d =>
        math.rint(vs.map(_(d).toDouble).sum / vs.length * 1e6) / 1e6
      }
      val (ca, cb) = (cent(as), cent(bs))
      val dot = ca.zip(cb).map { case (x, y) => x * y }.sum
      val qa = ca.map(x => x * x).sum
      val qb = cb.map(x => x * x).sum
      assert(math.abs(r.getAs[Double]("cos_shift")
        - dot / math.sqrt(qa * qb)) < 1e-5)
      val l2 = math.sqrt(ca.zip(cb).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(math.abs(r.getAs[Double]("l2_shift") - l2) < 1e-5)
    }
  }

  test("q190: market share matches the brute-force star join and is a valid share") {
    import spark.implicits._
    val rows = Relational.q190MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    def m(name: String, cols: String*) =
      graft.Util.rawTable(spark, sf, name).select(cols.map(col): _*).collect()
    val region = m("region", "r_regionkey", "r_name")
      .filter(_.getString(1) == "AMERICA").map(_.getInt(0).toLong).toSet
    val nation = m("nation", "n_nationkey", "n_regionkey", "n_name")
      .map(r => r.getInt(0).toLong -> (r.getInt(1).toLong, r.getString(2))).toMap
    val cust = m("customer", "c_custkey", "c_nationkey")
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val supp = m("supplier", "s_suppkey", "s_nationkey")
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val part = m("part", "p_partkey", "p_type")
      .filter(_.getString(1) == "PROMO").map(_.getLong(0)).toSet
    val ord = graft.Util.table(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("y"),
        $"o_orderdate").collect()
      .filter { r =>
        val y = r.getAs[Int]("y"); y >= 1995 && y <= 1996
      }.map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Int]("y"))).toMap
    val vols = graft.Util.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount").collect()
      .flatMap { r =>
        for {
          (ck, y) <- ord.get(r.getLong(0))
          if part.contains(r.getLong(1))
          cn <- cust.get(ck)
          if region.contains(nation(cn)._1)
          sn <- supp.get(r.getLong(2))
        } yield (y, nation(sn)._2 == "NATION_1",
          BigDecimal(r.getDouble(3)) * (1 - BigDecimal(r.getDouble(4))))
      }
    val byYear = vols.groupBy(_._1)
    rows.foreach { r =>
      val y = r.getAs[Long]("o_year").toInt
      val xs = byYear(y)
      val tot = xs.map(_._3).sum
      val nat1 = xs.filter(_._2).map(_._3).sum
      assert(math.abs(r.getAs[Double]("total_volume") - tot.toDouble) < 1e-2)
      assert(math.abs(r.getAs[Double]("mkt_share") - (nat1 / tot).toDouble) < 1e-4)
      assert(r.getAs[Double]("mkt_share") >= 0 && r.getAs[Double]("mkt_share") <= 1)
    }
  }

  test("q191: burstiness matches brute-force per-doc tf moments") {
    import spark.implicits._
    val rows = TextOps.q191TokenBurstiness(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val tf = graft.Util.table(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .flatMap { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).groupBy(identity)
          .map { case (t, g) => (t, g.length.toLong) }
      }.groupBy(_._1)
    rows.foreach { r =>
      val xs = tf(r.getAs[String]("token")).map(_._2.toDouble).toSeq
      assert(xs.length >= 20)
      assert(r.getAs[Long]("n_docs") === xs.length)
      val mean = xs.sum / xs.length
      val varS = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
      assert(math.abs(r.getAs[Double]("mean_tf") - mean) < 1e-3)
      assert(math.abs(r.getAs[Double]("vmr") - varS / mean) < 1e-4)
    }
  }

  test("q192: dup-group purity histogram matches brute-force head-fingerprint grouping") {
    import spark.implicits._
    val rows = DedupOps.q192DupSourcePurity(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Util.table(spark, sf, "documents")
      .select(md5(lower(substring($"text", 1, 40))).as("g"), $"source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val groups = docs.groupBy(_._1).filter(_._2.length >= 2)
    val cells = groups.values.map { g =>
      val bySrc = g.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
      val n = g.length.toDouble
      val ent = -bySrc.values.map(c => (c / n) * math.log(c / n)).sum
      ((g.length.toLong, bySrc.size.toLong), ent)
    }.toSeq.groupBy(_._1)
    assert(rows.length === cells.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("group_size"), r.getAs[Long]("n_sources"))
      val es = cells(k).map(_._2)
      assert(r.getAs[Long]("n_groups") === es.length.toLong)
      assert(math.abs(r.getAs[Double]("avg_entropy") - es.sum / es.length) < 1e-3)
    }
  }

  test("q193: nearest as-of picks the time-closest signup (ties earlier)") {
    import spark.implicits._
    val rows = EventOps.q193AsofNearest(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2) / 1000L, r.getLong(3)))
    val signups = ev.filter(_._1 == "signup").groupBy(_._2)
    val purchases = ev.filter(_._1 == "purchase")
      .map(r => r._4 -> (r._2, r._3)).toMap
    assert(rows.length ===
      purchases.count { case (_, (u, _)) => signups.contains(u) })
    rows.foreach { r =>
      val (u, pts) = purchases(r.getAs[Long]("event_id"))
      val best = signups(u).map(_._3)
        .minBy(s => (math.abs(pts - s), s))
      assert(r.getAs[Long]("signup_ts_us") === best)
      assert(r.getAs[Long]("signed_gap_us") === best - pts)
    }
  }

  test("q194: column profile matches per-column brute force") {
    import spark.implicits._
    val rows = Extended.q194ColumnProfile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size === 6)
    val ord = graft.Util.table(spark, sf, "orders").collect()
    assert(rows.values.forall(_.getAs[Long]("n") === ord.length.toLong))
    val ck = ord.map(_.getAs[Long]("o_custkey"))
    assert(rows("o_custkey").getAs[Long]("n_distinct") === ck.distinct.length)
    assert(rows("o_custkey").getAs[Double]("min_num") === ck.min.toDouble)
    assert(rows("o_custkey").getAs[Double]("max_num") === ck.max.toDouble)
    assert(rows("o_custkey").getAs[Long]("n_null") === 0L)
    val st = ord.map(_.getAs[String]("o_orderstatus"))
    assert(rows("o_orderstatus").getAs[Long]("n_distinct") === st.distinct.length)
    assert(rows("o_orderstatus").getAs[String]("min_str") === st.min)
    assert(rows("o_orderstatus").getAs[String]("max_str") === st.max)
    assert(rows("o_orderstatus").isNullAt(
      rows("o_orderstatus").fieldIndex("min_num")))
    val tp = ord.map(_.getAs[Double]("o_totalprice"))
    assert(rows("o_totalprice").getAs[Double]("min_num") === tp.min)
    assert(rows("o_totalprice").getAs[Double]("max_num") === tp.max)
  }

  test("q195: skew card HHI/top-share match brute-force user concentration") {
    import spark.implicits._
    val rows = EventOps.q195SkewCard(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val cs = ev(r.getAs[String]("event_type")).groupBy(_._2)
        .values.map(_.length.toLong).toSeq
      val n = cs.sum.toDouble
      assert(r.getAs[Long]("n_users") === cs.length.toLong)
      assert(r.getAs[Long]("n_events") === cs.sum)
      assert(r.getAs[Long]("max_user_events") === cs.max)
      val hhi = cs.map(c => (c / n) * (c / n)).sum
      assert(math.abs(r.getAs[Double]("hhi") - hhi) < 1e-5)
      assert(hhi >= 1.0 / cs.length - 1e-9 && hhi <= 1.0)
      assert(math.abs(r.getAs[Double]("top_share") - cs.max / n) < 1e-6)
    }
  }

  test("q196: covariance rows match brute force; diagonal non-negative") {
    import spark.implicits._
    val rows = SimilarityOps.q196EmbedCovariance(spark, sf).collect()
    assert(rows.length === 36)
    val em = graft.Util.table(spark, sf, "embeddings")
      .select($"embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray)
    val n = em.length.toDouble
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      assert(r.getAs[Long]("n") === em.length.toLong)
      val want = em.map(e => e(i) * e(j)).sum / n -
        (em.map(_(i)).sum / n) * (em.map(_(j)).sum / n)
      assert(math.abs(r.getAs[Double]("cov") - want) < 1e-4, s"cov($i,$j)")
      if (i == j) assert(r.getAs[Double]("cov") >= -1e-9)
    }
  }

  test("q197: session conversion matches brute-force sessionized funnel") {
    import spark.implicits._
    val row = EventOps.q197SessionConversion(spark, sf).collect().head
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    var (nSess, nView, nVC, nFull) = (0L, 0L, 0L, 0L)
    ev.values.foreach { xs =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      var sessions = Seq.newBuilder[Seq[(Long, String)]]
      var cur = List.empty[(Long, String)]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (cur.nonEmpty && e._2 - prev > 1800000000L) {
          sessions += cur.reverse; cur = Nil
        }
        cur = (e._2, e._4) :: cur; prev = e._2
      }
      if (cur.nonEmpty) sessions += cur.reverse
      sessions.result().foreach { s =>
        nSess += 1
        def first(t: String) = s.filter(_._2 == t).map(_._1).minOption
        (first("view"), first("click"), first("purchase")) match {
          case (Some(tv), tcO, tpO) =>
            nView += 1
            if (tcO.exists(tv < _)) {
              nVC += 1
              if (tpO.exists(tp => tcO.exists(tc => tv < tc && tc < tp))) nFull += 1
            }
          case _ => ()
        }
      }
    }
    assert(row.getAs[Long]("n_sessions") === nSess)
    assert(row.getAs[Long]("n_view") === nView)
    assert(row.getAs[Long]("n_view_click") === nVC)
    assert(row.getAs[Long]("n_full") === nFull)
    assert(math.abs(row.getAs[Double]("conversion_rate")
      - nFull.toDouble / nView) < 1e-5)
  }

  test("q198: growth curve matches brute-force first-seen; cumulative is monotone") {
    import spark.implicits._
    val rows = EventOps.q198UserGrowth(spark, sf).collect()
    assert(rows.nonEmpty)
    val fs = graft.Util.events(spark, sf)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000000L))
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).min) }
    val daily = fs.values.groupBy(identity).map { case (d, g) => (d, g.size.toLong) }
    assert(rows.length === daily.size)
    var cum = 0L
    rows.sortBy(_.getAs[Long]("day")).foreach { r =>
      val d = r.getAs[Long]("day")
      assert(r.getAs[Long]("n_new") === daily(d))
      cum += daily(d)
      assert(r.getAs[Long]("n_total") === cum)
    }
    assert(cum === fs.size.toLong, "cumulative ends at the user count")
  }

  test("q199: conversion latency matches brute-force first-view/first-purchase gaps") {
    import spark.implicits._
    val rows = EventOps.q199ConvertLatency(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getString(2)))
      .groupBy(_._1)
    val conv = ev.values.flatMap { xs =>
      val tv = xs.filter(_._3 == "view").map(_._2).minOption
      val tp = xs.filter(_._3 == "purchase").map(_._2).minOption
      (tv, tp) match {
        case (Some(v), Some(p)) if v < p => Some((p / 86400000000L, p - v))
        case _ => None
      }
    }.toSeq.groupBy(_._1)
    assert(rows.length === conv.size)
    rows.foreach { r =>
      val gaps = conv(r.getAs[Long]("day")).map(_._2)
      assert(r.getAs[Long]("n_converted") === gaps.length.toLong)
      assert(r.getAs[Long]("min_gap_us") === gaps.min)
      assert(r.getAs[Long]("max_gap_us") === gaps.max)
      assert(math.abs(r.getAs[Double]("mean_gap_us")
        - gaps.sum.toDouble / gaps.length) < 1.0)
    }
  }

  test("q200: decayed engagement matches the brute-force exponential sum; top-20 ordered") {
    import spark.implicits._
    val rows = EventOps.q200DecayedEngagement(spark, sf).collect()
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"ts", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getDouble(2)))
    val tMax = ev.map(_._2).max
    val scores = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.map(x => x._3 * math.exp((x._2 - tMax) / 604800000000.0)).sum)
    }
    assert(rows.length === math.min(20, scores.size))
    val want = scores.toSeq
      .map { case (u, s) => (u, math.rint(s * 1e6) / 1e6) }
      .sortBy { case (u, s) => (-s, u) }.take(20)
    rows.zip(want).foreach { case (r, (u, s)) =>
      assert(r.getAs[Long]("user_id") === u)
      assert(math.abs(r.getAs[Double]("score") - s) < 1e-4)
    }
    val got = rows.map(_.getAs[Double]("score"))
    assert(got.zip(got.tail).forall { case (a, b) => a >= b }, "descending")
  }

  test("q201: sole-returner matches brute-force EXISTS/NOT-EXISTS semantics") {
    import spark.implicits._
    val rows = Relational.q201SoleReturner(spark, sf).collect()
    val li = graft.Util.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val allPairs = li.map(x => (x._1, x._2)).distinct.groupBy(_._1)
    val rPairs = li.filter(_._3 == "R").map(x => (x._1, x._2)).distinct
    val rByOrder = rPairs.groupBy(_._1)
    val counts = rPairs.filter { case (o, s) =>
      allPairs(o).exists(_._2 != s) && !rByOrder(o).exists(_._2 != s)
    }.groupBy(_._2).map { case (s, g) => (s, g.length.toLong) }
    val want = counts.toSeq.sortBy { case (s, n) => (-n, s) }.take(20)
    assert(rows.length === math.min(20, counts.size))
    rows.zip(want).foreach { case (r, (s, n)) =>
      assert(r.getAs[Long]("s_suppkey") === s)
      assert(r.getAs[Long]("n_sole_return_orders") === n)
    }
  }

  test("q202: contingency independence matches brute-force margins and residuals") {
    import spark.implicits._
    val rows = TextOps.q202LangSourceIndependence(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Util.table(spark, sf, "documents")
      .select($"source", $"lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toDouble
    val rs = docs.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val cs = docs.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val cells = docs.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    assert(rows.length === cells.size)
    var total = 0.0
    rows.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val o = cells(key)
      val e = rs(key._1) * cs(key._2) / n
      assert(r.getAs[Long]("n_docs") === o.toLong)
      assert(math.abs(r.getAs[Double]("expected") - e) < 1e-3)
      assert(math.abs(r.getAs[Double]("std_residual")
        - (o - e) / math.sqrt(e)) < 1e-3)
      assert(r.getAs[Long]("dof") === (rs.size - 1L) * (cs.size - 1L))
      total += (o - e) * (o - e) / e
    }
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("chi2_total") - total) < 1e-2))
  }

  test("q203: seasonal-naive backtest matches brute-force day-7 forecasts") {
    import spark.implicits._
    val rows = EventOps.q203SeasonalNaive(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(identity).map { case ((t, d), v) => ((t, d), v.length.toLong) }
    val byType = daily.groupBy(_._1._1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val m = byType(t).map { case ((_, d), c) => (d, c) }
      val pairs = m.toSeq.flatMap { case (d, c) =>
        m.get(d - 7).map(f => (c, f))
      }
      assert(r.getAs[Long]("n_days") === pairs.length.toLong)
      val mae = pairs.map { case (a, f) => math.abs(a - f).toDouble }.sum / pairs.length
      val mape = pairs.map { case (a, f) => math.abs(a - f).toDouble / a }.sum / pairs.length
      assert(math.abs(r.getAs[Double]("mae") - mae) < 1e-3)
      assert(math.abs(r.getAs[Double]("mape") - mape) < 1e-4)
    }
  }

  test("q204: Theil-Sen slope is the brute-force median pairwise slope") {
    import spark.implicits._
    val rows = EventOps.q204TheilSen(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = daily(r.getAs[String]("event_type")).map(x => (x._2, x._3)).toSeq
      val slopes = (for {
        a <- xs; b <- xs if a._1 < b._1
      } yield (b._2 - a._2).toDouble / (b._1 - a._1)).sorted
      assert(r.getAs[Long]("n_pairs") === slopes.length.toLong)
      val med = slopes((slopes.length + 1) / 2 - 1)
      assert(math.abs(r.getAs[Double]("theilsen_slope") - med) < 1e-5)
    }
  }

  test("q205: embedding audit matches brute-force norms and pathology counts") {
    import spark.implicits._
    val rows = SimilarityOps.q205EmbedQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    val em = graft.Util.table(spark, sf, "embeddings")
      .select($"label", $"embedding").collect()
      .map(r => (r.getInt(0), r.getAs[scala.collection.Seq[Float]](1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = em(r.getAs[Int]("label")).map(_._2)
      assert(r.getAs[Long]("n_vecs") === xs.length.toLong)
      assert(r.getAs[Long]("n_dims_seen") === xs.map(_.length).distinct.length)
      val norms = xs.map(v =>
        math.sqrt(v.map(x => x.toDouble * x).sum))
      assert(r.getAs[Long]("n_zero") === norms.count(_ == 0.0).toLong)
      assert(r.getAs[Long]("n_nan") === xs.count(_.exists(_.isNaN)).toLong)
      assert(math.abs(r.getAs[Double]("mean_norm")
        - norms.sum / norms.length) < 1e-4)
      assert(math.abs(r.getAs[Double]("min_norm") - norms.min) < 1e-5)
      assert(math.abs(r.getAs[Double]("max_norm") - norms.max) < 1e-5)
    }
  }

  test("q206: dedup savings matches brute-force keeper accounting") {
    import spark.implicits._
    val row = DedupOps.q206DedupSavings(spark, sf).collect().head
    val docs = graft.Util.table(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map { r =>
        val head = r.getString(1).take(40).toLowerCase
        (r.getLong(0), head, r.getString(1).split(" ").count(_.nonEmpty).toLong)
      }
    val keepers = docs.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val dropped = docs.filter(d => keepers(d._2) != d._1)
    assert(row.getAs[Long]("n_docs") === docs.length.toLong)
    assert(row.getAs[Long]("n_dropped_docs") === dropped.length.toLong)
    assert(row.getAs[Long]("tokens_total") === docs.map(_._3).sum)
    assert(row.getAs[Long]("tokens_dropped") === dropped.map(_._3).sum)
    assert(math.abs(row.getAs[Double]("pct_tokens_saved")
      - dropped.map(_._3).sum.toDouble / docs.map(_._3).sum) < 1e-6)
  }

  test("q207: transition entropy matches brute-force Markov counts") {
    import spark.implicits._
    val rows = EventOps.q207TransitionEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val pairs = ev.values.toSeq.flatMap { xs =>
      val s = xs.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }
    val byCur = pairs.groupBy(_._1)
    rows.foreach { r =>
      val fs = byCur(r.getAs[String]("cur")).map(_._2)
      val counts = fs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(r.getAs[Long]("n_pairs") === fs.length.toLong)
      assert(r.getAs[Long]("n_followers") === counts.size.toLong)
      val n = fs.length.toDouble
      val h = -counts.values.map(c => (c / n) * math.log(c / n)).sum
      assert(math.abs(r.getAs[Double]("entropy") - h) < 1e-3)
      val top = counts.toSeq.maxBy { case (t, c) => (c, t) }
      assert(r.getAs[String]("top_follower") === top._1)
      assert(r.getAs[Long]("top_count") === top._2)
    }
  }

  test("q208: Pareto deciles match brute-force NTILE accounting; shares monotone to 1") {
    import spark.implicits._
    val rows = Relational.q208RevenuePareto(spark, sf).collect()
    val pc = graft.Util.table(spark, sf, "orders")
      .select($"o_custkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1))))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }
      .toSeq.sortBy { case (k, rev) => (-rev, k) }
    val nC = pc.length
    val nBuckets = math.min(10, nC)
    assert(rows.length === nBuckets)
    // NTILE: first (n mod 10) buckets get ceil(n/10), rest floor(n/10)
    val base = nC / 10; val extra = nC % 10
    var idx = 0
    var cum = BigDecimal(0)
    val totalCents = rows.map(r => BigDecimal(r.getAs[Double]("decile_revenue"))).sum
    rows.foreach { r =>
      val d = r.getAs[Long]("decile").toInt
      val sz = base + (if (d <= extra) 1 else 0)
      val bucket = pc.slice(idx, idx + sz); idx += sz
      assert(r.getAs[Long]("n_cust") === sz.toLong)
      val rev = bucket.map(_._2).sum
      assert((BigDecimal(r.getAs[Double]("decile_revenue")) - rev).abs < BigDecimal("0.02"))
      cum += BigDecimal(r.getAs[Double]("decile_revenue"))
      assert(math.abs(r.getAs[Double]("cum_share") - (cum / totalCents).toDouble) < 1e-4)
    }
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-9)
  }

  test("q209: affinity lift matches brute-force user-basket counts") {
    import spark.implicits._
    val rows = EventOps.q209TypeAffinity(spark, sf).collect()
    assert(rows.nonEmpty)
    val inc = graft.Util.events(spark, sf)
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val users = inc.map(_._1).distinct.length.toDouble
    val byType = inc.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byUser = inc.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val both = byUser.values.count(s => s.contains(a) && s.contains(b)).toLong
      assert(r.getAs[Long]("n_both") === both)
      assert(r.getAs[Long]("ca") === byType(a))
      assert(math.abs(r.getAs[Double]("support") - both / users) < 1e-5)
      assert(math.abs(r.getAs[Double]("confidence")
        - both.toDouble / byType(a)) < 1e-5)
      assert(math.abs(r.getAs[Double]("lift")
        - both * users / (byType(a).toDouble * byType(b))) < 1e-4)
    }
  }

  test("q210: weekly rollup and WoW deltas match brute force") {
    import spark.implicits._
    val rows = EventOps.q210WeeklyDeltas(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"event_type", $"ts", $"user_id", $"value").collect()
      .map(r => (r.getString(0), r.getLong(1) / 604800000000000L,
        r.getLong(2), r.getDouble(3)))
    val weekly = ev.groupBy(x => (x._1, x._2)).map { case ((t, wk), xs) =>
      ((t, wk), (xs.length.toLong, xs.map(_._3).distinct.length.toLong,
        xs.map(x => BigDecimal(x._4)).sum))
    }
    assert(rows.length === weekly.size)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("week"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val k = (r.getAs[String]("event_type"), r.getAs[Long]("week"))
        val (n, u, v) = weekly(k)
        assert(r.getAs[Long]("n_events") === n)
        assert(r.getAs[Long]("n_users") === u)
        assert((BigDecimal(r.getAs[Double]("sum_value")) - v).abs < BigDecimal("0.01"))
        if (i == 0) assert(r.isNullAt(r.fieldIndex("wow_pct")))
        else {
          val prev = weekly((k._1, sorted(i - 1).getAs[Long]("week")))._1
          assert(math.abs(r.getAs[Double]("wow_pct")
            - (n - prev).toDouble * 100.0 / prev) < 1e-3)
        }
      }
    }
  }

  test("q211: anomaly flags match the brute-force median/MAD rule") {
    import spark.implicits._
    val rows = EventOps.q211VolumeAnomalies(spark, sf).collect()
    val daily = graft.Util.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .toSeq.groupBy(_._1)
    def lowerMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.length + 1) / 2 - 1)
    }
    val want = daily.flatMap { case (t, xs) =>
      val cs = xs.map(_._3.toDouble)
      val med = lowerMedian(cs)
      val mad = lowerMedian(cs.map(c => math.abs(c - med)))
      if (mad <= 0.0) Seq.empty
      else xs.flatMap { case (_, d, c) =>
        val z = math.rint((c - med) / (1.4826 * mad) * 1e4) / 1e4
        if (math.abs(z) > 2.5) Some(((t, d), (c, med, z))) else None
      }
    }
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (c, med, z) = want((r.getAs[String]("event_type"), r.getAs[Long]("day")))
      assert(r.getAs[Long]("n_events") === c)
      assert(r.getAs[Double]("med") === med)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)
    }
  }

  test("q212: sketched rolling reach lands within 5% of the exact windowed distinct") {
    import spark.implicits._
    val rows = EventOps.q212RollingReachSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx_users7"), r.getAs[Long]("exact_users7"))
      assert(e > 0)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"day ${r.getAs[Long]("day")}: $a vs $e")
    }
  }

  test("q213: two-proportion z matches brute-force first-event incidence") {
    import spark.implicits._
    val row = EventOps.q213TwoProportionZ(spark, sf).collect().head
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val conv = ev.map { case (u, xs) =>
      (u, xs.minBy(e => (e._2, e._3))._4 == "view")
    }
    val (as, bs) = conv.partition(_._1 % 2 == 0)
    val (na, nb) = (as.size.toDouble, bs.size.toDouble)
    val (xa, xb) = (as.count(_._2).toDouble, bs.count(_._2).toDouble)
    assert(row.getAs[Long]("n_a") === as.size.toLong)
    assert(row.getAs[Long]("conv_a") === xa.toLong)
    assert(math.abs(row.getAs[Double]("rate_a") - xa / na) < 1e-5)
    val p = (xa + xb) / (na + nb)
    if (p > 0 && p < 1) {
      val z = (xa / na - xb / nb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
      assert(math.abs(row.getAs[Double]("z_stat") - z) < 1e-3)
    } else assert(row.isNullAt(row.fieldIndex("z_stat")))
  }

  test("q214: Benford audit matches brute-force leading-digit census") {
    import spark.implicits._
    val rows = EventOps.q214BenfordAudit(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val cents = graft.Util.events(spark, sf)
      .select($"value").collect()
      .map(r => math.rint(r.getDouble(0) * 100).toLong).filter(_ > 0)
    val digits = cents.map(_.toString.head.asDigit.toLong)
    val census = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = digits.length.toDouble
    var chi2 = 0.0
    census.foreach { case (d, n) =>
      val o = n / total
      val b = math.log10(1.0 + 1.0 / d)
      chi2 += (o - b) * (o - b) / b * total
    }
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(r.getAs[Long]("n") === census(d))
      assert(math.abs(r.getAs[Double]("observed") - census(d) / total) < 1e-5)
      assert(math.abs(r.getAs[Double]("benford")
        - math.log10(1.0 + 1.0 / d)) < 1e-5)
      assert(math.abs(r.getAs[Double]("chi2_total") - chi2) < 1e-2)
    }
  }

  test("q215: hapax rate matches brute-force per-source tf census") {
    import spark.implicits._
    val rows = TextOps.q215HapaxRate(spark, sf).collect()
    assert(rows.nonEmpty)
    val tf = graft.Util.table(spark, sf, "documents")
      .select($"source", $"text").collect()
      .flatMap { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).map((r.getString(0), _))
      }
      .groupBy(identity).map { case ((s, t), g) => (s, t, g.length.toLong) }
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = tf(r.getAs[String]("source")).toSeq
      assert(r.getAs[Long]("vocab") === xs.length.toLong)
      assert(r.getAs[Long]("n_tokens") === xs.map(_._3).sum)
      assert(r.getAs[Long]("hapax") === xs.count(_._3 == 1L).toLong)
      assert(r.getAs[Long]("dis") === xs.count(_._3 == 2L).toLong)
      assert(math.abs(r.getAs[Double]("hapax_rate")
        - xs.count(_._3 == 1L).toDouble / xs.length) < 1e-5)
    }
  }

  test("q216: streak histogram matches brute-force consecutive-day runs") {
    import spark.implicits._
    val rows = EventOps.q216StreakHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val du = graft.Util.events(spark, sf)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000000L)).distinct
      .groupBy(_._1)
    val best = du.values.map { xs =>
      val days = xs.map(_._2).distinct.sorted
      var (cur, mx) = (1L, 1L)
      days.zip(days.tail).foreach { case (a, b) =>
        cur = if (b == a + 1) cur + 1 else 1L
        mx = math.max(mx, cur)
      }
      mx
    }.toSeq
    val want = best.groupBy(identity).map { case (l, g) => (l, g.size.toLong) }
    assert(rows.length === want.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") === want(r.getAs[Long]("streak_days")))
    }
    assert(rows.map(_.getAs[Long]("n_users")).sum === du.size.toLong)
  }

  test("q217: MH odds ratio matches brute-force stratum folding") {
    import spark.implicits._
    val row = EventOps.q217MantelHaenszel(spark, sf).collect().head
    val ud = graft.Util.events(spark, sf)
      .select($"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000000L, r.getString(2)))
      .groupBy(x => (x._1, x._2))
      .map { case ((u, d), xs) => (u, d, xs.exists(_._3 == "purchase")) }
    val strata = ud.groupBy(_._2).values.map { g =>
      val a = g.count(x => x._1 % 2 == 0 && x._3).toDouble
      val b = g.count(x => x._1 % 2 == 0 && !x._3).toDouble
      val c = g.count(x => x._1 % 2 != 0 && x._3).toDouble
      val d = g.count(x => x._1 % 2 != 0 && !x._3).toDouble
      (a, b, c, d)
    }.toSeq
    assert(row.getAs[Long]("n_strata") === strata.length.toLong)
    val num = strata.map { case (a, b, c, d) => a * d / (a + b + c + d) }.sum
    val den = strata.map { case (a, b, c, d) => b * c / (a + b + c + d) }.sum
    assert(math.abs(row.getAs[Double]("mh_odds_ratio") - num / den) < 1e-3)
    val (sa, sb, sc, sd) = strata.foldLeft((0.0, 0.0, 0.0, 0.0)) {
      case ((pa, pb, pc, pd), (a, b, c, d)) => (pa + a, pb + b, pc + c, pd + d)
    }
    assert(math.abs(row.getAs[Double]("crude_odds_ratio")
      - sa * sd / (sb * sc)) < 1e-3)
  }

  test("q218: churn fit matches brute-force censored retention regression") {
    import spark.implicits._
    val row = EventOps.q218ChurnHalflife(spark, sf).collect().head
    val du = graft.Util.events(spark, sf)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000000L)).distinct
    val fs = du.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val maxDay = du.map(_._2).max
    val pts = (1L to 30L).flatMap { o =>
      val cohort = fs.values.count(_ + o <= maxDay)
      val active = du.count { case (u, d) => d - fs(u) == o }
      if (cohort >= 10 && active >= 1)
        Some((o.toDouble, math.log(active.toDouble / cohort)))
      else None
    }
    assert(row.getAs[Long]("n_points") === pts.length.toLong)
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val slope = (n * pts.map(p => p._1 * p._2).sum - sx * sy) /
      (n * pts.map(p => p._1 * p._1).sum - sx * sx)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-4)
    if (slope < 0)
      assert(math.abs(row.getAs[Double]("half_life_days")
        - (-math.log(2.0) / slope)) < 1.0)
    else assert(row.isNullAt(row.fieldIndex("half_life_days")))
  }

  test("q219: Kaplan-Meier curve matches the brute-force product-limit estimator") {
    import spark.implicits._
    val rows = EventOps.q219KaplanMeier(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getString(2)))
    val maxTs = ev.map(_._2).max
    val subjects = ev.groupBy(_._1).values.flatMap { xs =>
      xs.filter(_._3 == "view").map(_._2).minOption.map { tv =>
        val tp = xs.filter(e => e._3 == "purchase" && e._2 > tv)
          .map(_._2).minOption
        tp match {
          case Some(p) => ((p - tv) / 3600000000L, true)
          case None => ((maxTs - tv) / 3600000000L, false)
        }
      }
    }.toSeq
    val grouped = subjects.groupBy(_._1).map { case (t, g) =>
      (t, g.size.toLong, g.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val total = subjects.size.toLong
    var before = 0L
    var s = 1.0
    val want = grouped.flatMap { case (t, cAll, d) =>
      val nRisk = total - before
      before += cAll
      if (d > 0 && d < nRisk) {
        s *= 1.0 - d.toDouble / nRisk
        Some(t -> (nRisk, d, s))
      } else None
    }.toMap
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (nRisk, d, sv) = want(r.getAs[Long]("hours"))
      assert(r.getAs[Long]("n_risk") === nRisk)
      assert(r.getAs[Long]("n_converted") === d)
      assert(math.abs(r.getAs[Double]("s_km") - sv) < 1e-4)
      assert(r.getAs[Double]("s_km") >= 0.0 && r.getAs[Double]("s_km") <= 1.0)
    }
  }

  test("q220: log-rank statistic matches brute-force stratum-by-stratum folding") {
    import spark.implicits._
    val row = EventOps.q220LogRank(spark, sf).collect().head
    val ev = graft.Util.events(spark, sf)
      .select($"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getString(2)))
    val maxTs = ev.map(_._2).max
    val subjects = ev.groupBy(_._1).flatMap { case (u, xs) =>
      xs.filter(_._3 == "view").map(_._2).minOption.map { tvv =>
        val tpp = xs.filter(e => e._3 == "purchase" && e._2 > tvv)
          .map(_._2).minOption
        val (t, e) = tpp match {
          case Some(p) => ((p - tvv) / 3600000000L, true)
          case None => ((maxTs - tvv) / 3600000000L, false)
        }
        (u % 2 == 0, t, e)
      }
    }.toSeq
    val times = subjects.map(_._2).distinct.sorted
    var (obs, expd, vr, nt) = (0L, 0.0, 0.0, 0L)
    times.foreach { t =>
      val n1 = subjects.count(s => s._1 && s._2 >= t).toDouble
      val n2 = subjects.count(s => !s._1 && s._2 >= t).toDouble
      val d1 = subjects.count(s => s._1 && s._2 == t && s._3).toLong
      val d2 = subjects.count(s => !s._1 && s._2 == t && s._3).toLong
      val d = (d1 + d2).toDouble
      val n = n1 + n2
      if (d > 0 && n > d) {
        nt += 1; obs += d1
        expd += d * n1 / n
        vr += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
      }
    }
    assert(row.getAs[Long]("n_times") === nt)
    assert(row.getAs[Long]("obs_a") === obs)
    assert(math.abs(row.getAs[Double]("exp_a") - expd) < 1e-3)
    assert(math.abs(row.getAs[Double]("logrank_chi2")
      - (obs - expd) * (obs - expd) / vr) < 1e-3)
  }

  test("q184: fuzzy block join reports only capped-block pairs within distance") {
    import spark.implicits._
    val rows = DedupOps.q184FuzzyBlockJoin(spark, sf).collect()
    // exact duplicate heads must surface as dist-0 pairs when present
    val docs = graft.Util.table(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).take(40).toLowerCase))
    val exactPairs = docs.groupBy(_._2).values
      .filter(g => g.size >= 2 && g.size <= 256)
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    val d0 = rows.find(_.getAs[Long]("dist") == 0L)
      .map(_.getAs[Long]("n_pairs")).getOrElse(0L)
    assert(d0 >= exactPairs * 9 / 10,
      s"dist-0 pairs $d0 should cover nearly all $exactPairs exact-head pairs")
    rows.foreach { r =>
      val (p, d) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("dist") <= 20L)
      assert(d <= 2 * p, "a pair involves at most two docs")
      assert(p == 0 || d >= 2)
    }
  }

  test("q287 walk: crafted chains yield known removal effects") {
    // START -> A (0.5) -> CONV; START -> B (0.5) -> NULL.
    // Removing A kills all conversion (effect 1); removing B changes nothing.
    val t1 = Seq(
      ("START", "A", 0.5), ("START", "B", 0.5),
      ("A", "CONV", 1.0), ("B", "NULL", 1.0))
    val (full1, eff1) = EventOps.markovRemovalEffects(t1)
    assert(math.abs(full1 - 0.5) < 1e-12)
    val m1 = eff1.map(e => e._1 -> e._3).toMap
    assert(math.abs(m1("A") - 0.0) < 1e-12, "removing A zeroes conversion")
    assert(math.abs(m1("B") - 0.5) < 1e-12, "removing B changes nothing")

    // A self-loop chain: START -> A; A -> A (0.5) | CONV (0.5).
    // 8-step truncation: conv = 1 - 0.5^8.
    val t2 = Seq(("START", "A", 1.0), ("A", "A", 0.5), ("A", "CONV", 0.5))
    val (full2, eff2) = EventOps.markovRemovalEffects(t2)
    assert(math.abs(full2 - (1.0 - math.pow(0.5, 7))) < 1e-12,
      s"7 post-entry steps of the geometric chain, got $full2")
    // removing A redirects START's mass to NULL immediately
    assert(math.abs(eff2.head._3 - 0.0) < 1e-12)
  }

  test("q323 fold: Shapley axioms on crafted coalitions (efficiency, symmetry, dummy)") {
    // 3 channels; masks: {A}=4 conv, {B}=4 conv, {A,B}=2, {C-only}=0 via
    // mask {C}=3 conversions that C alone explains, and 1 untouched conv.
    val counts = Seq((0L, 1L), (1L, 4L), (2L, 4L), (3L, 2L), (4L, 3L))
    val phi = EventOps.shapleyFromMaskCounts(counts, 3)
    val vFull = 1L + 4 + 4 + 2 + 3
    val vEmpty = 1L
    // efficiency: shares sum to v(N) - v(empty)
    assert(math.abs(phi.sum - (vFull - vEmpty)) < 1e-9)
    // symmetry: A and B are interchangeable by construction
    assert(math.abs(phi(0) - phi(1)) < 1e-12)
    // C's credit is exactly its solo conversions (dummy-style separability)
    assert(math.abs(phi(2) - 3.0) < 1e-9)
    // a channel touched by nothing is a dummy with zero credit
    val phi2 = EventOps.shapleyFromMaskCounts(Seq((0L, 5L), (1L, 7L)), 2)
    assert(math.abs(phi2(1) - 0.0) < 1e-12)
    assert(math.abs(phi2(0) - 7.0) < 1e-9)
  }

  test("q322: growth-accounting identity active_d = active_prev + new + resurrected - churned") {
    val rows = EventOps.q322GrowthAccounting(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
        r.getAs[Long]("n_resurrected") === r.getAs[Long]("n_active"),
        s"inflow classes partition actives on day ${r.getAs[Long]("day")}")
    }
    rows.sliding(2).foreach {
      case Array(p, c) if c.getAs[Long]("day") == p.getAs[Long]("day") + 1 =>
        assert(p.getAs[Long]("n_active") - c.getAs[Long]("n_churned") +
          c.getAs[Long]("n_new") + c.getAs[Long]("n_resurrected") ===
          c.getAs[Long]("n_active"),
          s"growth-accounting identity on day ${c.getAs[Long]("day")}")
      case _ => ()
    }
  }

  test("q325: Holt fit reconstructs residuals; 7 future rows carry only a forecast") {
    val rows = EventOps.q325HoltForecast(spark, sf).collect()
    val (fit, fut) = rows.partition(r => !r.isNullAt(r.fieldIndex("cents")))
    assert(fut.length === 7, "exactly 7 projection rows")
    fut.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("forecast")) &&
        r.isNullAt(r.fieldIndex("level")) && r.isNullAt(r.fieldIndex("resid")))
    }
    fit.filter(r => !r.isNullAt(r.fieldIndex("forecast"))).foreach { r =>
      val resid = r.getAs[Long]("cents").toDouble -
        r.getAs[Double]("forecast")
      assert(math.abs(r.getAs[Double]("resid") - BigDecimal(resid)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    }
    // projection is linear in h off the final state
    val f = fut.sortBy(_.getAs[Long]("day")).map(_.getAs[Double]("forecast"))
    val step = f(1) - f(0)
    f.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs((b - a) - step) < 1e-5, "constant-trend projection")
    }
  }
}
