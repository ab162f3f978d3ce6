package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Behavioral checks for IRLS logistic regression and label
  * propagation: planted ground truth recovered, results stable under
  * repartitioning.
  */
class ModelsGraphSpec extends SparkSpec {

  test("logisticIrls: recovers planted coefficients; scoring separates the classes") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val (b0, b1, b2) = (0.5, 2.0, -1.0)
    val rows = (0 until 4000).map { _ =>
      val (x1, x2) = (rng.nextDouble() * 4 - 2, rng.nextDouble() * 4 - 2)
      val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x1 + b2 * x2)))
      (x1, x2, if (rng.nextDouble() < p) 1.0 else 0.0)
    }
    val df = rows.toDF("x1", "x2", "y")
    val beta = Models.logisticIrls(df, Seq("x1", "x2"), "y", iterations = 6)
    assert(math.abs(beta(0) - b0) < 0.3, s"intercept ${beta(0)}")
    assert(math.abs(beta(1) - b1) < 0.3, s"beta1 ${beta(1)}")
    assert(math.abs(beta(2) - b2) < 0.3, s"beta2 ${beta(2)}")

    val scored = Models.logisticScore(df, Seq("x1", "x2"), beta)
    val acc = scored.filter((col("prob") > 0.5) === (col("y") > 0.5)).count()
      .toDouble / rows.length
    assert(acc > 0.8, s"accuracy $acc")

    // convergence is partitioning-stable (IRLS at its fixed point)
    val beta2r = Models.logisticIrls(df.repartition(13), Seq("x1", "x2"), "y",
      iterations = 6)
    beta.zip(beta2r).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-3, s"partitioning moved a coefficient: $a vs $b")
    }
  }

  test("logisticIrls: near-separable data stays finite under the ridge stabilizer") {
    import spark.implicits._
    val df = ((0 until 50).map(i => (i.toDouble / 50 + 1.0, 1.0)) ++
      (0 until 50).map(i => (-i.toDouble / 50 - 1.0, 0.0))).toDF("x", "y")
    val beta = Models.logisticIrls(df, Seq("x"), "y", iterations = 8)
    assert(beta.forall(b => !b.isNaN && !b.isInfinite))
    assert(beta(1) > 0, "separating direction must be positive")
  }

  test("labelPropagation: planted cliques resolve to two communities; bridge does not merge them") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L) ++ Seq((4L, 10L)))
      .toDF("a", "b")
    val got = Graph.labelPropagation(edges, "a", "b", iterations = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("community")).toMap
    assert(got.keySet === ((0L to 4L) ++ (10L to 14L)).toSet)
    val commA = (0L to 4L).map(got).toSet
    val commB = (10L to 14L).map(got).toSet
    assert(commA.size === 1, s"clique A must agree: $got")
    assert(commB.size === 1, s"clique B must agree: $got")
    assert(commA != commB, s"bridge must not merge the cliques: $got")

    // deterministic under repartitioning
    val again = Graph.labelPropagation(edges.repartition(7), "a", "b", iterations = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("community")).toMap
    assert(again === got)

    // r13: the packed-long argmax (primitive HashAggregate path) must
    // pick the identical winner every round — n·2²²+(2²²−1−lbl) is
    // order-isomorphic to the (n, -lbl) struct ordering
    val packed = Graph.labelPropagation(edges, "a", "b", iterations = 5,
        packLabels = true)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("community")).toMap
    assert(packed === got)
  }

  test("labelPropagation packLabels: an id outside [0, 2^22) fails loudly, never decodes wrong") {
    import spark.implicits._
    // 4194304 = 2^22 — one past the packable domain; silently packing
    // it would decode to label 0 instead of failing
    val edges = Seq((1L, 4194304L), (1L, 2L)).toDF("a", "b")
    val e = intercept[Exception] {
      Graph.labelPropagation(edges, "a", "b", iterations = 2,
        packLabels = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packLabels = false")),
      s"expected the packLabels domain error, got: $e")
  }

  test("covarianceMatrix: matches brute-force population covariance; symmetric") {
    import spark.implicits._
    val rows = Seq(
      Array(1.0f, 2.0f, 3.0f), Array(2.0f, 4.0f, 5.0f),
      Array(3.0f, 6.0f, 8.0f), Array(0.0f, 1.0f, 2.0f),
      Array(5.0f, 9.0f, 13.0f))
    val df = rows.map(Tuple1(_)).toDF("emb")
    val cov = Models.covarianceMatrix(df, "emb", 3)
    val n = rows.length.toDouble
    def mean(k: Int) = rows.map(_(k).toDouble).sum / n
    for { i <- 0 until 3; j <- 0 until 3 } {
      val want = rows.map(r => r(i).toDouble * r(j)).sum / n - mean(i) * mean(j)
      assert(math.abs(cov(i)(j) - want) < 1e-9, s"cov($i)($j)")
      assert(cov(i)(j) === cov(j)(i))
    }
  }

  test("adamicAdar: exact inverse-log-degree scores; degree cap drops hot items") {
    import spark.implicits._
    // items: i1 shared by {a,b} (deg 2), i2 shared by {a,b,c} (deg 3),
    // i3 only {c} (deg 1 — never pairs), hot shared by everyone
    val m = Seq(
      ("a", "i1"), ("b", "i1"),
      ("a", "i2"), ("b", "i2"), ("c", "i2"),
      ("c", "i3"),
      ("a", "hot"), ("b", "hot"), ("c", "hot"), ("d", "hot"),
      ("a", "i2") // duplicate membership must not double-count
    ).toDF("id", "item")
    val got = Graph.adamicAdar(m, "id", "item", maxItemDegree = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val w2 = math.round(1e6 / math.log(2.0))
    val w3 = math.round(1e6 / math.log(3.0))
    // hot (deg 4 > cap) contributes nothing; (a,b) share i1+i2, others i2
    assert(got(("a", "b")) === ((2L, w2 + w3)))
    assert(got(("a", "c")) === ((1L, w3)))
    assert(got(("b", "c")) === ((1L, w3)))
    assert(!got.contains(("a", "d")), "cap must drop the hot item's pairs")
    assert(got.size === 3)
    // the packed-key fold is a pure shuffle-width optimization: same rows
    val ids = Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L)
    val mNum = m.select(
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.typedLit(ids), $"id").as("id"),
      $"item")
    val packed = Graph.adamicAdar(mNum, "id", "item", maxItemDegree = 3,
        packIds = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(packed === got.map { case ((a, b), v) => ((ids(a), ids(b)), v) })
  }

  test("adamicAdar packIds: an id outside [0, 2^22) fails loudly, never corrupts the key") {
    import spark.implicits._
    // 4194304 = 2^22 — one past the packable domain; silently packing it
    // would alias into a WRONG (id_a, id_b) pair with no error
    val m = Seq((1L, "i1"), (4194304L, "i1"), (2L, "i1")).toDF("id", "item")
    val e = intercept[Exception] {
      Graph.adamicAdar(m, "id", "item", packIds = true).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("2^22")),
      s"expected the packIds domain error, got: $e")
    // the same frame is fine unpacked
    assert(Graph.adamicAdar(m, "id", "item").count() === 3L)
  }

  test("pcaTopComponent: returns the dominant eigenpair of a known matrix") {
    // eigvalues 3 and 1, top eigvec (1,1)/√2
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (v, lambda) = Models.pcaTopComponent(a)
    assert(math.abs(lambda - 3.0) < 1e-9)
    assert(math.abs(v(0) - 1 / math.sqrt(2)) < 1e-9)
    assert(math.abs(v(1) - 1 / math.sqrt(2)) < 1e-9)
    // residual ‖Av − λv‖ ≈ 0 on the embeddings covariance too
    val cov = Models.covarianceMatrix(
      graft.Util.table(spark, sf, "embeddings"), "embedding", 8)
    // random embeddings are near-isotropic (small eigengap), so power
    // iteration needs more rounds and a method-appropriate tolerance
    val (v8, l8) = Models.pcaTopComponent(cov, iterations = 2000)
    assert(math.abs(v8.map(x => x * x).sum - 1.0) < 1e-9, "unit norm")
    val res = (0 until 8).map { i =>
      val av = (0 until 8).map(j => cov(i)(j) * v8(j)).sum
      math.pow(av - l8 * v8(i), 2)
    }.sum
    assert(math.sqrt(res) < 1e-2 * math.max(l8, 1e-12), s"residual $res")
    // λ must dominate the Rayleigh quotient of axis-aligned probes
    (0 until 8).foreach(i => assert(l8 >= cov(i)(i) - 1e-9))
  }
}
