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
  }
}
