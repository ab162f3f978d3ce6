package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed model fitting beyond the closed forms (q159/q169's OLS):
  * iteratively reweighted least squares for logistic regression. The
  * cluster's job per Newton iteration is ONE scan producing the
  * weighted moment matrix X'WX (d(d+1)/2 sums) and gradient vector
  * X'Wz (d sums) by conditional aggregation — map-side partials, a
  * d²-number shuffle state — and the d×d solve happens on the driver
  * where d is tiny. 100 TB of training rows cost `iterations` scans;
  * nothing driver-side grows with the data. This is exactly how MLlib's
  * own GLM training is shaped; re-derived here on plain DataFrame
  * aggregations so the engine needs no MLlib dependency.
  */
object Models {

  /** Fit binary logistic regression P(y=1) = σ(β₀ + Σ βᵢ·xᵢ) by IRLS.
    *
    * @param df          training frame
    * @param featureCols numeric feature columns (the intercept is
    *                    implicit — do not pass a constant column)
    * @param labelCol    0/1 numeric label column
    * @param iterations  Newton steps (IRLS converges quadratically;
    *                    5 is plenty for well-conditioned data)
    * @param ridge       small L2 stabilizer added to the normal-matrix
    *                    diagonal — keeps separable data from diverging
    * @return coefficients, intercept first: (β₀, β₁, …, β_d)
    */
  def logisticIrls(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iterations: Int = 5, ridge: Double = 1e-6): Array[Double] = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(iterations >= 1, s"iterations must be positive: $iterations")
    val d = featureCols.length + 1 // + intercept
    // x(0) = 1 (intercept), x(i) = featureCols(i-1)
    def x(i: Int): Column =
      if (i == 0) lit(1.0) else col(featureCols(i - 1)).cast("double")
    val y = col(labelCol).cast("double")
    var beta = Array.fill(d)(0.0)

    (1 to iterations).foreach { _ =>
      val eta = (0 until d).map(i => x(i) * beta(i)).reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-eta))
      // clamp the IRLS weight away from 0 so z = eta + (y-p)/w stays finite
      // on rows the current model already classifies with near certainty
      val w = greatest(p * (lit(1.0) - p), lit(1e-10))
      val z = eta + (y - p) / w
      val momentAggs =
        (for { i <- 0 until d; j <- i until d }
          yield sum(w * x(i) * x(j)).as(s"a_${i}_$j")) ++
          (0 until d).map(i => sum(w * x(i) * z).as(s"b_$i"))
      val row = df.agg(momentAggs.head, momentAggs.tail: _*).collect()(0)
      val a = Array.ofDim[Double](d, d)
      val b = Array.ofDim[Double](d)
      for { i <- 0 until d; j <- i until d } {
        val v = row.getAs[Double](s"a_${i}_$j")
        a(i)(j) = v; a(j)(i) = v
      }
      (0 until d).foreach { i =>
        a(i)(i) += ridge
        b(i) = row.getAs[Double](s"b_$i")
      }
      beta = solve(a, b)
    }
    beta
  }

  /** Score a frame against fitted coefficients: adds `probCol` =
    * σ(β₀ + Σ βᵢ·xᵢ) — one narrow expression, no shuffle, the
    * broadcast-free inference path.
    */
  def logisticScore(df: DataFrame, featureCols: Seq[String],
      beta: Array[Double], probCol: String = "prob"): DataFrame = {
    require(beta.length == featureCols.length + 1,
      s"coefficient count ${beta.length} != features ${featureCols.length} + intercept")
    val eta = beta.zipWithIndex.map {
      case (b, 0) => lit(b)
      case (b, i) => col(featureCols(i - 1)).cast("double") * b
    }.reduce(_ + _)
    df.withColumn(probCol, lit(1.0) / (lit(1.0) + exp(-eta)))
  }

  /** Population covariance matrix of the first `dims` components of an
    * array column — ONE aggregation over one scan producing d(d+1)/2
    * pair sums + d means via `element_at` projections (no explode, no
    * ×d² fanout; map-side partials, a d²-number shuffle state). The d×d
    * matrix materializes on the driver where d is model-sized — the
    * input [[pcaTopComponent]] and any whitening transform consume.
    * q196 is the oracle-checked relational twin of these moments.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dims: Int): Array[Array[Double]] = {
    require(dims >= 1, s"dims must be positive: $dims")
    val proj = df.select((0 until dims).map(i =>
      element_at(col(vecCol), i + 1).cast("double").as(s"x$i")): _*)
    val aggs =
      (for { i <- 0 until dims; j <- i until dims }
        yield sum(col(s"x$i") * col(s"x$j")).as(s"s_${i}_$j")) ++
        (0 until dims).map(i => sum(col(s"x$i")).as(s"m_$i")) :+
        count(lit(1)).cast("double").as("n")
    val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Double]("n")
    val cov = Array.ofDim[Double](dims, dims)
    for { i <- 0 until dims; j <- i until dims } {
      val v = row.getAs[Double](s"s_${i}_$j") / n -
        (row.getAs[Double](s"m_$i") / n) * (row.getAs[Double](s"m_$j") / n)
      cov(i)(j) = v; cov(j)(i) = v
    }
    cov
  }

  /** Top principal component of a symmetric PSD matrix by power
    * iteration — runs on the driver (the matrix is model-sized; the
    * DATA-sized work already happened in [[covarianceMatrix]]'s one
    * scan). Deterministic all-ones init (valid unless the top eigvec is
    * exactly orthogonal to 1, which a diagonal perturbation of real
    * covariance data never is). Returns (unit eigenvector, eigenvalue);
    * the sign is fixed by making the largest-magnitude component
    * positive so results are reproducible.
    */
  def pcaTopComponent(cov: Array[Array[Double]],
      iterations: Int = 100): (Array[Double], Double) = {
    val d = cov.length
    require(d >= 1 && cov.forall(_.length == d), "square matrix required")
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    (1 to iterations).foreach { _ =>
      val av = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val norm = math.sqrt(av.map(x => x * x).sum)
      require(norm > 1e-300, "zero matrix has no principal component")
      v = av.map(_ / norm)
      lambda = norm
    }
    val kmax = (0 until d).maxBy(i => math.abs(v(i)))
    if (v(kmax) < 0) v = v.map(-_)
    (v, lambda)
  }

  /** Gaussian elimination with partial pivoting — d is model-sized. */
  private def solve(aIn: Array[Array[Double]], bIn: Array[Double]): Array[Double] = {
    val d = bIn.length
    val a = aIn.map(_.clone()); val b = bIn.clone()
    for (k <- 0 until d) {
      val piv = (k until d).maxBy(r => math.abs(a(r)(k)))
      require(math.abs(a(piv)(k)) > 1e-300, "singular normal matrix")
      val (tr, tb) = (a(k), b(k)); a(k) = a(piv); b(k) = b(piv)
      a(piv) = tr; b(piv) = tb
      for (r <- k + 1 until d) {
        val f = a(r)(k) / a(k)(k)
        for (c <- k until d) a(r)(c) -= f * a(k)(c)
        b(r) -= f * b(k)
      }
    }
    val out = Array.fill(d)(0.0)
    for (k <- d - 1 to 0 by -1) {
      var s = b(k)
      for (c <- k + 1 until d) s -= a(k)(c) * out(c)
      out(k) = s / a(k)(k)
    }
    out
  }
}
