package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge frames — the join+aggregate
  * formulation that scales on Spark: each iteration is one equi-join of
  * the rank frame against the (checkpointed) edge list and one hash
  * aggregation by destination. Nothing driver-side grows with the
  * graph; iteration state is one (node, rank) row per node.
  */
object Graph {

  /** PageRank in FIXED-POINT integer arithmetic: ranks are held in
    * micro-units (1.0 ≡ 1,000,000) and every per-edge contribution is
    * an integer floor-division `rank div outdeg`, so iteration results
    * are exact integers — independent of partitioning, join order, and
    * engine float summation order. That determinism is what lets a
    * DuckDB twin hash-match the distributed run bit-for-bit; the cost
    * is ≤ outdeg micro-units of truncation per node per iteration
    * (≤ 10⁻⁶·outdeg relative), far below any ranking-relevant signal.
    *
    * `edges` must be DIRECTED (src, dst) rows — pass both directions
    * for an undirected graph. Nodes are the set of edge sources (every
    * node of an undirected dup-graph has outdeg ≥ 1, so there are no
    * dangling nodes; the damping mass keeps totals bounded regardless).
    *
    * Scale shape: the edge list and out-degree frames are computed once
    * and localCheckpoint'd (each of the `iterations` plans references
    * them as materialized scans instead of re-deriving the upstream
    * subtree — the multi-consumer re-execution trap); each round is one
    * shuffle keyed by dst plus a left join back onto the node set.
    * Returns (id, rank_micros).
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampingMicros: Long = 850000L): DataFrame = {
    require(iterations >= 1, s"iterations must be positive: $iterations")
    require(dampingMicros > 0 && dampingMicros < 1000000L,
      s"dampingMicros out of (0, 1e6): $dampingMicros")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint()
    val baseMicros = 1000000L - dampingMicros
    var ranks = outdeg.select(col("src").as("id"), lit(1000000L).as("r"))
    (1 to iterations).foreach { _ =>
      val contrib = e
        .join(ranks, e("src") === ranks("id"))
        .join(outdeg, "src")
        .select(col("dst"), expr("r div od").as("ct"))
        .groupBy(col("dst")).agg(sum(col("ct")).as("c"))
      ranks = outdeg.select(col("src").as("id"))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(baseMicros) +
            expr(s"($dampingMicros * coalesce(c, 0L)) div 1000000")).as("r"))
    }
    ranks.select(col("id"), col("r").as("rank_micros"))
  }

  /** Per-node triangle counts over an UNDIRECTED graph given as
    * canonical (a < b) edge rows — the local clustering signal that
    * separates "sits inside a duplication clique" from "bridges two
    * clusters" (a keep-one-per-cluster policy wants the former as
    * canonical, the latter inspected).
    *
    * Algorithm: the compact-forward / oriented enumeration — each
    * triangle {x < y < z} is found EXACTLY once as the edge pair
    * (x,y), (y,z) closed by (x,z), i.e. two hash equi-joins of the edge
    * list against itself, no direction double-count, no division by 6.
    * The a < b orientation is also the classic skew bound: a node's
    * join fan-out is its FORWARD degree only, so a k-clique costs
    * C(k,3) triangle rows (the true output) without any node exploding
    * to degree² candidate pairs in both directions.
    *
    * The edge frame is localCheckpoint'd: three plan references
    * (e1/e2/e3) would otherwise re-execute the upstream pair pipeline
    * three times. Returns (id, n_triangles) for nodes in ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }
}
