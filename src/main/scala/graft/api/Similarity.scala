package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Library API for embedding similarity search — DataFrame-in/
  * DataFrame-out over a corpus with (idCol: long, embCol: array<float>)
  * columns. The `graft.operators.SimilarityOps` oracle queries are thin
  * bindings of this API to the harness tables.
  *
  * Scale shape (docs/SCALING.md): probe/centroid sides broadcast, the
  * corpus scan never shuffles, dot products run in the codegen'd
  * `vector_dot` expression, and every top-k window projects embedding
  * arrays away before its shuffle so only scalars move.
  */
object Similarity {

  private def dot(a: String, b: String): String = s"vector_dot($a, $b)"

  /** Corpus with a precomputed L2 norm column (`norm`) — norms are
    * computed once per vector, never once per pair.
    */
  def withNorm(corpus: DataFrame, embCol: String): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    corpus.withColumn("norm", expr(s"sqrt(${dot(embCol, embCol)})"))
  }

  /** Exact cosine top-k: for every probe row, the k most similar corpus
    * rows (excluding itself): (probe_id, rn, cand_id, sim). `probes`
    * must be a (small, broadcastable) subset shaped like the corpus.
    */
  def cosineKnn(corpus: DataFrame, probes: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    val emb = withNorm(corpus, embCol)
    val p = withNorm(probes, embCol)
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"), col("norm").as("p_norm"))
    val c = emb.select(col(idCol).as("cand_id"), col(embCol).as("c_emb"), col("norm").as("c_norm"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
    c.crossJoin(broadcast(p))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("sim", expr(dot("p_emb", "c_emb")) / (col("p_norm") * col("c_norm")))
      // drop the arrays before the window shuffle — only scalars move
      .select(col("probe_id"), col("cand_id"), col("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("rn").cast("long").as("rn"), col("cand_id"), col("sim"))
  }

  /** IVF coarse-quantizer assignment: every corpus row gains a `cluster`
    * column = the max-cosine centroid id (ties to the lowest id). The
    * centroid set collapses into ONE broadcast array row, so assignment
    * is a narrow per-row struct-argmax — no row blowup, no shuffle.
    * `centroids` must be a small frame shaped like the corpus.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String): DataFrame = {
    val emb = withNorm(corpus, embCol)
    val centArr = withNorm(centroids, embCol)
      .agg(collect_list(struct(col(idCol).as("cent_id"), col(embCol).as("cent_emb"),
        col("norm").as("cent_norm"))).as("cents"))
    emb.crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        s"""array_max(transform(cents, c ->
           |  struct(${dot("c.cent_emb", embCol)} / (c.cent_norm * norm) AS csim,
           |         -c.cent_id AS neg_id)))""".stripMargin))
      .withColumn("cluster", -col("best.neg_id"))
      .drop("cents", "best")
  }

  /** IVF top-k: probes search only their own cell of an [[ivfAssign]]ed
    * corpus: (probe_id, rn, cluster, cand_id, sim).
    */
  def ivfKnn(assigned: DataFrame, probeFilter: org.apache.spark.sql.Column,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val probes = assigned.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
        col("norm").as("p_norm"), col("cluster"))
    val cands = assigned
      .select(col(idCol).as("cand_id"), col(embCol).as("c_emb"),
        col("norm").as("c_norm"), col("cluster"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
    cands.join(broadcast(probes), "cluster")
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("sim", expr(dot("p_emb", "c_emb")) / (col("p_norm") * col("c_norm")))
      .select(col("probe_id"), col("cluster"), col("cand_id"), col("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("rn").cast("long").as("rn"),
        col("cluster"), col("cand_id"), col("sim"))
  }

  /** All embedding pairs with cosine ≥ threshold (id_a < id_b):
    * (id_a, id_b, sim). Exact all-pairs via a broadcast of one side —
    * the blocked scale path is [[ivfAssign]] + within-cell pairing.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    val emb = withNorm(corpus, embCol)
    val a = emb.select(col(idCol).as("id_a"), col(embCol).as("a_emb"), col("norm").as("a_norm"))
    val b = emb.select(col(idCol).as("id_b"), col(embCol).as("b_emb"), col("norm").as("b_norm"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("sim", expr(dot("a_emb", "b_emb")) / (col("a_norm") * col("b_norm")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
